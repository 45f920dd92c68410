"""Quaternion helper tests (pure-numpy pyquaternion replacement)."""
import numpy as np

from stp3_tpu.utils import quaternion as Q


def test_rotation_matrix_yaw():
    yaw = 0.7
    q = Q.yaw_quat(yaw)
    r = Q.quat_to_rotation_matrix(q)
    expected = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                         [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
    np.testing.assert_allclose(r, expected, atol=1e-12)
    np.testing.assert_allclose(Q.quat_yaw(q), yaw, atol=1e-12)


def test_inverse():
    rng = np.random.RandomState(0)
    q = rng.randn(4)
    r = Q.quat_to_rotation_matrix(q)
    r_inv = Q.quat_to_rotation_matrix(Q.quat_inverse(q))
    np.testing.assert_allclose(r @ r_inv, np.eye(3), atol=1e-12)


def test_transform_matrix_inverse():
    rng = np.random.RandomState(1)
    q = rng.randn(4)
    t = rng.randn(3)
    m = Q.transform_matrix(t, q)
    m_inv = Q.transform_matrix(t, q, inverse=True)
    np.testing.assert_allclose(m @ m_inv, np.eye(4), atol=1e-12)


def test_yaw_from_matrix_matches_quat_yaw():
    rng = np.random.RandomState(2)
    q = rng.randn(4)
    np.testing.assert_allclose(Q.yaw_from_matrix(Q.transform_matrix([0, 0, 0], q)),
                               Q.quat_yaw(q), atol=1e-12)


def test_box_bottom_corners():
    from stp3_tpu.datas.nuscenes_data import _box_bottom_corners
    # axis-aligned box at origin: w=2 (y extent), l=4 (x extent), h=2
    corners = _box_bottom_corners([0, 0, 0], [2.0, 4.0, 2.0], [1, 0, 0, 0])
    assert corners.shape == (3, 4)
    np.testing.assert_allclose(sorted(np.abs(corners[0])), [2, 2, 2, 2])
    np.testing.assert_allclose(sorted(np.abs(corners[1])), [1, 1, 1, 1])
    np.testing.assert_allclose(corners[2], [-1, -1, -1, -1])
