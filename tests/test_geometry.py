import jax.numpy as jnp
import numpy as np
import pytest

from stp3_tpu.ops import geometry as G


def test_bev_parameters_match_reference_values():
    res, start, dim = G.calculate_birds_eye_view_parameters(
        [-50.0, 50.0, 0.5], [-50.0, 50.0, 0.5], [-10.0, 10.0, 20.0]
    )
    np.testing.assert_allclose(res, [0.5, 0.5, 20.0])
    np.testing.assert_allclose(start, [-49.75, -49.75, 0.0])
    np.testing.assert_array_equal(dim, [200, 200, 1])


def test_frustum_shape_and_corners():
    fr = G.create_frustum((224, 480), 8, (2.0, 50.0, 1.0))
    assert fr.shape == (48, 28, 60, 3)
    # first point: u=0, v=0, d=2
    np.testing.assert_allclose(fr[0, 0, 0], [0.0, 0.0, 2.0])
    # last u spans to W-1, v to H-1, d to 49
    np.testing.assert_allclose(fr[-1, -1, -1], [479.0, 223.0, 49.0])


def test_pose_roundtrip():
    rng = np.random.RandomState(0)
    vec = np.concatenate([rng.randn(5, 3), 0.5 * rng.randn(5, 3)], axis=-1).astype(np.float32)
    mat = G.pose_vec2mat(jnp.asarray(vec))
    vec2 = G.mat2pose_vec(mat)
    np.testing.assert_allclose(np.asarray(vec2), vec, atol=1e-5)
    # bottom row is homogeneous
    np.testing.assert_allclose(np.asarray(mat)[:, 3], np.tile([0, 0, 0, 1], (5, 1)), atol=0)


def test_invert_pose_matrix():
    rng = np.random.RandomState(1)
    vec = np.concatenate([rng.randn(4, 3), 0.3 * rng.randn(4, 3)], axis=-1).astype(np.float32)
    mat = G.pose_vec2mat(jnp.asarray(vec))
    inv = G.invert_pose_matrix(mat)
    prod = np.asarray(mat @ inv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (4, 1, 1)), atol=1e-5)


def test_get_geometry_identity_camera():
    # K = I, E = I: point = (u*d, v*d, d)
    fr = jnp.asarray(G.create_frustum((16, 16), 8, (1.0, 3.0, 1.0)))  # (2,2,2,3)
    k = jnp.eye(3)[None]
    e = jnp.eye(4)[None]
    pts = G.get_geometry(fr, k, e)
    expected = np.concatenate(
        [np.asarray(fr[..., :2]) * np.asarray(fr[..., 2:3]), np.asarray(fr[..., 2:3])], axis=-1
    )
    np.testing.assert_allclose(np.asarray(pts[0]), expected, atol=1e-5)


def test_get_geometry_translation():
    fr = jnp.asarray(G.create_frustum((16, 16), 8, (1.0, 2.0, 1.0)))
    k = jnp.eye(3)[None]
    e = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))[None]
    pts = G.get_geometry(fr, k, e)
    base = G.get_geometry(fr, k, jnp.eye(4)[None])
    np.testing.assert_allclose(np.asarray(pts - base)[0],
                               np.broadcast_to([1.0, 2.0, 3.0], pts.shape[1:]), atol=1e-5)


def test_update_intrinsics():
    k = jnp.array([[[100.0, 0, 50], [0, 200.0, 60], [0, 0, 1]]])
    k2 = G.update_intrinsics(k, top_crop=10, left_crop=5, scale_width=0.5, scale_height=0.25)
    np.testing.assert_allclose(np.asarray(k2[0]), [[50, 0, 20], [0, 50, 5], [0, 0, 1]], atol=1e-5)


def test_cumulative_prewarp_chain():
    # two frames of known forward motion: frame0 must get M0, frame1 identity
    vec = np.zeros((1, 2, 6), dtype=np.float32)
    vec[0, 0, 0] = 1.0  # tx = 1 from frame0 -> frame1
    tr = G.cumulative_prewarp_transforms(jnp.asarray(vec), 2)
    np.testing.assert_allclose(np.asarray(tr[0, 1]), np.eye(4), atol=1e-6)
    expected = np.eye(4)
    expected[0, 3] = 1.0
    np.testing.assert_allclose(np.asarray(tr[0, 0]), expected, atol=1e-6)

    # three frames: frame0 gets M1 @ M0
    vec = np.zeros((1, 3, 6), dtype=np.float32)
    vec[0, 0, 0] = 1.0
    vec[0, 1, 5] = np.pi / 2  # yaw between frame1 and frame2
    tr = G.cumulative_prewarp_transforms(jnp.asarray(vec), 3)
    m0 = np.asarray(G.pose_vec2mat(jnp.asarray(vec[0, 0])))
    m1 = np.asarray(G.pose_vec2mat(jnp.asarray(vec[0, 1])))
    np.testing.assert_allclose(np.asarray(tr[0, 0]), m1 @ m0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr[0, 1]), m1, atol=1e-6)
