"""Trajectory sampler tests (reference stp3/utils/sampler.py semantics)."""
import numpy as np

from stp3_tpu.utils.sampler import sample, sample_trajectories


def test_shapes_and_sorting():
    rng = np.random.RandomState(0)
    tt = np.arange(0.0, 2.05, 0.05)
    out = sample(5.0, 0.1, np.array([0.0, 1.0]), np.array([-1.0, 0.0]), tt, 30, rng=rng)
    assert out.shape == (30, len(tt), 3)
    # sorted by terminal x so LEFT/FORWARD/RIGHT thirds are positional
    assert (np.diff(out[:, -1, 0]) >= 0).all()


def test_all_start_at_origin():
    rng = np.random.RandomState(1)
    tt = np.arange(0.0, 1.05, 0.05)
    out = sample(3.0, -0.05, np.array([0.0, 1.0]), np.array([1.0, 0.0]), tt, 30, rng=rng)
    np.testing.assert_allclose(out[:, 0, :2], 0.0, atol=1e-6)


def test_straight_lines_match_kinematics():
    rng = np.random.RandomState(2)
    tt = np.arange(0.0, 1.05, 0.05)
    # possibility all-straight
    out = sample(4.0, 0.0, np.array([0.0, 1.0]), np.array([1.0, 0.0]), tt, 10,
                 possibility=(0.0, 1.0, 0.0), rng=rng)
    # straight candidates have zero lateral displacement and zero heading
    np.testing.assert_allclose(out[:, :, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[:, :, 2], 0.0, atol=1e-6)
    # longitudinal positions are monotone for accel >= -3 over 1s from v>=0
    assert np.isfinite(out).all()


def test_wrapper_decimation():
    rng = np.random.RandomState(3)
    out = sample_trajectories(5.0, 0.1, n_future=4, n_samples=12, rng=rng)
    assert out.shape == (12, 5, 3)


def test_steering_flip():
    r1 = np.random.RandomState(4)
    r2 = np.random.RandomState(4)
    a = sample_trajectories(5.0, 0.2, 4, 12, flip_steering=False, rng=r1)
    b = sample_trajectories(5.0, -0.2, 4, 12, flip_steering=True, rng=r2)
    np.testing.assert_allclose(a, b)
