"""Misc utility tests: network helpers, Kalman filter, profiling timer."""
import jax.numpy as jnp
import numpy as np

from stp3_tpu.utils import network as N
from stp3_tpu.utils.kalman import KalmanFilter


def test_pack_unpack_roundtrip():
    x = jnp.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5)
    packed = N.pack_sequence_dim(x)
    assert packed.shape == (6, 4, 5)
    np.testing.assert_array_equal(np.asarray(N.unpack_sequence_dim(packed, 2, 3)),
                                  np.asarray(x))


def test_normalise_denormalise_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (8, 8, 3), np.uint8)
    out = N.denormalise_image(N.normalise_image(img))
    np.testing.assert_allclose(out, img / 255.0, atol=1e-5)


def test_prepare_image_uint8_matches_host_normalise():
    """uint8 wire format + in-jit normalisation == the reference's
    host-side fp32 normalise (same math, device-side)."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (2, 4, 6, 3), np.uint8)
    got = np.asarray(N.prepare_image(jnp.asarray(img), jnp.float32))
    want = N.normalise_image(img)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_prepare_image_float_passthrough():
    """float input = already normalised: only a dtype cast, no re-scale."""
    x = np.linspace(-2, 2, 24, dtype=np.float32).reshape(2, 4, 3)
    got = N.prepare_image(jnp.asarray(x), jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), x, atol=2e-2)


def test_kalman_constant_velocity_tracks_line():
    dt = 1.0
    f = np.array([[1, dt], [0, 1]])
    h = np.array([[1.0, 0.0]])
    q = np.eye(2) * 1e-4
    r = np.eye(1) * 0.25
    kf = KalmanFilter(f, h, q, r)
    s = kf.init(np.zeros(2), np.eye(2))
    rng = np.random.RandomState(0)
    true = np.arange(1, 31, dtype=np.float64)           # position = t (v=1)
    zs = (true + 0.5 * rng.randn(30))[:, None]
    s_final, xs = kf.filter(s, jnp.asarray(zs))
    # velocity estimate converges to ~1, position tracks within noise
    assert abs(float(s_final.x[1]) - 1.0) < 0.15
    assert abs(float(xs[-1, 0]) - true[-1]) < 1.0


def test_kalman_update_reduces_uncertainty():
    kf = KalmanFilter(np.eye(1), np.eye(1), np.eye(1) * 1e-6, np.eye(1))
    s = kf.init(np.zeros(1), np.eye(1) * 100.0)
    s2 = kf.update(s, np.array([5.0]))
    assert float(s2.p[0, 0]) < float(s.p[0, 0])


def test_probabilistic_loss_usable_from_model_outputs():
    """STP3 exposes present_mu/log_sigma so losses.probabilistic_loss works."""
    from stp3_tpu.losses import gaussian_kl
    mu = jnp.zeros((2, 1, 4))
    ls = jnp.zeros((2, 1, 4))
    out = {'present_mu': mu, 'present_log_sigma': ls,
           'future_mu': mu + 1.0, 'future_log_sigma': ls}
    from stp3_tpu.losses import probabilistic_loss
    val = float(probabilistic_loss(out, 'GAUSSIAN'))
    np.testing.assert_allclose(val, 0.5 * 4, rtol=1e-6)  # sum over latent of 0.5*diff^2
