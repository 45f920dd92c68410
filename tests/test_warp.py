import jax.numpy as jnp
import numpy as np
import pytest

from stp3_tpu.ops import warp as W

torch = pytest.importorskip('torch')
import torch.nn.functional as TF  # noqa: E402


def _torch_warp(x_nchw, theta, mode):
    grid = TF.affine_grid(torch.tensor(theta), size=x_nchw.shape, align_corners=False)
    return TF.grid_sample(torch.tensor(x_nchw), grid, mode=mode,
                          padding_mode='zeros', align_corners=False).numpy()


@pytest.mark.parametrize('mode', ['bilinear', 'nearest'])
def test_affine_grid_sample_matches_torch(mode):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 9, 3).astype(np.float32)  # B,H,W,C
    theta = np.stack([
        np.array([[np.cos(0.3), -np.sin(0.3), 0.1], [np.sin(0.3), np.cos(0.3), -0.2]]),
        np.array([[1.0, 0.0, 0.45], [0.0, 1.0, 0.0]]),
    ]).astype(np.float32)
    ours = np.asarray(W.affine_grid_sample(jnp.asarray(x), jnp.asarray(theta), mode=mode))
    ref = _torch_warp(np.transpose(x, (0, 3, 1, 2)), theta, mode)
    ref = np.transpose(ref, (0, 2, 3, 1))
    # nearest can differ at exact .5 boundaries; use a tolerant comparison there
    if mode == 'nearest':
        frac_match = (np.isclose(ours, ref, atol=1e-5)).mean()
        assert frac_match > 0.98, frac_match
    else:
        np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize('mode', ['bilinear', 'nearest'])
def test_warp_features_matches_torch_reference_impl(mode):
    """Oracle: the exact reference warp_features math run through torch."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 10, 10, 2).astype(np.float32)
    flow = rng.randn(2, 6).astype(np.float32) * 0.3
    extent = (5.0, 5.0)

    ours = np.asarray(W.warp_features(jnp.asarray(x), jnp.asarray(flow), mode, extent))

    # reference math (geometry.py:196-238)
    angle = flow[:, 5]
    tr = flow[:, :2].copy()
    tr[:, 0] /= extent[0]
    tr[:, 1] /= extent[1]
    tr[:, 0] *= -1
    cos_t, sin_t = np.cos(angle), np.sin(angle)
    theta = np.stack([cos_t, -sin_t, tr[:, 1], sin_t, cos_t, tr[:, 0]], axis=-1).reshape(2, 2, 3).astype(np.float32)
    ref = _torch_warp(np.transpose(x, (0, 3, 1, 2)), theta, mode)
    ref = np.transpose(ref, (0, 2, 3, 1))
    if mode == 'nearest':
        assert (np.isclose(ours, ref, atol=1e-5)).mean() > 0.97
    else:
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_cumulative_warp_identity_flow_is_noop():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 8, 8, 1).astype(np.float32)
    flow = np.zeros((1, 3, 6), dtype=np.float32)
    out = np.asarray(W.cumulative_warp_features(jnp.asarray(x), jnp.asarray(flow),
                                                'bilinear', (4.0, 4.0)))
    np.testing.assert_allclose(out, x, atol=1e-5)
    out_r = np.asarray(W.cumulative_warp_features_reverse(jnp.asarray(x), jnp.asarray(flow),
                                                          'bilinear', (4.0, 4.0)))
    np.testing.assert_allclose(out_r, x, atol=1e-5)


def test_cumulative_warp_known_translation():
    """A +x ego translation of 1 grid-extent-unit shifts past frames."""
    h = w = 8
    x = np.zeros((1, 2, h, w, 1), dtype=np.float32)
    x[0, 0, 4, 4, 0] = 1.0  # a dot in the past frame
    x[0, 1, 4, 4, 0] = 1.0
    flow = np.zeros((1, 2, 6), dtype=np.float32)
    # ego moves forward 2m between frame0 and frame1; extent 8m x 8m, cell=2m
    flow[0, 0, 0] = 2.0
    extent = (8.0, 8.0)
    out = np.asarray(W.cumulative_warp_features(jnp.asarray(x), jnp.asarray(flow),
                                                'nearest', extent))
    # present frame unchanged
    np.testing.assert_allclose(out[0, 1], x[0, 1])
    # exact check against the reference torch path
    import torch.nn.functional as TF2
    tr0 = -2.0 / extent[0]  # reference: translation[:,0] = -flow_x / extent_x
    theta = np.array([[[1.0, 0.0, 0.0], [0.0, 1.0, tr0]]], dtype=np.float32)
    grid = TF2.affine_grid(torch.tensor(theta), size=(1, 1, h, w), align_corners=False)
    ref = TF2.grid_sample(torch.tensor(x[0, 0:1].transpose(0, 3, 1, 2)), grid, mode='nearest',
                          padding_mode='zeros', align_corners=False).numpy()[0, 0]
    np.testing.assert_allclose(out[0, 0, :, :, 0], ref, atol=1e-5)
