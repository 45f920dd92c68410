"""Loss functions vs the ACTUAL reference stp3/losses.py (imports torch
only — directly runnable). tests/test_losses.py pins the quirks with
hand-built torch formulas; this pins them to the reference classes
themselves, so a drift in the reference-reading cannot hide in a shared
misreading (discount starts at the FIRST future frame, top-k sorts after
discounting, HDmap per-element training weights, depth mean-over-all
incl. zeroed ignored pixels, the KL conventions).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

import reference_oracle as ro  # noqa: E402

ro.install()

from stp3 import losses as ref_losses  # noqa: E402  (reference)

from stp3_tpu import losses as L  # noqa: E402


def _rand(shape, seed, scale=1.0):
    return (np.random.RandomState(seed).randn(*shape) * scale).astype(np.float32)


def t_first(x, axis=2):
    """channels-last numpy -> torch channels-first at `axis`."""
    return torch.from_numpy(np.moveaxis(x, -1, axis).copy())


def test_segmentation_loss_oracle():
    b, s, h, w, c = 2, 5, 8, 8, 2
    rng = np.random.RandomState(0)
    logits = _rand((b, s, h, w, c), 1)
    target = rng.randint(0, c, (b, s, h, w))
    target[0, 0, :2] = 255                       # ignored pixels
    weights = [1.0, 2.5]
    for use_top_k, ratio in [(False, 1.0), (True, 0.25)]:
        got = L.segmentation_loss(jnp.asarray(logits), jnp.asarray(target),
                                  weights, n_present=3, future_discount=0.95,
                                  use_top_k=use_top_k, top_k_ratio=ratio)
        ref = ref_losses.SegmentationLoss(
            class_weights=torch.tensor(weights), use_top_k=use_top_k,
            top_k_ratio=ratio, future_discount=0.95)
        with torch.no_grad():
            want = ref(t_first(logits), torch.from_numpy(target)[:, :, None],
                       n_present=3)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5,
                                   err_msg=f'top_k={use_top_k}')


def test_hdmap_loss_oracle():
    b, h, w, e = 2, 8, 8, 2
    rng = np.random.RandomState(2)
    logits = _rand((b, h, w, 2 * e), 3)
    target = rng.randint(0, 2, (b, h, w, e))
    weights = [[1.0, 3.0], [1.0, 1.5]]
    train_w = [2.0, 0.5]
    use_top_k = [True, False]
    ratio = [0.5, 1.0]
    got = L.hdmap_loss(jnp.asarray(logits), jnp.asarray(target), weights,
                       train_w, use_top_k, ratio)
    ref = ref_losses.HDmapLoss(
        class_weights=[torch.tensor(wi) for wi in weights],
        training_weights=train_w, use_top_k=use_top_k, top_k_ratio=ratio)
    with torch.no_grad():
        want = ref(t_first(logits, axis=1),
                   torch.from_numpy(np.moveaxis(target, -1, 1).copy()))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


@pytest.mark.parametrize('norm', [1, 2])
def test_spatial_regression_loss_oracle(norm):
    b, s, h, w, c = 2, 4, 8, 8, 2
    pred = _rand((b, s, h, w, c), 4)
    target = _rand((b, s, h, w, c), 5)
    target[0, :, :3] = 255                       # ignored region
    got = L.spatial_regression_loss(jnp.asarray(pred), jnp.asarray(target),
                                    norm=norm, n_present=2,
                                    future_discount=0.9)
    ref = ref_losses.SpatialRegressionLoss(norm=norm, future_discount=0.9)
    with torch.no_grad():
        want = ref(t_first(pred), t_first(target), n_present=2)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_depth_loss_oracle():
    b, s, n, d, h, w = 1, 2, 2, 6, 4, 4
    rng = np.random.RandomState(6)
    logits = _rand((b, s, n, h, w, d), 7)
    target = rng.randint(0, d, (b, s, n, h, w))
    target[0, 0, 0, 0] = 255                     # ignored pixels
    got = L.depth_loss(jnp.asarray(logits), jnp.asarray(target))
    ref = ref_losses.DepthLoss(ignore_index=255)
    with torch.no_grad():
        want = ref(torch.from_numpy(np.moveaxis(logits, -1, 3).copy()),
                   torch.from_numpy(target))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


@pytest.mark.parametrize('method', ['GAUSSIAN', 'MIXGAUSSIAN', 'BERNOULLI'])
def test_probabilistic_loss_oracle(method):
    b, sdim, ldim = 2, 1, 4
    if method == 'GAUSSIAN':
        out = {'present_mu': _rand((b, sdim, ldim), 8, 0.5),
               'present_log_sigma': _rand((b, sdim, ldim), 9, 0.3),
               'future_mu': _rand((b, sdim, ldim), 10, 0.5),
               'future_log_sigma': _rand((b, sdim, ldim), 11, 0.3)}
        t_out = {k: torch.from_numpy(v) for k, v in out.items()}
    elif method == 'MIXGAUSSIAN':
        out = {'present_mu': [_rand((b, sdim, ldim), 20 + i, 0.5) for i in range(3)],
               'present_log_sigma': [_rand((b, sdim, ldim), 23 + i, 0.3) for i in range(3)],
               'future_mu': [_rand((b, sdim, ldim), 26 + i, 0.5) for i in range(3)],
               'future_log_sigma': [_rand((b, sdim, ldim), 29 + i, 0.3) for i in range(3)]}
        t_out = {k: [torch.from_numpy(x) for x in v] for k, v in out.items()}
    else:
        lp = np.log(np.random.RandomState(12).rand(b, 8, 8, ldim)
                    .astype(np.float32) * 0.9 + 0.05)
        lq = np.log(np.random.RandomState(13).rand(b, 8, 8, ldim)
                    .astype(np.float32) * 0.9 + 0.05)
        out = {'present_log_prob': lp, 'future_log_prob': lq}
        # reference layout: (B, L, H, W)
        t_out = {k: torch.from_numpy(np.moveaxis(v, -1, 1).copy())
                 for k, v in out.items()}
    got = L.probabilistic_loss(out, method)
    ref = ref_losses.ProbabilisticLoss(method)
    with torch.no_grad():
        want = ref(t_out)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5,
                               err_msg=method)
