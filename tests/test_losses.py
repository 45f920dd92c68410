"""Loss parity tests vs torch oracles (reference stp3/losses.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from stp3_tpu import losses as L

torch = pytest.importorskip('torch')
import torch.nn.functional as TF  # noqa: E402


def _np(x):
    return np.asarray(x)


def test_segmentation_loss_matches_torch_ce():
    rng = np.random.RandomState(0)
    b, s, h, w, c = 2, 3, 4, 5, 2
    pred = rng.randn(b, s, h, w, c).astype(np.float32)
    tgt = rng.randint(0, c, (b, s, h, w))
    weights = [1.0, 2.0]
    ours = L.segmentation_loss(jnp.asarray(pred), jnp.asarray(tgt), weights,
                               n_present=3, future_discount=1.0)
    # torch oracle: CE(weight) reduction none -> mean
    tp = torch.tensor(pred).permute(0, 1, 4, 2, 3).reshape(b * s, c, h, w)
    tt = torch.tensor(tgt).reshape(b * s, h, w)
    ref = TF.cross_entropy(tp, tt, weight=torch.tensor(weights),
                           reduction='none').mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_segmentation_loss_topk_and_discount():
    rng = np.random.RandomState(1)
    b, s, h, w, c = 1, 4, 4, 4, 2
    pred = rng.randn(b, s, h, w, c).astype(np.float32)
    tgt = rng.randint(0, c, (b, s, h, w))
    disc = 0.5
    ours = L.segmentation_loss(jnp.asarray(pred), jnp.asarray(tgt), [1.0, 1.0],
                               n_present=2, future_discount=disc,
                               use_top_k=True, top_k_ratio=0.25)
    tp = torch.tensor(pred).permute(0, 1, 4, 2, 3).reshape(b * s, c, h, w)
    tt = torch.tensor(tgt).reshape(b * s, h, w)
    loss = TF.cross_entropy(tp, tt, reduction='none').reshape(b, s, h, w)
    discounts = torch.tensor([1.0, 1.0, disc, disc ** 2]).view(1, s, 1, 1)
    loss = (loss * discounts).reshape(b, s, -1)
    k = int(0.25 * h * w)
    loss, _ = torch.sort(loss, dim=2, descending=True)
    ref = loss[:, :, :k].mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_segmentation_loss_ignore_index_zeroes():
    pred = np.zeros((1, 1, 2, 2, 2), np.float32)
    tgt = np.full((1, 1, 2, 2), 255)
    ours = L.segmentation_loss(jnp.asarray(pred), jnp.asarray(tgt), [1.0, 1.0],
                               n_present=1)
    assert float(ours) == 0.0


def test_spatial_regression_l1_masked():
    pred = np.ones((1, 2, 2, 2, 2), np.float32) * 3.0
    tgt = np.ones((1, 2, 2, 2, 2), np.float32)
    tgt[0, 0, 0, 0] = 255.0  # ignored pixel
    ours = L.spatial_regression_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                     norm=1, n_present=2)
    # each valid pixel: |3-1| * 2 channels = 4; mean over 7 valid pixels
    np.testing.assert_allclose(float(ours), 4.0, rtol=1e-6)


def test_spatial_regression_all_ignored_returns_zero():
    pred = np.ones((1, 1, 2, 2, 2), np.float32)
    tgt = np.full((1, 1, 2, 2, 2), 255.0, np.float32)
    assert float(L.spatial_regression_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                           norm=2, n_present=1)) == 0.0


def test_hdmap_loss_matches_torch():
    rng = np.random.RandomState(2)
    b, h, w, e = 2, 4, 4, 2
    pred = rng.randn(b, h, w, 2 * e).astype(np.float32)
    tgt = rng.randint(0, 2, (b, h, w, e))
    cw = [[1.0, 5.0], [1.0, 1.0]]
    ours = L.hdmap_loss(jnp.asarray(pred), jnp.asarray(tgt), cw, [1, 1],
                        [True, False], [0.25, 0.25])
    ref = 0.0
    tp = torch.tensor(pred).permute(0, 3, 1, 2)
    for i in range(e):
        cur = TF.cross_entropy(tp[:, 2 * i:2 * (i + 1)],
                               torch.tensor(tgt[..., i]),
                               weight=torch.tensor(cw[i]),
                               reduction='none').reshape(b, -1)
        if [True, False][i]:
            k = int(0.25 * h * w)
            cur, _ = torch.sort(cur, dim=1, descending=True)
            cur = cur[:, :k]
        ref += cur.mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_gaussian_kl_zero_for_identical():
    mu = jnp.asarray(np.random.RandomState(3).randn(2, 1, 8).astype(np.float32))
    ls = jnp.zeros((2, 1, 8))
    np.testing.assert_allclose(float(L.gaussian_kl(mu, ls, mu, ls)), 0.0, atol=1e-6)


def test_depth_loss_known_value():
    # two bins, logits [0, 0] -> CE = log(2) everywhere
    pred = np.zeros((1, 1, 1, 2, 2, 2), np.float32)
    tgt = np.zeros((1, 1, 1, 2, 2), np.int32)
    np.testing.assert_allclose(float(L.depth_loss(jnp.asarray(pred), jnp.asarray(tgt))),
                               np.log(2.0), rtol=1e-6)
