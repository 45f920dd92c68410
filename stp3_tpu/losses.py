"""Loss functions — pure, channels-last, jit-friendly.

Mirrors reference stp3/losses.py semantics exactly (CE with class weights +
ignore-index, future-frame discounting, top-k hardest-pixel selection,
L1/L2 spatial regression with ignore masks, depth-bin CE, and the
probabilistic KL divergences), as pure functions of (prediction, target).

Differences from the reference's torch modules:
  * predictions are channels-LAST: seg (B,S,H,W,C), hdmap (B,H,W,2E),
    regression (B,S,H,W,C), depth (B,S,N,Hf,Wf,D);
  * top-k uses jax.lax.top_k with a static k (= ratio x H*W);
  * torch's "reduction='none' then .mean()" quirk — ignored pixels
    contribute zeros to the mean denominator — is preserved.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _future_discounts(s: int, n_present: int, discount: float, dtype=jnp.float32):
    """[1]*n_present + [d^1 ... d^future_len] (reference losses.py:33-37,70-75)."""
    future_len = s - n_present
    return jnp.concatenate([
        jnp.ones((n_present,), dtype),
        discount ** jnp.arange(1, future_len + 1, dtype=dtype),
    ])


def _weighted_ce(logits: jnp.ndarray, target: jnp.ndarray, class_weights,
                 ignore_index: int) -> jnp.ndarray:
    """Per-pixel weighted cross-entropy, zero at ignored pixels (torch
    F.cross_entropy(weight=..., ignore_index=..., reduction='none'))."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = target != ignore_index
    tgt = jnp.where(valid, target, 0)
    # one-hot contraction, not take_along_axis: per-pixel scalar gathers
    # (and their scatter VJPs) run ~25 cycles/elem on TPU, a dense C-wide
    # multiply-sum is pure VPU (see ops/static_splat.py device_arrays note)
    oh = jax.nn.one_hot(tgt, logp.shape[-1], dtype=logp.dtype)
    nll = -(logp * oh).sum(-1)
    w = oh @ jnp.asarray(class_weights, logits.dtype)
    return jnp.where(valid, nll * w, 0.0)


def segmentation_loss(prediction: jnp.ndarray, target: jnp.ndarray,
                      class_weights: Sequence[float], n_present: int = 3,
                      future_discount: float = 1.0, use_top_k: bool = False,
                      top_k_ratio: float = 1.0, ignore_index: int = 255) -> jnp.ndarray:
    """prediction (B,S,H,W,C) logits; target (B,S,H,W) int
    (reference SegmentationLoss, losses.py:43-83)."""
    b, s, h, w, _ = prediction.shape
    loss = _weighted_ce(prediction, target, class_weights, ignore_index)
    loss = loss * _future_discounts(s, n_present, future_discount,
                                    loss.dtype)[None, :, None, None]
    loss = loss.reshape(b, s, h * w)
    if use_top_k:
        k = int(top_k_ratio * h * w)
        loss, _ = jax.lax.top_k(loss, k)
    return loss.mean()


def hdmap_loss(prediction: jnp.ndarray, target: jnp.ndarray,
               class_weights: Sequence[Sequence[float]],
               training_weights: Sequence[float],
               use_top_k: Sequence[bool], top_k_ratio: Sequence[float],
               ignore_index: int = 255) -> jnp.ndarray:
    """prediction (B,H,W,2E) logits; target (B,H,W,E) int per-element
    (reference HDmapLoss, losses.py:85-114)."""
    b, h, w, _ = prediction.shape
    total = jnp.zeros((), prediction.dtype)
    for i in range(target.shape[-1]):
        cur = _weighted_ce(prediction[..., 2 * i:2 * (i + 1)], target[..., i],
                           class_weights[i], ignore_index)
        cur = cur.reshape(b, h * w)
        if use_top_k[i]:
            k = int(top_k_ratio[i] * h * w)
            cur, _ = jax.lax.top_k(cur, k)
        total = total + cur.mean() * training_weights[i]
    return total


def spatial_regression_loss(prediction: jnp.ndarray, target: jnp.ndarray,
                            norm: int, n_present: int = 3,
                            future_discount: float = 1.0,
                            ignore_index: int = 255) -> jnp.ndarray:
    """prediction/target (B,S,H,W,C); L1 (norm=1) or MSE (norm=2), channel
    sum, discount, masked mean over pixels whose target[...,0] != ignore
    (reference SpatialRegressionLoss, losses.py:6-40)."""
    assert prediction.ndim == 5, 'Must be a 5D tensor'
    mask = target[..., 0] != ignore_index                       # (B,S,H,W)
    if norm == 1:
        loss = jnp.abs(prediction - target)
    elif norm == 2:
        loss = (prediction - target) ** 2
    else:
        raise ValueError(f'Expected norm 1 or 2, got {norm}')
    loss = loss.sum(axis=-1)                                    # (B,S,H,W)
    s = loss.shape[1]
    loss = loss * _future_discounts(s, n_present, future_discount,
                                    loss.dtype)[None, :, None, None]
    count = mask.sum()
    return jnp.where(count > 0, (loss * mask).sum() / jnp.maximum(count, 1), 0.0)


def depth_loss(prediction: jnp.ndarray, target: jnp.ndarray,
               ignore_index: int = 255) -> jnp.ndarray:
    """prediction (B,S,N,Hf,Wf,D) logits over depth bins; target int
    (reference DepthLoss, losses.py:116-134). Ignored pixels are excluded
    from the mean (torch CE with ignore_index + implicit masking)."""
    logp = jax.nn.log_softmax(prediction, axis=-1)
    valid = target != ignore_index
    tgt = jnp.where(valid, target, 0)
    oh = jax.nn.one_hot(tgt, logp.shape[-1], dtype=logp.dtype)
    nll = -(logp * oh).sum(-1)          # one-hot, not take_along (see above)
    nll = jnp.where(valid, nll, 0.0)
    # torch F.cross_entropy(reduction='none') zeroes ignored pixels, and the
    # reference then takes a plain mean over all pixels (losses.py:133)
    return nll.mean()


# ----------------------------------------------------------- probabilistic
def gaussian_kl(present_mu, present_log_sigma, future_mu, future_log_sigma):
    """KL(future || present) summed over latent dim, meaned over batch
    (reference ProbabilisticLoss.kl_div, losses.py:141-152)."""
    var_future = jnp.exp(2 * future_log_sigma)
    var_present = jnp.exp(2 * present_log_sigma)
    kl = (present_log_sigma - future_log_sigma - 0.5
          + (var_future + (future_mu - present_mu) ** 2) / (2 * var_present))
    return jnp.mean(jnp.sum(kl, axis=-1))


def bernoulli_kl(present_log_prob, future_log_prob):
    """KL(future || present) with log targets, batch-mean (reference
    losses.py:169-171: F.kl_div(..., reduction='batchmean', log_target=True))."""
    kl = jnp.exp(future_log_prob) * (future_log_prob - present_log_prob)
    return kl.sum() / present_log_prob.shape[0]


def probabilistic_loss(output: dict, method: str) -> jnp.ndarray:
    """Dispatch on method (reference ProbabilisticLoss.forward,
    losses.py:154-179). Defined for parity; the reference trainer never
    instantiates it (SURVEY.md §2.2)."""
    if method == 'GAUSSIAN':
        return gaussian_kl(output['present_mu'], output['present_log_sigma'],
                           output['future_mu'], output['future_log_sigma'])
    if method == 'MIXGAUSSIAN':
        total = 0.0
        for i in range(len(output['present_mu'])):
            total += gaussian_kl(output['present_mu'][i], output['present_log_sigma'][i],
                                 output['future_mu'][i], output['future_log_sigma'][i])
        return total
    if method == 'BERNOULLI':
        return bernoulli_kl(output['present_log_prob'], output['future_log_prob'])
    raise NotImplementedError(method)
