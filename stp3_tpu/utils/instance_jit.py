"""On-device (jit) instance decoding — the XLA counterpart of the host-side
numpy path in utils/instance.py (reference stp3/utils/instance.py:80-170).

The host path forces a device->host transfer of the full center/offset/
segmentation tensors and a Python loop over (B, T); this decoder runs the
center NMS + pixel grouping as one fused XLA program with static shapes, so
train/val-time panoptic metrics only transfer the final (B, T, H, W) int32
id maps.

Design notes (TPU-first):
  * maxpool NMS via ``lax.reduce_window`` (static 3x3 window);
  * ``argwhere`` (dynamic shape) is replaced by ``lax.top_k`` over the
    flattened NMS survivors with a static ``max_instances`` cap, then
    re-sorted by flat index so center ordering — and therefore id
    assignment — exactly matches the numpy path's row-major ``argwhere``;
  * consecutive id renumbering via bincount + cumsum (a static-shape LUT)
    instead of ``np.unique``.

Temporal id consistency (Hungarian matching) stays host-side in
utils/instance.py — it is eval-only in the reference and inherently
sequential; pass its output through ``make_instance_id_temporally_consistent``
when needed.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _nms_keep(center: jnp.ndarray, conf_threshold: float,
              nms_kernel_size: int) -> jnp.ndarray:
    """center (H, W) -> bool (H, W): local maxima above the threshold
    (reference instance.py:80-91 maxpool trick)."""
    cp = jnp.where(center > conf_threshold, center, -1.0)
    pad = (nms_kernel_size - 1) // 2
    pooled = lax.reduce_window(
        cp, -jnp.inf, lax.max, (nms_kernel_size, nms_kernel_size), (1, 1),
        [(pad, pad), (pad, pad)])
    return (cp == pooled) & (cp > 0)


def _decode_one(center: jnp.ndarray, offset: jnp.ndarray,
                foreground: jnp.ndarray, conf_threshold: float,
                nms_kernel_size: int, max_instances: int) -> jnp.ndarray:
    """(H, W), (H, W, 2), (H, W) bool -> (H, W) int32 ids in [0, K],
    consecutively numbered, 0 = background."""
    h, w = center.shape
    keep = _nms_keep(center, conf_threshold, nms_kernel_size)

    # first-K survivors in row-major order: top_k over NEGATED flat index
    # picks the K smallest flat indices, already sorted ascending — exactly
    # the reference's argwhere()[:max_n] truncation (instance.py:129-136),
    # including frames with MORE than max_instances survivors (selecting by
    # confidence instead would silently shift ids in crowded scenes).
    # fp32 holds integers < 2^24 exactly; h*w <= 40000 here.
    flat_keep = keep.reshape(-1)
    neg_idx = jnp.where(flat_keep,
                        -jnp.arange(h * w, dtype=jnp.float32), -jnp.inf)
    scores, idx = lax.top_k(neg_idx, max_instances)
    valid = scores > -jnp.inf
    centers = jnp.stack([idx // w, idx % w], -1).astype(jnp.float32)  # (K, 2)

    gx, gy = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    loc = jnp.stack([gx, gy], -1) + offset                       # (H, W, 2)
    d = jnp.linalg.norm(centers[:, None, None, :] - loc[None], axis=-1)
    d = jnp.where(valid[:, None, None], d, jnp.inf)
    ids = d.argmin(axis=0).astype(jnp.int32) + 1                 # (H, W)
    seg = jnp.where(foreground & valid.any(), ids, 0)

    # consecutive renumbering: LUT[i] = #present ids <= i, minus 1
    occ = (jnp.zeros(max_instances + 1, jnp.int32).at[seg].set(1)).at[0].set(1)
    lut = jnp.cumsum(occ) - 1
    return lut[seg]


@partial(jax.jit, static_argnames=('conf_threshold', 'nms_kernel_size',
                                   'max_instances', 'vehicles_id'))
def decode_instances(segmentation_logits: jnp.ndarray, center: jnp.ndarray,
                     offset: jnp.ndarray, conf_threshold: float = 0.1,
                     nms_kernel_size: int = 3, max_instances: int = 100,
                     vehicles_id: int = 1) -> jnp.ndarray:
    """Batch instance decoding, jit-compiled.

    segmentation_logits (B, T, H, W, C); center (B, T, H, W, 1);
    offset (B, T, H, W, 2) -> (B, T, H, W) int32 instance ids (0 = bg),
    per-frame consecutive (no temporal linking — see module docstring).
    """
    b, t, h, w = segmentation_logits.shape[:4]
    foreground = segmentation_logits.argmax(-1) == vehicles_id
    fn = partial(_decode_one, conf_threshold=conf_threshold,
                 nms_kernel_size=nms_kernel_size, max_instances=max_instances)
    out = jax.vmap(fn)(center.reshape(b * t, h, w, -1)[..., 0],
                       offset.reshape(b * t, h, w, 2),
                       foreground.reshape(b * t, h, w))
    return out.reshape(b, t, h, w)
