"""SE(2) feature warping (the reference's affine_grid + grid_sample path).

Reference semantics: stp3/utils/geometry.py:196-296. Torch's
``affine_grid(align_corners=False)`` + ``grid_sample(padding_mode='zeros')``
are re-implemented as explicit, vectorized gathers that XLA fuses well.
All tensors are channels-last: (B, H, W, C).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from stp3_tpu.ops.geometry import invert_pose_matrix, mat2pose_vec, pose_vec2mat, posemm


def _base_grid(h: int, w: int, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized base grid matching torch affine_grid(align_corners=False):
    x_j = (2j+1)/W - 1, y_i = (2i+1)/H - 1."""
    xs = (2.0 * jnp.arange(w, dtype=dtype) + 1.0) / w - 1.0
    ys = (2.0 * jnp.arange(h, dtype=dtype) + 1.0) / h - 1.0
    return jnp.meshgrid(xs, ys, indexing='xy')  # each (H, W)


def grid_sample_2d(x: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray, mode: str = 'bilinear') -> jnp.ndarray:
    """Sample x (H, W, C) at normalized coords gx, gy (H', W') in [-1, 1].

    Matches torch grid_sample(align_corners=False, padding_mode='zeros'):
    ix = ((gx+1)*W - 1)/2. Out-of-bounds reads contribute zero.
    """
    h, w = x.shape[0], x.shape[1]
    ix = ((gx + 1.0) * w - 1.0) / 2.0
    iy = ((gy + 1.0) * h - 1.0) / 2.0

    if mode == 'nearest':
        ix0 = jnp.floor(ix + 0.5).astype(jnp.int32)
        iy0 = jnp.floor(iy + 0.5).astype(jnp.int32)
        valid = (ix0 >= 0) & (ix0 < w) & (iy0 >= 0) & (iy0 < h)
        ix0c = jnp.clip(ix0, 0, w - 1)
        iy0c = jnp.clip(iy0, 0, h - 1)
        out = x[iy0c, ix0c]
        return jnp.where(valid[..., None], out, 0.0).astype(x.dtype)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = (ix - ix0)[..., None]
    ty = (iy - iy0)[..., None]
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)

    def gather(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        v = x[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    v00 = gather(iy0, ix0)
    v01 = gather(iy0, ix0 + 1)
    v10 = gather(iy0 + 1, ix0)
    v11 = gather(iy0 + 1, ix0 + 1)
    top = v00 * (1.0 - tx) + v01 * tx
    bot = v10 * (1.0 - tx) + v11 * tx
    return (top * (1.0 - ty) + bot * ty).astype(x.dtype)


def affine_grid_sample(x: jnp.ndarray, theta: jnp.ndarray, mode: str = 'bilinear') -> jnp.ndarray:
    """Warp x (B, H, W, C) with per-batch 2x3 affine theta on normalized coords.

    Equivalent to torch affine_grid(theta, size) + grid_sample, both with
    align_corners=False, padding zeros.
    """
    b, h, w, _ = x.shape
    gx, gy = _base_grid(h, w, theta.dtype)

    def one(xb, th):
        sx = th[0, 0] * gx + th[0, 1] * gy + th[0, 2]
        sy = th[1, 0] * gx + th[1, 1] * gy + th[1, 2]
        return grid_sample_2d(xb, sx, sy, mode)

    return jax.vmap(one)(x, theta)


def warp_features(x: jnp.ndarray, flow: Optional[jnp.ndarray], mode: str = 'nearest',
                  spatial_extent: Optional[Tuple[float, float]] = None) -> jnp.ndarray:
    """Apply an SE(2) (z-rotation + xy-translation) warp to BEV maps.

    x: (B, H, W, C); flow: (B, 6) 6-DoF pose vector (uses tx, ty, rz).
    Mirrors reference geometry.py:196-238 exactly: translation normalized by
    the spatial extent, forward axis inverted, theta rows
    [cos, -sin, ty_n; sin, cos, -tx_n].
    """
    if flow is None:
        return x
    angle = flow[:, 5]
    tx = -flow[:, 0] / spatial_extent[0]
    ty = flow[:, 1] / spatial_extent[1]
    cos_t = jnp.cos(angle)
    sin_t = jnp.sin(angle)
    theta = jnp.stack(
        [
            jnp.stack([cos_t, -sin_t, ty], axis=-1),
            jnp.stack([sin_t, cos_t, tx], axis=-1),
        ],
        axis=-2,
    )  # (B, 2, 3)
    return affine_grid_sample(x, theta.astype(jnp.float32), mode=mode)


def cumulative_warp_features(x: jnp.ndarray, flow: jnp.ndarray, mode: str = 'nearest',
                             spatial_extent: Optional[Tuple[float, float]] = None) -> jnp.ndarray:
    """Warp past frames into the present (last) frame (reference :241-269).

    x: (B, T, H, W, C); flow: (B, T, 6) with motion from t to t+1.
    x[:, -1] unchanged; x[:, t] warped by flow[t] @ ... @ flow[T-2].
    """
    t_len = x.shape[1]
    if t_len == 1:
        return x
    mats = pose_vec2mat(flow)
    out = [x[:, -1]]
    cum = mats[:, -2]
    for t in range(t_len - 2, -1, -1):
        out.append(warp_features(x[:, t], mat2pose_vec(cum), mode=mode, spatial_extent=spatial_extent))
        if t > 0:
            cum = posemm(mats[:, t - 1], cum)
    return jnp.stack(out[::-1], axis=1)


def cumulative_warp_features_reverse(x: jnp.ndarray, flow: jnp.ndarray, mode: str = 'nearest',
                                     spatial_extent: Optional[Tuple[float, float]] = None) -> jnp.ndarray:
    """Warp future frames back into the first frame (reference :272-296).

    x[:, 0] unchanged; x[:, i] warped by flow[0]^-1 @ ... @ flow[i-1]^-1.
    """
    mats = pose_vec2mat(flow)
    out = [x[:, 0]]
    cum = None
    for i in range(1, x.shape[1]):
        inv = invert_pose_matrix(mats[:, i - 1])
        cum = inv if cum is None else posemm(cum, inv)
        out.append(warp_features(x[:, i], mat2pose_vec(cum), mode=mode, spatial_extent=spatial_extent))
    return jnp.stack(out, axis=1)
