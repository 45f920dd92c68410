"""BEV voxel pooling ("splat") — the lift-splat scatter, TPU-first.

The reference implements this with python loops over (batch, time), a sort,
and a custom-autograd cumsum trick (stp3/models/stp3.py:226-301,
stp3/utils/geometry.py:299-330 ``VoxelsSumming``). Here the whole thing is
one vectorized, differentiable pipeline:

  1. voxelize ego-frame points to integer cell ids (invalid -> overflow id)
  2. sort points by cell id (XLA radix sort)
  3. ``jax.ops.segment_sum`` with ``indices_are_sorted=True``

Autodiff falls out for free (the backward is a gather), replacing the
hand-written ``VoxelsSumming.backward``. The temporal ego-motion pre-warp
(stp3.py:269-277) is applied as one batched matmul using the cumulative
pose chain, and the exponential temporal discount accumulate
(stp3.py:282-299) is a ``lax.scan`` carrying the BEV grid.

A fused Pallas kernel (sorted segment matmul-scatter over a VMEM-resident
accumulator) lives in stp3_tpu.ops.pallas.bev_pool_kernel and is selected
with method='pallas'.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stp3_tpu.ops.geometry import cumulative_prewarp_transforms


def voxelize_coords(points: jnp.ndarray, bev_resolution, bev_start_position,
                    bev_dimension) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ego-frame 3-D points -> integer cell coords + validity mask.

    index = (p - (start - res/2)) / res, truncated toward zero like the
    reference's ``.long()`` cast (stp3.py:287-289).
    """
    res = jnp.asarray(bev_resolution, dtype=points.dtype)
    start = jnp.asarray(bev_start_position, dtype=points.dtype)
    dim = jnp.asarray(np.asarray(bev_dimension), dtype=jnp.int32)
    coords_f = (points - (start - res / 2.0)) / res
    coords = coords_f.astype(jnp.int32)  # trunc-toward-zero, like torch .long()
    valid = jnp.all((coords >= 0) & (coords < dim), axis=-1)
    return coords, valid


def _ranks(coords: jnp.ndarray, valid: jnp.ndarray, bev_dimension) -> jnp.ndarray:
    """Flatten (x, y, z) cell coords into a scalar rank; invalid -> ncells."""
    nx, ny, nz = (int(v) for v in np.asarray(bev_dimension))
    ncells = nx * ny * nz
    r = coords[..., 0] * (ny * nz) + coords[..., 1] * nz + coords[..., 2]
    return jnp.where(valid, r, ncells)


def bev_pool(feats: jnp.ndarray, coords: jnp.ndarray, valid: jnp.ndarray,
             bev_dimension, method: str = 'sort') -> jnp.ndarray:
    """Scatter-add point features into the BEV grid.

    feats: (P, C); coords: (P, 3) int; valid: (P,) bool.
    Returns (nx, ny, nz*C) — z folded into channels (nz is 1 in all
    reference configs; LIFT.Z_BOUND [-10, 10, 20]).
    """
    nx, ny, nz = (int(v) for v in np.asarray(bev_dimension))
    ncells = nx * ny * nz
    p, c = feats.shape
    ranks = _ranks(coords, valid, bev_dimension)
    feats = jnp.where(valid[:, None], feats, 0.0)

    if method == 'sort':
        # NOTE: measured 2x SLOWER than 'scatter' on v5e — the random-row
        # gather feats[order] (372 MB at flagship scale) dominates
        # (benchmarks/bev_pool_bench.py). Kept for cross-checking.
        order = jnp.argsort(ranks)
        out = jax.ops.segment_sum(feats[order], ranks[order], num_segments=ncells + 1,
                                  indices_are_sorted=True)
    elif method == 'scatter':
        # independent scatters over point chunks, summed: XLA's TPU
        # scatter is INDEX-bound (~15-16 ns/index regardless of row width);
        # splitting lets index processing overlap. Degree 4 was the knee for
        # a single standalone frame (8.3 -> 7.1 ms), but under the real
        # vmapped 3-frame workload degree 16 measures best
        # (23.8 -> 22.1 ms total; /tmp-probe round 2). Exact up to fp
        # reassociation.
        deg = 16
        q = (p + deg - 1) // deg
        out = sum(jax.ops.segment_sum(feats[i * q:(i + 1) * q],
                                      ranks[i * q:(i + 1) * q],
                                      num_segments=ncells + 1)
                  for i in range(deg))
    elif method == 'pallas':
        from stp3_tpu.ops.pallas.bev_pool_kernel import bev_pool_pallas
        out = bev_pool_pallas(feats, ranks, ncells)
        out = jnp.concatenate([out, jnp.zeros_like(out[:1])], axis=0)
    elif method == 'pallas2':
        # branch-free serial-RMW kernel with in-kernel bf16->fp32 staging:
        # 3.8 vs 6.6 ms (XLA deg-16 scatter) per 484k-point frame on v5e
        from stp3_tpu.ops.pallas.bev_pool_kernel import bev_pool_pallas_v2
        out = bev_pool_pallas_v2(feats, ranks, ncells)
        out = jnp.concatenate([out, jnp.zeros_like(out[:1])], axis=0)
    else:
        raise ValueError(f'Unknown bev_pool method {method}')
    out = out[:ncells]  # drop overflow segment
    return out.reshape(nx, ny, nz * c)


def bev_pool_dense_reference(feats: np.ndarray, coords: np.ndarray, valid: np.ndarray,
                             bev_dimension) -> np.ndarray:
    """Numpy scatter-add oracle for tests."""
    nx, ny, nz = (int(v) for v in np.asarray(bev_dimension))
    c = feats.shape[-1]
    out = np.zeros((nx, ny, nz, c), dtype=np.float64)
    for p in range(feats.shape[0]):
        if valid[p]:
            x, y, z = coords[p]
            out[x, y, z] += feats[p]
    return out.reshape(nx, ny, nz * c).astype(feats.dtype)


@partial(jax.jit, static_argnames=('bev_dimension_t', 'discount', 'method'))
def _project_impl(feats, geometry, future_egomotion, bev_resolution, bev_start_position,
                  bev_dimension_t, discount, method):
    b, s = feats.shape[:2]
    nx, ny, nz = bev_dimension_t
    c = feats.shape[-1]

    # 1. ego-motion pre-warp of past-frame geometry into the present frame
    tr = cumulative_prewarp_transforms(future_egomotion, s)  # (B,S,4,4)
    rot = tr[..., :3, :3]
    t3 = tr[..., :3, 3]
    geom = (jnp.einsum('bsij,bsndhwj->bsndhwi', rot, geometry, precision='highest')
            + t3[:, :, None, None, None, None, :])

    # 2. voxelize + per-(b,s) splat
    coords, valid = voxelize_coords(geom, bev_resolution, bev_start_position, bev_dimension_t)
    flat_feats = feats.reshape(b, s, -1, c)
    flat_coords = coords.reshape(b, s, -1, 3)
    flat_valid = valid.reshape(b, s, -1)

    pool = partial(bev_pool, bev_dimension=np.asarray(bev_dimension_t), method=method)
    if method == 'pallas2b':
        # all B*S frames as ONE pipelined kernel launch (leading grid dim
        # over frames); invalid points land on the kernel's overflow row,
        # so no pre-masking of feats is needed. The single-TPU auto default
        # since the round-2 A/B (e2e 83.2 vs 84.2 ms vs per-frame pallas2).
        from stp3_tpu.ops.pallas.bev_pool_kernel import bev_pool_pallas_v2_batched
        ncells = nx * ny * nz
        ranks = _ranks(flat_coords, flat_valid, np.asarray(bev_dimension_t))
        out = bev_pool_pallas_v2_batched(
            flat_feats.reshape(b * s, -1, c), ranks.reshape(b * s, -1),
            ncells)
        splat = out.reshape(b, s, nx, ny, nz * c)
    elif method in ('pallas', 'pallas2'):
        # pallas_call does not vmap; B*S is tiny (<=  batch x 3 frames), so a
        # static python loop compiles to sequential kernel launches
        splat = jnp.stack([
            jnp.stack([pool(flat_feats[ib, it], flat_coords[ib, it], flat_valid[ib, it])
                       for it in range(s)])
            for ib in range(b)])
    else:
        splat = jax.vmap(jax.vmap(pool))(flat_feats, flat_coords, flat_valid)  # (B,S,nx,ny,nz*C)

    # 3. discounted temporal accumulate: out_t = discount * out_{t-1} + splat_t
    def step(carry, x_t):
        nxt = carry * discount + x_t
        return nxt, nxt

    _, out = jax.lax.scan(step, jnp.zeros_like(splat[:, 0]), jnp.swapaxes(splat, 0, 1))
    return jnp.swapaxes(out, 0, 1)  # (B,S,nx,ny,nz*C)


@partial(jax.jit, static_argnames=('bev_dimension_t', 'discount'))
def _project_fused_impl(ctx, depth_logits, geometry, future_egomotion,
                        bev_resolution, bev_start_position, bev_dimension_t,
                        discount):
    from stp3_tpu.ops.pallas.bev_pool_kernel import lift_splat_pallas
    b, s, n, hf, wf, c = ctx.shape
    d = depth_logits.shape[-1]
    nx, ny, nz = bev_dimension_t
    ncells = nx * ny * nz

    tr = cumulative_prewarp_transforms(future_egomotion, s)
    rot = tr[..., :3, :3]
    t3 = tr[..., :3, 3]
    geom = (jnp.einsum('bsij,bsndhwj->bsndhwi', rot, geometry, precision='highest')
            + t3[:, :, None, None, None, None, :])
    coords, valid = voxelize_coords(geom, bev_resolution, bev_start_position,
                                    bev_dimension_t)
    ranks = _ranks(coords.reshape(b, s, -1, 3), valid.reshape(b, s, -1),
                   np.asarray(bev_dimension_t)).astype(jnp.int32)

    # point p = (cam n, depth d, pixel hw) -> ray id n*Hf*Wf + hw (static)
    ray_ids = jnp.asarray(
        (np.arange(n)[:, None, None] * (hf * wf)
         + np.zeros((1, d, 1), np.int32)
         + np.arange(hf * wf)[None, None, :]).reshape(-1).astype(np.int32))

    dp = jax.nn.softmax(depth_logits, axis=-1)                   # (B,S,N,Hf,Wf,D)
    dp = jnp.moveaxis(dp, -1, 3)                                 # (B,S,N,D,Hf,Wf)
    ctx_flat = ctx.reshape(b, s, n * hf * wf, c)

    splat = jnp.stack([
        jnp.stack([
            lift_splat_pallas(ctx_flat[ib, it], dp[ib, it].reshape(-1),
                              ranks[ib, it], ray_ids, ncells)
            for it in range(s)])
        for ib in range(b)]).reshape(b, s, nx, ny, nz * c)

    def step(carry, x_t):
        nxt = carry * discount + x_t
        return nxt, nxt

    _, out = jax.lax.scan(step, jnp.zeros_like(splat[:, 0]), jnp.swapaxes(splat, 0, 1))
    return jnp.swapaxes(out, 0, 1)


def project_lift_splat_fused(ctx, depth_logits, geometry, future_egomotion,
                             bev_resolution, bev_start_position, bev_dimension,
                             discount: float = 0.5) -> jnp.ndarray:
    """Fused lift+splat (pallas): the (B,S,N,D,Hf,Wf,C) lifted tensor never
    materialises — the kernel computes depth_prob x ctx rows on the fly
    while scatter-accumulating into a VMEM-resident grid.

    ctx: (B,S,N,Hf,Wf,C) camera context features;
    depth_logits: (B,S,N,Hf,Wf,D); geometry: (B,S,N,D,Hf,Wf,3).
    Returns (B,S,nx,ny,nz*C), same contract as project_to_birds_eye_view.
    """
    bev_dim_t = tuple(int(v) for v in np.asarray(bev_dimension))
    return _project_fused_impl(ctx, depth_logits, geometry, future_egomotion,
                               jnp.asarray(bev_resolution),
                               jnp.asarray(bev_start_position),
                               bev_dim_t, float(discount))


def project_to_birds_eye_view(feats: jnp.ndarray, geometry: jnp.ndarray,
                              future_egomotion: jnp.ndarray, bev_resolution,
                              bev_start_position, bev_dimension,
                              discount: float = 0.5, method: str = 'auto') -> jnp.ndarray:
    """Full splat: pre-warp + voxel pooling + discounted temporal accumulate.

    feats: (B, S, N, D, Hf, Wf, C) lifted camera features
    geometry: (B, S, N, D, Hf, Wf, 3) ego-frame points
    future_egomotion: (B, S, 6)
    Returns (B, S, nx, ny, nz*C). Matches reference
    ``STP3.projection_to_birds_eye_view`` (stp3.py:226-301).
    """
    bev_dim_t = tuple(int(v) for v in np.asarray(bev_dimension))
    if method == 'auto':
        # benchmark escape hatch: A/B splat variants through the full model
        # without code edits (used by benchmarks/*; unset in production)
        env = os.environ.get('STP3_SPLAT_METHOD', '')
        if env:
            method = env
    if method == 'auto':
        # single-TPU: the v2 pallas kernel (branch-free serial RMW over a
        # VMEM-resident fp32 accumulator, bf16 inputs staged in-kernel)
        # beats XLA's index-bound scatter 3.8 vs 6.6 ms per 484k-point
        # frame, and the frame-BATCHED launch (grid over B*S frames, one
        # pipelined pallas_call) beats per-frame launches on-chip:
        # e2e 83.2 vs 84.2 ms at batch 1, batch-8 throughput 18.1 vs
        # 17.6 frames/s (A/B'd round 2, /tmp/tpu_queue logs). Everywhere
        # else fall back to XLA's scatter (see ops/pallas/gating.py for
        # the single-device-TPU rationale; shard_map call sites like
        # parallel/serving.py pass an explicit method instead). The
        # round-1 v1 kernel that LOST end-to-end (133 vs 114 ms) staged
        # feats to fp32 in HBM and branched per point; v2 fixes both.
        from stp3_tpu.ops.pallas.gating import single_device_tpu
        method = 'pallas2b' if single_device_tpu() else 'scatter'
    return _project_impl(feats, geometry, future_egomotion,
                         jnp.asarray(bev_resolution), jnp.asarray(bev_start_position),
                         bev_dim_t, float(discount), method)
