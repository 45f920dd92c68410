"""Variant shoot-out for the static-geometry serving splat on the real TPU.

Chained-dependency timing (CLAUDE.md: block_until_ready returns early over
the axon tunnel): each iteration's input is perturbed by a scalar from the
previous output, one host readback at the end.

Variants:
  dynamic    — the serve_step path: lift (dp ⊗ ctx) + voxelize+sort+scatter
  buckets    — ops/static_splat.static_splat (per-cell crossing buckets)
  flatgather — buckets, but prefix sums gathered with FLAT 1-D indices
  segsum     — crossings sorted by cell + jax.ops.segment_sum (sorted ids)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')

from stp3_tpu.config import get_cfg
from stp3_tpu.ops.bev_pool import project_to_birds_eye_view
from stp3_tpu.ops.geometry import (calculate_birds_eye_view_parameters,
                                   create_frustum, get_geometry)
from stp3_tpu.ops.static_splat import build_static_splat_plan, static_splat


def flagship_rig(n=6):
    k = np.tile(np.array([[260.0, 0, 240], [0, 260.0, 112], [0, 0, 1]],
                         np.float32), (n, 1, 1))
    e = np.stack([np.eye(4, dtype=np.float32)] * n)
    for i in range(n):
        a = i * np.pi / 3
        e[i, :3, :3] = np.array([[np.cos(a), -np.sin(a), 0],
                                 [np.sin(a), np.cos(a), 0],
                                 [0, 0, 1]], np.float32)
        e[i, :3, 3] = [1.5 * np.cos(a), 1.5 * np.sin(a), 1.6]
    return k, e


def chain_time(fn, args, perturb_idx=0, iters=10, reps=3):
    """median ms/iter; output scalar feeds back into args[perturb_idx]."""
    out = fn(*args)
    carry = jnp.asarray(out).ravel()[0]
    float(carry)  # compile + settle
    times = []
    for _ in range(reps):
        a = list(args)
        t0 = time.perf_counter()
        c = jnp.float32(0)
        for _ in range(iters):
            a[perturb_idx] = args[perturb_idx] + c * 1e-12
            out = fn(*a)
            c = jnp.asarray(out).ravel()[0].astype(jnp.float32)
        float(c)
        times.append((time.perf_counter() - t0) / iters * 1000.0)
    return float(np.median(times))


def main():
    cfg = get_cfg()
    res, start, dim = calculate_birds_eye_view_parameters(
        cfg.LIFT.X_BOUND, cfg.LIFT.Y_BOUND, cfg.LIFT.Z_BOUND)
    frustum = create_frustum(tuple(cfg.IMAGE.FINAL_DIM),
                             cfg.MODEL.ENCODER.DOWNSAMPLE,
                             tuple(cfg.LIFT.D_BOUND))
    k, e = flagship_rig()
    plan = build_static_splat_plan(frustum, k, e, res, start, dim)
    print('buckets:', [(b.cells.shape[0], b.ray.shape[1])
                       for b in plan.buckets], flush=True)
    d = plan.depth_bins
    nx, ny, nz = plan.bev_dimension
    n, hf, wf = 6, np.asarray(frustum).shape[1], np.asarray(frustum).shape[2]
    c = 64
    rng = np.random.RandomState(0)
    ctx = jnp.asarray(rng.randn(1, plan.n_rays, c).astype(np.float32))
    dpl = jnp.asarray(rng.randn(1, plan.n_rays, d).astype(np.float32))

    geometry = get_geometry(jnp.asarray(np.asarray(frustum)),
                            jnp.asarray(k)[None, None],
                            jnp.asarray(e)[None, None])

    @jax.jit
    def dynamic(ctx, dpl):
        dp = jax.nn.softmax(dpl, -1)
        lifted = (dp.reshape(1, n, hf, wf, d).transpose(0, 1, 4, 2, 3)[..., None]
                  * ctx.reshape(1, n, hf, wf, c)[:, :, None])
        return project_to_birds_eye_view(
            lifted[:, None], geometry, jnp.zeros((1, 1, 6)), res, start, dim)

    buckets = plan.device_buckets()

    @jax.jit
    def bucketed(ctx, dpl, buckets):
        dp = jax.nn.softmax(dpl, -1)
        return static_splat(ctx, dp, buckets, plan.bev_dimension)

    # flat-index prefix-sum gather
    fbuckets = [(jnp.asarray(b.cells),
                 jnp.asarray(b.ray),
                 jnp.asarray(b.ray.astype(np.int64) * (d + 1) + b.lo),
                 jnp.asarray(b.ray.astype(np.int64) * (d + 1) + b.hi))
                for b in plan.buckets]

    @jax.jit
    def flatgather(ctx, dpl, fbuckets):
        dp = jax.nn.softmax(dpl, -1)
        ctx2, dp2 = ctx[0], dp[0]
        s = jnp.concatenate(
            [jnp.zeros_like(dp2[:, :1]), jnp.cumsum(dp2, 1)], 1).reshape(-1)
        out = jnp.zeros((nx * ny * nz, c), ctx2.dtype)
        for cells, ray, flo, fhi in fbuckets:
            w = s[fhi] - s[flo]
            vals = jnp.einsum('mk,mkc->mc', w, ctx2[ray])
            out = out.at[cells].set(vals, unique_indices=True)
        return out.reshape(1, nx, ny, nz * c)

    # sorted segment-sum over crossings
    cr_cell, cr_ray, cr_lo, cr_hi = [], [], [], []
    for b in plan.buckets:
        kk = b.ray.shape[1]
        valid = (b.hi > b.lo)
        cr_cell.append(np.repeat(b.cells, kk).reshape(-1)[valid.reshape(-1)])
        cr_ray.append(b.ray.reshape(-1)[valid.reshape(-1)])
        cr_lo.append(b.lo.reshape(-1)[valid.reshape(-1)])
        cr_hi.append(b.hi.reshape(-1)[valid.reshape(-1)])
    cr_cell = np.concatenate(cr_cell)
    srt = np.argsort(cr_cell, kind='stable')
    cr_cell = jnp.asarray(cr_cell[srt])
    cr_ray = jnp.asarray(np.concatenate(cr_ray)[srt])
    cr_flo = jnp.asarray((np.concatenate(cr_lo)[srt]).astype(np.int64)
                         + np.concatenate(cr_ray)[srt].astype(np.int64) * (d + 1))
    cr_fhi = jnp.asarray((np.concatenate(cr_hi)[srt]).astype(np.int64)
                         + np.concatenate(cr_ray)[srt].astype(np.int64) * (d + 1))
    print('crossings:', cr_cell.shape[0], flush=True)

    @jax.jit
    def segsum(ctx, dpl, cr_cell, cr_ray, cr_flo, cr_fhi):
        dp = jax.nn.softmax(dpl, -1)
        ctx2, dp2 = ctx[0], dp[0]
        s = jnp.concatenate(
            [jnp.zeros_like(dp2[:, :1]), jnp.cumsum(dp2, 1)], 1).reshape(-1)
        w = (s[cr_fhi] - s[cr_flo])[:, None]
        vals = w * ctx2[cr_ray]
        out = jax.ops.segment_sum(vals, cr_cell, num_segments=nx * ny * nz,
                                  indices_are_sorted=True)
        return out.reshape(1, nx, ny, nz * c)

    for name, fn, args in [
            ('dynamic', dynamic, (ctx, dpl)),
            ('buckets', bucketed, (ctx, dpl, buckets)),
            ('flatgather', flatgather, (ctx, dpl, fbuckets)),
            ('segsum', segsum, (ctx, dpl, cr_cell, cr_ray, cr_flo, cr_fhi))]:
        ms = chain_time(fn, args)
        print(f'{name}: {ms:.2f} ms', flush=True)


if __name__ == '__main__':
    main()
