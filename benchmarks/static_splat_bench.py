"""Variant shoot-out for the static-geometry serving splat on the real TPU.

Chained-dependency timing (CLAUDE.md: block_until_ready returns early over
the axon tunnel): each iteration's input is perturbed by a scalar from the
previous output, one host readback at the end.

Variants (select with VARIANTS=column,dynamic,... — default the two that
matter; index-array uploads over the tunnel cost ~minutes per 10 MB, so
only request what you need):
  column     — ops/static_splat.column_splat (column-collapsed MXU matmul
               + tiny sorted segment-sum; ~27 MB upload: interval masks +
               indices)
  dynamic    — the serve_step path: lift (dp ⊗ ctx) + voxelize+sort+scatter
               (no index upload)
  buckets    — ops/static_splat.static_splat per-cell gather buckets (~12 MB)
  segsum     — crossings sorted by cell + jax.ops.segment_sum (~5 MB)

DTYPE=bf16 casts the inputs to the serving policy dtype.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')

from stp3_tpu.ops.bev_pool import project_to_birds_eye_view
from stp3_tpu.ops.geometry import (calculate_birds_eye_view_parameters,
                                   create_frustum, get_geometry)
from stp3_tpu.ops.static_splat import (build_column_splat_plan,
                                       build_static_splat_plan, column_splat,
                                       static_splat)


def flagship_rig(cfg):
    """The SAME rig as serving_bench / __graft_entry__._example_inputs —
    a synthetic rig without the camera-axis permutation lands almost no
    points on the grid and makes every static variant look absurdly fast."""
    from __graft_entry__ import _example_inputs
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        _, k, e, _ = _example_inputs(cfg)
    return np.asarray(k)[0, 0], np.asarray(e)[0, 0]


def put(tree, label):
    """Device-put with progress print — uploads over the tunnel are slow
    and silent; make them visible."""
    t0 = time.perf_counter()
    out = jax.device_put(tree)
    jax.block_until_ready(out)
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(out))
    print(f'upload {label}: {nbytes / 1e6:.1f} MB in '
          f'{time.perf_counter() - t0:.1f}s', flush=True)
    return out


_CHAIN_OVERHEAD_MS = None


def _chain_overhead_ms(reps=3):
    """Fixed cost of ONE chained call (enqueue + readback over the tunnel,
    ~28 ms measured) — calibrated with a trivial body and subtracted from
    every variant so sub-ms kernels are reported honestly
    (benchmarks/README.md methodology rule 2)."""
    global _CHAIN_OVERHEAD_MS
    if _CHAIN_OVERHEAD_MS is None:
        @jax.jit
        def empty():
            return jax.lax.fori_loop(0, 1, lambda _, c: c + 1.0,
                                     jnp.float32(0))
        float(empty())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(empty())
            ts.append((time.perf_counter() - t0) * 1000.0)
        _CHAIN_OVERHEAD_MS = float(np.median(ts))
        print(f'chain overhead: {_CHAIN_OVERHEAD_MS:.1f} ms/call', flush=True)
    return _CHAIN_OVERHEAD_MS


def chain_time(fn, args, perturb_idx=0, iters=50, reps=3):
    """median ms/iter with the iteration chain INSIDE one jitted program,
    minus the calibrated fixed per-call overhead.

    Per-call dispatch over the axon tunnel costs ~10 ms — at sub-ms kernel
    scale a host-side loop measures the tunnel, not the kernel. A
    lax.fori_loop with the data-dependent perturbation in-graph costs ONE
    dispatch for all iters; one scalar readback settles it."""

    @jax.jit
    def chained(args):
        def body(_, c):
            a = list(args)
            a[perturb_idx] = args[perturb_idx] + c.astype(args[perturb_idx].dtype) * 1e-12
            out = fn(*a)
            return jnp.asarray(out).ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    overhead = _chain_overhead_ms()
    t0 = time.perf_counter()
    float(chained(args))  # compile + settle
    print(f'  compile+first {time.perf_counter() - t0:.1f}s', flush=True)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(args))
        times.append(((time.perf_counter() - t0) * 1000.0 - overhead) / iters)
    return max(float(np.median(times)), 0.0)


def main():
    which = os.environ.get('VARIANTS', 'column,dynamic').split(',')
    from __graft_entry__ import _flagship_cfg
    cfg = _flagship_cfg()
    res, start, dim = calculate_birds_eye_view_parameters(
        cfg.LIFT.X_BOUND, cfg.LIFT.Y_BOUND, cfg.LIFT.Z_BOUND)
    frustum = create_frustum(tuple(cfg.IMAGE.FINAL_DIM),
                             cfg.MODEL.ENCODER.DOWNSAMPLE,
                             tuple(cfg.LIFT.D_BOUND))
    k, e = flagship_rig(cfg)
    frustum_np = np.asarray(frustum)
    # one source of truth for grid/frustum sizes: the same helpers the plan
    # builders use (a second hand-rolled encoding could silently diverge)
    d = frustum_np.shape[0]
    n, hf, wf = len(cfg.IMAGE.NAMES), frustum_np.shape[1], frustum_np.shape[2]
    nx, ny, nz = (int(v) for v in np.asarray(dim))
    c = 64
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16 if os.environ.get('DTYPE') == 'bf16' else jnp.float32
    print(f'dtype: {np.dtype(dt).name}  variants: {which}', flush=True)
    ctx = put(jnp.asarray(rng.randn(1, n * hf * wf, c).astype(np.float32), dt),
              'ctx')
    dpl = put(jnp.asarray(rng.randn(1, n * hf * wf, d).astype(np.float32), dt),
              'dpl')

    variants = []

    if 'column' in which:
        t0 = time.perf_counter()
        cplan = build_column_splat_plan(frustum, k, e, res, start, dim)
        print(f'column plan: ncols {cplan.cells.shape[0]} rmax '
              f'{cplan.cells.shape[1]} ({time.perf_counter() - t0:.1f}s)',
              flush=True)
        carrays = put(cplan.device_arrays(), 'column indices')
        cmeta = (cplan.n_cams, cplan.hf, cplan.wf, cplan.depth_bins,
                 cplan.bev_dimension)

        @jax.jit
        def column(ctx, dpl, carrays):
            dp = jax.nn.softmax(dpl, -1)
            return column_splat(ctx, dp, carrays, cmeta)

        variants.append(('column', column, (ctx, dpl, carrays)))

    plan = None
    if 'buckets' in which or 'segsum' in which:
        t0 = time.perf_counter()
        plan = build_static_splat_plan(frustum, k, e, res, start, dim)
        print('buckets:', [(b.cells.shape[0], b.ray.shape[1])
                           for b in plan.buckets],
              f'({time.perf_counter() - t0:.1f}s)', flush=True)

    if 'buckets' in which:
        buckets = put(plan.device_buckets(), 'bucket indices')

        @jax.jit
        def bucketed(ctx, dpl, buckets):
            dp = jax.nn.softmax(dpl, -1)
            return static_splat(ctx, dp, buckets, plan.bev_dimension)

        variants.append(('buckets', bucketed, (ctx, dpl, buckets)))

    if 'segsum' in which:
        # sorted segment-sum over individual crossings
        cr = [[], [], [], []]
        for b in plan.buckets:
            valid = (b.hi > b.lo).reshape(-1)
            kk = b.ray.shape[1]
            cr[0].append(np.repeat(b.cells, kk)[valid])
            cr[1].append(b.ray.reshape(-1)[valid])
            cr[2].append(b.lo.reshape(-1)[valid])
            cr[3].append(b.hi.reshape(-1)[valid])
        cr = [np.concatenate(x) for x in cr]
        srt = np.argsort(cr[0], kind='stable')
        flo = (cr[2][srt] + cr[1][srt].astype(np.int64) * (d + 1)).astype(np.int32)
        fhi = (cr[3][srt] + cr[1][srt].astype(np.int64) * (d + 1)).astype(np.int32)
        print('crossings:', srt.size, flush=True)
        cr_cell, cr_ray, cr_flo, cr_fhi = put(
            (jnp.asarray(cr[0][srt].astype(np.int32)),
             jnp.asarray(cr[1][srt]), jnp.asarray(flo), jnp.asarray(fhi)),
            'crossing indices')

        @jax.jit
        def segsum(ctx, dpl, cr_cell, cr_ray, cr_flo, cr_fhi):
            dp = jax.nn.softmax(dpl, -1)
            ctx2, dp2 = ctx[0], dp[0]
            s = jnp.concatenate(
                [jnp.zeros_like(dp2[:, :1]), jnp.cumsum(dp2, 1)], 1).reshape(-1)
            w = (s[cr_fhi] - s[cr_flo])[:, None]
            vals = (w * ctx2[cr_ray]).astype(ctx2.dtype)
            out = jax.ops.segment_sum(vals, cr_cell, num_segments=nx * ny * nz,
                                      indices_are_sorted=True)
            return out.reshape(1, nx, ny, nz * c)

        variants.append(
            ('segsum', segsum, (ctx, dpl, cr_cell, cr_ray, cr_flo, cr_fhi)))

    if 'dynamic' in which:
        with jax.default_device(jax.local_devices(backend='cpu')[0]):
            geometry = get_geometry(
                jnp.asarray(frustum_np),
                jnp.asarray(k)[None, None], jnp.asarray(e)[None, None])
        geometry = put(np.asarray(geometry), 'geometry')

        @jax.jit
        def dynamic(ctx, dpl):
            dp = jax.nn.softmax(dpl, -1)
            lifted = (dp.reshape(1, n, hf, wf, d).transpose(0, 1, 4, 2, 3)
                      [..., None] * ctx.reshape(1, n, hf, wf, c)[:, :, None])
            return project_to_birds_eye_view(
                lifted[:, None], geometry, jnp.zeros((1, 1, 6)),
                res, start, dim)

        variants.append(('dynamic', dynamic, (ctx, dpl)))

    ref = None
    for name, fn, args in variants:
        out = np.asarray(fn(*args), np.float32).reshape(-1)
        if ref is None:
            ref = out
            print(f'{name}: reference output', flush=True)
        else:
            err = float(np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9))
            print(f'{name} max rel err vs {variants[0][0]}: {err:.2e}',
                  flush=True)
    for name, fn, args in variants:
        ms = chain_time(fn, args)
        print(f'{name}: {ms:.2f} ms', flush=True)


if __name__ == '__main__':
    main()
