"""Microbenchmark: BEV splat variants on the real chip.

Times the three bev_pool paths ('sort', 'scatter', 'pallas') and the
stages of the full projection (outer product, prewarp, pool, scan) at the
flagship scale (B=1, S=3, N=6, D=48, 28x60, C=64 -> 200x200 grid) to
decide where kernel effort goes.

Run: python benchmarks/bev_pool_bench.py
"""
from __future__ import annotations

import os
import time

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from stp3_tpu.ops import bev_pool as BP  # noqa: E402
from stp3_tpu.ops import geometry as G  # noqa: E402


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    B, S, N, D, HF, WF, C = 1, 3, 6, 48, 28, 60, 64
    res, start, dim = G.calculate_birds_eye_view_parameters(
        [-50.0, 50.0, 0.5], [-50.0, 50.0, 0.5], [-10.0, 10.0, 20.0])
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(B, S, N, D, HF, WF, C).astype(np.float32))
    geom = jnp.asarray((rng.rand(B, S, N, D, HF, WF, 3) * 90 - 45).astype(np.float32))
    ego = jnp.asarray(np.tile(np.array([-1.0, 0, 0, 0, 0, 0.01], np.float32), (B, S, 1)))

    p = N * D * HF * WF
    flat_feats = feats.reshape(B * S, p, C)
    coords, valid = BP.voxelize_coords(geom.reshape(B * S, p, 3), res, start, dim)

    for method in ['sort', 'scatter']:
        f = jax.jit(jax.vmap(lambda ff, cc, vv: BP.bev_pool(
            ff, cc, vv, np.asarray(dim), method=method)))
        ms = timeit(f, flat_feats, coords, valid)
        print(f'bev_pool[{method}] (BS={B*S}, P={p}, C={C}): {ms:.2f} ms')

    # rank computation + argsort alone
    def ranks_and_sort(cc, vv):
        r = BP._ranks(cc, vv, np.asarray(dim))
        return jnp.argsort(r)
    ms = timeit(jax.jit(jax.vmap(ranks_and_sort)), coords, valid)
    print(f'ranks+argsort: {ms:.2f} ms')

    # full projection
    for method in ['sort', 'scatter']:
        f = jax.jit(lambda ff, gg, ee: BP.project_to_birds_eye_view(
            ff, gg, ee, jnp.asarray(res), jnp.asarray(start), dim,
            method=method))
        ms = timeit(f, feats, geom, ego)
        print(f'project_to_birds_eye_view[{method}]: {ms:.2f} ms')

    # depth-softmax outer product alone (the lift, stp3.py:214-217)
    ctx = jnp.asarray(rng.rand(B * S * N, HF, WF, C).astype(np.float32))
    dep = jnp.asarray(rng.rand(B * S * N, HF, WF, D).astype(np.float32))

    def lift(ctx, dep):
        p = jax.nn.softmax(dep, -1)
        return jnp.moveaxis(p, -1, 1)[..., None] * ctx[:, None]
    ms = timeit(jax.jit(lift), ctx, dep)
    print(f'depth-softmax outer product: {ms:.2f} ms')


if __name__ == '__main__':
    main()
