"""Microbenchmark: BEV splat variants + stage costs on the real chip.

Timing uses chained data dependencies + one host readback — the tunneled
backend's block_until_ready returns early, so naive loops report ~0 ms.
Inputs are passed as jit ARGUMENTS (closure constants get baked into the
program and blow the tunnel's remote-compile payload limit).

Run: python benchmarks/bev_pool_bench.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from stp3_tpu.ops import bev_pool as BP  # noqa: E402
from stp3_tpu.ops import geometry as G  # noqa: E402


def timeit_chain(f, args, n=10, dtype=jnp.float32):
    """f(*args, carry)->scalar; returns ms/call with serial chaining."""
    c = f(*args, jnp.zeros((), dtype))
    float(c)
    t0 = time.perf_counter()
    c = jnp.zeros((), dtype)
    for _ in range(n):
        c = f(*args, c)
    float(c)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    B, S, N, D, HF, WF, C = 1, 3, 6, 48, 28, 60, 64
    res, start, dim = G.calculate_birds_eye_view_parameters(
        [-50.0, 50.0, 0.5], [-50.0, 50.0, 0.5], [-10.0, 10.0, 20.0])
    dim_np = np.asarray(dim)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(B, S, N, D, HF, WF, C).astype(np.float32))
    geom = jnp.asarray((rng.rand(B, S, N, D, HF, WF, 3) * 90 - 45).astype(np.float32))
    ego = jnp.asarray(np.tile(np.array([-1.0, 0, 0, 0, 0, 0.01], np.float32), (B, S, 1)))

    p = N * D * HF * WF
    flat_feats = feats.reshape(B * S, p, C)
    coords, valid = BP.voxelize_coords(geom.reshape(B * S, p, 3), res, start, dim)

    for dtype in [jnp.float32, jnp.bfloat16]:
        ff_t = flat_feats.astype(dtype)
        for method in ['sort', 'scatter', 'pallas', 'pallas2']:
            @jax.jit
            def step(ff, cc, vv, carry, method=method):
                ff = ff + carry.astype(ff.dtype) * 0
                if method.startswith('pallas'):   # pallas_call does not vmap on TPU
                    out = jnp.stack([
                        BP.bev_pool(ff[i], cc[i], vv[i], dim_np, method=method)
                        for i in range(ff.shape[0])])
                else:
                    out = jax.vmap(lambda a, b, c: BP.bev_pool(
                        a, b, c, dim_np, method=method))(ff, cc, vv)
                return out.ravel()[0].astype(jnp.float32)
            try:
                ms = timeit_chain(step, (ff_t, coords, valid))
                print(f'bev_pool[{method}][{np.dtype(dtype).name}]: {ms:.2f} ms',
                      flush=True)
            except Exception as exc:
                print(f'bev_pool[{method}][{np.dtype(dtype).name}]: FAILED {exc}',
                      flush=True)

    @jax.jit
    def step_sort(cc, vv, carry):
        cc = cc + (carry * 0).astype(cc.dtype)
        r = jax.vmap(lambda c, v: BP._ranks(c, v, dim_np))(cc, vv)
        order = jnp.argsort(r, axis=-1)
        return order.ravel()[0].astype(jnp.float32)
    print(f'ranks+argsort: {timeit_chain(step_sort, (coords, valid)):.2f} ms',
          flush=True)

    for method in ['sort', 'scatter', 'pallas2', 'pallas2b']:
        @jax.jit
        def step_proj(ff, gg, ee, carry, method=method):
            ff = ff + carry.astype(ff.dtype) * 0
            out = BP.project_to_birds_eye_view(
                ff, gg, ee, jnp.asarray(res), jnp.asarray(start), dim,
                method=method)
            return out.ravel()[0].astype(jnp.float32)
        ms = timeit_chain(step_proj, (feats, geom, ego))
        print(f'project_to_birds_eye_view[{method}]: {ms:.2f} ms', flush=True)

    ctx = jnp.asarray(rng.rand(B * S * N, HF, WF, C).astype(np.float32))
    dep = jnp.asarray(rng.rand(B * S * N, HF, WF, D).astype(np.float32))

    @jax.jit
    def step_lift(ctx, dep, carry):
        d = dep + carry * 0.0
        pr = jax.nn.softmax(d, -1)
        lifted = jnp.moveaxis(pr, -1, 1)[..., None] * ctx[:, None]
        return lifted.ravel()[0]
    print(f'depth-softmax outer product: {timeit_chain(step_lift, (ctx, dep)):.2f} ms',
          flush=True)


if __name__ == '__main__':
    main()
