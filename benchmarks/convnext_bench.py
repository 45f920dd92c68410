"""ConvNeXt block: XLA path vs the fused pallas MLP kernel, row-tile sweep.

Round-3 motivation: the e2e A/B showed the kernel LOSING at batch 1
(110.3 vs 81.7 ms) while WINNING the train step (478 vs 498 ms) and
neutral at batch 8 — i.e. the kernel's per-row cost is competitive but
something batch-1-sized is slow. This isolates the block at flagship
shape (9 frames x 200x200 x 64ch, bf16) and sweeps the row-tile size and
the XLA baseline, in-graph chained timing (CLAUDE.md methodology).

Run: python benchmarks/convnext_bench.py
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

DT = jnp.bfloat16
FRAMES, H, W, C = 9, 200, 200, 64


def chain_time(fn, args, iters=30, reps=3):
    from static_splat_bench import _chain_overhead_ms

    @jax.jit
    def chained(args):
        def body(_, c):
            a = (args[0] + c.astype(args[0].dtype) * 1e-12,) + tuple(args[1:])
            out = fn(*a)
            return out.ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    overhead = _chain_overhead_ms()
    float(chained(args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(args))
        times.append(((time.perf_counter() - t0) * 1000.0 - overhead) / iters)
    return max(float(np.median(times)), 0.0)


def main():
    from stp3_tpu.layers.convolutions import ConvNeXtBlock
    from stp3_tpu.ops.pallas.convnext_mlp_kernel import _forward, _mlp_reference

    rng = np.random.RandomState(0)
    x4d = jnp.asarray(rng.rand(FRAMES, H, W, C), np.float32).astype(DT)
    mod = ConvNeXtBlock()
    os.environ['STP3_CONVNEXT'] = 'off'
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0),
                                  x4d.astype(jnp.float32))
    from stp3_tpu.utils.precision import cast_floating
    variables = cast_floating(variables, DT)

    # ---- whole block (dwconv + tail), XLA vs kernel
    def block_xla(x, v):
        os.environ['STP3_CONVNEXT'] = 'off'
        return mod.apply(v, x)

    def block_pallas(x, v):
        os.environ['STP3_CONVNEXT'] = 'pallas'
        return mod.apply(v, x)

    print(f'block XLA: {chain_time(block_xla, (x4d, variables)):.2f} ms',
          flush=True)

    # ---- tail only (flat rows), reference vs kernel at several tiles
    n = FRAMES * H * W
    hflat = jnp.asarray(rng.rand(n, C), np.float32).astype(DT)
    xflat = jnp.asarray(rng.rand(n, C), np.float32).astype(DT)
    p = variables['params']
    wargs = (p['LayerNorm_0']['scale'], p['LayerNorm_0']['bias'],
             p['Dense_0']['kernel'], p['Dense_0']['bias'],
             p['Dense_1']['kernel'], p['Dense_1']['bias'], p['gamma'])

    print(f'tail XLA (reference math): '
          f'{chain_time(lambda h, x: _mlp_reference(h, x, *wargs), (hflat, xflat)):.2f} ms',
          flush=True)
    for rows in (1024, 2048, 4096, 8192, 16384, 32768):
        def tail_k(h, x, rows=rows):
            return _forward(h, x, *wargs, rows=rows)
        print(f'tail pallas rows={rows}: '
              f'{chain_time(tail_k, (hflat, xflat)):.2f} ms', flush=True)

    os.environ['STP3_CONVNEXT'] = 'pallas'
    print(f'block pallas (default rows): '
          f'{chain_time(block_pallas, (x4d, variables)):.2f} ms', flush=True)
    os.environ.pop('STP3_CONVNEXT', None)


if __name__ == '__main__':
    main()
