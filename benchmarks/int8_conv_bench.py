"""Does XLA lower int8 convolutions to the v5e's 2x-rate int8 MXU path?

Gates any quantized-serving work: if an int8 conv (with in-graph
dynamic quantization, the realistic serving op) is not meaningfully
faster than the bf16 conv at BEV shapes, there is no point building a
quantized inference mode.

Shapes probed (the two conv archetypes of the dist+future/decoder path):
  * 3x3 64->64   @ (9,200,200,64)  — GRU-gate / trunk archetype
  * 1x1 64->256  @ (9,200,200,64)  — ConvNeXt pw1 / head archetype

Timing: in-graph lax.fori_loop chain (per-call dispatch over the tunnel
is ~10 ms), with the carry fed through a GLOBAL SUM of the conv output —
a bare out[0] probe lets XLA slice the conv and under-measures ~7x
(benchmarks/README.md, round-3 ASPP postmortem).

Run: python benchmarks/int8_conv_bench.py

MEASURED VERDICT (round 3, on-chip, /tmp/tpu_queue5/q4_int8_conv.log):
int8 LOSES at both archetype shapes —
  3x3 64->64 : bf16 1.259 ms | int8 dynamic 1.701 | int8 static 1.493
  1x1 64->256: bf16 1.015 ms | int8 dynamic 1.472 | int8 static 1.229
Even with static (calibrated) activation scales and precomputed int8
weights the quantize/dequantize epilogue costs more than the MXU saves:
at 64-256 channels the convs are bandwidth/latency-bound, not
MXU-rate-bound, so the 2x int8 MXU rate buys nothing while the fp32
round/clip/rescale adds VPU work and an extra fp32 intermediate.
DECISION: no quantized serving mode (a drafted repo-wide int8 conv
dispatch was pruned; this bench is the negative-result record).
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

ITERS = 50
REPS = 3


def chain_time(fn, x, iters=ITERS, reps=REPS):
    """median ms/iter, chain in-graph, output forced via global sum."""

    @jax.jit
    def chained(x):
        def body(_, c):
            out = fn(x + c.astype(x.dtype) * 1e-12)
            return out.astype(jnp.float32).sum() * 1e-20
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(chained(x))
    print(f'  compile+first {time.perf_counter() - t0:.1f}s', flush=True)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(x))
        times.append((time.perf_counter() - t0) * 1000.0 / iters)
    return float(np.median(times))


def conv(x, w, accum=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding='SAME' if w.shape[0] == 3 else 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=accum)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(9, 200, 200, 64), jnp.bfloat16)

    for kh, cout, tag in ((3, 64, '3x3 64->64'), (1, 256, '1x1 64->256')):
        w = jnp.asarray(rng.randn(kh, kh, 64, cout) * 0.1, jnp.bfloat16)
        # per-output-channel int8 weight quantization, precomputed
        w32 = np.asarray(w, np.float32)
        wscale = np.abs(w32).reshape(-1, cout).max(0) / 127.0
        w8 = jnp.asarray(np.clip(np.round(w32 / wscale), -127, 127), jnp.int8)
        wscale = jnp.asarray(wscale, jnp.float32)

        def bf16_conv(xp, w=w):
            return conv(xp, w)

        def int8_conv(xp, w8=w8, wscale=wscale):
            # dynamic per-tensor activation quantization, in-graph
            xs = jnp.max(jnp.abs(xp.astype(jnp.float32))) / 127.0
            x8 = jnp.clip(jnp.round(xp.astype(jnp.float32) / xs),
                          -127, 127).astype(jnp.int8)
            acc = conv(x8, w8, accum=jnp.int32)
            return (acc.astype(jnp.float32) * (xs * wscale)).astype(jnp.bfloat16)

        def int8_conv_static(xp, w8=w8, wscale=wscale):
            # static activation scale (calibrated): no abs-max reduction
            x8 = jnp.clip(jnp.round(xp.astype(jnp.float32) * 32.0),
                          -127, 127).astype(jnp.int8)
            acc = conv(x8, w8, accum=jnp.int32)
            return (acc.astype(jnp.float32) * (wscale / 32.0)).astype(jnp.bfloat16)

        ms_bf16 = chain_time(bf16_conv, x)
        ms_int8 = chain_time(int8_conv, x)
        ms_int8s = chain_time(int8_conv_static, x)
        print(f'{tag}: bf16 {ms_bf16:.3f} ms | int8(dyn) {ms_int8:.3f} ms | '
              f'int8(static) {ms_int8s:.3f} ms', flush=True)


if __name__ == '__main__':
    main()
