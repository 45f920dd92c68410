"""ASPP dilated-conv formulations on the real TPU at BEV flagship shape.

The dist+future DeepLabHead costs ~9.8 ms and the temporal-model head is
built from the same ASPP (hidden 128, input (9|3, 200, 200, 64) bf16).
The pyramid branches are 3x3 convs with rhs_dilation 12/24/36 — XLA
lowers large-rate dilations poorly on TPU (the kernel is effectively
73x73-sparse at rate 36). Candidate rewrite, analogous to the
causal-conv "shifted 2-D conv" win: a rate-r 3x3 dilated conv with SAME
(=torch padding=rate) zero padding is EXACTLY the sum of 9 pointwise
matmuls of spatially shifted (zero-padded) copies of x with the 9 kernel
taps.

Variants per rate:
  dilated — conv_general_dilated with rhs_dilation (current _AtrousConv)
  taps    — sum of 9 shifted (HW, C)x(C, O) matmuls
  stacked — pad + stack the 9 shifts on a new axis, ONE einsum (K = 9*C)
Plus the surrounding costs for context: the plain 3x3 conv 128->128 and
the whole DeepLabHead (current).

Run: python benchmarks/aspp_bench.py
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

DT = jnp.bfloat16
FRAMES, H, W, CIN, COUT = 9, 200, 200, 64, 128
RATES = (12, 24, 36)


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


def atrous_dilated(x, k, rate):
    pad = ((rate, rate), (rate, rate))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), pad, rhs_dilation=(rate, rate),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def atrous_taps(x, k, rate):
    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (rate, rate), (rate, rate), (0, 0)))
    out = None
    for i in range(3):
        for j in range(3):
            xs = xp[:, i * rate:i * rate + h, j * rate:j * rate + w, :]
            t = jnp.einsum('bhwc,co->bhwo', xs, k[i, j])
            out = t if out is None else out + t
    return out


def atrous_stacked(x, k, rate):
    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (rate, rate), (rate, rate), (0, 0)))
    xs = jnp.stack([xp[:, i * rate:i * rate + h, j * rate:j * rate + w, :]
                    for i in range(3) for j in range(3)], axis=-2)
    return jnp.einsum('bhwsc,sco->bhwo', xs, k.reshape(9, *k.shape[2:]))


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(FRAMES, H, W, CIN), np.float32).astype(DT)
    k = jnp.asarray(rng.rand(3, 3, CIN, COUT) * 0.1, np.float32).astype(DT)

    # correctness first (fp32, CPU-cheap shapes would hide layout issues;
    # do it on-device at real shape, tolerance for bf16)
    ref = np.asarray(atrous_dilated(x, k, 12), np.float32)
    for name, fn in (('taps', atrous_taps), ('stacked', atrous_stacked)):
        got = np.asarray(fn(x, k, 12), np.float32)
        err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-6)
        print(f'parity {name} rate=12: rel-max-err {err:.2e}', flush=True)

    for rate in RATES:
        row = []
        for name, fn in (('dilated', atrous_dilated), ('taps', atrous_taps),
                         ('stacked', atrous_stacked)):
            ms = chain_time(partial(fn, rate=rate), (x, k))
            row.append(f'{name} {ms:.2f} ms')
        print(f'rate {rate}: ' + ' | '.join(row), flush=True)

    # context: the plain 3x3 conv 128->128 after the merge
    x128 = jnp.asarray(rng.rand(FRAMES, H, W, COUT), np.float32).astype(DT)
    k128 = jnp.asarray(rng.rand(3, 3, COUT, COUT) * 0.1, np.float32).astype(DT)

    def conv3(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    print(f'plain 3x3 128->128: {chain_time(conv3, (x128, k128)):.2f} ms',
          flush=True)

    # the whole DeepLabHead as currently built
    from stp3_tpu.layers.convolutions import DeepLabHead
    from stp3_tpu.utils.precision import cast_floating
    mod = DeepLabHead(num_classes=CIN, hidden_channel=COUT)
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0),
                                  x.astype(jnp.float32))
    variables = cast_floating(variables, DT)
    print(f'DeepLabHead ({os.environ.get("STP3_ATROUS", "auto")}): '
          f'{chain_time(lambda a, v: mod.apply(v, a), (x, variables)):.2f} ms',
          flush=True)


if __name__ == '__main__':
    main()
