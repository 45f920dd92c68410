"""Sub-stage latency of the distribution+future stage (the fattest stage of
the full forward, ~37 ms of ~94): DistributionModule, DualGRU rollout,
ConvNeXt res block, one SpatialGRU pass, DeepLabHead — each standalone at
flagship shapes (200x200x64 BEV, rf=3, 6 future frames), bf16, chained
timing. Fresh random params per block (latency does not need trained
weights).

Run: python benchmarks/future_breakdown.py
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
H = W = 200
C = 64
RF = 3
NF = 6
LATENT = 32


def dep(x, c):
    return x + (c * 0).astype(x.dtype)


def timeit_chain(f, n=5, reps=3):
    c = f(jnp.zeros(()))
    float(c)
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = jnp.zeros(())
        for _ in range(n):
            c = f(c)
        float(c)
        best.append((time.perf_counter() - t0) / n * 1000.0)
    return float(np.percentile(best, 50))


def bench(name, module, *args, method=None):
    from stp3_tpu.utils.precision import cast_floating
    # init in fp32 (mixed bf16 inputs + fp32 init params break scan carries)
    f32_args = [a.astype(jnp.float32) for a in args]
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), *f32_args)
    variables = cast_floating(variables, DT)

    @jax.jit
    def run(c):
        out = module.apply(variables, dep(args[0], c), *args[1:])
        if isinstance(out, dict):
            out = next(v for v in out.values() if v is not None)
        return out.ravel()[0].astype(jnp.float32)

    print(f'{name}: {timeit_chain(run):.2f} ms', flush=True)


def main():
    rng = np.random.RandomState(0)
    from stp3_tpu.layers.convolutions import ConvNeXtBlock, DeepLabHead
    from stp3_tpu.layers.temporal import DualGRU, SpatialGRU
    from stp3_tpu.models.distributions import DistributionModule
    from stp3_tpu.models.future_prediction import FuturePrediction

    present = jnp.asarray(rng.rand(1, 1, H, W, C), np.float32).astype(DT)
    states = jnp.asarray(rng.rand(1, RF, H, W, C), np.float32).astype(DT)
    sample = jnp.asarray(rng.rand(1, 1, H, W, LATENT), np.float32).astype(DT)
    seq9 = jnp.asarray(rng.rand(1, RF + NF, H, W, C), np.float32).astype(DT)
    flat9 = seq9.reshape(RF + NF, H, W, C)

    bench('DistributionModule (present frame)',
          DistributionModule(latent_dim=LATENT), present)
    bench(f'DualGRU rollout ({NF} future)',
          DualGRU(LATENT, C, n_future=NF), sample, states)
    bench('ConvNeXtBlock x9 frames', ConvNeXtBlock(), flat9)
    bench('SpatialGRU one pass (9 steps)', SpatialGRU(C, C), seq9)
    bench('DeepLabHead x9 frames (hidden 128)',
          DeepLabHead(num_classes=C, hidden_channel=128), flat9)
    bench('FuturePrediction (whole stage)',
          FuturePrediction(C, LATENT, n_future=NF), sample, states)


if __name__ == '__main__':
    main()
