"""Sub-stage latency of the distribution+future stage (the fattest stage of
the full forward, ~30 ms of ~85): DistributionModule, DualGRU rollout,
ConvNeXt res block, one SpatialGRU pass, DeepLabHead — each standalone at
flagship shapes (200x200x64 BEV, rf=3, 6 future frames), bf16, in-graph
chained timing (these stages run below/near the tunnel's per-dispatch
cost). Fresh random params per block (latency does not need trained
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


def bench(name, module, *args, iters=30):
    """In-graph chained timing (CLAUDE.md methodology: these sub-stages run
    5-30 ms, well under the ~10 ms/dispatch tunnel floor, so the iteration
    chain must live INSIDE one jitted program — a host loop times the
    tunnel). Variables and inputs are jit ARGUMENTS, not closure constants
    (closure-baked arrays blow the remote-compile payload limit)."""
    from static_splat_bench import _chain_overhead_ms
    from stp3_tpu.utils.precision import cast_floating
    # init in fp32 (mixed bf16 inputs + fp32 init params break scan carries)
    f32_args = [a.astype(jnp.float32) for a in args]
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), *f32_args)
    variables = cast_floating(variables, DT)

    @jax.jit
    def chained(variables, args):
        def body(_, c):
            a = (args[0] + c.astype(args[0].dtype) * 1e-12,) + args[1:]
            out = module.apply(variables, *a)
            if isinstance(out, dict):
                out = next(v for v in out.values() if v is not None)
            return out.ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    overhead = _chain_overhead_ms()
    float(chained(variables, args))  # compile + settle
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(variables, args))
        times.append(((time.perf_counter() - t0) * 1000.0 - overhead) / iters)
    print(f'{name}: {max(float(np.median(times)), 0.0):.2f} ms', flush=True)


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
