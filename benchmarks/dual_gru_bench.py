"""A/B: XLA DualGRU rollout vs the fused pallas kernel
(ops/pallas/dual_gru_kernel.py) at flagship shape — latent 32, 64-ch
state, 200x200, n_present=3 warm-up + 6 future steps, bf16.

In-graph chained timing (same methodology as spatial_gru_bench.py).

Run: python benchmarks/dual_gru_bench.py
     STP3_DUAL_GRU=pallas python bench.py                       # e2e
     STP3_DUAL_GRU=pallas STP3_SPATIAL_GRU=pallas python bench.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from static_splat_bench import chain_time  # noqa: E402
from stp3_tpu.layers.temporal import DualGRU  # noqa: E402
from stp3_tpu.utils.precision import cast_floating  # noqa: E402

B, H, W, CH, LATENT = 1, 200, 200, 64, 32
N_PRESENT, N_FUTURE = 3, 6
DT = jnp.bfloat16


def bench(label, variables, x, state):
    mod = DualGRU(input_size=LATENT, hidden_size=CH, n_future=N_FUTURE)
    ms = chain_time(mod.apply, (variables, x, state), perturb_idx=1, iters=20)
    print(f'{label}: {ms:.2f} ms/rollout', flush=True)
    return jax.jit(mod.apply)(variables, x, state)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, 1, H, W, LATENT).astype(np.float32))
    state = jnp.asarray(rng.randn(B, N_PRESENT, H, W, CH).astype(np.float32))
    mod = DualGRU(input_size=LATENT, hidden_size=CH, n_future=N_FUTURE)
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x, state)
    variables = cast_floating(variables, DT)
    x, state = x.astype(DT), state.astype(DT)

    os.environ.pop('STP3_DUAL_GRU', None)
    ref = bench('xla-dualgru', variables, x, state)

    os.environ['STP3_DUAL_GRU'] = 'pallas'
    got = bench('pallas-fused', variables, x, state)
    os.environ.pop('STP3_DUAL_GRU', None)

    diff = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    print(f'on-chip parity: max|diff| = {float(diff):.4f} '
          f'(bf16; interpret-mode parity is exact, tests/)', flush=True)


if __name__ == '__main__':
    main()
