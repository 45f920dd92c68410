"""A/B: XLA unrolled SpatialGRU pass vs the fused pallas ConvGRU rollout
(ops/pallas/spatial_gru_kernel.py) at flagship shape — (1, 9, 200, 200, 64)
bf16, the exact pass future_prediction runs twice per forward.

In-graph chained timing (CLAUDE.md methodology: one pass runs ~5 ms, near
the tunnel's per-dispatch floor, so the iteration chain lives inside one
jitted fori_loop); calibrated chain overhead subtracted. Also reports an
on-chip parity check (max |pallas - xla| on the decoded output).

Run: python benchmarks/spatial_gru_bench.py          # both variants
     STP3_SPATIAL_GRU=pallas python bench.py          # e2e A/B
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
from stp3_tpu.layers.temporal import SpatialGRU  # noqa: E402
from stp3_tpu.utils.precision import cast_floating  # noqa: E402

B, T, H, W, C = 1, 9, 200, 200, 64
DT = jnp.bfloat16


def bench(label, variables, x, h0):
    mod = SpatialGRU(input_size=C, hidden_size=C)
    ms = chain_time(mod.apply, (variables, x, h0), perturb_idx=1, iters=30)
    print(f'{label}: {ms:.2f} ms/pass', flush=True)
    return jax.jit(mod.apply)(variables, x, h0)


def bench_grad(label, variables, x, h0):
    """fwd+bwd (the hand-written reverse-rollout VJP vs XLA autodiff
    through the unrolled cell)."""
    mod = SpatialGRU(input_size=C, hidden_size=C)

    def loss(variables, x, h0):
        return jnp.sum(mod.apply(variables, x, h0).astype(jnp.float32))

    def step(variables, x, h0):
        _, grads = jax.value_and_grad(loss)(variables, x, h0)
        return jax.tree_util.tree_leaves(grads)[0]

    ms = chain_time(step, (variables, x, h0), perturb_idx=1, iters=15)
    print(f'{label}: {ms:.2f} ms/fwd+bwd', flush=True)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32))
    h0 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    mod = SpatialGRU(input_size=C, hidden_size=C)
    variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x, h0)
    variables = cast_floating(variables, DT)
    x, h0 = x.astype(DT), h0.astype(DT)

    os.environ.pop('STP3_SPATIAL_GRU', None)
    ref = bench('xla-unrolled', variables, x, h0)

    os.environ['STP3_SPATIAL_GRU'] = 'pallas'
    got = bench('pallas-fused', variables, x, h0)
    os.environ.pop('STP3_SPATIAL_GRU', None)

    diff = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    print(f'on-chip parity: max|diff| = {float(diff):.4f} '
          f'(bf16; interpret-mode parity is exact, tests/)', flush=True)

    bench_grad('xla-unrolled-grad', variables, x, h0)
    os.environ['STP3_SPATIAL_GRU'] = 'pallas'
    bench_grad('pallas-fused-grad', variables, x, h0)
    os.environ.pop('STP3_SPATIAL_GRU', None)


if __name__ == '__main__':
    main()
