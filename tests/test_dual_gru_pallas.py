"""Parity tests for the fused DualGRU rollout kernel
(stp3_tpu/ops/pallas/dual_gru_kernel.py) vs the XLA DualGRU path.

Interpret mode (CPU): the fused warm-up + rollout (2 GRU cells, decoder
conv, 7x7 trust gate with LayerNorm/GELU stages, softmax mixing) must
reproduce layers.temporal.DualGRU exactly, and the env hatch must keep
the param tree checkpoint-identical.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from stp3_tpu.layers.temporal import DualGRU


def _setup(latent=4, ch=8, n_present=3, n_future=3, h=10, w=8, b=1, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, 1, h, w, latent).astype(np.float32))
    state = jnp.asarray(rng.randn(b, n_present, h, w, ch).astype(np.float32))
    mod = DualGRU(input_size=latent, hidden_size=ch, n_future=n_future)
    variables = mod.init(jax.random.PRNGKey(1), x, state)
    # randomize the zero-init biases / identity LN params so they are
    # actually exercised by the parity comparison
    def randomize(path, v):
        if 'bias' in str(path[-1]) or 'scale' in str(path[-1]):
            return jnp.asarray(rng.randn(*v.shape).astype(np.float32)) * 0.2
        return v

    variables = jax.tree_util.tree_map_with_path(randomize, variables)
    return mod, variables, x, state


@pytest.mark.parametrize('n_present,n_future,b', [
    (3, 3, 1), (1, 2, 1), (2, 1, 1), (3, 2, 2)])
def test_dual_gru_hatch_matches_default(monkeypatch, n_present, n_future, b):
    mod, variables, x, state = _setup(n_present=n_present,
                                      n_future=n_future, b=b)
    want = mod.apply(variables, x, state)

    monkeypatch.setenv('STP3_DUAL_GRU', 'pallas')
    with pltpu.force_tpu_interpret_mode():
        got = mod.apply(variables, x, state)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_dual_gru_hatch_param_tree_unchanged(monkeypatch):
    mod, variables, x, state = _setup()
    monkeypatch.setenv('STP3_DUAL_GRU', 'pallas')
    with pltpu.force_tpu_interpret_mode():
        variables_p = mod.init(jax.random.PRNGKey(1), x, state)
    flat = jax.tree_util.tree_leaves_with_path(variables)
    flat_p = jax.tree_util.tree_leaves_with_path(variables_p)
    paths = sorted(str(p) for p, _ in flat)
    paths_p = sorted(str(p) for p, _ in flat_p)
    assert paths == paths_p
    shapes = {str(p): v.shape for p, v in flat}
    for p, v in flat_p:
        assert shapes[str(p)] == v.shape, (p, v.shape, shapes[str(p)])


def test_dual_gru_hatch_mixture_false_falls_back(monkeypatch):
    """mixture=False is outside the kernel's contract (s1 != s2): the
    hatch must fall through to the XLA path and still be correct."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 1, 6, 6, 4).astype(np.float32))
    state = jnp.asarray(rng.randn(1, 2, 6, 6, 8).astype(np.float32))
    mod = DualGRU(input_size=4, hidden_size=8, n_future=2, mixture=False)
    variables = mod.init(jax.random.PRNGKey(3), x, state)
    want = mod.apply(variables, x, state)
    monkeypatch.setenv('STP3_DUAL_GRU', 'pallas')
    got = mod.apply(variables, x, state)   # no pallas -> no interpret needed
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_dual_gru_hatch_bf16_smoke(monkeypatch):
    """bf16 (on-chip serving dtype): finite, near the fp32 reference."""
    mod, variables, x, state = _setup(seed=4)
    want = mod.apply(variables, x, state)
    variables = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16)
        if jnp.issubdtype(v.dtype, jnp.floating) else v, variables)
    monkeypatch.setenv('STP3_DUAL_GRU', 'pallas')
    with pltpu.force_tpu_interpret_mode():
        got = mod.apply(variables, x.astype(jnp.bfloat16),
                        state.astype(jnp.bfloat16))
    got = np.asarray(got, np.float32)
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, np.asarray(want), rtol=0.15, atol=0.15)
