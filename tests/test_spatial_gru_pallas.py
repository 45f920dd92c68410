"""Parity tests for the fused ConvGRU rollout kernel
(stp3_tpu/ops/pallas/spatial_gru_kernel.py) vs the XLA ConvGRUCell loop.

Run in pallas interpret mode (CPU): the kernel's flat-padded tap algebra,
junk-column masking, state persistence across grid steps, and the
SpatialGRU env hatch must reproduce the reference cell exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from stp3_tpu.layers.temporal import ConvGRUCell, SpatialGRU
from stp3_tpu.ops.pallas.spatial_gru_kernel import conv_gru_rollout_pallas


def _reference_rollout(x, h0, variables):
    """Unrolled ConvGRUCell pass returning every state (pre-decoder)."""
    cell = ConvGRUCell(hidden_size=h0.shape[-1])
    states, h = [], h0
    for i in range(x.shape[1]):
        h = cell.apply(variables, x[:, i], h)
        states.append(h)
    return jnp.stack(states, axis=1)


def _init_cell(key, cx, ch):
    cell = ConvGRUCell(hidden_size=ch)
    x0 = jnp.zeros((1, 4, 4, cx))
    s0 = jnp.zeros((1, 4, 4, ch))
    return cell.init(key, x0, s0)


@pytest.mark.parametrize('b,t,h,w,cx,ch', [
    (1, 3, 10, 8, 6, 8),    # Cx != Ch, odd H
    (2, 1, 6, 6, 4, 4),     # batch > 1, single step
    (1, 5, 8, 12, 8, 8),    # longer rollout
])
def test_rollout_matches_conv_gru_cell(b, t, h, w, cx, ch):
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(b, t, h, w, cx).astype(np.float32))
    h0 = jnp.asarray(rng.randn(b, h, w, ch).astype(np.float32))
    variables = _init_cell(jax.random.PRNGKey(0), cx, ch)
    # non-zero bias so the bias path is actually exercised
    p = variables['params']
    p['gates']['bias'] = jnp.asarray(rng.randn(2 * ch).astype(np.float32)) * 0.1
    p['candidate']['bias'] = jnp.asarray(rng.randn(ch).astype(np.float32)) * 0.1

    want = _reference_rollout(x, h0, variables)
    with pltpu.force_tpu_interpret_mode():
        got = conv_gru_rollout_pallas(
            x, h0, p['gates']['kernel'], p['gates']['bias'],
            p['candidate']['kernel'], p['candidate']['bias'])
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_rollout_gru_bias_init():
    """gru_bias_init is added to the gate pre-activations, matching the
    ConvGRUCell formula."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 2, 6, 6, 4).astype(np.float32))
    h0 = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
    variables = _init_cell(jax.random.PRNGKey(1), 4, 4)
    p = variables['params']

    cell = ConvGRUCell(hidden_size=4, gru_bias_init=0.7)
    want, hh = [], h0
    for i in range(2):
        hh = cell.apply(variables, x[:, i], hh)
        want.append(hh)
    want = jnp.stack(want, axis=1)

    with pltpu.force_tpu_interpret_mode():
        got = conv_gru_rollout_pallas(
            x, h0, p['gates']['kernel'], p['gates']['bias'],
            p['candidate']['kernel'], p['candidate']['bias'],
            gru_bias_init=0.7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_rollout_bf16_smoke():
    """bf16 inputs (the on-chip serving dtype): finite and close to the
    fp32 reference within bf16 tolerance."""
    rng = np.random.RandomState(11)
    x32 = rng.randn(1, 3, 8, 8, 8).astype(np.float32)
    h32 = rng.randn(1, 8, 8, 8).astype(np.float32)
    variables = _init_cell(jax.random.PRNGKey(2), 8, 8)
    p = variables['params']
    want = _reference_rollout(jnp.asarray(x32), jnp.asarray(h32), variables)
    with pltpu.force_tpu_interpret_mode():
        got = conv_gru_rollout_pallas(
            jnp.asarray(x32, jnp.bfloat16), jnp.asarray(h32, jnp.bfloat16),
            p['gates']['kernel'].astype(jnp.bfloat16),
            p['gates']['bias'].astype(jnp.bfloat16),
            p['candidate']['kernel'].astype(jnp.bfloat16),
            p['candidate']['bias'].astype(jnp.bfloat16))
    got = np.asarray(got, np.float32)
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, np.asarray(want), rtol=0.1, atol=0.1)


@pytest.mark.parametrize('b,t,h,w,ch', [(1, 3, 8, 6, 8), (2, 2, 6, 8, 4)])
def test_rollout_backward_matches_autodiff(b, t, h, w, ch):
    """The hand-written reverse-rollout VJP must match XLA autodiff
    through the ConvGRUCell loop for every input: x, h0, both conv
    kernels and biases (weight grads accumulate across all (b, t) grid
    steps; the carry chains through every step)."""
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(b, t, h, w, ch).astype(np.float32))
    h0 = jnp.asarray(rng.randn(b, h, w, ch).astype(np.float32))
    variables = _init_cell(jax.random.PRNGKey(5), ch, ch)
    p = variables['params']
    p['gates']['bias'] = jnp.asarray(rng.randn(2 * ch).astype(np.float32)) * 0.1
    p['candidate']['bias'] = jnp.asarray(rng.randn(ch).astype(np.float32)) * 0.1
    cot = jnp.asarray(rng.randn(b, t, h, w, ch).astype(np.float32))

    def loss_ref(x, h0, wg, bg, wc, bc):
        cell = ConvGRUCell(hidden_size=ch, gru_bias_init=0.3)
        v = {'params': {'gates': {'kernel': wg, 'bias': bg},
                        'candidate': {'kernel': wc, 'bias': bc}}}
        states, hh = [], h0
        for i in range(t):
            hh = cell.apply(v, x[:, i], hh)
            states.append(hh)
        return jnp.sum(jnp.stack(states, 1) * cot)

    def loss_pallas(x, h0, wg, bg, wc, bc):
        out = conv_gru_rollout_pallas(x, h0, wg, bg, wc, bc, 0.3)
        return jnp.sum(out * cot)

    args = (x, h0, p['gates']['kernel'], p['gates']['bias'],
            p['candidate']['kernel'], p['candidate']['bias'])
    want = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_pallas, argnums=tuple(range(6)))(*args)
    names = ['dx', 'dh0', 'dwg', 'dbg', 'dwc', 'dbc']
    for n, a, bb in zip(names, want, got):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


def test_fused_rollout_gating(monkeypatch):
    """Auto mode must NOT pick pallas off-TPU (CPU tests, sharded runs);
    env forces always win in both directions."""
    from stp3_tpu.layers import temporal as T
    monkeypatch.delenv('STP3_SPATIAL_GRU', raising=False)
    # auto flipped on, but backend here is CPU -> XLA path
    monkeypatch.setattr(T, '_FUSED_GRU_AUTO',
                        {'STP3_SPATIAL_GRU': True, 'STP3_DUAL_GRU': True})
    assert not T._fused_rollout('STP3_SPATIAL_GRU', allow=True)
    # env force-on wins even when the caller does not allow it
    monkeypatch.setenv('STP3_SPATIAL_GRU', 'pallas')
    assert T._fused_rollout('STP3_SPATIAL_GRU', allow=False)
    # env force-off wins over auto
    monkeypatch.setenv('STP3_SPATIAL_GRU', 'off')
    assert not T._fused_rollout('STP3_SPATIAL_GRU', allow=True)
    # a model with allow_fused=True still runs the XLA cell on CPU auto
    monkeypatch.delenv('STP3_SPATIAL_GRU', raising=False)
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(1, 2, 6, 6, 4).astype(np.float32))
    mod = SpatialGRU(input_size=4, hidden_size=4, allow_fused=True)
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)   # would raise if pallas were chosen
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_spatial_gru_env_hatch_matches_default(monkeypatch):
    """STP3_SPATIAL_GRU=pallas must leave SpatialGRU's outputs AND param
    tree unchanged (checkpoint interchangeability)."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 3, 8, 8, 6).astype(np.float32))
    state = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    mod = SpatialGRU(input_size=6, hidden_size=8)
    variables = mod.init(jax.random.PRNGKey(4), x, state)
    want = mod.apply(variables, x, state)

    monkeypatch.setenv('STP3_SPATIAL_GRU', 'pallas')
    with pltpu.force_tpu_interpret_mode():
        variables_p = mod.init(jax.random.PRNGKey(4), x, state)
        got = mod.apply(variables, x, state)
    assert jax.tree_util.tree_structure(variables_p) == \
        jax.tree_util.tree_structure(variables)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(variables),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(variables_p),
                   key=lambda kv: str(kv[0]))):
        assert str(ka) == str(kb) and a.shape == b.shape, (ka, kb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
