"""Temporal layer equivalence: the TPU-friendly unfolded CausalConv3d must
equal a direct VALID 3-D convolution on a left-padded input."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stp3_tpu.layers.temporal import (
    CausalConv3d, ConvGRUCell, TemporalBlock, _LatentGRUCell)


def test_latent_gru_cell_matches_conv_gru_cell():
    """_LatentGRUCell (hoisted x-half convs) == ConvGRUCell on the same
    params over a multi-step rollout with a CONSTANT x, fp32."""
    rng = np.random.RandomState(0)
    cx, h = 5, 8
    x = jnp.asarray(rng.randn(2, 6, 7, cx).astype(np.float32))
    s = jnp.asarray(rng.randn(2, 6, 7, h).astype(np.float32))
    ref = ConvGRUCell(hidden_size=h, gru_bias_init=0.5)
    rv = ref.init(jax.random.PRNGKey(1), x, s)
    rv = jax.tree.map(lambda a: jnp.asarray(
        rng.randn(*a.shape).astype(np.float32) * 0.3), rv)
    fast = _LatentGRUCell(hidden_size=h, x_channels=cx, gru_bias_init=0.5)
    # same param tree -> same variables restore into both
    maps = fast.apply(rv, x, method=_LatentGRUCell.x_maps)
    s_ref, s_fast = s, s
    for _ in range(4):
        s_ref = ref.apply(rv, x, s_ref)
        s_fast = fast.apply(rv, maps, s_fast)
    np.testing.assert_allclose(np.asarray(s_fast), np.asarray(s_ref),
                               rtol=2e-5, atol=2e-5)


def test_latent_gru_cell_mixed_precision_promotes_like_nn_conv():
    """fp32 params + bf16 activations: _LatentGRUCell must promote to fp32
    (nn.Conv's dtype=None semantics) so both DualGRU branches stay in the
    same precision — no silent bf16 downcast of the hoisted convs."""
    rng = np.random.RandomState(3)
    cx, h = 5, 8
    x = jnp.asarray(rng.randn(1, 4, 4, cx)).astype(jnp.bfloat16)
    s = jnp.asarray(rng.randn(1, 4, 4, h)).astype(jnp.bfloat16)
    ref = ConvGRUCell(hidden_size=h)
    rv = ref.init(jax.random.PRNGKey(1), x, s)   # fp32 params
    fast = _LatentGRUCell(hidden_size=h, x_channels=cx)
    maps = fast.apply(rv, x, method=_LatentGRUCell.x_maps)
    out_ref = ref.apply(rv, x, s)
    out_fast = fast.apply(rv, maps, s)
    assert out_ref.dtype == out_fast.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_conv_gru_cell_param_tree_unchanged():
    """ConvGRUCell keeps {gates,candidate}/{kernel,bias} with the concat
    kernel shapes existing checkpoints / the torch importer use."""
    cell = ConvGRUCell(hidden_size=8)
    v = cell.init(jax.random.PRNGKey(0),
                  jnp.zeros((1, 4, 4, 6)), jnp.zeros((1, 4, 4, 8)))
    assert set(v['params'].keys()) == {'gates', 'candidate'}
    assert v['params']['gates']['kernel'].shape == (3, 3, 14, 16)
    assert v['params']['candidate']['kernel'].shape == (3, 3, 14, 8)


@pytest.mark.parametrize('kt,dil', [(2, (1, 1, 1)), (1, (1, 1, 1)), (3, (2, 1, 1))])
def test_causal_conv3d_matches_direct_3d(kt, dil):
    rng = np.random.RandomState(0)
    b, t, h, w, cin, cout = 2, 4, 6, 5, 3, 7
    x = jnp.asarray(rng.randn(b, t, h, w, cin).astype(np.float32))
    mod = CausalConv3d(cout, kernel_size=(kt, 3, 3), dilation=dil)
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)

    # oracle: direct 3-D conv, VALID, left temporal pad (the reference's
    # formulation, temporal.py:252-273), same kernel + norm params
    kernel = variables['params']['kernel']
    dt_, dh, dw = dil
    tpad = (kt - 1) * dt_
    xp = jnp.pad(x, ((0, 0), (tpad, 0), (1, 1), (1, 1), (0, 0)))
    dn = jax.lax.conv_dimension_numbers(xp.shape, kernel.shape,
                                        ('NTHWC', 'THWIO', 'NTHWC'))
    conv = jax.lax.conv_general_dilated(
        xp, kernel, window_strides=(1, 1, 1), padding='VALID',
        rhs_dilation=dil, dimension_numbers=dn)
    # same GroupNorm afterwards
    from stp3_tpu.layers.convolutions import Norm
    norm = Norm()
    nvars = {'params': variables['params']['Norm_0']}
    ref = jax.nn.relu(norm.apply(nvars, conv))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_temporal_block_shapes_and_finite():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 3, 8, 8, 12).astype(np.float32))
    mod = TemporalBlock(16, use_pyramid_pooling=True, pool_sizes=[(2, 8, 8)])
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    assert out.shape == (1, 3, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
