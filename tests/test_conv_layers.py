"""Conv building-block equivalences (stp3_tpu/layers/convolutions.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from stp3_tpu.layers.convolutions import (
    _AtrousConv, _GroupNormFast, ASPP, Bottleblock, ConvNeXtBlock, Norm)


@pytest.mark.parametrize('h,w,rate', [
    (14, 30, 12),   # all taps in bounds vertically for y>=12; full kernel
    (14, 30, 24),   # rate >= h: vertical taps dropped -> 1x3 kernel
    (14, 30, 36),   # rate >= h and >= w: center tap only -> 1x1 kernel
    (40, 40, 12),   # BEV-like: nothing dropped
    (5, 5, 36),     # degenerate tiny map
])
def test_atrous_conv_matches_dilated_nn_conv(h, w, rate):
    """_AtrousConv's always-out-of-bounds tap clipping is EXACT vs the plain
    SAME-padded dilated nn.Conv it replaced (reference torch Conv2d with
    padding=rate, dilation=rate semantics)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, 8).astype(np.float32))
    ref = nn.Conv(16, (3, 3), kernel_dilation=(rate, rate), padding='SAME',
                  use_bias=False)
    rv = ref.init(jax.random.PRNGKey(1), x)
    out_ref = ref.apply(rv, x)
    out = _AtrousConv(16, rate).apply(
        {'params': {'kernel': rv['params']['kernel']}}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('groups,shape', [
    (4, (2, 7, 9, 16)),     # 4-D NHWC
    (8, (3, 5, 64)),        # 3-D NLC
    (1, (2, 6, 6, 8)),      # layer-norm-like single group
    (8, (1, 200, 200, 64)), # BEV-scale shape
])
def test_groupnorm_fast_matches_flax(groups, shape):
    """_GroupNormFast (reshape-free stats) == flax nn.GroupNorm on the same
    {scale, bias} params, fp32."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32)) * 3.0 + 1.5
    ref = nn.GroupNorm(num_groups=groups)
    rv = ref.init(jax.random.PRNGKey(0), x)
    rv = jax.tree.map(lambda a: jnp.asarray(
        rng.randn(*a.shape).astype(np.float32)), rv)
    out_ref = ref.apply(rv, x)
    out = _GroupNormFast(num_groups=groups).apply(rv, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_groupnorm_fast_bf16_policy():
    """Under the bf16 policy (params + input cast to bf16) the fast norm
    returns bf16 and stays within bf16 tolerance of the fp32 flax result;
    stats are still accumulated in fp32 internally."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 10, 12, 32).astype(np.float32))
    ref = nn.GroupNorm(num_groups=8)
    rv = ref.init(jax.random.PRNGKey(0), x)
    out_ref = ref.apply(rv, x)  # fp32 oracle
    rv16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), rv)
    out = _GroupNormFast(num_groups=8).apply(rv16, x.astype(jnp.bfloat16))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(out_ref), rtol=0.05, atol=0.05)


def test_ln_param_trees_unchanged():
    """Bottleblock / ConvNeXtBlock keep the LayerNorm_i auto-number param
    paths checkpoints rely on."""
    v = Bottleblock(16).init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))
    assert {'LayerNorm_0', 'LayerNorm_1', 'LayerNorm_2'} <= set(v['params'])
    v = ConvNeXtBlock().init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))
    assert 'LayerNorm_0' in v['params'] and 'gamma' in v['params']


def test_convnext_layer_scale_disabled():
    """layer_scale_init_value <= 0 disables gamma (reference
    convolutions.py:330 semantics) instead of crashing."""
    x = jnp.ones((1, 4, 4, 8))
    block = ConvNeXtBlock(layer_scale_init_value=0.0)
    v = block.init(jax.random.PRNGKey(0), x)
    assert 'gamma' not in v['params']
    out = block.apply(v, x)
    assert out.shape == x.shape and jnp.isfinite(out).all()


def test_norm_param_tree_unchanged():
    """Norm('gn') keeps the GroupNorm_0/{scale,bias} param path existing
    checkpoints use, despite dispatching to _GroupNormFast."""
    v = Norm(kind='gn').init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 16)))
    assert set(v['params'].keys()) == {'GroupNorm_0'}
    assert set(v['params']['GroupNorm_0'].keys()) == {'scale', 'bias'}
    assert v['params']['GroupNorm_0']['scale'].shape == (16,)


def test_aspp_param_names_stable():
    """ASPP's param tree keeps the nn.Conv auto-numbering layout
    (Conv_0..Conv_5 + Norm_0..Norm_5) that checkpoints and the torch
    importer rely on, despite the _AtrousConv/_ChunkedPointwise rewrites."""
    v = ASPP(out_channels=16).init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 14, 30, 8)))
    assert sorted(v['params'].keys()) == (
        [f'Conv_{i}' for i in range(6)] + [f'Norm_{i}' for i in range(6)])
    assert v['params']['Conv_1']['kernel'].shape == (3, 3, 8, 16)
