"""Parity tests for the fused ConvNeXt MLP kernel
(stp3_tpu/ops/pallas/convnext_mlp_kernel.py) vs the XLA ConvNeXtBlock tail.

Interpret mode (CPU). The kernel fuses LN -> pw1 -> GELU(tanh) -> pw2 ->
gamma + residual; its plain-JAX mirror ``_mlp_reference`` is both the
custom_vjp backward and the exact oracle here. Against the real flax
block the comparison is loose-tolerance only: the kernel casts matmul
operands to bf16 (MXU-native) while the fp32 XLA path does not.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from stp3_tpu.layers.convolutions import ConvNeXtBlock
from stp3_tpu.ops.pallas.convnext_mlp_kernel import (
    _mlp_reference, convnext_mlp_pallas, use_fused_convnext)


def _inputs(n=500, c=16, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randn(n, c), dtype)
    x = jnp.asarray(rng.randn(n, c), dtype)
    scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(c, 4 * c) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.randn(4 * c) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(4 * c, c) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    gamma = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    return h, x, scale, bias, w1, b1, w2, b2, gamma


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize('n', [500, 2048, 2049])  # off-tile padding too
def test_kernel_matches_reference(dtype, n):
    args = _inputs(n=n, dtype=dtype)
    want = _mlp_reference(*args)
    with pltpu.force_tpu_interpret_mode():
        got = convnext_mlp_pallas(*args)
    assert got.dtype == want.dtype == dtype
    # bf16 output: fp32 reassociation inside the kernel can shift the
    # rounded result by 1 ULP (2^-8 relative)
    rtol = 1e-2 if dtype == jnp.bfloat16 else 0
    atol = 1e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=rtol, atol=atol)


def test_kernel_grad_matches_reference_grad():
    args = _inputs(n=300)

    def loss_k(*a):
        with pltpu.force_tpu_interpret_mode():
            return (convnext_mlp_pallas(*a) ** 2).sum()

    def loss_r(*a):
        return (_mlp_reference(*a) ** 2).sum()

    gk = jax.grad(loss_k, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(9)))(*args)
    for a, b in zip(gk, gr):
        # fwd output (kernel vs reference) differs only by fp32 reassociation;
        # the bwd itself IS the reference vjp
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def _block_setup(seed=0, c=16, hw=10):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(3, hw, hw, c).astype(np.float32))
    mod = ConvNeXtBlock()
    variables = mod.init(jax.random.PRNGKey(1), x)

    def randomize(path, v):
        return jnp.asarray(rng.randn(*v.shape).astype(np.float32)) * 0.2

    variables = jax.tree_util.tree_map_with_path(randomize, variables)
    return mod, variables, x


def test_block_hatch_matches_xla_path(monkeypatch):
    mod, variables, x = _block_setup()
    monkeypatch.delenv('STP3_CONVNEXT', raising=False)
    want = mod.apply(variables, x)
    monkeypatch.setenv('STP3_CONVNEXT', 'pallas')
    assert use_fused_convnext()
    with pltpu.force_tpu_interpret_mode():
        got = mod.apply(variables, x)
    # loose: the kernel's bf16 matmul casts vs the fp32 XLA path
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=3e-2)
    # tight relative to the magnitude of the residual branch
    resid = np.abs(np.asarray(want) - np.asarray(x)).max()
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 0.05 * max(resid, 1e-3)


def test_block_param_tree_identical_under_hatch(monkeypatch):
    mod, variables, x = _block_setup()
    monkeypatch.setenv('STP3_CONVNEXT', 'pallas')
    variables2 = mod.init(jax.random.PRNGKey(1), x)
    t1 = jax.tree_util.tree_structure(variables)
    t2 = jax.tree_util.tree_structure(variables2)
    assert t1 == t2
    for (p1, v1), (p2, v2) in zip(
            jax.tree_util.tree_flatten_with_path(variables)[0],
            jax.tree_util.tree_flatten_with_path(variables2)[0]):
        assert p1 == p2 and v1.shape == v2.shape


def test_block_grad_under_hatch_is_finite_and_close(monkeypatch):
    mod, variables, x = _block_setup()

    def loss(v, x):
        return (mod.apply(v, x) ** 2).sum()

    monkeypatch.delenv('STP3_CONVNEXT', raising=False)
    g_ref = jax.grad(loss)(variables, x)
    monkeypatch.setenv('STP3_CONVNEXT', 'pallas')
    with pltpu.force_tpu_interpret_mode():
        g_k = jax.grad(loss)(variables, x)
    leaves_r = jax.tree_util.tree_leaves(g_ref)
    leaves_k = jax.tree_util.tree_leaves(g_k)
    for a, b in zip(leaves_k, leaves_r):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        # the two paths intentionally differ (bf16 matmul casts, tanh vs
        # erf GELU in fp32): compare per-leaf relative to the grad scale
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 0.03
