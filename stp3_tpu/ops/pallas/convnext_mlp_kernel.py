"""Pallas TPU kernel: fused ConvNeXt MLP (LN -> pw1 -> GELU -> pw2 -> gamma
-> residual) over flattened BEV rows.

Why it exists (measured, round 3): the dist+future stage's cost is NOT the
GRUs (DualGRU rollout 1.17 ms, SpatialGRU pass 0.26 ms standalone) but the
six ConvNeXt blocks (~4.0 ms each over 9 frames) and the DeepLabHead —
all HBM-bandwidth-bound pointwise chains. The XLA lowering of
LN -> Dense(4C) -> GELU -> Dense(C) materialises the (N, 4C) expanded
tensor (9*40400*256*2B = 185 MB) plus the LN/GELU intermediates in HBM
each block. This kernel keeps the whole chain in VMEM per row-tile: reads
h (dwconv output) and x (residual input) once, writes the output once —
~140 MB of traffic instead of ~1 GB per block.

Math (mirrors layers/convolutions.py ConvNeXtBlock after the dwconv,
reference stp3/layers/convolutions.py:310-346):

    u  = LayerNorm(h; scale, bias, eps=1e-6)        # stats in fp32
    a  = u @ W1 + b1                                # (N, 4C), MXU bf16
    g  = gelu_tanh(a)                               # fp32 VPU
    y  = x + gamma * (g @ W2 + b2)

The matmul operands are cast to bf16 (MXU-native; matches the serving
policy where the whole tree is bf16 anyway); accumulation and every
pointwise op run in fp32. Backward is a plain-JAX rematerialised VJP of
the same math (custom_vjp below), so the kernel is usable on training
traces.

Grid: 1-D over row tiles of ``_ROWS``; weights are whole-array blocks
revisited every step (index_map -> 0). VMEM per step: ~2.5 MB at C=64.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 2048
_SQRT_2_OVER_PI = 0.7978845608028654


def _gelu_tanh(x):
    """tanh-approx GELU in fp32 (the bf16-policy activation the XLA path
    uses; exact-erf is not Mosaic-lowerable)."""
    return 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x + 0.044715 * x * x * x)))


def _mlp_kernel(h_ref, x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, gamma_ref, out_ref):
    h = h_ref[...].astype(jnp.float32)                       # (R, C)
    mean = jnp.mean(h, axis=1, keepdims=True)
    var = jnp.mean(h * h, axis=1, keepdims=True) - mean * mean
    u = (h - mean) * jax.lax.rsqrt(var + 1e-6)
    u = u * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    a = jnp.dot(u.astype(jnp.bfloat16), w1_ref[...],
                preferred_element_type=jnp.float32)          # (R, 4C)
    a = a + b1_ref[...].astype(jnp.float32)
    g = _gelu_tanh(a)
    o = jnp.dot(g.astype(jnp.bfloat16), w2_ref[...],
                preferred_element_type=jnp.float32)          # (R, C)
    o = o + b2_ref[...].astype(jnp.float32)
    y = x_ref[...].astype(jnp.float32) + gamma_ref[...].astype(jnp.float32) * o
    out_ref[...] = y.astype(out_ref.dtype)


def _mlp_reference(h, x, scale, bias, w1, b1, w2, b2, gamma):
    """Plain-JAX mirror of the kernel math (same dtypes/rounding points);
    differentiated for the custom_vjp backward and used as the test oracle."""
    hf = h.astype(jnp.float32)
    mean = jnp.mean(hf, axis=-1, keepdims=True)
    var = jnp.mean(hf * hf, axis=-1, keepdims=True) - mean * mean
    u = (hf - mean) * jax.lax.rsqrt(var + 1e-6)
    u = u * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    a = jnp.dot(u.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    g = _gelu_tanh(a)
    o = jnp.dot(g.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b2.astype(jnp.float32)
    y = x.astype(jnp.float32) + gamma.astype(jnp.float32) * o
    return y.astype(x.dtype)


def _forward(h, x, scale, bias, w1, b1, w2, b2, gamma, rows=None):
    n, c = h.shape
    c4 = w1.shape[1]
    rows = rows or int(os.environ.get('STP3_CONVNEXT_ROWS', _ROWS))
    rows = min(rows, -(-n // 8) * 8)
    n_tiles = -(-n // rows)
    pad = n_tiles * rows - n
    if pad:
        h = jnp.pad(h, ((0, pad), (0, 0)))
        x = jnp.pad(x, ((0, pad), (0, 0)))

    whole = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mlp_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            whole((1, c)), whole((1, c)),
            whole((c, c4)), whole((1, c4)),
            whole((c4, c)), whole((1, c)),
            whole((1, c)),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * rows, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            # row tiles are independent: let Mosaic pipeline the grid
            dimension_semantics=('parallel',),
            vmem_limit_bytes=96 * 1024 * 1024),
    )(h, x, scale.reshape(1, c), bias.reshape(1, c),
      w1.astype(jnp.bfloat16), b1.reshape(1, c4),
      w2.astype(jnp.bfloat16), b2.reshape(1, c), gamma.reshape(1, c))
    return out[:n]


@jax.custom_vjp
def convnext_mlp_pallas(h, x, scale, bias, w1, b1, w2, b2, gamma):
    """Fused LN+MLP+residual over rows. h, x: (N, C); scale/bias/gamma (C,);
    w1 (C, 4C); b1 (4C,); w2 (4C, C); b2 (C,). Returns (N, C) in x.dtype."""
    return _forward(h, x, scale, bias, w1, b1, w2, b2, gamma)


def _fwd(h, x, scale, bias, w1, b1, w2, b2, gamma):
    out = _forward(h, x, scale, bias, w1, b1, w2, b2, gamma)
    return out, (h, x, scale, bias, w1, b1, w2, b2, gamma)


def _bwd(res, g):
    # rematerialised plain-JAX backward of the kernel math: the expanded
    # (N, 4C) tensor exists only inside this backward, which XLA fuses
    # reasonably; the forward stays single-pass
    _, vjp = jax.vjp(_mlp_reference, *res)
    return vjp(g)


convnext_mlp_pallas.defvjp(_fwd, _bwd)


def use_fused_convnext(train: bool = False) -> bool:
    """Trace-time gate. env STP3_CONVNEXT=pallas forces on, =off/xla forces
    off; auto picks the kernel on TRAINING traces on a single-device TPU
    and never on inference traces.

    Round-3 on-chip verdicts behind the split default:
      * train step WINS: 478.2 vs 498.0 ms @ batch 2 (/tmp/tpu_queue4
        train_cnx) — the single-pass forward + rematerialised backward
        beats XLA's materialised (N, 4C) chain on training traces.
      * inference e2e LOSES: 110.7 vs 81.7 ms at batch 1 — NOT kernel
        cost (standalone the block wins 3.2 vs 3.9 ms; a 3-block stack
        wins 9.9 vs 11.4). Root cause, isolated with a trivial pallas
        IDENTITY kernel reproducing the full +25 ms: a layout-constrained
        tpu_custom_call consuming the DualGRU rollout output makes XLA
        keep every conv on that producer chain in naive b01f
        conv_general_dilated form (batch-1 T(2,128) tiles, symmetric
        window padding) instead of its optimised 01bf rewrite
        (space-folded matmuls, T(8,128)); the rollout's gate convs run
        ~3x slower. optimization_barrier does not firewall it; tile size
        is irrelevant (rows=8192 e2e 112.9). See benchmarks/README.md.
    """
    from stp3_tpu.ops.pallas.gating import single_tpu_auto
    return single_tpu_auto('STP3_CONVNEXT', auto=train)
