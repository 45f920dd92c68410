"""Pallas TPU kernel: fused ConvGRU rollout with a VMEM-resident state.

The SpatialGRU passes (reference stp3/layers/temporal.py:11-57, consumed
by future_prediction.py:29-46) are the most serial part of the forward:
T<=9 dependent ConvGRU steps, each only ~18 GFLOP of 3x3 convs at
(200,200,64) but forced through HBM between every XLA op (concat ->
conv -> sigmoid -> concat -> conv -> combine). This kernel runs the WHOLE
rollout in one launch: the hidden state lives in VMEM across all T steps,
each step streams one x frame in and one state frame out through the
pallas pipeline, and the 3x3 convs are computed as 9 tap-shifted
contiguous matmuls on the MXU.

Layout trick (what makes the taps contiguous): every (H, W) plane is
stored flat with a (W+2)-stride per row — i.e. reshaped (H*(W+2), C) with
one zero pad column on each side of every row. In these coordinates a
SAME 3x3 conv tap (ky, kx) is ONE contiguous 2-D slice of the padded
input at offset (ky+2)*(W+2) + kx - 1 (p1 holds 3 leading pad rows), so
each tap is a single (H*(W+2), Cin) @ (Cin, Cout) dot. The two junk
column slots per row receive garbage products but never alias a real
output (the offset algebra maps junk to junk); a column mask re-zeroes
them in the carried state so the zero padding of the NEXT step's conv
stays exact.

VMEM budget at flagship (T=9, 200x200, Cx=Ch=64, bf16): p1 10.7 MB +
two fp32 gate/candidate accumulators 20.7 MB + state 5.2 MB + pipelined
in/out blocks ~21 MB =~ 60 MB of the v5e's 128 MB VMEM.

Forward-only: no custom_vjp (differentiating through it fails loudly).
The training path keeps the XLA cell; this kernel is for the serving /
full-recompute forward (opt-in via STP3_SPATIAL_GRU=pallas, read at
trace time in layers/temporal.py).

Cell math (must match layers.temporal.ConvGRUCell exactly):
    gates = conv3x3([x, h], Wg) + bg + gru_bias_init
    u, r  = sigmoid(gates[..., :Ch]), sigmoid(gates[..., Ch:])
    tilde = conv3x3([x, (1 - r) * h], Wc) + bc
    h'    = (1 - u) * h + u * tilde
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _col_mask(m: int, ch: int, s: int, lo: int, hi: int):
    """(m, ch) bool: True on real columns (flat index mod s in [lo, hi)),
    False on the junk pad slots. Built from a broadcasted iota so it costs
    registers, not VMEM (a (m, 1) input block would be lane-padded to 128
    and waste ~21 MB at flagship shape)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (m, ch), 0) % s
    return (col >= lo) & (col < hi)


def _rollout_kernel(x_ref, h0_ref, wu_ref, wr_ref, wc_ref, bu_ref, br_ref,
                    bc_ref, out_ref, h_ref, p1_ref, gu_ref, gr_ref,
                    *, hh: int, ww: int, cx: int, ch: int):
    """Grid (B, T): the minor dimension walks the GRU time steps of one
    sample; TPU grids run sequentially, so h_ref/p1_ref scratch persists
    across steps (same property the splat kernel's accumulator relies on)
    and the state is re-initialized whenever t wraps to 0.

    Shapes (S = ww + 2, M = hh * S):
      x_ref   (1, 1, M, cx)  this sample+step's input frame (flat padded)
      h0_ref  (1, M, ch)     this sample's initial state (read at t == 0)
      w*_ref  (9, cx+ch, ch) conv taps, k = ky*3 + kx (update/reset/cand)
      b*_ref  (1, ch)        fp32 biases (bu/br include gru_bias_init)
      out_ref (1, 1, M, ch)  this step's new state (pipeline writes HBM)
      h_ref   (M, ch)        persistent state scratch
      p1_ref  ((hh+6)*S, cx+ch)  padded conv input (3 pad rows + slack)
      gu/gr_ref (M, ch) fp32     update / reset accumulators
    """
    s = ww + 2
    m = hh * s
    bi = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((bi == 0) & (t == 0))
    def _():
        p1_ref[...] = jnp.zeros_like(p1_ref)   # pad rows/cols stay 0 forever

    @pl.when(t == 0)
    def _():
        h_ref[...] = h0_ref[0]

    # ---- build the conv input [x, h] (data rows sit at p1 rows 3..hh+2)
    p1_ref[pl.ds(3 * s, m), 0:cx] = x_ref[0, 0]
    p1_ref[pl.ds(3 * s, m), cx:] = h_ref[...]

    def conv9(w_ref, acc_ref):
        """acc[o] = sum_k p1[o + (ky+2)*s + kx - 1] @ w[k] — SAME 3x3 conv
        on the flat layout; each tap is one contiguous (M, Cin) slice."""
        acc_ref[...] = jnp.zeros_like(acc_ref)
        for ky in range(3):
            for kx in range(3):
                tap = p1_ref[pl.ds((ky + 2) * s + kx - 1, m)]
                acc_ref[...] += jnp.dot(tap, w_ref[ky * 3 + kx],
                                        preferred_element_type=jnp.float32)

    # ---- gates (both read the UNSCALED [x, h]; update before the scale)
    conv9(wu_ref, gu_ref)
    conv9(wr_ref, gr_ref)

    # ---- candidate input: scale the h half by (1 - reset) in place.
    # p1 h rows (global row i) sit at flat (i+3)*s + x + 1 = gate flat
    # coordinate + 3*s, so the slice below is exactly aligned; the junk
    # slots hold zeros (masked state) and stay zero under the multiply.
    reset = jax.nn.sigmoid(gr_ref[...] + br_ref[0])
    p1_ref[pl.ds(3 * s, m), cx:] = (
        p1_ref[pl.ds(3 * s, m), cx:] * (1.0 - reset).astype(p1_ref.dtype))

    conv9(wc_ref, gr_ref)   # reset acc is dead -> reuse as candidate acc

    # ---- combine + re-zero junk columns, persist and emit the new state
    update = jax.nn.sigmoid(gu_ref[...] + bu_ref[0])
    tilde = gr_ref[...] + bc_ref[0]
    h_old = h_ref[...].astype(jnp.float32)
    h_new = (1.0 - update) * h_old + update * tilde
    h_new = jnp.where(_col_mask(m, ch, s, 1, ww + 1), h_new, 0.0)
    h_ref[...] = h_new.astype(h_ref.dtype)
    out_ref[0, 0] = h_ref[...]


def conv_gru_rollout_pallas(x: jnp.ndarray, h0: jnp.ndarray,
                            wg: jnp.ndarray, bg: jnp.ndarray,
                            wc: jnp.ndarray, bc: jnp.ndarray,
                            gru_bias_init: float = 0.0) -> jnp.ndarray:
    """Fused T-step ConvGRU rollout (ONE pallas launch; grid = (B, T)).

    x  (B, T, H, W, Cx)   per-step inputs
    h0 (B, H, W, Ch)      initial state
    wg (3, 3, Cx+Ch, 2*Ch) gates conv kernel (HWIO, update | reset halves)
    bg (2*Ch,)            gates bias
    wc (3, 3, Cx+Ch, Ch)  candidate conv kernel
    bc (Ch,)              candidate bias
    Returns (B, T, H, W, Ch): the state after every step (pre-decoder).

    Forward-only (no VJP registered) — see module docstring.
    """
    b, t, hh, ww, cx = x.shape
    ch = h0.shape[-1]
    cin = cx + ch
    s = ww + 2
    m = hh * s

    # nn.Conv promotion semantics (dtype=None): common dtype of in/params
    dt = jnp.promote_types(x.dtype, wg.dtype)
    x = x.astype(dt)
    h0 = h0.astype(dt)

    # taps as (9, Cin, Ch) stacks; biases fp32 with the extra gru bias
    wu = wg[..., :ch].reshape(9, cin, ch).astype(dt)
    wr = wg[..., ch:].reshape(9, cin, ch).astype(dt)
    wc9 = wc.reshape(9, cin, ch).astype(dt)
    bu = (bg[:ch].astype(jnp.float32) + gru_bias_init).reshape(1, ch)
    br = (bg[ch:].astype(jnp.float32) + gru_bias_init).reshape(1, ch)
    bc1 = bc.astype(jnp.float32).reshape(1, ch)

    # flat padded layouts: one zero column on each side of every row
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    xp = xp.reshape(b, t, m, cx)
    hp = jnp.pad(h0, ((0, 0), (0, 0), (1, 1), (0, 0))).reshape(b, m, ch)

    kern = functools.partial(_rollout_kernel, hh=hh, ww=ww, cx=cx, ch=ch)
    vmem = pltpu.VMEM
    out = pl.pallas_call(
        kern,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, 1, m, cx), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, m, ch), lambda bi, ti: (bi, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((9, cin, ch), lambda bi, ti: (0, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((9, cin, ch), lambda bi, ti: (0, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((9, cin, ch), lambda bi, ti: (0, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, ch), lambda bi, ti: (0, 0), memory_space=vmem),
            pl.BlockSpec((1, ch), lambda bi, ti: (0, 0), memory_space=vmem),
            pl.BlockSpec((1, ch), lambda bi, ti: (0, 0), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((1, 1, m, ch), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((b, t, m, ch), dt),
        scratch_shapes=[
            pltpu.VMEM((m, ch), dt),                  # h
            pltpu.VMEM(((hh + 6) * s, cin), dt),      # p1 (3 pad rows + slack)
            pltpu.VMEM((m, ch), jnp.float32),         # update acc
            pltpu.VMEM((m, ch), jnp.float32),         # reset / candidate acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(xp, hp, wu, wr, wc9, bu, br, bc1)
    return out.reshape(b, t, hh, s, ch)[:, :, :, 1:ww + 1]
