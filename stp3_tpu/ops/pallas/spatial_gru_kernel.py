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

A hand-written VJP (the same reason the reference hand-writes
``VoxelsSumming``'s backward) makes the rollout training-grade: the
backward walks the grid in REVERSE time with the cotangent carry
VMEM-resident, recomputes the gates of each step from the saved states
(checkpoint-style — only the per-step states are residuals), lowers the
transposed convs as flipped-tap matmuls in the same flat layout, and
accumulates weight/bias grads into constant-index output blocks across
the whole grid. Gradient parity vs XLA autodiff through ConvGRUCell is
tested in interpret mode. The backward requires Cx == Ch (true at every
model call site); forward-only uses have no such restriction.

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


def _pad_flat(x, pad: int):
    """(..., H, W, C) -> (..., H*(W+2*pad), C): `pad` zero columns on each
    side of every row, rows flattened with the padded stride. The shared
    layout helper for both fused-rollout kernels (forward and backward)."""
    widths = [(0, 0)] * (x.ndim - 2) + [(pad, pad), (0, 0)]
    xp = jnp.pad(x, widths)
    return xp.reshape(x.shape[:-3] + (x.shape[-3] * (x.shape[-2] + 2 * pad),
                                      x.shape[-1]))


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def conv_gru_rollout_pallas(x: jnp.ndarray, h0: jnp.ndarray,
                            wg: jnp.ndarray, bg: jnp.ndarray,
                            wc: jnp.ndarray, bc: jnp.ndarray,
                            gru_bias_init: float = 0.0) -> jnp.ndarray:
    """Fused T-step ConvGRU rollout (ONE pallas launch; grid = (B, T)).
    Differentiable via the hand-written reverse-rollout kernel below
    (requires Cx == Ch for the backward).

    x  (B, T, H, W, Cx)   per-step inputs
    h0 (B, H, W, Ch)      initial state
    wg (3, 3, Cx+Ch, 2*Ch) gates conv kernel (HWIO, update | reset halves)
    bg (2*Ch,)            gates bias
    wc (3, 3, Cx+Ch, Ch)  candidate conv kernel
    bc (Ch,)              candidate bias
    Returns (B, T, H, W, Ch): the state after every step (pre-decoder).
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
    xp = _pad_flat(x, 1)
    hp = _pad_flat(h0, 1)

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


# =====================================================================
# Hand-written backward: reverse-time rollout, VMEM-resident carry
# =====================================================================
def _backward_kernel(x_ref, hprev_ref, dout_ref,
                     wux_ref, wuh_ref, wrx_ref, wrh_ref, wcx_ref, wch_ref,
                     tux_ref, tuh_ref, trx_ref, trh_ref, tcx_ref, tch_ref,
                     bu_ref, br_ref, bc_ref,
                     dx_ref, dh0_ref, dwux_ref, dwuh_ref, dwrx_ref,
                     dwrh_ref, dwcx_ref, dwch_ref, dbu_ref, dbr_ref,
                     dbc_ref,
                     carry_ref, su_ref, sr_ref, px_ref, ph_ref,
                     pg_ref, acc1_ref, acc2_ref,
                     *, hh: int, ww: int, ch: int, t_total: int):
    """Grid (B, T) walking time REVERSED (block index maps pick step
    t_total-1-ti). Per step: recompute u, r, q, til from (x_t, h_{t-1})
    exactly as the forward did, then backpropagate the GRU cell:

        h' = (1-u)*h + u*til,  til = conv_c([x, q]) + bc,  q = (1-r)*h
        u, r = sigmoid(conv_g([x, h]) + bg)

        g       = dout_t + carry                (dL/dh_t)
        du_pre  = (til - h) * g * u(1-u)
        dtil    = u * g
        carry   = (1-u) * g                      (dL/dh_{t-1}, grows below)
        d[x,q]  = conv_c^T(dtil);  dq = [.., ch:];  carry += (1-r) * dq
        dr_pre  = -h * dq * r(1-r)
        d[x,h] += conv_g^T([du_pre, dr_pre]);    carry += h-half
        dW_*   += input_tap^T @ d*_pre;  db_* += sum(d*_pre)

    conv^T is the same tap walk with flipped-transposed weights (t*_ref).
    x/h input halves live in separate padded buffers; ph alternates
    between holding h and q = (1-r)*h (a ~5 MB VPU refill each switch —
    cheaper than a fourth padded buffer against the VMEM budget). pg
    holds the padded d*_pre being convolved; its junk slots are exactly
    zero (every d*_pre is a product with g or h, whose junk slots are
    zero), so the weight-grad contractions are uncontaminated. The carry
    is re-masked each step, and dx accumulates in an fp32 output block
    (27 sequential bf16 adds would carry visible rounding noise into
    every upstream layer's gradient).

    VMEM at flagship bf16 (T=9, 200x200, Cx=Ch=64): scratch ~57 MB
    (carry/acc1/acc2 fp32 31, su/sr 10.4, px/ph/pg 15.9) + pipelined
    blocks ~57 MB (x/hprev/dout bf16 31, dx fp32 20.5, dh0 5.2) =~ 114
    of the 128 MB. fp32 inputs (PRECISION 32 configs) would roughly
    double that and fail loudly at compile — keep the XLA cell there
    (the trainer's bf16 policy casts params before apply, so training
    traces are bf16).
    """
    s = ww + 2
    m = hh * s
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    dt = px_ref.dtype
    interior = pl.ds(3 * s, m)
    mask = _col_mask(m, ch, s, 1, ww + 1)

    @pl.when((bi == 0) & (ti == 0))
    def _():
        px_ref[...] = jnp.zeros_like(px_ref)
        ph_ref[...] = jnp.zeros_like(ph_ref)
        pg_ref[...] = jnp.zeros_like(pg_ref)
        for r in (dwux_ref, dwuh_ref, dwrx_ref, dwrh_ref, dwcx_ref,
                  dwch_ref, dbu_ref, dbr_ref, dbc_ref):
            r[...] = jnp.zeros_like(r)

    @pl.when(ti == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    def taps_sum(dst, pairs, zero=True):
        """dst[...] (+)= sum over taps/pairs of shifted-slice matmuls
        (fp32 accumulation into an fp32 ref)."""
        first = zero
        for src_ref, w_ref in pairs:
            for k in range(9):
                start = (k // 3 + 2) * s + k % 3 - 1
                d = jnp.dot(src_ref[pl.ds(start, m)], w_ref[k],
                            preferred_element_type=jnp.float32)
                if first:
                    dst[...] = d
                    first = False
                else:
                    dst[...] += d

    def dw_taps(dw_ref, src_ref, dy):
        """dW[k] += shifted-input-slice^T @ dy (contract the M rows)."""
        for k in range(9):
            start = (k // 3 + 2) * s + k % 3 - 1
            dw_ref[k] += jax.lax.dot_general(
                src_ref[pl.ds(start, m)], dy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    # ---- recompute the forward step's gates ---------------------------
    px_ref[interior] = x_ref[0, 0]
    ph_ref[interior] = hprev_ref[0, 0]
    taps_sum(acc1_ref, [(px_ref, wux_ref), (ph_ref, wuh_ref)])
    su_ref[...] = jax.nn.sigmoid(acc1_ref[...] + bu_ref[0]).astype(dt)
    taps_sum(acc1_ref, [(px_ref, wrx_ref), (ph_ref, wrh_ref)])
    sr_ref[...] = jax.nn.sigmoid(acc1_ref[...] + br_ref[0]).astype(dt)
    hprev = hprev_ref[0, 0].astype(jnp.float32)
    ph_ref[interior] = (hprev * (1.0 - sr_ref[...].astype(jnp.float32))
                        ).astype(dt)                           # ph <- q
    taps_sum(acc1_ref, [(px_ref, wcx_ref), (ph_ref, wch_ref)])  # til - bc

    # ---- backward through the cell ------------------------------------
    acc2_ref[...] = dout_ref[0, 0].astype(jnp.float32) + carry_ref[...]  # g
    u = su_ref[...].astype(jnp.float32)
    til = acc1_ref[...] + bc_ref[0]
    carry_ref[...] = (1.0 - u) * acc2_ref[...]
    pg_ref[interior] = ((til - hprev) * acc2_ref[...]
                        * u * (1.0 - u)).astype(dt)            # du_pre
    ph_ref[interior] = hprev_ref[0, 0]                         # ph <- h
    dw_taps(dwux_ref, px_ref, pg_ref[interior])
    dw_taps(dwuh_ref, ph_ref, pg_ref[interior])
    dbu_ref[...] += jnp.sum(pg_ref[interior].astype(jnp.float32),
                            axis=0, keepdims=True)
    taps_sum(dx_ref.at[0, 0], [(pg_ref, tux_ref)])
    taps_sum(acc1_ref, [(pg_ref, tuh_ref)])
    carry_ref[...] += acc1_ref[...]

    pg_ref[interior] = (u * acc2_ref[...]).astype(dt)          # dtil
    r = sr_ref[...].astype(jnp.float32)
    ph_ref[interior] = (hprev * (1.0 - r)).astype(dt)          # ph <- q
    dw_taps(dwcx_ref, px_ref, pg_ref[interior])
    dw_taps(dwch_ref, ph_ref, pg_ref[interior])
    dbc_ref[...] += jnp.sum(pg_ref[interior].astype(jnp.float32),
                            axis=0, keepdims=True)
    taps_sum(dx_ref.at[0, 0], [(pg_ref, tcx_ref)], zero=False)
    taps_sum(acc1_ref, [(pg_ref, tch_ref)])                    # dq
    carry_ref[...] += (1.0 - r) * acc1_ref[...]

    pg_ref[interior] = (-hprev * acc1_ref[...]
                        * r * (1.0 - r)).astype(dt)            # dr_pre
    ph_ref[interior] = hprev_ref[0, 0]                         # ph <- h
    dw_taps(dwrx_ref, px_ref, pg_ref[interior])
    dw_taps(dwrh_ref, ph_ref, pg_ref[interior])
    dbr_ref[...] += jnp.sum(pg_ref[interior].astype(jnp.float32),
                            axis=0, keepdims=True)
    taps_sum(dx_ref.at[0, 0], [(pg_ref, trx_ref)], zero=False)
    taps_sum(acc2_ref, [(pg_ref, trh_ref)])
    carry_ref[...] += acc2_ref[...]
    carry_ref[...] = jnp.where(mask, carry_ref[...], 0.0)

    @pl.when(ti == t_total - 1)
    def _():
        dh0_ref[0] = carry_ref[...].astype(dt)


def _flip_t(w9):
    """(9, a, b) forward taps -> (9, b, a) transposed-conv taps."""
    return jnp.transpose(w9[::-1], (0, 2, 1))


def _rollout_fwd(x, h0, wg, bg, wc, bc, gru_bias_init):
    out = conv_gru_rollout_pallas(x, h0, wg, bg, wc, bc, gru_bias_init)
    return out, (x, h0, wg, bg, wc, bc, out)


def _rollout_bwd(gru_bias_init, res, dout):
    x, h0, wg, bg, wc, bc, out = res
    b, t, hh, ww, cx = x.shape
    ch = h0.shape[-1]
    assert cx == ch, (
        'conv_gru_rollout_pallas backward requires Cx == Ch (true at all '
        f'model call sites); got Cx={cx}, Ch={ch} — use the XLA cell path '
        'for gradients at this shape')
    s = ww + 2
    m = hh * s
    dt = jnp.promote_types(x.dtype, wg.dtype)

    xp = _pad_flat(x.astype(dt), 1)
    hprev = jnp.concatenate([h0[:, None], out[:, :-1]], axis=1)
    hprev_p = _pad_flat(hprev.astype(dt), 1)
    dout_p = _pad_flat(dout.astype(dt), 1)

    def split9(k):   # (3,3,cin,co) -> x-half and h-half tap stacks
        k9 = k.reshape(9, cx + ch, k.shape[-1]).astype(dt)
        return k9[:, :cx], k9[:, cx:]

    wux, wuh = split9(wg[..., :ch])
    wrx, wrh = split9(wg[..., ch:])
    wcx9, wch9 = split9(wc)
    bu = (bg[:ch].astype(jnp.float32) + gru_bias_init).reshape(1, ch)
    br = (bg[ch:].astype(jnp.float32) + gru_bias_init).reshape(1, ch)
    bc1 = bc.astype(jnp.float32).reshape(1, ch)

    kern = functools.partial(_backward_kernel, hh=hh, ww=ww, ch=ch,
                             t_total=t)
    vmem = pltpu.VMEM
    rev = lambda bi, ti: (bi, t - 1 - ti, 0, 0)          # noqa: E731
    w9 = lambda: pl.BlockSpec((9, cx, ch), lambda bi, ti: (0, 0, 0),  # noqa: E731
                              memory_space=vmem)
    b1 = lambda: pl.BlockSpec((1, ch), lambda bi, ti: (0, 0),  # noqa: E731
                              memory_space=vmem)
    pads = (hh + 6) * s

    outs = pl.pallas_call(
        kern,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, 1, m, cx), rev, memory_space=vmem),   # x
            pl.BlockSpec((1, 1, m, ch), rev, memory_space=vmem),   # hprev
            pl.BlockSpec((1, 1, m, ch), rev, memory_space=vmem),   # dout
            w9(), w9(), w9(), w9(), w9(), w9(),        # forward taps
            w9(), w9(), w9(), w9(), w9(), w9(),        # transposed taps
            b1(), b1(), b1(),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, m, cx), rev, memory_space=vmem),   # dx
            pl.BlockSpec((1, m, ch), lambda bi, ti: (bi, 0, 0),
                         memory_space=vmem),                       # dh0
            w9(), w9(), w9(), w9(), w9(), w9(),        # dW halves (f32)
            b1(), b1(), b1(),                          # db (f32)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, m, cx), jnp.float32),
            jax.ShapeDtypeStruct((b, m, ch), dt),
            jax.ShapeDtypeStruct((9, cx, ch), jnp.float32),
            jax.ShapeDtypeStruct((9, ch, ch), jnp.float32),
            jax.ShapeDtypeStruct((9, cx, ch), jnp.float32),
            jax.ShapeDtypeStruct((9, ch, ch), jnp.float32),
            jax.ShapeDtypeStruct((9, cx, ch), jnp.float32),
            jax.ShapeDtypeStruct((9, ch, ch), jnp.float32),
            jax.ShapeDtypeStruct((1, ch), jnp.float32),
            jax.ShapeDtypeStruct((1, ch), jnp.float32),
            jax.ShapeDtypeStruct((1, ch), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, ch), jnp.float32),   # carry
            pltpu.VMEM((m, ch), dt),            # u
            pltpu.VMEM((m, ch), dt),            # r
            pltpu.VMEM((pads, cx), dt),         # px
            pltpu.VMEM((pads, ch), dt),         # ph (h / q alternating)
            pltpu.VMEM((pads, ch), dt),         # pg (padded d*_pre)
            pltpu.VMEM((m, ch), jnp.float32),   # acc1
            pltpu.VMEM((m, ch), jnp.float32),   # acc2
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
            vmem_limit_bytes=127 * 1024 * 1024),
    )(xp, hprev_p, dout_p, wux, wuh, wrx, wrh, wcx9, wch9,
      _flip_t(wux), _flip_t(wuh), _flip_t(wrx), _flip_t(wrh),
      _flip_t(wcx9), _flip_t(wch9), bu, br, bc1)

    (dx_f, dh0_f, dwux, dwuh, dwrx, dwrh, dwcx, dwch, dbu, dbr,
     dbc) = outs
    dx = dx_f.reshape(b, t, hh, s, cx)[:, :, :, 1:ww + 1].astype(x.dtype)
    dh0 = dh0_f.reshape(b, hh, s, ch)[:, :, 1:ww + 1].astype(h0.dtype)

    def join(dwx, dwh, co):
        return jnp.concatenate([dwx, dwh], axis=1).reshape(3, 3, cx + ch, co)

    dwg = jnp.concatenate([join(dwux, dwuh, ch), join(dwrx, dwrh, ch)],
                          axis=-1).astype(wg.dtype)
    dwc = join(dwcx, dwch, ch).astype(wc.dtype)
    dbg = jnp.concatenate([dbu[0], dbr[0]]).astype(bg.dtype)
    return dx, dh0, dwg, dbg, dwc, dbc[0].astype(bc.dtype)


conv_gru_rollout_pallas.defvjp(_rollout_fwd, _rollout_bwd)
