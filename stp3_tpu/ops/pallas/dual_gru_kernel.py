"""Pallas TPU kernel: fused DualGRU future rollout with VMEM-resident state.

The DualGRU (reference stp3/layers/temporal.py:59-160, rebuilt in
layers/temporal.py:DualGRU) rolls ``n_future`` steps; each step runs a
latent-driven ConvGRU (cell 1, with the constant latent's conv
contribution pre-hoisted — see _LatentGRUCell), an autoregressive ConvGRU
(cell 2), a 3x3 decoder conv, and a "trusting gate" (Bottleblock with a
7x7 conv + three LayerNorm/GELU stages + a 1x1 skip, then a 1x1 head +
2-way softmax) that mixes the two pathways. In XLA every one of those
~20 ops round-trips (200,200,64+) activations through HBM per step; here
the whole rollout is ONE launch with all carried state in VMEM, built on
the same flat-padded tap-matmul scheme as spatial_gru_kernel.py but with
a (W+6) row stride so the 7x7 conv's taps are contiguous slices too
(3 zero pad columns per side; 4 leading pad rows so every tap offset is
non-negative; junk-to-junk offset algebra as before).

Semantics fused (must match layers.temporal exactly). CONTRACT: valid
ONLY for mixture=True (the flagship config) — the mixing step makes
s1 == s2 at every step entry, so ONE resident state carries both
pathways. mixture=False keeps distinct s1/s2 and would silently compute
the wrong rollout here; the only caller (the DualGRU STP3_DUAL_GRU
hatch, layers/temporal.py) routes to this kernel exclusively when
self.mixture is True and falls through to the XLA cells otherwise:
  s1' = _LatentGRUCell(x_maps, s)         # gx/cxm hoisted, computed in XLA
  hh' = ConvGRUCell(s, hh)                # note input is s (== s2 == s1)
  s2' = conv3x3(hh') + bd
  gate = softmax(trust(concat[s1', s2']))  # = sigmoid of the logit diff
  cur  = s2'*gate[...,0] + s1'*gate[...,1];  s <- cur
GELU matches convolutions.gelu's dtype gate (tanh-approx for bf16, exact
erf for fp32); LayerNorm stats run fp32 with flax's rsqrt(var + 1e-6).

Forward-only, opt-in via STP3_DUAL_GRU=pallas (trace-time, in DualGRU);
training keeps the XLA cells. The 2-step warm-up over past states reuses
conv_gru_rollout_pallas with cell 2's weights.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stp3_tpu.ops.pallas.spatial_gru_kernel import _col_mask, _pad_flat


def _ln_gelu(v, scale, bias, dt, exact: bool):
    """flax nn.LayerNorm(eps=1e-6) + convolutions.gelu on fp32 stats."""
    mu = jnp.mean(v, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(v - mu), axis=-1, keepdims=True)
    y = (v - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias
    return jax.nn.gelu(y.astype(dt), approximate=not exact).astype(jnp.float32)


def _rollout_kernel(gxu_ref, gxr_ref, cxm_ref, s0_ref, hh0_ref,
                    k1u_ref, k1r_ref, k1c_ref, k2u_ref, k2r_ref, k2c_ref,
                    kd_ref, k7_ref, k1x1_ref, k3t_ref, kskip_ref, kdiff_ref,
                    bg2u_ref, bg2r_ref, bc2_ref, bd_ref,
                    ln0s_ref, ln0b_ref, ln1s_ref, ln1b_ref, ln2s_ref,
                    ln2b_ref, out_ref,
                    s_ref, hh_ref, pa_ref, pb_ref, pc_ref, acca_ref,
                    accb_ref, sem,
                    *, hh_rows: int, ww: int, ch: int, exact_gelu: bool):
    """Grid (B, T): minor dim walks one sample's future steps (state
    re-initialized when t wraps to 0). S = ww+6; M = hh_rows*S; data rows
    sit at p rows 4..hh_rows+3, data cols at slots 3..ww+2. Tap offset for
    a KxK conv: (ky - K//2 + 4)*S + (kx - K//2). Buffer roles:
      pa (M-pad, 2ch)  cell2 [s, hh] input, then the trust-gate mix
      pb (M-pad, 2ch)  7x7 trust input (kept across trust stages)
      pc (M-pad, ch)   cell1 s / decoder hh' / trust t1 (reused serially)
      acca/accb (M, ch) fp32 tap accumulators (lifetimes in comments)
    """
    s = ww + 6
    m = hh_rows * s
    bi = pl.program_id(0)
    t = pl.program_id(1)
    dt = s_ref.dtype

    @pl.when((bi == 0) & (t == 0))
    def _():
        pa_ref[...] = jnp.zeros_like(pa_ref)
        pb_ref[...] = jnp.zeros_like(pb_ref)
        pc_ref[...] = jnp.zeros_like(pc_ref)

    @pl.when(t == 0)
    def _():
        cp = pltpu.make_async_copy(s0_ref.at[bi], s_ref, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(hh0_ref.at[bi], hh_ref, sem)
        cp2.start()
        cp2.wait()

    def taps(src_ref, w_ref, k, acc_ref):
        half = k // 2
        acc_ref[...] = jnp.zeros_like(acc_ref)
        for ky in range(k):
            for kx in range(k):
                start = (ky - half + 4) * s + (kx - half)
                acc_ref[...] += jnp.dot(src_ref[pl.ds(start, m)],
                                        w_ref[ky * k + kx],
                                        preferred_element_type=jnp.float32)

    # register-resident junk-column mask (see spatial_gru_kernel._col_mask)
    mask = _col_mask(m, ch, s, 3, ww + 3)
    interior = pl.ds(4 * s, m)

    # ---- cell 1 (latent GRU): state-half convs on padded s ------------
    pc_ref[interior] = s_ref[...]
    taps(pc_ref, k1u_ref, 3, acca_ref)          # acca = u1 conv
    taps(pc_ref, k1r_ref, 3, accb_ref)          # accb = r1 conv
    r1 = jax.nn.sigmoid(accb_ref[...] + gxr_ref[0].astype(jnp.float32))
    pc_ref[interior] = (pc_ref[interior].astype(jnp.float32)
                        * (1.0 - r1)).astype(dt)
    taps(pc_ref, k1c_ref, 3, accb_ref)          # accb = til1 conv (r1 dead)
    u1 = jax.nn.sigmoid(acca_ref[...] + gxu_ref[0].astype(jnp.float32))
    til1 = cxm_ref[0].astype(jnp.float32) + accb_ref[...]
    s1 = jnp.where(mask, (1.0 - u1) * s_ref[...].astype(jnp.float32)
                   + u1 * til1, 0.0)

    # ---- cell 2: [s, hh] -> hh' ---------------------------------------
    pa_ref[interior, 0:ch] = s_ref[...]
    pa_ref[interior, ch:] = hh_ref[...]
    taps(pa_ref, k2u_ref, 3, acca_ref)          # acca = u2 conv (u1 dead)
    taps(pa_ref, k2r_ref, 3, accb_ref)          # accb = r2 conv
    r2 = jax.nn.sigmoid(accb_ref[...] + bg2r_ref[0])
    pa_ref[interior, ch:] = (pa_ref[interior, ch:].astype(jnp.float32)
                             * (1.0 - r2)).astype(dt)
    taps(pa_ref, k2c_ref, 3, accb_ref)          # accb = til2 conv
    u2 = jax.nn.sigmoid(acca_ref[...] + bg2u_ref[0])
    hh_new = ((1.0 - u2) * hh_ref[...].astype(jnp.float32)
              + u2 * (accb_ref[...] + bc2_ref[0]))
    hh_ref[...] = jnp.where(mask, hh_new, 0.0).astype(dt)

    # ---- decoder2 + the trust-gate mix --------------------------------
    pc_ref[interior] = hh_ref[...]
    taps(pc_ref, kd_ref, 3, acca_ref)           # acca = s2' - bd (LIVE to end)
    pb_ref[interior, 0:ch] = s1.astype(dt)      # s1 is masked above
    pb_ref[interior, ch:] = jnp.where(
        mask, acca_ref[...] + bd_ref[0], 0.0).astype(dt)

    # ---- trusting gate: Bottleblock + 1x1 head as a sigmoid of the
    # 2-way logit difference (softmax([a,b])[1] == sigmoid(b - a)) -------
    taps(pb_ref, k7_ref, 7, accb_ref)           # accb = 7x7 conv
    t0 = _ln_gelu(accb_ref[...], ln0s_ref[0], ln0b_ref[0], dt, exact_gelu)
    t1 = _ln_gelu(jnp.dot(t0.astype(dt), k1x1_ref[...],
                          preferred_element_type=jnp.float32),
                  ln1s_ref[0], ln1b_ref[0], dt, exact_gelu)
    pc_ref[interior] = jnp.where(mask, t1, 0.0).astype(dt)
    taps(pc_ref, k3t_ref, 3, accb_ref)          # accb = 3x3 conv (t0 dead)
    t2 = _ln_gelu(accb_ref[...], ln2s_ref[0], ln2b_ref[0], dt, exact_gelu)
    skip = jax.nn.gelu(
        jnp.dot(pb_ref[interior], kskip_ref[...],
                preferred_element_type=jnp.float32).astype(dt),
        approximate=not exact_gelu).astype(jnp.float32)
    tb = t2 + skip
    g1 = jax.nn.sigmoid(jnp.dot(tb.astype(dt), kdiff_ref[...],
                                preferred_element_type=jnp.float32))

    # ---- mix, carry, emit ---------------------------------------------
    s2 = pb_ref[interior, ch:].astype(jnp.float32)
    s1m = pb_ref[interior, 0:ch].astype(jnp.float32)
    cur = jnp.where(mask, s2 * (1.0 - g1) + s1m * g1, 0.0)
    s_ref[...] = cur.astype(dt)
    out_ref[0, 0] = s_ref[...]


def dual_gru_rollout_pallas(gx, cxm, s0, hh0, n_future: int, params,
                            gru_bias_init: float = 0.0,
                            exact_gelu=None) -> jnp.ndarray:
    """Fused DualGRU rollout (ONE launch, grid = (B, n_future); forward-only).

    gx  (B, H, W, 2Ch)  hoisted cell-1 gates x-map (bias included)
    cxm (B, H, W, Ch)   hoisted cell-1 candidate x-map (bias included)
    s0  (B, H, W, Ch)   initial mixed state (state[:, -1])
    hh0 (B, H, W, Ch)   warmed-up cell-2 hidden
    params: dict with cell1/cell2 {gates,candidate}{kernel,bias},
      decoder2 {kernel,bias}, trusting_gate layers_0 (Bottleblock
      Conv_0..3 + LayerNorm_0..2) and layers_1 {kernel} — the exact
      DualGRU subtree (see layers/temporal.DualGRU).
    Returns (B, n_future, H, W, Ch) of mixed states.
    """
    b, hh_rows, ww, ch = s0.shape
    s = ww + 6
    m = hh_rows * s

    dt = jnp.promote_types(s0.dtype, params['cell2']['gates']['kernel'].dtype)
    if exact_gelu is None:
        exact_gelu = dt != jnp.bfloat16

    def taps9(k):   # (3,3,Cin,Cout) -> (9,Cin,Cout)
        return k.reshape(9, k.shape[2], k.shape[3]).astype(dt)

    latent = params['cell1']['gates']['kernel'].shape[2] - ch
    k1g = params['cell1']['gates']['kernel'][:, :, latent:, :]
    k1u, k1r = taps9(k1g[..., :ch]), taps9(k1g[..., ch:])
    k1c = taps9(params['cell1']['candidate']['kernel'][:, :, latent:, :])
    k2g = params['cell2']['gates']['kernel']
    k2u, k2r = taps9(k2g[..., :ch]), taps9(k2g[..., ch:])
    k2c = taps9(params['cell2']['candidate']['kernel'])
    kd = taps9(params['decoder2']['kernel'])
    tg = params['trusting_gate']
    bb = tg['layers_0']
    k7 = bb['Conv_0']['kernel'].reshape(49, 2 * ch, ch).astype(dt)
    k1x1 = bb['Conv_1']['kernel'].reshape(ch, ch).astype(dt)
    k3t = taps9(bb['Conv_2']['kernel'])
    kskip = bb['Conv_3']['kernel'].reshape(2 * ch, ch).astype(dt)
    khead = tg['layers_1']['kernel'].reshape(ch, 2)
    kdiff = (khead[:, 1:2] - khead[:, 0:1]).astype(dt)

    def b32(v):
        return v.astype(jnp.float32).reshape(1, -1)

    bg2 = params['cell2']['gates']['bias'].astype(jnp.float32) + gru_bias_init
    bg2u, bg2r = bg2[:ch].reshape(1, ch), bg2[ch:].reshape(1, ch)
    bc2 = b32(params['cell2']['candidate']['bias'])
    bd = b32(params['decoder2']['bias'])
    ln0s, ln0b = b32(bb['LayerNorm_0']['scale']), b32(bb['LayerNorm_0']['bias'])
    ln1s, ln1b = b32(bb['LayerNorm_1']['scale']), b32(bb['LayerNorm_1']['bias'])
    ln2s, ln2b = b32(bb['LayerNorm_2']['scale']), b32(bb['LayerNorm_2']['bias'])

    gxf = _pad_flat((gx + gru_bias_init).astype(dt), 3)
    gxu, gxr = gxf[..., :ch], gxf[..., ch:]
    cxmf = _pad_flat(cxm.astype(dt), 3)
    s0f = _pad_flat(s0.astype(dt), 3)
    hh0f = _pad_flat(hh0.astype(dt), 3)

    kern = functools.partial(_rollout_kernel, hh_rows=hh_rows, ww=ww, ch=ch,
                             exact_gelu=bool(exact_gelu))
    vspec = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    const2 = lambda shp: vspec(shp, lambda bi, ti: (0, 0))        # noqa: E731
    const3 = lambda shp: vspec(shp, lambda bi, ti: (0, 0, 0))     # noqa: E731
    per_b = lambda shp: vspec(                                    # noqa: E731
        (1,) + shp, lambda bi, ti: (bi,) + (0,) * len(shp))
    call = pl.pallas_call(
        kern,
        grid=(b, n_future),
        in_specs=[
            per_b((m, ch)), per_b((m, ch)), per_b((m, ch)),   # gxu gxr cxm
            pl.BlockSpec(memory_space=pl.ANY),               # s0 (DMA'd)
            pl.BlockSpec(memory_space=pl.ANY),               # hh0 (DMA'd)
            const3((9, ch, ch)), const3((9, ch, ch)), const3((9, ch, ch)),
            const3((9, 2 * ch, ch)), const3((9, 2 * ch, ch)),
            const3((9, 2 * ch, ch)), const3((9, ch, ch)),
            const3((49, 2 * ch, ch)), const2((ch, ch)),
            const3((9, ch, ch)), const2((2 * ch, ch)), const2((ch, 1)),
            const2((1, ch)), const2((1, ch)), const2((1, ch)), const2((1, ch)),
            const2((1, ch)), const2((1, ch)), const2((1, ch)), const2((1, ch)),
            const2((1, ch)), const2((1, ch)),
        ],
        out_specs=vspec((1, 1, m, ch), lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_future, m, ch), dt),
        scratch_shapes=[
            pltpu.VMEM((m, ch), dt),                  # s
            pltpu.VMEM((m, ch), dt),                  # hh
            pltpu.VMEM(((hh_rows + 8) * s, 2 * ch), dt),   # pa
            pltpu.VMEM(((hh_rows + 8) * s, 2 * ch), dt),   # pb
            pltpu.VMEM(((hh_rows + 8) * s, ch), dt),       # pc
            pltpu.VMEM((m, ch), jnp.float32),         # acca
            pltpu.VMEM((m, ch), jnp.float32),         # accb
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
            vmem_limit_bytes=120 * 1024 * 1024),
    )

    out = call(gxu, gxr, cxmf, s0f, hh0f,
               k1u, k1r, k1c, k2u, k2r, k2c, kd, k7, k1x1, k3t, kskip,
               kdiff, bg2u, bg2r, bc2, bd, ln0s, ln0b, ln1s, ln1b,
               ln2s, ln2b)
    return out.reshape(b, n_future, hh_rows, s, ch)[:, :, :, 3:ww + 3]
