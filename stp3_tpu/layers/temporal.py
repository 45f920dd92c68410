"""Temporal layers: convolutional GRUs and causal 3-D conv blocks.

Functional equivalents of the reference's stp3/layers/temporal.py
(SpatialGRU :11-57, Dual_GRU :59-160, BiGRU :162-249, CausalConv3d
:252-273, Bottleneck3D :328-372, PyramidSpatioTemporalPooling :375-423,
TemporalBlock :426-489).

TPU-first deviations: all python time loops are ``lax.scan``/``nn.scan``
(single trace, compiler-scheduled); tensors are time-major-in-batch
channels-last: 2-D (B, H, W, C), sequences (B, T, H, W, C); 3-D convs run
directly on (B, T, H, W, C) with left-only temporal padding for causality.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stp3_tpu.layers.convolutions import Bottleblock, ConvNeXtBlock, DeepLabHead, Norm, resize_bilinear


class ConvGRUCell(nn.Module):
    """Convolutional GRU cell (reference SpatialGRU.gru_cell, temporal.py:44-57).

    The update and reset gates share the same input, so their two 3x3 convs
    are fused into one conv with 2x hidden outputs — halves the sequential
    conv dispatches in the (deeply serial) GRU rollouts.

    NEGATIVE result (round 2, do not retry): computing both cell convs
    concat-free on a split kernel (conv(x, K[:,:,:Cx]) + conv(s,
    K[:,:,Cx:])) wins 6.1 -> 3.6 ms on a standalone 9-step rollout at
    (200,200,64) bf16, but REGRESSES the full flagship path 92.3 ->
    99.0 ms: in the real graph the batch-1 convs run in space-to-batch
    layouts, and the split doubles the conv-input staging + output
    materialization that the standalone probe doesn't see."""
    hidden_size: int
    gru_bias_init: float = 0.0

    @nn.compact
    def __call__(self, x, state):
        xs = jnp.concatenate([x, state], axis=-1)
        gates = nn.Conv(2 * self.hidden_size, (3, 3), padding='SAME',
                        name='gates')(xs) + self.gru_bias_init
        update = nn.sigmoid(gates[..., :self.hidden_size])
        reset = nn.sigmoid(gates[..., self.hidden_size:])
        tilde = nn.Conv(self.hidden_size, (3, 3), padding='SAME', name='candidate')(
            jnp.concatenate([x, (1.0 - reset) * state], axis=-1))
        return (1.0 - update) * state + update * tilde


class _RawConv(nn.Module):
    """SAME conv with directly-declared {kernel, bias} params (same
    shapes/init as nn.Conv) that can be applied to an input-channel SLICE
    of the kernel. Lets a caller hoist the contribution of a
    loop-invariant input out of a serial rollout — or mirror an nn.Conv's
    param tree without computing (fused pallas rollouts) — while keeping
    checkpoints / the torch importer unaffected."""
    features: int
    cin: int
    kernel_size: Tuple[int, int] = (3, 3)
    use_bias: bool = True

    def setup(self):
        kh, kw = self.kernel_size
        self.kernel = self.param('kernel', nn.initializers.lecun_normal(),
                                 (kh, kw, self.cin, self.features))
        if self.use_bias:
            self.bias = self.param('bias', nn.initializers.zeros,
                                   (self.features,))

    def slice_apply(self, x, lo: int, hi: Optional[int], with_bias: bool):
        # promote like nn.Conv (dtype=None -> common dtype of input and
        # params): fp32 params + bf16 input must compute in fp32, not
        # silently downcast the kernel — keeps _LatentGRUCell numerically
        # interchangeable with ConvGRUCell under any precision mix
        dt = jnp.promote_types(x.dtype, self.kernel.dtype)
        k = self.kernel[:, :, lo:hi].astype(dt)
        x = x.astype(dt)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ('NHWC', 'HWIO', 'NHWC'))
        out = jax.lax.conv_general_dilated(x, k, (1, 1), 'SAME',
                                           dimension_numbers=dn)
        return out + self.bias.astype(out.dtype) if with_bias else out


class _LatentGRUCell(nn.Module):
    """ConvGRUCell specialisation for a rollout whose input x is the SAME
    array every step (DualGRU cell 1: x = the latent sample). The x-half
    of both cell convs (conv(concat([x, s]), K) == conv(x, K[:,:,:Cx]) +
    conv(s, K[:,:,Cx:])) is loop-invariant, so ``x_maps`` computes it
    once and the serial rollout only convolves the state half — 33% less
    conv input per step and no concat staging. Same math and the same
    param tree as ConvGRUCell ({gates, candidate}/{kernel, bias}); only
    fp reassociation differs.

    (This is NOT the reverted whole-cell split — per step there is still
    exactly ONE conv per gate, now on fewer channels; the x conv runs
    once per rollout instead of once per step.)"""
    hidden_size: int
    x_channels: int
    gru_bias_init: float = 0.0

    def setup(self):
        cin = self.x_channels + self.hidden_size
        self.gates = _RawConv(2 * self.hidden_size, cin)
        self.candidate = _RawConv(self.hidden_size, cin)

    def x_maps(self, x):
        """Precompute the x-half contributions (call once per rollout)."""
        cx = self.x_channels
        return (self.gates.slice_apply(x, 0, cx, with_bias=True),
                self.candidate.slice_apply(x, 0, cx, with_bias=True))

    def __call__(self, x_maps, state):
        gx, cx_map = x_maps
        cx = self.x_channels
        h = self.hidden_size
        gates = (gx + self.gates.slice_apply(state, cx, None, with_bias=False)
                 + self.gru_bias_init)
        update = nn.sigmoid(gates[..., :h])
        reset = nn.sigmoid(gates[..., h:])
        tilde = cx_map + self.candidate.slice_apply(
            (1.0 - reset) * state, cx, None, with_bias=False)
        return (1.0 - update) * state + update * tilde


# NOTE (rounds 2-3, negative results — do not rebuild without new
# evidence): two fused whole-rollout pallas kernels lived here
# (ops/pallas/{spatial_gru,dual_gru}_kernel.py, removed round 3; see git
# history for the implementations and hand-written reverse-time VJP).
#   * SpatialGRU rollout: PERMANENT Mosaic compile fail at flagship scale
#     ("Ran out of memory in memory space vmem. Used 143.65M of 128.00M"
#     after a ~27 min remote compile) — the double-buffered per-timestep
#     (1,1,40400,64) windows + the VMEM-resident (40400,128) gate scratch
#     cannot coexist with the carried 200x200x64 state.
#   * DualGRU rollout: the e2e A/B timed out a 1800 s slot still
#     compiling; honest rollout cost is ~10 ms (the round-2 1.17 ms
#     number was a dead-code-eliminated chain — benchmarks/README.md),
#     and pallas consumers of rollout outputs de-optimise the producer
#     convs (the round-3 layout-poisoning finding), so the ceiling never
#     justified the compile-time risk.


class SpatialGRU(nn.Module):
    """Scan a ConvGRU over (B, T, H, W, C); per-step 1x1 conv decoder
    (reference temporal.py:11-57)."""
    input_size: int
    hidden_size: int
    gru_bias_init: float = 0.0
    # MODEL.REMAT tag 'cells': checkpoint each cell invocation so the
    # backward recomputes the gate convs step-LOCALLY from the saved
    # (x_t, h_{t-1}) instead of storing every gate tensor. Unlike
    # rematting the whole rollout ('future' — a measured LOSS, queue6:
    # 549.9 vs 479.2 ms, the recompute re-runs the serial chain), the
    # per-step states stay saved, so no serial recompute happens.
    remat_cells: bool = False

    @nn.compact
    def __call__(self, x, state: Optional[jnp.ndarray] = None):
        b, t, h, w, _ = x.shape
        if state is None:
            state = jnp.zeros((b, h, w, self.hidden_size), x.dtype)
        decoder = nn.Conv(self.input_size, (1, 1), use_bias=False, name='decoder')

        cell_cls = nn.remat(ConvGRUCell) if self.remat_cells else ConvGRUCell
        cell = cell_cls(self.hidden_size, self.gru_bias_init, name='cell')
        # UNROLLED python loop, not nn.scan: T <= 9 here, and the scan's
        # per-step dynamic slice/stack costs more than it saves — measured
        # 17.0 -> 5.7 ms for one standalone 9-step pass at (200,200,64) on
        # v5e (host-chain numbers near the ~5.5 ms dispatch floor, so the
        # RATIO is indicative, not the absolute; the unroll also carried
        # bench.py e2e wins); the python-unrolled DualGRU was already far
        # cheaper per conv than the scanned SpatialGRU
        states = []
        for i in range(t):
            state = cell(x[:, i], state)
            states.append(state)
        return decoder(jnp.stack(states, axis=1))


class DualGRU(nn.Module):
    """Dual-pathway future rollout (reference Dual_GRU, temporal.py:59-160).

    Cell 1 is driven by the (fixed) latent sample; cell 2 rolls an
    autoregressive state; a learned 2-way softmax "trusting gate" mixes them.
    Warm-up passes the past states through cell 2 first.
    """
    input_size: int   # latent dim
    hidden_size: int  # state channels
    n_future: int
    mixture: bool = True
    gru_bias_init: float = 0.0
    remat_cells: bool = False  # see SpatialGRU.remat_cells

    @nn.compact
    def __call__(self, x, state):
        """x: (B, 1, H, W, latent); state: (B, n_present, H, W, C)."""
        assert x.shape[-1] == self.input_size
        n_present = state.shape[1]
        # cell 1's input is the SAME latent sample every step -> hoist its
        # conv contributions out of the serial rollout (_LatentGRUCell)
        cell1_cls = (nn.remat(_LatentGRUCell) if self.remat_cells
                     else _LatentGRUCell)  # remat wraps __call__ only;
        #                                    x_maps (hoisted) stays plain
        cell2_cls = nn.remat(ConvGRUCell) if self.remat_cells else ConvGRUCell
        cell1 = cell1_cls(self.hidden_size, self.input_size,
                          self.gru_bias_init, name='cell1')
        cell2 = cell2_cls(self.hidden_size, self.gru_bias_init, name='cell2')
        decoder2 = nn.Conv(self.hidden_size, (3, 3), padding='SAME', name='decoder2')
        trust = nn.Sequential([Bottleblock(self.hidden_size),
                               nn.Conv(2, (1, 1), use_bias=False)], name='trusting_gate')

        # warm-up: h <- cell2(state_t, h) over the past (reference :100-102)
        h = state[:, 0]
        for t in range(n_present - 1):
            h = cell2(state[:, t], h)

        rnn_state1 = state[:, -1]
        rnn_state2 = state[:, -1]
        x0_maps = cell1.x_maps(x[:, 0])

        def step(carry, _):
            s1, s2, hh = carry
            s1 = cell1(x0_maps, s1)
            hh = cell2(s2, hh)
            s2 = decoder2(hh)
            mix = jnp.concatenate([s1, s2], axis=-1)
            gate = nn.softmax(trust(mix), axis=-1)
            cur = s2 * gate[..., 0:1] + s1 * gate[..., 1:2]
            if self.mixture:
                s1 = cur
                s2 = cur
            return (s1, s2, hh), cur

        # unrolled python loop keeps flax param-sharing simple; n_future <= 6
        carry = (rnn_state1, rnn_state2, h)
        outs = []
        for _ in range(self.n_future):
            carry, cur = step(carry, None)
            outs.append(cur)
        return jnp.stack(outs, axis=1)  # (B, n_future, H, W, C)


class BiGRU(nn.Module):
    """Bidirectional conv-GRU (reference temporal.py:162-249; defined but
    unused in the reference forward path — kept for API parity and
    oracle-tested like the live GRUs, tests/test_module_parity.py).

    Reference quirk NOT reproduced: its res_blocks build
    ``Block(in_channels, in_channels)`` (temporal.py:184-185), passing
    in_channels as ConvNeXt Block's 2nd positional arg — ``drop_path`` —
    i.e. a stochastic-depth RATE of ``in_channels``. Identity at eval
    (timm DropPath is a no-op outside training), nonsense at train; this
    port uses drop-path 0, which is eval-equivalent."""
    in_channels: int
    gru_bias_init: float = 0.0

    @nn.compact
    def __call__(self, x):
        b, s, h, w, c = x.shape
        cell1 = ConvGRUCell(self.in_channels, self.gru_bias_init, name='cell1')
        cell2 = ConvGRUCell(self.in_channels, self.gru_bias_init, name='cell2')
        dec1 = Bottleblock(self.in_channels, name='decoder1')
        dec2 = Bottleblock(self.in_channels, name='decoder2')

        s1, s2 = x[:, 0], x[:, -1]
        f_states, b_states = [], []
        for t in range(s):
            s1 = cell1(x[:, t], s1)
            s2 = cell2(x[:, s - t - 1], s2)
            f_states.append(dec1(s1))
            b_states.append(dec2(s2))
        states = jnp.concatenate([jnp.stack(f_states, 1), jnp.stack(b_states[::-1], 1)], axis=-1)
        flat = states.reshape(b * s, h, w, states.shape[-1])
        flat = Bottleblock(self.in_channels)(flat)
        flat = ConvNeXtBlock()(flat)
        flat = ConvNeXtBlock()(flat)
        return flat.reshape(b, s, h, w, self.in_channels)


class CausalConv3d(nn.Module):
    """3-D conv with left-only temporal padding, norm + relu
    (reference temporal.py:252-273). Input (B, T, H, W, C).

    TPU-first lowering: a (kt, kh, kw) causal conv is computed as kt
    temporally-shifted 2-D convs batched over (B*T) frames — XLA's TPU
    3-D conv path is far slower than its tuned 2-D conv for tiny T.
    Mathematically identical to the VALID 3-D conv on a left-padded input."""
    out_channels: int
    kernel_size: Tuple[int, int, int] = (2, 3, 3)
    dilation: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        dt, dh, dw = self.dilation
        b, t, h, w, cin = x.shape
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (kt, kh, kw, cin, self.out_channels), x.dtype)

        flat = x.reshape(b * t, h, w, cin)
        dn = jax.lax.conv_dimension_numbers(
            flat.shape, (kh, kw, cin, self.out_channels),
            ('NHWC', 'HWIO', 'NHWC'))
        hpad = ((kh - 1) * dh) // 2
        wpad = ((kw - 1) * dw) // 2

        out = None
        for k in range(kt):
            conv = jax.lax.conv_general_dilated(
                flat, kernel[k].astype(x.dtype), window_strides=(1, 1),
                padding=((hpad, hpad), (wpad, wpad)), rhs_dilation=(dh, dw),
                dimension_numbers=dn)
            conv = conv.reshape(b, t, h, w, self.out_channels)
            # kernel tap k sees frame t - (kt - 1 - k) * dt (causal: left pad)
            shift = (kt - 1 - k) * dt
            if shift:
                conv = jnp.pad(conv, ((0, 0), (shift, 0), (0, 0), (0, 0), (0, 0)))[:, :t]
            out = conv if out is None else out + conv
        return nn.relu(Norm()(out))


class Conv1x1x1NormActivated(nn.Module):
    """1x1x1 3-D conv + norm + relu (reference temporal.py:315-325).
    A 1x1x1 conv is a per-position channel matmul -> Dense (identical,
    avoids the TPU 3-D conv lowering)."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_channels, use_bias=False)(x)
        return nn.relu(Norm()(x))


class Bottleneck3D(nn.Module):
    """3-D bottleneck with causal conv and residual (reference temporal.py:328-372)."""
    out_channels: Optional[int] = None
    kernel_size: Tuple[int, int, int] = (2, 3, 3)
    dilation: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        h = Conv1x1x1NormActivated(in_ch // 2)(x)
        h = CausalConv3d(in_ch // 2, self.kernel_size, self.dilation)(h)
        h = Conv1x1x1NormActivated(out_ch)(h)
        if out_ch != in_ch:
            skip = nn.Dense(out_ch, use_bias=False)(x)
            skip = Norm()(skip)
        else:
            skip = x
        return h + skip


class PyramidSpatioTemporalPooling(nn.Module):
    """Causal spatio-temporal average-pyramid pooling
    (reference temporal.py:375-423). Input/out (B, T, H, W, C)."""
    reduction_channels: int
    pool_sizes: Sequence[Tuple[int, int, int]]

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        out = []
        for pool_size in self.pool_sizes:
            kt, kh, kw = pool_size
            assert kt == 2, 'time kernel must be 2 (matches reference)'
            # causal time pad of kt-1 on the left; average ignores padding
            # (count_include_pad=False): implement by averaging pairs of
            # spatially-pooled frames with a leading duplicate-free edge.
            xp = nn.avg_pool(x.reshape(b * t, h, w, c), (kh, kw), strides=(kh, kw),
                             padding='VALID' if (h % kh == 0 and w % kw == 0) else 'SAME')
            hp, wp = xp.shape[1:3]
            xp = xp.reshape(b, t, hp, wp, c)
            # temporal average over (t-1, t); at t=0 only frame 0 contributes
            prev = jnp.concatenate([xp[:, :1], xp[:, :-1]], axis=1)
            first = jnp.zeros((b, t, 1, 1, 1), x.dtype).at[:, 0].set(1.0)
            xt = jnp.where(first > 0, xp, (xp + prev) / 2.0)
            xt = Conv1x1x1NormActivated(self.reduction_channels)(xt)
            xt = resize_bilinear(xt.reshape(b * t, hp, wp, self.reduction_channels), (h, w))
            out.append(xt.reshape(b, t, h, w, self.reduction_channels))
        return jnp.concatenate(out, axis=-1)


class TemporalBlock(nn.Module):
    """Multi-path causal temporal block (reference temporal.py:426-489):
    paths 2x3x3, 1x3x3, 1x1x1 (each preceded by 1x1x1 reduce), optional
    pyramid pooling, 1x1x1 aggregation + residual."""
    out_channels: Optional[int] = None
    use_pyramid_pooling: bool = False
    pool_sizes: Optional[Sequence[Tuple[int, int, int]]] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        half = in_ch // 2
        out_ch = self.out_channels or in_ch

        paths = []
        for ks in [(2, 3, 3), (1, 3, 3)]:
            h = Conv1x1x1NormActivated(half)(x)
            h = CausalConv3d(half, ks)(h)
            paths.append(h)
        paths.append(Conv1x1x1NormActivated(half)(x))
        h = jnp.concatenate(paths, axis=-1)

        if self.use_pyramid_pooling:
            assert self.pool_sizes is not None
            pooled = PyramidSpatioTemporalPooling(in_ch // 3, self.pool_sizes)(x)
            h = jnp.concatenate([h, pooled], axis=-1)

        h = Conv1x1x1NormActivated(out_ch)(h)

        if out_ch != in_ch:
            skip = nn.Dense(out_ch, use_bias=False)(x)
            skip = Norm()(skip)
        else:
            skip = x
        return skip + h
