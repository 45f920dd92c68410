"""2-D NN building blocks (flax.linen, channels-last / NHWC).

Functional equivalents of the reference's stp3/layers/convolutions.py:
ConvBlock, Bottleneck, Interpolate, UpsamplingConcat, UpsamplingAdd,
ASPP / DeepLabHead, ConvNeXt Block, Bottleblock.

TPU-first deviations (documented, SURVEY.md §7 hard-part 6):
  * normalisation defaults to GroupNorm instead of (sync-)BatchNorm — no
    mutable state under jit and no cross-replica traffic; channels-last
    keeps the lane dimension on channels for the MXU.
  * bilinear resizes use jax.image.resize (half-pixel convention, i.e.
    torch align_corners=False).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _num_groups(channels: int, preferred: int = 8) -> int:
    g = min(preferred, channels)
    while channels % g != 0:
        g -= 1
    return max(g, 1)


_DEFAULT_NORM = 'gn'


class _GroupNormFast(nn.Module):
    """GroupNorm computed without the (..., G, C/G) reshape.

    flax's nn.GroupNorm reshapes to split the group axis; on TPU that
    reshape moves the minor dim from C (=128 lanes, aligned) to C/G (=8-16)
    and XLA materializes several full-size fp32 intermediates plus layout
    copies around it — measured ~2.5 GB of extra HBM writes per forward at
    flagship scale (HLO audit, round 2). Here the stats come from plain
    channel-wise sum/sum-of-squares reductions (one streaming pass, fp32
    accumulation, layout preserved) combined per-group on a (B, C)-sized
    array, and the normalization is folded into a single per-channel
    multiply-add that XLA fuses into the neighbouring op.

    Same formula as flax (var = E[x^2] - E[x]^2, eps inside rsqrt), same
    param tree ({scale, bias} of shape (C,)); differs only in fp reduction
    order."""
    num_groups: int
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)

        red = tuple(range(1, x.ndim - 1))          # spatial dims
        x32 = x.astype(jnp.float32)
        s1 = jnp.sum(x32, axis=red)                # (B, C)
        s2 = jnp.sum(x32 * x32, axis=red)          # (B, C) — same fused pass
        b = x.shape[0]
        n = (x.size // (b * c)) * (c // g)         # elements per (b, group)
        gs1 = s1.reshape(b, g, c // g).sum(-1)     # (B, G), tiny
        gs2 = s2.reshape(b, g, c // g).sum(-1)
        mean = gs1 / n
        var = gs2 / n - mean * mean
        inv = jax.lax.rsqrt(var + self.epsilon)    # (B, G)
        # fold scale/shift into per-(b, channel) a, b2: y = x * a + b2
        inv_c = jnp.repeat(inv, c // g, axis=-1)   # (B, C)
        mean_c = jnp.repeat(mean, c // g, axis=-1)
        a = inv_c * scale.astype(jnp.float32)
        b2 = bias.astype(jnp.float32) - mean_c * a
        shape = (b,) + (1,) * (x.ndim - 2) + (c,)
        dt = jnp.promote_types(x.dtype, scale.dtype)
        return (x.astype(dt) * a.reshape(shape).astype(dt)
                + b2.reshape(shape).astype(dt))


# NEGATIVE result (round 2, do not retry): an _LayerNormFast analogous to
# _GroupNormFast (single sum/sum^2 pass over the channel axis, fused
# multiply-add apply) REGRESSED the flagship path 92.45 -> 93.55 ms
# (medians of 3-4 runs). Unlike GroupNorm, flax's LayerNorm has no
# group-split reshape, so XLA already fuses its fp32 converts into the
# surrounding ops; the hand-rolled version only disturbed that fusion.
def set_default_norm(kind: str) -> None:
    """Process-wide default normalisation for all layers built afterwards
    ('gn' | 'ln' | 'bn' | 'bn_frozen' | 'none'); wired from cfg.MODEL.NORM by
    STP3Config.from_cfg. Construction-time only — do not change between
    building models with different norms in one process."""
    global _DEFAULT_NORM
    assert kind in ('gn', 'ln', 'bn', 'bn_frozen', 'none'), kind
    _DEFAULT_NORM = kind


def default_norm() -> str:
    return _DEFAULT_NORM


_BN_MOMENTUM = 0.1


def set_bn_momentum(momentum: float) -> None:
    """Torch-convention BN momentum (new = (1-m)*old + m*batch) for every
    'bn' Norm site — the reference applies cfg.MODEL.BN_MOMENTUM to all
    BNs at model init (stp3/models/stp3.py:109, utils/network.py:27-30;
    0.1 default, 0.05 in every published config)."""
    global _BN_MOMENTUM
    _BN_MOMENTUM = float(momentum)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU that is exact (erf) in fp32 and tanh-approximate in bf16.

    The erf lowering costs ~4x the tanh form on the TPU VPU (measured
    2.6 ms vs 0.7 ms on a (6,200,200,256) activation — the single most
    expensive op in ConvNeXtBlock). The tanh approximation's error
    (<1.5e-3 absolute, ~3e-4 where activations concentrate) is below
    bf16's own quantization step, so under the bf16 serving/training
    policy it is a free win; fp32 (parity/eval) keeps exact erf."""
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


class Norm(nn.Module):
    """GroupNorm by default ('gn'); 'ln' LayerNorm; 'none' identity;
    'bn_frozen' inference-mode BatchNorm (fixed running statistics as
    non-trainable params) — the import target for reference torch
    checkpoints whose BN statistics must be preserved; 'bn' trainable
    BatchNorm (running stats in the mutable ``batch_stats`` collection) —
    the reference's from-scratch training recipe (BN + sync_batchnorm,
    /root/reference/train.py:45).

    'bn' semantics: train/eval mode is derived from whether the caller
    made ``batch_stats`` mutable (no ``train`` plumbing needed at every
    Norm site); batch statistics reduce over all non-channel axes like
    torch BatchNorm2d/3d; the running-average update uses the TORCH
    momentum convention with the unbiased variance, configured via
    ``set_bn_momentum`` (cfg.MODEL.BN_MOMENTUM). Sync-BN falls out of
    GSPMD: under jit with the batch sharded over the 'data' mesh axis the
    batch-mean IS the global mean (XLA inserts the cross-replica
    collectives), which is exactly Lightning's sync_batchnorm=True.

    The param tree of 'bn' ({scale, bias} params + {mean, var}
    batch_stats at the same Norm path) splits from a 'bn_frozen' tree
    ({mean, var, scale, bias} all params) via
    ``training.checkpoint.split_frozen_bn`` — the fine-tune-an-imported-
    checkpoint-with-live-BN path.

    kind='default' resolves to the process-wide ``set_default_norm`` choice
    (cfg.MODEL.NORM).

    ``eps`` is used by the bn branches only: torch BatchNorm defaults
    to 1e-5, but efficientnet_pytorch builds its BNs with eps=1e-3
    (batch_norm_epsilon) — the EfficientNet trunk passes eps=1e-3 so
    imported reference statistics normalise identically."""
    kind: str = 'default'
    groups: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        kind = default_norm() if self.kind == 'default' else self.kind
        if kind == 'none':
            return x
        if kind == 'ln':
            return nn.LayerNorm()(x)
        if kind == 'bn_frozen':
            c = x.shape[-1]
            mean = self.param('mean', nn.initializers.zeros, (c,), jnp.float32)
            var = self.param('var', nn.initializers.ones, (c,), jnp.float32)
            scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
            bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
            inv = jax.lax.rsqrt(var + self.eps) * scale
            return (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + bias.astype(x.dtype)
        if kind == 'bn':
            c = x.shape[-1]
            scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
            bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
            ra_mean = self.variable('batch_stats', 'mean',
                                    lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable('batch_stats', 'var',
                                   lambda: jnp.ones((c,), jnp.float32))
            training = (self.is_mutable_collection('batch_stats')
                        and not self.is_initializing())
            if training:
                xf = x.astype(jnp.float32).reshape(-1, c)
                mean = xf.mean(0)
                var = jnp.maximum((xf * xf).mean(0) - mean * mean, 0.0)
                n = xf.shape[0]
                unbiased = var * (n / max(n - 1, 1))
                m = _BN_MOMENTUM
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
            else:
                mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.eps) * scale
            return ((x - mean.astype(x.dtype)) * inv.astype(x.dtype)
                    + bias.astype(x.dtype))
        return _GroupNormFast(num_groups=_num_groups(x.shape[-1], self.groups),
                              name='GroupNorm_0')(x)


def upsample_bilinear(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Bilinear 2x upsample, NHWC / N...HWC, torch align_corners=False."""
    shape = list(x.shape)
    shape[-3] *= scale
    shape[-2] *= scale
    return jax.image.resize(x, tuple(shape), method='bilinear')


def resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    shape = list(x.shape)
    shape[-3], shape[-2] = hw
    return jax.image.resize(x, tuple(shape), method='bilinear')


class ConvBlock(nn.Module):
    """conv -> norm -> activation (reference convolutions.py:10-62)."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = 'default'
    activation: str = 'relu'
    use_bias: bool = False
    transpose: bool = False

    @nn.compact
    def __call__(self, x):
        k = (self.kernel_size, self.kernel_size)
        if self.transpose:
            x = nn.ConvTranspose(self.out_channels, k, strides=(self.stride, self.stride),
                                 padding='SAME', use_bias=self.use_bias)(x)
        else:
            x = nn.Conv(self.out_channels, k, strides=(self.stride, self.stride),
                        padding='SAME', use_bias=self.use_bias)(x)
        if self.norm != 'none':
            x = Norm(self.norm)(x)
        act = {'relu': nn.relu, 'lrelu': lambda v: nn.leaky_relu(v, 0.1),
               'elu': nn.elu, 'tanh': jnp.tanh, 'none': lambda v: v}[self.activation]
        return act(x)


class Bottleneck(nn.Module):
    """1x1 down-project -> kxk conv (optionally strided/up) -> 1x1 up-project,
    each norm+relu, with a projected residual (reference convolutions.py:65-169)."""
    out_channels: Optional[int] = None
    kernel_size: int = 3
    upsample: bool = False
    downsample: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        bneck = in_ch // 2

        h = nn.Conv(bneck, (1, 1), use_bias=False)(x)
        h = nn.relu(Norm()(h))
        k = (self.kernel_size, self.kernel_size)
        # explicit torch-style padding (k//2) instead of 'SAME': identical for
        # stride 1, and for the strided variants it reproduces the reference's
        # window alignment exactly (ConvTranspose2d(p=k//2, output_padding=k//2)
        # / Conv2d(p=k//2)) so imported torch weights are bit-compatible
        p = self.kernel_size // 2
        if self.upsample:
            h = nn.ConvTranspose(bneck, k, strides=(2, 2),
                                 padding=((p, p + 1), (p, p + 1)),
                                 transpose_kernel=True, use_bias=False)(h)
        elif self.downsample:
            h = nn.Conv(bneck, k, strides=(2, 2), padding=((p, p), (p, p)),
                        use_bias=False)(h)
        else:
            h = nn.Conv(bneck, k, padding=((p, p), (p, p)), use_bias=False)(h)
        h = nn.relu(Norm()(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False)(h)
        h = nn.relu(Norm()(h))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)

        if out_ch == in_ch and not self.downsample and not self.upsample:
            skip = x
        else:
            skip = x
            if self.upsample:
                skip = upsample_bilinear(skip, 2)
            elif self.downsample:
                # zero-pad odd h/w so the pooled skip matches the ceil-ing
                # strided conv (reference convolutions.py:165-167)
                ph, pw = skip.shape[-3] % 2, skip.shape[-2] % 2
                if ph or pw:
                    skip = jnp.pad(skip, ((0, 0),) * (skip.ndim - 3) + ((0, ph), (0, pw), (0, 0)))
                skip = nn.max_pool(skip, (2, 2), strides=(2, 2))
            skip = nn.Conv(out_ch, (1, 1), use_bias=False)(skip)
            skip = Norm()(skip)
        return h + skip


class UpsamplingConcat(nn.Module):
    """2x bilinear upsample, concat skip, 2x (conv-norm-relu)
    (reference convolutions.py:183-201)."""
    out_channels: int
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x_to_upsample, x_skip):
        x = upsample_bilinear(x_to_upsample, self.scale_factor)
        if x.shape[-3:-1] != x_skip.shape[-3:-1]:
            x = resize_bilinear(x, x_skip.shape[-3:-1])
        x = jnp.concatenate([x_skip, x], axis=-1)
        for _ in range(2):
            x = nn.Conv(self.out_channels, (3, 3), padding='SAME', use_bias=False)(x)
            x = nn.relu(Norm()(x))
        return x


class UpsamplingAdd(nn.Module):
    """2x bilinear upsample -> 1x1 conv -> norm, + skip
    (reference convolutions.py:204-215)."""
    out_channels: int
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, x_skip):
        x = upsample_bilinear(x, self.scale_factor)
        if x.shape[-3:-1] != x_skip.shape[-3:-1]:
            x = resize_bilinear(x, x_skip.shape[-3:-1])
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False)(x)
        x = Norm()(x)
        return x + x_skip


class _ChunkedPointwise(nn.Module):
    """1x1 bias-free projection of channel-concatenated branches, computed
    as per-branch matmuls with input-channel slices of ONE kernel.

    Exactly conv1x1(concat(parts)) — a conv is linear in the channel
    concat — but the (B, H, W, sum C) concat never materializes: at ASPP
    scale that intermediate costs ~1 GB of HBM write+read traffic per
    DeepLabHead call. The param tree matches nn.Conv ({kernel}, same
    shape/init), so checkpoints and the torch importer are unaffected
    (instantiated with name='Conv_5' in ASPP)."""
    features: int

    @nn.compact
    def __call__(self, parts: Sequence[jnp.ndarray]) -> jnp.ndarray:
        cin = sum(p.shape[-1] for p in parts)
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features), jnp.float32)
        out = None
        off = 0
        for p in parts:
            c = p.shape[-1]
            k = kernel[0, 0, off:off + c]
            dt = jnp.promote_types(p.dtype, kernel.dtype)
            part = jnp.einsum('...c,co->...o', p.astype(dt), k.astype(dt))
            out = part if out is None else out + part
            off += c
        return out


class _AtrousConv(nn.Module):
    """Bias-free 3x3 conv with dilation ``rate`` whose always-out-of-bounds
    taps are dropped EXACTLY: with SAME (= torch padding=rate) zero padding,
    a tap at offset +-rate never lands in bounds once rate >= H (resp. W),
    so slicing those kernel rows/cols off computes the identical result.
    On the encoder's 14x30 stride-16 maps this turns the rate-36 branch
    into a 1x1 conv and rate-24 into a 1x3 (9x / 3x fewer MXU taps); at
    200x200 BEV (all rates in bounds) it is the plain dilated conv.
    Param tree matches nn.Conv ({kernel}, same shape/init)."""
    features: int
    rate: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        h, w = x.shape[-3], x.shape[-2]
        rows = slice(None) if self.rate < h else slice(1, 2)
        cols = slice(None) if self.rate < w else slice(1, 2)
        k = kernel[rows, cols]
        pad = tuple((self.rate, self.rate) if k.shape[i] == 3 else (0, 0)
                    for i in range(2))
        dt = jnp.promote_types(x.dtype, kernel.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(dt), k.astype(dt), (1, 1), pad,
            rhs_dilation=(self.rate, self.rate),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference convolutions.py:242-270)."""
    out_channels: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # explicit Conv_i names: _AtrousConv replaces what used to be plain
        # nn.Conv calls, and auto-numbering must not shift for the remaining
        # nn.Convs (checkpoint / torch-importer layout)
        res = []
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, name='Conv_0')(x)
        res.append(nn.relu(Norm()(h)))
        for i, rate in enumerate(self.atrous_rates):
            h = _AtrousConv(self.out_channels, rate, name=f'Conv_{i + 1}')(x)
            res.append(nn.relu(Norm()(h)))
        # global pooling branch; stays (B, 1, 1, C) — the projection result
        # broadcasts in the sum, the full-res broadcast never materializes
        g = jnp.mean(x, axis=(-3, -2), keepdims=True)
        g = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name=f'Conv_{len(self.atrous_rates) + 1}')(g)
        g = nn.relu(Norm()(g))
        res.append(g)
        h = _ChunkedPointwise(self.out_channels, name='Conv_5')(res)
        h = nn.relu(Norm()(h))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h


class DeepLabHead(nn.Module):
    """ASPP -> 3x3 conv-norm-relu -> 1x1 conv (reference convolutions.py:272-280)."""
    num_classes: int
    hidden_channel: int = 256

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = ASPP(out_channels=self.hidden_channel)(x, train=train)
        x = nn.Conv(self.hidden_channel, (3, 3), padding='SAME', use_bias=False)(x)
        x = nn.relu(Norm()(x))
        return nn.Conv(self.num_classes, (1, 1))(x)


class ConvNeXtBlock(nn.Module):
    """ConvNeXt block: dwconv7 -> LN -> pw 4x -> GELU -> pw -> gamma + skip
    (reference convolutions.py:310-346). Channels-last native — no permutes.

    On TRAINING traces on a single-device TPU the LN->pw->GELU->pw->
    gamma+skip tail runs as one fused pallas kernel
    (ops/pallas/convnext_mlp_kernel.py): single-pass forward + remat
    backward, measured -20 ms/train-step. On inference traces the kernel
    is off by default: the custom-call's layout constraints de-optimise
    the GRU-rollout convs feeding it (full analysis in the kernel's gate
    docstring). Param tree is identical on both paths."""
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        from stp3_tpu.ops.pallas.convnext_mlp_kernel import (
            convnext_mlp_pallas, use_fused_convnext)

        dim = x.shape[-1]
        h = nn.Conv(dim, (7, 7), padding='SAME', feature_group_count=dim)(x)
        ln = nn.LayerNorm(epsilon=1e-6)
        d1 = nn.Dense(4 * dim)
        d2 = nn.Dense(dim)
        # layer_scale <= 0 disables gamma, matching the reference
        # (convolutions.py:330: `if layer_scale_init_value > 0 else None`)
        gamma = (self.param('gamma', nn.initializers.constant(
                     self.layer_scale_init_value), (dim,))
                 if self.layer_scale_init_value > 0 else None)

        if use_fused_convnext(train) and not self.is_initializing():
            # read the (already-initialized) submodule params directly; the
            # flax modules above exist so both paths share one param tree
            p = self.variables['params']
            lead = h.shape[:-1]
            g = gamma if gamma is not None else jnp.ones((dim,), h.dtype)
            out = convnext_mlp_pallas(
                h.reshape(-1, dim), x.reshape(-1, dim),
                p['LayerNorm_0']['scale'], p['LayerNorm_0']['bias'],
                p['Dense_0']['kernel'], p['Dense_0']['bias'],
                p['Dense_1']['kernel'], p['Dense_1']['bias'], g)
            return out.reshape(*lead, dim)

        h = ln(h)
        h = d1(h)
        h = gelu(h)
        h = d2(h)
        if gamma is not None:
            h = gamma * h
        return x + h


class Bottleblock(nn.Module):
    """7x7 -> LN -> GELU, 1x1, 3x3 with GELU-projected residual
    (reference convolutions.py:348-380)."""
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        bneck = in_ch // 2
        h = nn.Conv(bneck, (7, 7), padding='SAME', use_bias=False)(x)
        h = gelu(nn.LayerNorm(epsilon=1e-6)(h))
        h = nn.Conv(bneck, (1, 1), use_bias=False)(h)
        h = gelu(nn.LayerNorm(epsilon=1e-6)(h))
        h = nn.Conv(out_ch, (3, 3), padding='SAME', use_bias=False)(h)
        h = gelu(nn.LayerNorm(epsilon=1e-6)(h))
        if out_ch == in_ch:
            skip = x
        else:
            skip = gelu(nn.Conv(out_ch, (1, 1), use_bias=False)(x))
        return h + skip
