"""BEV decoder: shared ResNet18-style trunk + per-task heads.

Mirrors reference stp3/models/decoder.py:8-140: first_conv (7x7 s2) ->
layer1-3 of a ResNet18 (basic blocks, 64/128/256 channels) -> three
UpsamplingAdd skip stages back to full resolution, then gated heads:
vehicle segmentation (always), pedestrian, HD map (present frame only,
2 logits per element), instance centerness (sigmoid), instance offset,
future flow, planning cost volume.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stp3_tpu.layers.convolutions import Norm, UpsamplingAdd


class BasicBlock(nn.Module):
    """ResNet basic block, GroupNorm variant."""
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        # explicit pad 1 (torch-style) rather than 'SAME': identical at
        # stride 1, and reproduces torchvision's window alignment at stride 2
        # so imported resnet18 weights are bit-compatible
        h = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False)(x)
        h = nn.relu(Norm()(h))
        h = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)), use_bias=False)(h)
        h = Norm()(h)
        if self.stride != 1 or x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False)(x)
            x = Norm()(x)
        return nn.relu(h + x)


class _Kernel(nn.Module):
    """Bare conv kernel with nn.Conv's param layout ({kernel}, lecun init),
    so a module holding it is checkpoint-identical to an nn.Conv."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param('kernel', nn.initializers.lecun_normal(), self.shape)


class _Head(nn.Module):
    """3x3 conv-norm-relu -> 1x1 conv (reference decoder.py:37-89).

    The 3x3 stage is exposed as a bare kernel (``conv0_kernel``) so the
    Decoder can run ONE fused in->(in * n_heads) conv for every head reading
    the same trunk output: a 64-channel conv runs at ~15% of v5e bf16 peak
    (half the 128 MXU lanes idle) while the 384-wide fused form runs ~2.4x
    faster than six narrow convs (measured round 2). Param tree is identical
    to the unfused nn.Conv form (Conv_0/Norm_0/Conv_1)."""
    out_channels: int
    in_channels: int

    def setup(self):
        self._conv0 = _Kernel((3, 3, self.in_channels, self.in_channels),
                              name='Conv_0')
        self._norm = Norm(name='Norm_0')
        self._proj = nn.Conv(self.out_channels, (1, 1), name='Conv_1')

    def conv0_kernel(self):
        return self._conv0()

    def finish(self, hidden):
        """Apply norm-relu-1x1 to this head's slice of the fused conv."""
        return self._proj(nn.relu(self._norm(hidden)))

    def __call__(self, x):
        k = self._conv0()
        dt = jnp.promote_types(x.dtype, k.dtype)
        h = jax.lax.conv_general_dilated(
            x.astype(dt), k.astype(dt), (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return self.finish(h)


class Decoder(nn.Module):
    n_classes: int
    n_present: int
    n_hdmap: int
    predict_pedestrian: bool = True
    perceive_hdmap: bool = True
    predict_instance: bool = True
    predict_future_flow: bool = True
    planning: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Optional[jnp.ndarray]]:
        """x: (B, S, H, W, C) -> dict of per-task outputs (channels-last)."""
        if self.predict_future_flow and not self.predict_instance:
            raise ValueError('flow cannot be enabled without instance prediction')
        b, s, h, w, c = x.shape
        flat = x.reshape(b * s, h, w, c)
        skip1 = flat

        # H/2 (pad 3 = torch first_conv padding, reference decoder.py:24)
        t = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False)(flat)
        t = nn.relu(Norm()(t))
        # sequential calls (not nested expressions) so flax construction
        # order == call order: BasicBlock_2/_4 are the strided blocks,
        # matching torchvision layer{2,3}.0 for weight import
        t = BasicBlock(64)(t)
        t = BasicBlock(64)(t)
        skip2 = t
        # H/4
        t = BasicBlock(128, stride=2)(t)
        t = BasicBlock(128)(t)
        skip3 = t
        # H/8
        t = BasicBlock(256, stride=2)(t)
        t = BasicBlock(256)(t)

        t = UpsamplingAdd(128)(t, skip3)
        t = UpsamplingAdd(64)(t, skip2)
        t = UpsamplingAdd(c)(t, skip1)

        def unflat(y):
            return y.reshape(b, s, *y.shape[1:])

        # all-frame heads share one fused 3x3 conv over t (see _Head); the
        # hdmap head runs unfused on the present frame only (1/s the work)
        tc = t.shape[-1]
        heads = [('segmentation', _Head(self.n_classes, tc, name='segmentation_head'))]
        if self.predict_pedestrian:
            heads.append(('pedestrian', _Head(self.n_classes, tc, name='pedestrian_head')))
        if self.predict_instance:
            heads.append(('instance_center', _Head(1, tc, name='instance_center_head')))
            heads.append(('instance_offset', _Head(2, tc, name='instance_offset_head')))
        if self.predict_future_flow:
            heads.append(('instance_flow', _Head(2, tc, name='instance_future_head')))
        if self.planning:
            heads.append(('costvolume', _Head(1, tc, name='costvolume_head')))

        kernels = [m.conv0_kernel() for _, m in heads]
        dt = jnp.promote_types(t.dtype, kernels[0].dtype)
        fused = jax.lax.conv_general_dilated(
            t.astype(dt), jnp.concatenate(kernels, axis=-1).astype(dt),
            (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        out: Dict[str, Optional[jnp.ndarray]] = {
            'pedestrian': None, 'hdmap': None, 'instance_center': None,
            'instance_offset': None, 'instance_flow': None, 'costvolume': None}
        for i, (key, mod) in enumerate(heads):
            y = mod.finish(fused[..., i * tc:(i + 1) * tc])
            if key == 'instance_center':
                out[key] = nn.sigmoid(unflat(y))
            elif key == 'costvolume':
                out[key] = unflat(y)[..., 0]  # (B, S, H, W)
            else:
                out[key] = unflat(y)

        if self.perceive_hdmap:
            present = unflat(t)[:, self.n_present - 1]
            out['hdmap'] = _Head(2 * self.n_hdmap, tc, name='hdmap_head')(present)
        return out
