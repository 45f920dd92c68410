"""BEV decoder: shared ResNet18-style trunk + per-task heads.

Mirrors reference stp3/models/decoder.py:8-140: first_conv (7x7 s2) ->
layer1-3 of a ResNet18 (basic blocks, 64/128/256 channels) -> three
UpsamplingAdd skip stages back to full resolution, then gated heads:
vehicle segmentation (always), pedestrian, HD map (present frame only,
2 logits per element), instance centerness (sigmoid), instance offset,
future flow, planning cost volume.
"""
from __future__ import annotations

from typing import Dict, Optional

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


class _Head(nn.Module):
    """3x3 conv-norm-relu -> 1x1 conv (reference decoder.py:37-89)."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Conv(c, (3, 3), padding='SAME', use_bias=False)(x)
        h = nn.relu(Norm()(h))
        return nn.Conv(self.out_channels, (1, 1))(h)


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
    def __call__(self, x, *, train: bool = False) -> Dict[str, Optional[jnp.ndarray]]:
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

        out: Dict[str, Optional[jnp.ndarray]] = {}
        out['segmentation'] = unflat(_Head(self.n_classes, name='segmentation_head')(t))
        out['pedestrian'] = (unflat(_Head(self.n_classes, name='pedestrian_head')(t))
                             if self.predict_pedestrian else None)
        if self.perceive_hdmap:
            present = unflat(t)[:, self.n_present - 1]
            out['hdmap'] = _Head(2 * self.n_hdmap, name='hdmap_head')(present)
        else:
            out['hdmap'] = None
        if self.predict_instance:
            out['instance_center'] = nn.sigmoid(
                unflat(_Head(1, name='instance_center_head')(t)))
            out['instance_offset'] = unflat(_Head(2, name='instance_offset_head')(t))
        else:
            out['instance_center'] = None
            out['instance_offset'] = None
        out['instance_flow'] = (unflat(_Head(2, name='instance_future_head')(t))
                                if self.predict_future_flow else None)
        if self.planning:
            cv = _Head(1, name='costvolume_head')(t)
            out['costvolume'] = unflat(cv)[..., 0]  # (B, S, H, W)
        else:
            out['costvolume'] = None
        return out
