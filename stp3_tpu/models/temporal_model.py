"""Temporal model over BEV feature sequences.

Mirrors reference stp3/models/temporal_model.py: a stack of
``receptive_field - 1`` TemporalBlocks (optionally with spatio-temporal
pyramid pooling over the full BEV extent) followed by a DeepLabHead applied
per frame; plus the identity variant for single-frame configs.

Input/output: (B, S, H, W, C) channels-last (reference uses (B, C, T, H, W)).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from stp3_tpu.layers.convolutions import DeepLabHead
from stp3_tpu.layers.temporal import Bottleneck3D, TemporalBlock


class TemporalModel(nn.Module):
    receptive_field: int
    input_shape: Tuple[int, int]     # (H, W) of the BEV grid
    start_out_channels: int = 64
    extra_in_channels: int = 0
    inbetween_layers: int = 0
    use_pyramid_pooling: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, s, h, w, c = x.shape
        n_temporal_layers = self.receptive_field - 1

        block_out = self.start_out_channels
        for _ in range(n_temporal_layers):
            pool_sizes = [(2, h, w)] if self.use_pyramid_pooling else None
            x = TemporalBlock(block_out, use_pyramid_pooling=self.use_pyramid_pooling,
                              pool_sizes=pool_sizes)(x)
            for _ in range(self.inbetween_layers):
                x = Bottleneck3D(block_out, kernel_size=(1, 3, 3))(x)
            block_out += self.extra_in_channels

        out_c = x.shape[-1]
        flat = x.reshape(b * s, h, w, out_c)
        flat = DeepLabHead(num_classes=out_c, hidden_channel=128)(flat, train=train)
        return flat.reshape(b, s, h, w, out_c)

    @staticmethod
    def out_channels(start_out_channels: int, receptive_field: int, extra_in_channels: int) -> int:
        # reference temporal_model.py:40-44: out = channels entering the last block
        c = start_out_channels
        for _ in range(max(receptive_field - 1 - 1, 0)):
            c += extra_in_channels
        return c if receptive_field > 1 else start_out_channels


class TemporalModelIdentity(nn.Module):
    """Pass-through (reference temporal_model.py:63-70)."""
    receptive_field: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x
