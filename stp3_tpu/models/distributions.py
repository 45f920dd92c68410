"""Latent-future distribution module.

Mirrors reference stp3/models/distributions.py: a 4x-downsampling
Bottleneck encoder + global-pool decoder parameterising GAUSSIAN
(2L outputs), MIXGAUSSIAN (6L + 3) or BERNOULLI (Bottleneck + LogSigmoid)
latents over the present BEV state.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from stp3_tpu.layers.convolutions import Bottleneck


class DistributionEncoder(nn.Module):
    """4 downsampling bottlenecks (reference distributions.py:54-68)."""
    out_channels: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = Bottleneck(self.out_channels, downsample=True)(x, train=train)
        x = Bottleneck(self.out_channels, downsample=True)(x, train=train)
        x = Bottleneck(self.out_channels, downsample=True)(x, train=train)
        x = Bottleneck(self.out_channels, downsample=True)(x, train=train)
        return x


class DistributionModule(nn.Module):
    """s_t (B, 1, H, W, C) -> distribution parameters.

    GAUSSIAN -> (B, 1, 2L); MIXGAUSSIAN -> (B, 1, 6L+3);
    BERNOULLI -> (B, H, W, L) log-probabilities.
    """
    latent_dim: int
    method: str = 'GAUSSIAN'

    @nn.compact
    def __call__(self, s_t, *, train: bool = False):
        b, s = s_t.shape[:2]
        assert s == 1
        x = s_t[:, 0]
        compress = x.shape[-1] // 2

        if self.method in ('GAUSSIAN', 'MIXGAUSSIAN'):
            out_ch = 2 * self.latent_dim if self.method == 'GAUSSIAN' else 6 * self.latent_dim + 3
            h = DistributionEncoder(compress)(x, train=train)
            h = jnp.mean(h, axis=(-3, -2), keepdims=True)   # AdaptiveAvgPool2d(1)
            h = nn.Conv(out_ch, (1, 1))(h)
            return h.reshape(b, 1, out_ch)
        elif self.method == 'BERNOULLI':
            h = Bottleneck(self.latent_dim)(x, train=train)
            return nn.log_sigmoid(h)  # (B, H, W, L)
        raise NotImplementedError(self.method)
