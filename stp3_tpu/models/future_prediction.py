"""Future prediction: dual-pathway GRU rollout + SpatialGRU refinement.

Mirrors reference stp3/models/future_prediction.py:7-46: DualGRU rollout of
``n_future`` states from the latent sample, ConvNeXt res-blocks, then
``n_gru_blocks`` SpatialGRUs over [past states ++ future states] with res
blocks between (last one a DeepLabHead).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from stp3_tpu.layers.convolutions import ConvNeXtBlock, DeepLabHead
from stp3_tpu.layers.temporal import DualGRU, SpatialGRU


class FuturePrediction(nn.Module):
    in_channels: int
    latent_dim: int
    n_future: int
    mixture: bool = True
    n_gru_blocks: int = 2
    n_res_layers: int = 1
    # MODEL.REMAT tag 'cells': per-GRU-cell checkpointing (see
    # layers/temporal.py SpatialGRU.remat_cells)
    remat_cells: bool = False

    @nn.compact
    def __call__(self, sample, state, train: bool = False):
        """sample: (B, 1, H, W, latent); state: (B, n_present, H, W, C).
        Returns (B, n_present + n_future, H, W, C)."""
        x = DualGRU(self.latent_dim, self.in_channels, n_future=self.n_future,
                    mixture=self.mixture,
                    remat_cells=self.remat_cells)(sample, state)

        b, nf, h, w, c = x.shape
        flat = x.reshape(b * nf, h, w, c)
        for _ in range(self.n_res_layers):
            flat = ConvNeXtBlock()(flat, train=train)
        x = flat.reshape(b, nf, h, w, c)

        x = jnp.concatenate([state, x], axis=1)  # (B, S_total, H, W, C)

        hidden_state = x[:, 0]
        for i in range(self.n_gru_blocks):
            x = SpatialGRU(self.in_channels, self.in_channels,
                           remat_cells=self.remat_cells)(x, hidden_state)
            b2, s2, h2, w2, c2 = x.shape
            flat = x.reshape(b2 * s2, h2, w2, c2)
            if i < self.n_gru_blocks - 1:
                for _ in range(self.n_res_layers):
                    flat = ConvNeXtBlock()(flat, train=train)
            else:
                flat = DeepLabHead(num_classes=self.in_channels, hidden_channel=128)(flat, train=train)
            x = flat.reshape(b2, s2, h2, w2, c2)
        return x
