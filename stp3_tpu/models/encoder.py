"""Per-camera image encoder: EfficientNet trunk + DeepLab necks producing a
context feature map and a categorical depth-logit map.

Mirrors reference stp3/models/encoder.py:9-108: two parallel necks
(DeepLabHead at the deep endpoint, then UpsamplingConcat with the shallower
endpoint) for features (C=OUT_CHANNELS) and depth (D bins).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from stp3_tpu.layers.convolutions import DeepLabHead, UpsamplingConcat
from stp3_tpu.models.efficientnet import EfficientNetFeatures, block_plan


class Encoder(nn.Module):
    """x: (B*, H, W, 3) -> (features (B*, H/8, W/8, C), depth (B*, H/8, W/8, D))."""
    C: int                      # context channels (MODEL.ENCODER.OUT_CHANNELS)
    D: int                      # depth bins
    name_backbone: str = 'efficientnet-b4'
    downsample: int = 8
    use_depth_distribution: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        # NOTE: ``train`` is positional (not keyword-only) so nn.remat can
        # mark it static (models/stp3.py setup)
        assert self.downsample == 8, 'only the reference downsample=8 is supported'
        if x.dtype == jnp.uint8:
            # uint8 wire format fed straight to the model: normalise
            # in-jit at fp32 (callers wanting bf16 compute prep the image
            # themselves first — utils/network.prepare_image, as the
            # trainer and serving wrappers do)
            from stp3_tpu.utils.network import prepare_image
            x = prepare_image(x, jnp.float32)
        endpoints = EfficientNetFeatures(arch=self.name_backbone)(x, train=train)
        index = 3  # log2(8)
        input_1 = endpoints[f'reduction_{index + 1}']  # stride 16
        input_2 = endpoints[f'reduction_{index}']      # stride 8

        c1 = input_1.shape[-1]
        feat = DeepLabHead(num_classes=c1, hidden_channel=64)(input_1, train=train)
        feat = UpsamplingConcat(self.C)(feat, input_2)

        depth = None
        if self.use_depth_distribution:
            d = DeepLabHead(num_classes=c1, hidden_channel=64)(input_1, train=train)
            depth = UpsamplingConcat(self.D)(d, input_2)
        return feat, depth
