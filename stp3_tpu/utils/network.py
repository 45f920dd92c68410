"""Misc network utilities (reference stp3/utils/network.py:5-43).

Channels-last analogues; ``set_bn_momentum`` has no equivalent here —
normalisation is GroupNorm (stateless under jit), see layers/convolutions.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def pack_sequence_dim(x: jnp.ndarray) -> jnp.ndarray:
    """(B, S, ...) -> (B*S, ...) (reference network.py:5-7)."""
    b, s = x.shape[:2]
    return x.reshape(b * s, *x.shape[2:])


def unpack_sequence_dim(x: jnp.ndarray, b: int, s: int) -> jnp.ndarray:
    """(B*S, ...) -> (B, S, ...) (reference network.py:10-11)."""
    return x.reshape(b, s, *x.shape[1:])


def normalise_image(img: np.ndarray) -> np.ndarray:
    """uint8/float [0,255] HWC -> ImageNet-normalised float32."""
    return (np.asarray(img, np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def denormalise_image(img: np.ndarray) -> np.ndarray:
    """Inverse ImageNet normalisation for visualisation (the reference's
    ``NormalizeInverse``, network.py:33-43). Returns float in [0, 1]."""
    return np.clip(np.asarray(img) * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)
