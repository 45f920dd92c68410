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
    """uint8/float [0,255] HWC -> ImageNet-normalised float32 (host-side;
    prefer the uint8 wire format + ``prepare_image`` in-jit — see below)."""
    return (np.asarray(img, np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def prepare_image(image: jnp.ndarray, dtype) -> jnp.ndarray:
    """Wire-format image -> model input, IN-JIT.

    TPU-first input pipeline: datasets put raw **uint8** RGB on the wire
    (4x fewer host->device bytes than the reference's host-normalised
    fp32, reference NuscenesData.py:150-280 `Normalize`), and the
    ImageNet normalisation runs on device where XLA fuses it into the
    first conv's input processing. float inputs are treated as ALREADY
    normalised (the original fp32 contract) and only cast — so imported
    pipelines and hand-built test batches keep working unchanged.

    The divide/subtract runs in fp32 regardless of the compute dtype
    (uint8/255 has 8 significant bits; normalising in bf16 would round
    them), then casts once to ``dtype``.
    """
    if image.dtype == jnp.uint8:
        x = image.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        return x.astype(dtype)
    return image.astype(dtype)


def denormalise_image(img: np.ndarray) -> np.ndarray:
    """Inverse ImageNet normalisation for visualisation (the reference's
    ``NormalizeInverse``, network.py:33-43). Returns float in [0, 1].
    uint8 wire-format images are raw RGB already: just scaled."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return np.clip(img * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)
