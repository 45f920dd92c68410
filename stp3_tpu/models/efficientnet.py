"""EfficientNet backbone (flax, NHWC), b0/b4, truncated for BEV encoding.

Re-implements the behaviour the reference gets from efficientnet_pytorch
(stp3/models/encoder.py:18,39-97): stem + MBConv blocks, with the block
list truncated at the downsample-8 endpoint (b0: keep idx<=10, b4: keep
idx<=21; reference encoder.py:39-49,75-79) and "reduction" endpoints
recorded whenever the spatial size halves (encoder.py:66-82).

No pretrained torch weights are loaded (no network egress in this
environment); normalisation is GroupNorm (TPU-first; see layers doc).
"""
from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from stp3_tpu.layers.convolutions import Norm

# (num_repeat, kernel, stride, expand_ratio, in_ch, out_ch, se_ratio)
_BASE_BLOCKS: List[Tuple[int, int, int, int, int, int, float]] = [
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
]

_SCALING = {  # width, depth, drop_connect
    'efficientnet-b0': (1.0, 1.0, 0.2),
    'efficientnet-b4': (1.4, 1.8, 0.2),
}

# reference encoder.py:43-46: blocks kept for the downsample-8 truncation
_TRUNCATE_IDX = {'efficientnet-b0': 10, 'efficientnet-b4': 21}


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def block_plan(name: str, truncate: bool = True):
    """Expanded per-block list [(kernel, stride, expand, in_ch, out_ch, se)]."""
    width, depth, _ = _SCALING[name]
    plan = []
    for (r, k, s, e, i, o, se) in _BASE_BLOCKS:
        i2, o2 = round_filters(i, width), round_filters(o, width)
        reps = round_repeats(r, depth)
        for j in range(reps):
            plan.append((k, s if j == 0 else 1, e, i2 if j == 0 else o2, o2, se))
    if truncate:
        plan = plan[:_TRUNCATE_IDX[name] + 1]
    return plan


class SqueezeExcite(nn.Module):
    reduced_ch: int

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.Conv(self.reduced_ch, (1, 1))(s)
        s = nn.swish(s)
        s = nn.Conv(ch, (1, 1))(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    kernel: int
    stride: int
    expand: int
    out_ch: int
    se_ratio: float
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        h = x
        if self.expand != 1:
            h = nn.Conv(in_ch * self.expand, (1, 1), use_bias=False)(h)
            h = nn.swish(Norm(eps=1e-3)(h))
        mid = h.shape[-1]
        h = nn.Conv(mid, (self.kernel, self.kernel), strides=(self.stride, self.stride),
                    padding='SAME', feature_group_count=mid, use_bias=False)(h)
        h = nn.swish(Norm(eps=1e-3)(h))
        if self.se_ratio > 0:
            h = SqueezeExcite(max(1, int(in_ch * self.se_ratio)))(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False)(h)
        h = Norm(eps=1e-3)(h)
        if self.stride == 1 and in_ch == self.out_ch:
            if self.drop_rate > 0:
                # stochastic depth (drop-connect): drop the whole residual path
                # per-sample, like efficientnet_pytorch's drop_connect
                h = nn.Dropout(self.drop_rate, broadcast_dims=(1, 2, 3),
                               deterministic=not train)(h)
            h = h + x
        return h


class EfficientNetFeatures(nn.Module):
    """Truncated EfficientNet returning the two reduction endpoints the
    ST-P3 encoder consumes (reduction_{idx} and reduction_{idx+1} where
    idx = log2(downsample); reference encoder.py:84-86).

    Field is ``arch`` (not ``name``) because ``name`` is reserved by
    flax.linen.Module."""
    arch: str = 'efficientnet-b4'

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        width, depth, drop_connect = _SCALING[self.arch]
        stem_ch = round_filters(32, width)
        x = nn.Conv(stem_ch, (3, 3), strides=(2, 2), padding='SAME', use_bias=False)(x)
        x = nn.swish(Norm(eps=1e-3)(x))  # efficientnet_pytorch batch_norm_epsilon

        plan = block_plan(self.arch)
        # drop-connect divides by the TRUNCATED block count: the reference
        # deletes blocks first, then uses len(self.backbone._blocks)
        # (encoder.py:48-55, model.py drop_connect_rate * idx / len(blocks))
        n_total = len(plan)
        endpoints: Dict[str, jnp.ndarray] = {}
        prev = x
        for idx, (k, s, e, i, o, se) in enumerate(plan):
            rate = drop_connect * idx / n_total
            x = MBConv(k, s, e, o, se, drop_rate=rate)(x, train=train)
            if prev.shape[-3] > x.shape[-3]:
                endpoints[f'reduction_{len(endpoints) + 1}'] = prev
            prev = x
        endpoints[f'reduction_{len(endpoints) + 1}'] = x
        return endpoints
