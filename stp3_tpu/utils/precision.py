"""Mixed-precision policy: bf16 compute with fp32 master params.

The reference trains with torch AMP fp16 + loss scaling (train.py:46,
``PRECISION: 16`` in every config). The TPU-native equivalent is bf16 —
same exponent range as fp32, so no loss scaling. Implementation is the
t5x-style parameter cast: master params stay fp32 in the optimizer;
``cast_floating`` produces bf16 copies for the forward/backward (the cast
is differentiable, so gradients accumulate back into fp32), and inputs are
cast alongside. flax norm layers force float32 reductions internally, and
all pose/geometry math is pinned fp32 (``ops.geometry.posemm``), so only
the bulk activations/weights drop precision.

Things intentionally kept fp32 even under the policy:
  * camera intrinsics/extrinsics + frustum geometry (voxel quantization
    would shift at bf16 — see ops/geometry.py);
  * loss computation (outputs are upcast before log-softmax etc.).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_floating(tree: Any, dtype) -> Any:
    """Cast every floating-point array leaf to ``dtype``; ints untouched."""
    def cast(x):
        if isinstance(x, (jnp.ndarray, jax.Array)) and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        import numpy as np
        if isinstance(x, np.ndarray) and np.issubdtype(x.dtype, np.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def policy_dtype(cfg):
    """cfg.PRECISION 16 -> bfloat16 compute; anything else -> float32."""
    return jnp.bfloat16 if int(cfg.PRECISION) == 16 else jnp.float32
