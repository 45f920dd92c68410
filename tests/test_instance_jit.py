"""Jit instance decoding (utils/instance_jit.py) matches the host-side numpy
path (utils/instance.py) id-for-id on per-frame decoding."""
import numpy as np

import jax.numpy as jnp

from stp3_tpu.utils.instance import get_instance_segmentation_and_centers
from stp3_tpu.utils.instance_jit import decode_instances


def _random_scene(rng, h, w, n_blobs):
    """Synthesize decoder-like outputs: gaussian center blobs, offsets
    pointing at the nearest blob center, a foreground disc per blob."""
    center = np.zeros((h, w), np.float32)
    offset = rng.randn(h, w, 2).astype(np.float32) * 0.3
    fg = np.zeros((h, w), bool)
    gx, gy = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    pts = np.stack([rng.randint(3, h - 3, n_blobs),
                    rng.randint(3, w - 3, n_blobs)], -1)
    for (ci, cj) in pts:
        d2 = (gx - ci) ** 2 + (gy - cj) ** 2
        center = np.maximum(center, np.exp(-d2 / 4.0))
        mask = d2 <= 9
        fg |= mask
        offset[mask] = np.stack([ci - gx[mask], cj - gy[mask]], -1)
    return center, offset, fg


def test_decode_matches_numpy_path():
    rng = np.random.RandomState(0)
    h = w = 48
    b, t = 2, 3
    seg_logits = np.zeros((b, t, h, w, 2), np.float32)
    centers = np.zeros((b, t, h, w, 1), np.float32)
    offsets = np.zeros((b, t, h, w, 2), np.float32)
    expected = np.zeros((b, t, h, w), np.int64)
    for i in range(b):
        for j in range(t):
            c, o, fg = _random_scene(rng, h, w, n_blobs=rng.randint(0, 5))
            centers[i, j, ..., 0] = c
            offsets[i, j] = o
            seg_logits[i, j, ..., 1] = np.where(fg, 5.0, -5.0)
            inst, _ = get_instance_segmentation_and_centers(c, o, fg)
            expected[i, j] = inst

    got = np.asarray(decode_instances(jnp.asarray(seg_logits),
                                      jnp.asarray(centers),
                                      jnp.asarray(offsets)))
    np.testing.assert_array_equal(got, expected)


def test_decode_empty_frame_is_all_background():
    got = np.asarray(decode_instances(
        jnp.zeros((1, 1, 16, 16, 2)), jnp.zeros((1, 1, 16, 16, 1)),
        jnp.zeros((1, 1, 16, 16, 2))))
    assert (got == 0).all()
