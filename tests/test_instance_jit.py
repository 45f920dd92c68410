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


def test_decode_over_cap_matches_numpy_truncation():
    """Frames with MORE survivors than max_instances must keep the FIRST
    max_instances centers in row-major order — the reference's
    argwhere()[:max_n] truncation (instance.py:129-136), not the most
    confident ones (ADVICE round 1)."""
    rng = np.random.RandomState(3)
    h = w = 32
    # a grid of isolated peaks with RANDOM confidences, more than the cap
    center = np.zeros((h, w), np.float32)
    pts = [(i, j) for i in range(2, h - 2, 5) for j in range(2, w - 2, 5)]
    for (ci, cj) in pts:
        center[ci, cj] = 0.2 + 0.8 * rng.rand()
    offset = np.zeros((h, w, 2), np.float32)
    fg = np.zeros((h, w), bool)
    fg[1:-1, 1:-1] = True   # keep a background ring (realistic frames do)
    cap = len(pts) // 2  # force truncation

    inst_np, _ = get_instance_segmentation_and_centers(
        center, offset, fg, max_n_instance_centers=cap)
    seg_logits = np.zeros((1, 1, h, w, 2), np.float32)
    seg_logits[0, 0, ..., 1] = np.where(fg, 5.0, -5.0)
    inst_jit = np.asarray(decode_instances(
        jnp.asarray(seg_logits), jnp.asarray(center[None, None, :, :, None]),
        jnp.asarray(offset[None, None]), max_instances=cap))[0, 0]
    np.testing.assert_array_equal(inst_jit, inst_np)
