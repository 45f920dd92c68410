"""Instance label generation + eval post-processing vs the ACTUAL
reference implementation (stp3/utils/instance.py, runnable here: its
deps are torch + scipy + the reference_oracle geometry shims).

Until round 5 these two pipelines were validated with hand-built cases
only (PARITY.md §2.2); this pins them to the reference outputs directly:

  * ``convert_instance_mask_to_center_and_offset_label`` — the LABEL
    GENERATOR every dataset backend uses (centerness gaussians, centroid
    offsets, ego-compensated future displacement stamped on the previous
    frame's mask; reference instance.py:12-78). A drift here corrupts
    training supervision silently.
  * ``predict_instance_segmentation_and_trajectories`` — the eval
    decode (center NMS -> pixel grouping -> Hungarian temporal ids;
    reference instance.py:80-330). A drift here corrupts the panoptic
    metric, id-for-id.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import reference_oracle as ro  # noqa: E402

ro.install()

from stp3.utils import instance as ref_instance  # noqa: E402  (reference)

from stp3_tpu.utils.instance import (  # noqa: E402
    convert_instance_mask_to_center_and_offset_label,
    predict_instance_segmentation_and_trajectories)


def _instance_video(seq_len=4, h=32, w=32, n_inst=3, seed=7):
    """Moving-box instance masks + non-cell-aligned forward egomotion."""
    rng = np.random.RandomState(seed)
    inst = np.zeros((seq_len, h, w), np.int32)
    for i in range(1, n_inst + 1):
        r0, c0 = rng.randint(4, h - 10), rng.randint(4, w - 10)
        dr, dc = rng.randint(-2, 3), rng.randint(-2, 3)
        hh, ww = rng.randint(2, 5), rng.randint(2, 5)
        for t in range(seq_len):
            r, c = r0 + dr * t, c0 + dc * t
            if 0 <= r < h - hh and 0 <= c < w - ww:
                inst[t, r:r + hh, c:c + ww] = i
    ego = np.tile(np.array([-1.73, 0.083, 0, 0, 0, -0.037], np.float32),
                  (seq_len, 1))
    return inst, ego


def test_center_offset_flow_label_parity():
    inst, ego = _instance_video()
    se = (8.0, 8.0)
    c_j, o_j, f_j = convert_instance_mask_to_center_and_offset_label(
        inst, ego, num_instances=3, ignore_index=255,
        subtract_egomotion=True, spatial_extent=se)
    with torch.no_grad():
        c_t, o_t, f_t = ref_instance.convert_instance_mask_to_center_and_offset_label(
            torch.from_numpy(inst), torch.from_numpy(ego), num_instances=3,
            ignore_index=255, subtract_egomotion=True, spatial_extent=se)
    np.testing.assert_allclose(np.asarray(c_j),
                               c_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5, err_msg='centerness')
    np.testing.assert_allclose(np.asarray(o_j),
                               o_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5, err_msg='offset')
    np.testing.assert_allclose(np.asarray(f_j),
                               f_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5, err_msg='flow')
    # the labels are non-trivial (instances actually moved)
    assert (np.asarray(f_j) != 255).any() and np.asarray(c_j).max() > 0.5


@pytest.mark.parametrize('jit_decode', [False, True])
def test_instance_decode_parity(jit_decode):
    """Identical 'model outputs' (built from a GT instance video) decoded
    by both pipelines must give the SAME consistent instance ids."""
    inst, ego = _instance_video(seed=11)
    se = (8.0, 8.0)
    cen, off, flow = convert_instance_mask_to_center_and_offset_label(
        inst, ego, num_instances=3, ignore_index=255,
        subtract_egomotion=True, spatial_extent=se)
    fg = (inst > 0).astype(np.float32)
    seg_logits = np.stack([1.0 - fg, fg], axis=-1) * 10.0   # (S,H,W,2)
    # replace ignore_index stamps with zeros: these are PREDICTIONS now
    off = np.where(off == 255, 0.0, off).astype(np.float32)
    flow = np.where(flow == 255, 0.0, flow).astype(np.float32)

    out_j = {
        'segmentation': seg_logits[None],
        'instance_center': np.asarray(cen, np.float32)[None],
        'instance_offset': off[None],
        'instance_flow': flow[None],
    }
    got = predict_instance_segmentation_and_trajectories(
        out_j, jit_decode=jit_decode)

    def chan_first(x):
        return torch.from_numpy(np.moveaxis(x, -1, 2).copy())

    out_t = {
        'segmentation': chan_first(out_j['segmentation']),
        'instance_center': chan_first(out_j['instance_center']),
        'instance_offset': chan_first(out_j['instance_offset']),
        'instance_flow': chan_first(out_j['instance_flow']),
    }
    with torch.no_grad():
        want = ref_instance.predict_instance_segmentation_and_trajectories(out_t)
    np.testing.assert_array_equal(np.asarray(got), want.numpy())
    assert np.asarray(got).max() >= 2    # multiple instances survived
