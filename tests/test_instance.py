"""Instance label generation + post-processing tests (SURVEY.md §4:
'synthetic two-blob heatmap -> 2 instances')."""
import numpy as np

from stp3_tpu.utils import instance as I


def test_find_instance_centers_two_blobs():
    heat = np.zeros((16, 16), np.float32)
    heat[4, 4] = 1.0
    heat[10, 12] = 0.9
    centers = I.find_instance_centers(heat, conf_threshold=0.1)
    assert len(centers) == 2
    assert {tuple(c) for c in centers} == {(4, 4), (10, 12)}


def test_nms_suppresses_neighbours():
    heat = np.zeros((16, 16), np.float32)
    heat[4, 4] = 1.0
    heat[4, 5] = 0.8  # adjacent, lower -> suppressed by 3x3 NMS
    centers = I.find_instance_centers(heat)
    assert len(centers) == 1 and tuple(centers[0]) == (4, 4)


def test_group_pixels_nearest_center():
    centers = np.array([[2.0, 2.0], [10.0, 10.0]], np.float32)
    offsets = np.zeros((16, 16, 2), np.float32)
    ids = I.group_pixels(centers, offsets)
    assert ids[0, 0] == 1
    assert ids[15, 15] == 2


def test_get_instance_segmentation_and_centers_end_to_end():
    h = w = 16
    heat = np.zeros((h, w), np.float32)
    heat[4, 4] = 1.0
    heat[10, 12] = 0.9
    offsets = np.zeros((h, w, 2), np.float32)
    fg = np.zeros((h, w), bool)
    fg[3:6, 3:6] = True
    fg[9:12, 11:14] = True
    seg, centers = I.get_instance_segmentation_and_centers(heat, offsets, fg)
    assert seg.max() == 2
    assert (seg[3:6, 3:6] > 0).all()
    assert seg[0, 0] == 0


def test_label_generation_centroid_and_offsets():
    inst = np.zeros((1, 16, 16), np.int64)
    inst[0, 4:7, 4:7] = 1  # centroid (5, 5)
    ego = np.zeros((1, 6), np.float32)
    center, offset, flow = I.convert_instance_mask_to_center_and_offset_label(
        inst, ego, num_instances=1, spatial_extent=(8.0, 8.0))
    assert center.shape == (1, 16, 16, 1)
    np.testing.assert_allclose(center[0, 5, 5, 0], 1.0, atol=1e-6)
    # offset at (4,4) points to centroid: (+1, +1)
    np.testing.assert_allclose(offset[0, 4, 4], [1.0, 1.0])
    # background pixels ignored
    assert offset[0, 0, 0, 0] == 255.0


def test_label_generation_flow():
    # instance moves +2 rows between frames; no egomotion
    inst = np.zeros((2, 16, 16), np.int64)
    inst[0, 4:6, 4:6] = 1
    inst[1, 6:8, 4:6] = 1
    ego = np.zeros((2, 6), np.float32)
    _, _, flow = I.convert_instance_mask_to_center_and_offset_label(
        inst, ego, num_instances=1, subtract_egomotion=False,
        spatial_extent=(8.0, 8.0))
    # flow stamped on frame 0's mask = displacement (2, 0)
    np.testing.assert_allclose(flow[0, 4, 4], [2.0, 0.0])
    assert flow[0, 0, 0, 0] == 255.0


def test_temporal_consistency_keeps_ids():
    # one instance drifting; ids should persist across frames
    inst = np.zeros((3, 16, 16), np.int64)
    inst[0, 2:5, 2:5] = 1
    inst[1, 3:6, 2:5] = 1
    inst[2, 4:7, 2:5] = 1
    flow = np.zeros((3, 16, 16, 2), np.float32)
    flow[..., 0] = 1.0  # moving +1 row/frame
    out = I.make_instance_id_temporally_consistent(inst, flow)
    assert out[0].max() == out[1].max() == out[2].max() == 1


def test_predict_instance_segmentation_pipeline():
    b, s, h, w = 1, 2, 16, 16
    seg_logits = np.zeros((b, s, h, w, 2), np.float32)
    seg_logits[..., 1] = -5.0
    seg_logits[0, :, 3:6, 3:6, 1] = 5.0  # vehicle blob
    center = np.zeros((b, s, h, w, 1), np.float32)
    center[0, :, 4, 4, 0] = 1.0
    offset = np.zeros((b, s, h, w, 2), np.float32)
    flow = np.zeros((b, s, h, w, 2), np.float32)
    out = {'segmentation': seg_logits, 'instance_center': center,
           'instance_offset': offset, 'instance_flow': flow}
    consistent = I.predict_instance_segmentation_and_trajectories(out)
    assert consistent.shape == (b, s, h, w)
    assert (consistent[0, :, 4, 4] == 1).all()
    assert consistent[0, 0, 0, 0] == 0
