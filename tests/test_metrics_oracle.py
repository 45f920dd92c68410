"""Eval metrics vs the ACTUAL reference stp3/metrics.py (runnable via the
reference_oracle pytorch_lightning.metrics shim — the Panoptic/Planning
math lives entirely in the reference file; the shim only provides the
Metric state container).

BASELINE.md's within-1% comparison is made in these metrics' units, so
metric parity is as load-bearing as model parity: an accounting drift
here silently re-scales every headline number.

  * PanopticMetric — PQ/SQ/RQ with the temporal-consistency rule
    (reference metrics.py:74-260), driven with a REALISTIC prediction:
    the decode pipeline's consistent ids for slightly corrupted model
    outputs, plus a hand-made id-switch case.
  * PlanningMetric — L2 + both collision variants with the
    GT-collision skip (reference metrics.py:262-395).
  * IntersectionOverUnion — absent-score semantics (caveat: the
    per-class tp/fp/fn counting underneath is the shim's faithful
    re-implementation of lightning 0.x stat_scores_multiple_classes;
    the absent-score/compute logic under test is the reference's own).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import reference_oracle as ro  # noqa: E402

ro.install()

from stp3 import metrics as ref_metrics  # noqa: E402  (reference)

from helpers import make_test_cfg  # noqa: E402
from stp3_tpu.metrics import IoUMetric, PanopticMetric, PlanningMetric  # noqa: E402
from test_instance_oracle import _instance_video  # noqa: E402


def test_panoptic_metric_parity():
    """GT vs a perturbed prediction: dropped instance in one frame, a
    shifted box, and an id switch mid-sequence (exercises the
    temporal-consistency FP/FN rule)."""
    inst, _ = _instance_video(seq_len=4, n_inst=3, seed=13)
    gt = inst[None]                                  # (1, S, H, W)
    pred = inst.copy()
    pred[1][pred[1] == 2] = 0                        # instance 2 missing at t=1
    pred[2] = np.roll(pred[2], 2, axis=1)            # shifted boxes at t=2
    swap = pred[3].copy()
    pred[3][swap == 1] = 3                           # id switch 1<->3 at t=3
    pred[3][swap == 3] = 1
    pred = pred[None]

    ours = PanopticMetric(n_classes=2)
    ours.update(pred, gt)
    got = ours.compute()

    ref = ref_metrics.PanopticMetric(n_classes=2)
    ref.update(torch.from_numpy(pred).long(), torch.from_numpy(gt).long())
    want = ref.compute()
    for key in ('pq', 'sq', 'rq'):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   want[key].numpy(), rtol=1e-6,
                                   err_msg=key)
    assert np.asarray(got['pq'])[1] > 0              # non-degenerate


def test_panoptic_metric_parity_on_decoded_prediction():
    """End-to-end eval chain: model outputs -> OUR decode -> both
    panoptic metrics. The decode's consistent ids differ from GT ids by
    construction (fresh numbering), which is exactly what the metric's
    id mapping must absorb identically on both sides."""
    from stp3_tpu.utils.instance import (
        convert_instance_mask_to_center_and_offset_label,
        predict_instance_segmentation_and_trajectories)

    inst, ego = _instance_video(seq_len=3, n_inst=3, seed=17)
    cen, off, flow = convert_instance_mask_to_center_and_offset_label(
        inst, ego, num_instances=3, ignore_index=255,
        subtract_egomotion=True, spatial_extent=(8.0, 8.0))
    fg = (inst > 0).astype(np.float32)
    out = {
        'segmentation': (np.stack([1.0 - fg, fg], axis=-1) * 10.0)[None],
        'instance_center': np.asarray(cen, np.float32)[None],
        'instance_offset': np.where(off == 255, 0.0, off).astype(np.float32)[None],
        'instance_flow': np.where(flow == 255, 0.0, flow).astype(np.float32)[None],
    }
    pred = np.asarray(predict_instance_segmentation_and_trajectories(out))
    gt = inst[None]

    ours = PanopticMetric(n_classes=2)
    ours.update(pred, gt)
    got = ours.compute()
    ref = ref_metrics.PanopticMetric(n_classes=2)
    ref.update(torch.from_numpy(pred).long(), torch.from_numpy(gt).long())
    want = ref.compute()
    for key in ('pq', 'sq', 'rq'):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   want[key].numpy(), rtol=1e-6,
                                   err_msg=key)


def test_planning_metric_parity():
    cfg = make_test_cfg()
    nf = cfg.N_FUTURE_FRAMES
    rng = np.random.RandomState(3)
    b = 4
    hb = int((cfg.LIFT.X_BOUND[1] - cfg.LIFT.X_BOUND[0]) / cfg.LIFT.X_BOUND[2])
    trajs = np.cumsum(rng.randn(b, nf, 3).astype(np.float32) * 1.5, axis=1)
    gt = np.cumsum(rng.randn(b, nf, 3).astype(np.float32) * 0.5, axis=1)
    # sparse obstacles: at high density the GT trajectory itself collides
    # everywhere and the GT-collision skip zeroes both accumulators
    seg = (rng.rand(b, nf, hb, hb) < 0.03).astype(np.int64)

    ours = PlanningMetric(cfg, nf)
    ours.update(trajs.copy(), gt.copy(), seg.copy())
    got = ours.compute()

    ref = ref_metrics.PlanningMetric(cfg, n_future=nf)
    # fresh tensors: the reference mutates trajs in place (metrics.py:344)
    ref.update(torch.from_numpy(trajs.copy()), torch.from_numpy(gt.copy()),
               torch.from_numpy(seg.copy()))
    want = ref.compute()
    for key in ('L2', 'obj_col', 'obj_box_col'):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   want[key].numpy(), rtol=1e-5,
                                   atol=1e-7, err_msg=key)
    assert float(np.asarray(got['obj_box_col']).sum()) > 0  # non-degenerate


@pytest.mark.parametrize('absent_score', [0.0, 1.0])
def test_iou_metric_parity(absent_score):
    rng = np.random.RandomState(5)
    ours = IoUMetric(3, absent_score=absent_score)
    ref = ref_metrics.IntersectionOverUnion(3, absent_score=absent_score)
    for _ in range(3):
        # class 2 never appears: exercises the absent-score branch
        pred = rng.randint(0, 2, (2, 8, 8))
        tgt = rng.randint(0, 2, (2, 8, 8))
        ours.update(pred, tgt)
        ref.update(torch.from_numpy(pred), torch.from_numpy(tgt))
    np.testing.assert_allclose(np.asarray(ours.compute()),
                               ref.compute().numpy(), rtol=1e-6)
