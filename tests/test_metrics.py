"""Metric tests with hand-computed values (SURVEY.md §4)."""
import numpy as np

from helpers import make_test_cfg
from stp3_tpu.metrics import IoUMetric, PanopticMetric, PlanningMetric


def test_iou_known_grids():
    m = IoUMetric(2)
    pred = np.array([[0, 1], [1, 1]])
    tgt = np.array([[0, 1], [0, 1]])
    m.update(pred, tgt)
    # class1: tp=2 fp=1 fn=0 -> 2/3; class0: tp=1 fp=0 fn=1 -> 1/2
    scores = m.compute()
    np.testing.assert_allclose(scores, [0.5, 2 / 3], rtol=1e-6)


def test_iou_absent_score():
    m = IoUMetric(2, absent_score=1.0)
    pred = np.zeros((2, 2), np.int64)
    tgt = np.zeros((2, 2), np.int64)
    m.update(pred, tgt)
    scores = m.compute()
    assert scores[1] == 1.0  # class 1 absent everywhere


def test_iou_accumulates_across_updates():
    m = IoUMetric(2)
    m.update(np.array([[1]]), np.array([[1]]))
    m.update(np.array([[1]]), np.array([[0]]))
    scores = m.compute()
    np.testing.assert_allclose(scores[1], 0.5)  # tp=1 fp=1 fn=0


def test_iou_state_psum_reducible():
    """Metric states are additive pytrees: per-shard updates summed ==
    full-batch update (the DDP dist_reduce_fx='sum' equivalent)."""
    import jax
    full = IoUMetric(2)
    a, b = IoUMetric(2), IoUMetric(2)
    rng = np.random.RandomState(0)
    pred = rng.randint(0, 2, (4, 8, 8))
    tgt = rng.randint(0, 2, (4, 8, 8))
    full.update(pred, tgt)
    a.update(pred[:2], tgt[:2])
    b.update(pred[2:], tgt[2:])
    summed = jax.tree.map(lambda x, y: x + y, a.state, b.state)
    for key in full.state:
        np.testing.assert_array_equal(np.asarray(summed[key]),
                                      np.asarray(full.state[key]))


def test_panoptic_perfect_match():
    m = PanopticMetric(2)
    inst = np.zeros((1, 1, 8, 8), np.int64)
    inst[0, 0, 1:3, 1:3] = 1
    inst[0, 0, 5:7, 5:7] = 2
    m.update(inst, inst)
    scores = m.compute()
    np.testing.assert_allclose(scores['pq'][1], 1.0)
    np.testing.assert_allclose(scores['rq'][1], 1.0)


def test_panoptic_missed_instance():
    m = PanopticMetric(2)
    gt = np.zeros((1, 1, 8, 8), np.int64)
    gt[0, 0, 1:3, 1:3] = 1
    gt[0, 0, 5:7, 5:7] = 2
    pred = np.zeros_like(gt)
    pred[0, 0, 1:3, 1:3] = 1  # only finds one
    m.update(pred, gt)
    scores = m.compute()
    # vehicle: tp=1, fn=1 -> rq = 1 / (1 + 0.5) = 2/3
    np.testing.assert_allclose(scores['rq'][1], 2 / 3)


def test_panoptic_temporal_consistency_penalty():
    m = PanopticMetric(2, temporally_consistent=True)
    gt = np.zeros((1, 2, 8, 8), np.int64)
    gt[0, :, 1:3, 1:3] = 1
    pred = gt.copy()
    pred[0, 1][pred[0, 1] == 1] = 2  # id switches between frames
    m.update(pred, gt)
    scores = m.compute()
    assert scores['rq'][1] < 1.0  # inconsistency penalised
    m2 = PanopticMetric(2, temporally_consistent=False)
    m2.update(pred, gt)
    assert m2.compute()['rq'][1] == 1.0


def test_planning_metric_l2_and_collisions():
    cfg = make_test_cfg()
    pm = PlanningMetric(cfg, n_future=2)
    h, w = 16, 16
    gt = np.zeros((1, 2, 3), np.float32)
    gt[0, :, 1] = [1.0, 2.0]  # forward
    trajs = gt.copy()
    trajs[0, :, 0] += 1.0  # 1 m lateral error
    seg = np.zeros((1, 2, h, w), np.float32)
    pm.update(trajs, gt, seg)
    out = pm.compute()
    np.testing.assert_allclose(out['L2'], [1.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(out['obj_col'], 0.0)
    np.testing.assert_allclose(out['obj_box_col'], 0.0)


def test_planning_metric_detects_collision():
    cfg = make_test_cfg()
    pm = PlanningMetric(cfg, n_future=1)
    h, w = 16, 16
    # occupy only the cells around the ego origin (candidate footprint rows);
    # GT drives 5 m forward into free space
    seg = np.zeros((1, 1, h, w), np.float32)
    seg[0, 0, 5:11, :] = 1.0
    gt = np.zeros((1, 1, 3), np.float32)
    gt[0, 0, 1] = 5.0
    trajs = np.zeros((1, 1, 3), np.float32)  # candidate stays in occupied cell
    pm.update(trajs, gt, seg)
    out = pm.compute()
    assert out['obj_box_col'][0] == 1.0
    assert out['obj_col'][0] == 1.0


def test_planning_metric_skips_frames_where_gt_collides():
    cfg = make_test_cfg()
    pm = PlanningMetric(cfg, n_future=1)
    h, w = 16, 16
    seg = np.ones((1, 1, h, w), np.float32)
    gt = np.zeros((1, 1, 3), np.float32)      # GT itself collides
    trajs = np.zeros((1, 1, 3), np.float32)
    pm.update(trajs, gt, seg)
    out = pm.compute()
    assert out['obj_box_col'][0] == 0.0  # skipped


def test_planning_metric_trainval_scale_accumulation():
    """Host int64/float64 accumulators stay exact over trainval-scale
    update counts (fp32 on-device sums would drift; cf. IoUMetric)."""
    from helpers import make_test_cfg
    cfg = make_test_cfg()
    pm = PlanningMetric(cfg, n_future=1)
    h, w = 16, 16
    seg = np.zeros((4, 1, h, w), np.float32)
    gt = np.zeros((4, 1, 3), np.float32)
    gt[:, :, 1] = 2.0
    trajs = gt.copy()
    trajs[:, :, 0] += 1e-3  # tiny lateral error: 1e-3 per sample

    n_updates = 1500  # 6000 samples ~ nuScenes val
    for _ in range(n_updates):
        pm.update(trajs, gt, seg)
    out = pm.compute()
    assert pm.state['obj_col'].dtype == np.int64
    assert pm.state['l2'].dtype == np.float64
    assert pm.state['total'] == 4 * n_updates
    # float64 accumulation keeps the tiny per-sample error exact
    np.testing.assert_allclose(out['L2'], 1e-3, rtol=1e-5)
    np.testing.assert_array_equal(out['obj_col'], 0.0)
