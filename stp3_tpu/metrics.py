"""Evaluation metrics: semantic IoU, panoptic quality, planning L2/collision.

Mirrors reference stp3/metrics.py. TPU-first design: metric *states* are
plain pytrees of arrays so updates jit/psum cleanly across a device mesh
(replacing Lightning's ``dist_reduce_fx='sum'`` DDP reduction,
reference metrics.py:32-35,89-92,286-289):

  * ``IoUMetric`` — per-class TP/FP/FN/support accumulators (jnp update).
  * ``PlanningMetric`` — per-horizon L2 + two collision counters
    (point-wise ``obj_col``, footprint ``obj_box_col``), fully vectorized
    over batch/time in jnp (reference loops per batch, metrics.py:322-355).
  * ``PanopticMetric`` — PQ/SQ/RQ with IoU>0.5 matching and temporal
    instance-id consistency; stays host-side numpy (dynamic shapes,
    per-sequence id maps; eval-only, like the reference's effective use).

Each metric is a tiny class holding the state pytree with
``update``/``compute``/``reset``; ``state`` can be psum-reduced before
``compute`` under multi-device eval.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stp3_tpu.ops.geometry import (calculate_birds_eye_view_parameters,
                                   ego_footprint_grid_pts)
from stp3_tpu.utils.rasterize import polygon


# =====================================================================
# Semantic IoU
# =====================================================================
@jax.jit
def _iou_counts(prediction, target, cls):
    """Per-call TP/FP/FN/support counts (int32 is safe per batch; the
    accumulator below is host int64 so long evaluations cannot wrap)."""
    pred = prediction.reshape(-1)
    tgt = target.reshape(-1)
    is_p = pred[None, :] == cls
    is_t = tgt[None, :] == cls
    return {'tp': (is_p & is_t).sum(axis=1), 'fp': (is_p & ~is_t).sum(axis=1),
            'fn': (~is_p & is_t).sum(axis=1), 'support': is_t.sum(axis=1)}


class IoUMetric:
    """Reference IntersectionOverUnion (metrics.py:15-71). Per-batch counts
    are computed on-device (psum-reducible); totals accumulate host-side in
    int64 (int32 wraps within one nuScenes train-split evaluation)."""

    def __init__(self, n_classes: int, ignore_index: Optional[int] = None,
                 absent_score: float = 0.0):
        self.n_classes = n_classes
        self.ignore_index = ignore_index
        self.absent_score = absent_score
        self._cls = jnp.arange(n_classes)[:, None]
        self.reset()

    def reset(self):
        z = np.zeros((self.n_classes,), np.int64)
        self.state = {'tp': z.copy(), 'fp': z.copy(), 'fn': z.copy(),
                      'support': z.copy()}

    def update(self, prediction, target):
        counts = _iou_counts(jnp.asarray(prediction), jnp.asarray(target), self._cls)
        self.state = {k: self.state[k] + np.asarray(counts[k], np.int64)
                      for k in self.state}

    def compute(self) -> np.ndarray:
        tp = np.asarray(self.state['tp'], np.float64)
        fp = np.asarray(self.state['fp'], np.float64)
        fn = np.asarray(self.state['fn'], np.float64)
        sup = np.asarray(self.state['support'], np.float64)
        scores = np.zeros(self.n_classes)
        for c in range(self.n_classes):
            if c == self.ignore_index:
                continue
            if sup[c] + tp[c] + fp[c] == 0:
                scores[c] = self.absent_score
                continue
            scores[c] = tp[c] / (tp[c] + fp[c] + fn[c])
        if self.ignore_index is not None and 0 <= self.ignore_index < self.n_classes:
            scores = np.concatenate([scores[:self.ignore_index],
                                     scores[self.ignore_index + 1:]])
        return scores


# =====================================================================
# Planning metric
# =====================================================================
class PlanningMetric:
    """Reference PlanningMetric (metrics.py:263-396): per-horizon L2 plus
    point-wise and footprint-polygon collision counts, skipping frames
    where the GT trajectory itself collides."""

    def __init__(self, cfg, n_future: int = 4):
        dx, bx, dim = calculate_birds_eye_view_parameters(
            cfg.LIFT.X_BOUND, cfg.LIFT.Y_BOUND, cfg.LIFT.Z_BOUND)
        self.dx = np.asarray(dx[:2])
        self.bx = np.asarray(bx[:2])
        self.bev_dimension = np.asarray(dim)
        self.W = cfg.EGO.WIDTH
        self.H = cfg.EGO.HEIGHT
        self.n_future = n_future

        # ego footprint cell offsets (reference metrics.py:298-307); the
        # corner convention is shared with the viz panels via one helper
        pts = ego_footprint_grid_pts(self.W, self.H, self.bx, self.dx)
        rr, cc = polygon(pts[:, 1], pts[:, 0])
        self.footprint = jnp.asarray(np.stack([rr, cc], -1).astype(np.int32))  # (K,2)
        self.reset()

        # jit once per instance; closes over static grid params
        self._update_jit = jax.jit(self._update_impl)

    def reset(self):
        # host-side int64/float64 accumulators (same rationale as IoUMetric:
        # fp32 on-device sums lose precision at trainval scale; the per-batch
        # increments are still computed jitted on device)
        t = self.n_future
        self.state = {'obj_col': np.zeros((t,), np.int64),
                      'obj_box_col': np.zeros((t,), np.int64),
                      'l2': np.zeros((t,), np.float64),
                      'total': 0}

    def _box_collision(self, traj, segmentation):
        """traj (T, 2) in the flipped frame; segmentation (T, H, W).
        Footprint-any collision per step (reference evaluate_single_coll)."""
        nx, ny = int(self.bev_dimension[0]), int(self.bev_dimension[1])
        # reference swaps (x, y) -> (y, x) then divides by dx
        swapped = traj[:, ::-1] / jnp.asarray(self.dx, traj.dtype)
        cells = swapped[:, None, :] + self.footprint.astype(traj.dtype)  # (T,K,2)
        r = jnp.clip(cells[..., 0].astype(jnp.int32), 0, nx - 1)
        c = jnp.clip(cells[..., 1].astype(jnp.int32), 0, ny - 1)
        t_idx = jnp.arange(traj.shape[0])[:, None]
        return segmentation[t_idx, r, c].any(axis=-1)            # (T,) bool

    def _update_impl(self, trajs, gt_trajs, segmentation):
        """trajs/gt_trajs (B, T, 3); segmentation (B, T, H, W) {0,1}."""
        nx, ny = int(self.bev_dimension[0]), int(self.bev_dimension[1])
        l2 = jnp.sqrt(((trajs[..., :2] - gt_trajs[..., :2]) ** 2).sum(-1))  # (B,T)

        flip = jnp.asarray([-1.0, 1.0])
        tr = trajs[..., :2] * flip
        gt = gt_trajs[..., :2] * flip

        seg = segmentation.astype(bool)
        gt_box_coll = jax.vmap(self._box_collision)(gt, seg)     # (B,T)
        box_coll = jax.vmap(self._box_collision)(tr, seg)        # (B,T)

        # point-wise collision (reference metrics.py:337-347)
        yi = ((tr[..., 1] - self.bx[0]) / self.dx[0]).astype(jnp.int32)
        xi = ((tr[..., 0] - self.bx[1]) / self.dx[1]).astype(jnp.int32)
        inb = (yi >= 0) & (yi < nx) & (xi >= 0) & (xi < ny)
        t_idx = jnp.arange(trajs.shape[1])[None, :]
        b_idx = jnp.arange(trajs.shape[0])[:, None]
        occ = seg[b_idx, t_idx, jnp.clip(yi, 0, nx - 1), jnp.clip(xi, 0, ny - 1)]
        obj_col = (occ & inb & ~gt_box_coll).sum(axis=0)         # (T,)
        obj_box_col = (box_coll & ~gt_box_coll).sum(axis=0)      # (T,)

        return {'obj_col': obj_col, 'obj_box_col': obj_box_col,
                'l2': l2.sum(axis=0)}

    def update(self, trajs, gt_trajs, segmentation):
        inc = self._update_jit(jnp.asarray(trajs), jnp.asarray(gt_trajs),
                               jnp.asarray(segmentation))
        self.state['obj_col'] += np.asarray(inc['obj_col'], np.int64)
        self.state['obj_box_col'] += np.asarray(inc['obj_box_col'], np.int64)
        self.state['l2'] += np.asarray(inc['l2'], np.float64)
        self.state['total'] += int(np.shape(trajs)[0])

    def compute(self) -> Dict[str, np.ndarray]:
        total = float(max(self.state['total'], 1))
        return {'obj_col': np.asarray(self.state['obj_col']) / total,
                'obj_box_col': np.asarray(self.state['obj_box_col']) / total,
                'L2': np.asarray(self.state['l2']) / total}


# =====================================================================
# Panoptic metric (host-side numpy)
# =====================================================================
class PanopticMetric:
    """Reference PanopticMetric (metrics.py:74-261): PQ/SQ/RQ via a
    bincount confusion matrix, IoU>0.5 matching, and a per-sequence
    instance-id map enforcing temporal consistency for vehicles."""

    def __init__(self, n_classes: int, temporally_consistent: bool = True,
                 vehicles_id: int = 1):
        self.n_classes = n_classes
        self.temporally_consistent = temporally_consistent
        self.vehicles_id = vehicles_id
        self.reset()

    def reset(self):
        z = np.zeros(self.n_classes)
        self.state = {'iou': z.copy(), 'true_positive': z.copy(),
                      'false_positive': z.copy(), 'false_negative': z.copy()}

    def update(self, pred_instance, gt_instance):
        """pred_instance/gt_instance: (B, T, H, W) int; 0 = background."""
        pred_instance = np.asarray(pred_instance)
        gt_instance = np.asarray(gt_instance)
        assert gt_instance.min() == 0, 'ID 0 of gt_instance must be background'
        b, t = gt_instance.shape[:2]
        pred_seg = (pred_instance > 0).astype(np.int64)
        gt_seg = (gt_instance > 0).astype(np.int64)
        for i in range(b):
            unique_id_mapping: Dict[int, int] = {}
            for j in range(t):
                res = self._panoptic_metrics(pred_seg[i, j], pred_instance[i, j],
                                             gt_seg[i, j], gt_instance[i, j],
                                             unique_id_mapping)
                for k in self.state:
                    self.state[k] += res[k]

    def compute(self) -> Dict[str, np.ndarray]:
        tp = self.state['true_positive']
        denom = np.maximum(tp + self.state['false_positive'] / 2
                           + self.state['false_negative'] / 2, 1.0)
        return {'pq': self.state['iou'] / denom,
                'sq': self.state['iou'] / np.maximum(tp, 1.0),
                'rq': tp / denom}

    def _combine_mask(self, segmentation, instance, n_classes, n_all_things):
        """Shift instance ids past class ids; void -> 0 (reference
        metrics.py:238-261)."""
        instance = instance.reshape(-1).astype(np.int64)
        instance_mask = instance > 0
        instance = instance - 1 + n_classes
        seg = segmentation.reshape(-1).astype(np.int64).copy()
        seg_mask = seg < n_classes
        keep = instance_mask & seg_mask
        id_to_cls = -np.ones(n_all_things, dtype=np.int64)
        id_to_cls[instance[keep]] = seg[keep]
        id_to_cls[:n_classes] = np.arange(n_classes)
        seg[instance_mask] = instance[instance_mask]
        seg += 1
        seg[~seg_mask] = 0
        return seg, id_to_cls

    def _panoptic_metrics(self, pred_segmentation, pred_instance,
                          gt_segmentation, gt_instance, unique_id_mapping):
        n_classes = self.n_classes
        result = {k: np.zeros(n_classes) for k in
                  ('iou', 'true_positive', 'false_positive', 'false_negative')}
        n_instances = int(max(pred_instance.max(), gt_instance.max()))
        n_all_things = n_instances + n_classes
        n_things_and_void = n_all_things + 1

        prediction, pred_to_cls = self._combine_mask(
            pred_segmentation, pred_instance, n_classes, n_all_things)
        target, target_to_cls = self._combine_mask(
            gt_segmentation, gt_instance, n_classes, n_all_things)

        x = prediction + n_things_and_void * target
        conf = np.bincount(x, minlength=n_things_and_void ** 2).reshape(
            n_things_and_void, n_things_and_void)[1:, 1:]
        union = conf.sum(0)[None] + conf.sum(1)[:, None] - conf
        iou = np.where(union > 0, (conf + 1e-9) / (union + 1e-9), 0.0)

        mapping = np.argwhere(iou > 0.5)                         # (M, 2): (target, pred)
        is_matching = pred_to_cls[mapping[:, 1]] == target_to_cls[mapping[:, 0]]
        mapping = mapping[is_matching]
        tp_mask = np.zeros_like(conf, dtype=bool)
        tp_mask[mapping[:, 0], mapping[:, 1]] = True

        for target_id, pred_id in mapping:
            cls_id = pred_to_cls[pred_id]
            if (self.temporally_consistent and cls_id == self.vehicles_id
                    and target_id in unique_id_mapping
                    and unique_id_mapping[target_id] != pred_id):
                result['false_negative'][target_to_cls[target_id]] += 1
                result['false_positive'][pred_to_cls[pred_id]] += 1
                unique_id_mapping[target_id] = pred_id
                continue
            result['true_positive'][cls_id] += 1
            result['iou'][cls_id] += iou[target_id, pred_id]
            unique_id_mapping[target_id] = pred_id

        for target_id in range(n_classes, n_all_things):
            if tp_mask[target_id, n_classes:].any():
                continue
            if target_to_cls[target_id] != -1:
                result['false_negative'][target_to_cls[target_id]] += 1
        for pred_id in range(n_classes, n_all_things):
            if tp_mask[n_classes:, pred_id].any():
                continue
            if pred_to_cls[pred_id] != -1 and (conf[:, pred_id] > 0).any():
                result['false_positive'][pred_to_cls[pred_id]] += 1
        return result
