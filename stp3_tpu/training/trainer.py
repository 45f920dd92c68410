"""Training runtime: functional train/val steps over a device mesh.

Replaces the reference's Lightning ``TrainingModule`` (stp3/trainer.py:14-462)
with a TPU-first design:

  * one pure ``loss_fn(params, batch, rng)`` -> (total_loss, aux);
  * ``train_step`` = jit(grad + clip-5 + Adam(+L2)) with the batch sharded
    over a 1-D 'data' mesh — XLA emits the gradient psum over ICI (the
    NCCL-DDP equivalent, SURVEY.md §2.5);
  * label preparation (GT warped to the present frame, reference
    trainer.py:254-360) is pure jnp and runs inside the same jit;
  * homoscedastic uncertainty weighting reads the per-task log-variance
    params that live on the model (reference trainer.py:42-97,125-191);
  * planning trains against GT occupancy/HD-map with a detached front-cam
    feature and cost volume semantics preserved (trainer.py:174-189).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from stp3_tpu.losses import (depth_loss, hdmap_loss, segmentation_loss,
                             spatial_regression_loss)
from stp3_tpu.metrics import IoUMetric, PanopticMetric, PlanningMetric
from stp3_tpu.models.stp3 import STP3, STP3Config
from stp3_tpu.ops.warp import (cumulative_warp_features,
                               cumulative_warp_features_reverse)
from stp3_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from stp3_tpu.utils.instance import predict_instance_segmentation_and_trajectories
from stp3_tpu.utils.network import prepare_image
from stp3_tpu.utils.precision import cast_floating, policy_dtype


class TrainState(train_state.TrainState):
    # running BN statistics (MODEL.NORM='bn' only; None otherwise). Lives on
    # the state so the jitted step can update it functionally — the flax
    # ``batch_stats`` collection made mutable inside loss_fn.
    batch_stats: Any = None


def _trainable_mask(params):
    """False for frozen-BN running statistics ('mean'/'var' leaves of the
    bn_frozen Norm kind) — imported checkpoint stats must not be trained
    or weight-decayed."""
    import jax.tree_util as jtu

    def is_trainable(path, _):
        leaf = path[-1].key if hasattr(path[-1], 'key') else str(path[-1])
        return leaf not in ('mean', 'var')
    return jtu.tree_map_with_path(is_trainable, params)


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Grad-clip 5 -> torch-style Adam L2 weight decay -> Adam
    (reference train.py:51 gradient_clip_val, trainer.py:456-462).
    bn_frozen statistics are masked out entirely."""
    base = optax.chain(
        optax.clip_by_global_norm(float(cfg.GRAD_NORM_CLIP)),
        optax.add_decayed_weights(float(cfg.OPTIMIZER.WEIGHT_DECAY)),
        optax.adam(float(cfg.OPTIMIZER.LR)),
    )
    return optax.chain(
        optax.masked(base, _trainable_mask),
        optax.masked(optax.set_to_zero(),
                     lambda params: jax.tree.map(lambda t: not t,
                                                 _trainable_mask(params))),
    )


class Trainer:
    def __init__(self, cfg, mesh=None):
        self.cfg = cfg
        self.model_cfg = STP3Config.from_cfg(cfg)
        self.model = STP3(self.model_cfg)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.PARALLEL.DP)
        self.spatial_extent = (cfg.LIFT.X_BOUND[1], cfg.LIFT.Y_BOUND[1])
        self.rf = cfg.TIME_RECEPTIVE_FIELD
        self.tx = make_optimizer(cfg)
        # PRECISION 16 -> bf16 activations/weights, fp32 master params
        # (utils/precision.py); geometry inputs and losses stay fp32
        self.compute_dtype = policy_dtype(cfg)

        n_classes = len(cfg.SEMANTIC_SEG.VEHICLE.WEIGHTS)
        self.metric_vehicle_val = IoUMetric(n_classes)
        self.metric_pedestrian_val = (IoUMetric(n_classes)
                                      if cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED else None)
        self.metric_hdmap_val = ([IoUMetric(2, absent_score=1.0)
                                  for _ in cfg.SEMANTIC_SEG.HDMAP.ELEMENTS]
                                 if cfg.SEMANTIC_SEG.HDMAP.ENABLED else None)
        self.metric_panoptic_val = (PanopticMetric(n_classes)
                                    if cfg.INSTANCE_SEG.ENABLED else None)
        self.metric_planning_val = (PlanningMetric(cfg, cfg.N_FUTURE_FRAMES)
                                    if cfg.PLANNING.ENABLED else None)

        bs = batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        self._train_step = jax.jit(
            self._train_step_impl,
            in_shardings=(rep, bs, rep), out_shardings=(rep, rep),
            donate_argnums=(0,))
        # val follows whatever sharding shard_batch chose (the final val
        # batch may be replicated when not divisible by the mesh)
        self._val_forward = jax.jit(self._val_forward_impl)
        # AOT executables kept by warmup_compile (multi-process only);
        # dispatched directly so the post-barrier first step does not
        # re-trace/re-compile (see warmup_compile docstring)
        self._train_step_aot = None
        self._val_forward_aot = None

    # ------------------------------------------------------------------ init
    def init_state(self, rng: jax.Array, batch: Dict[str, np.ndarray]) -> TrainState:
        # jitted init: eager flax init at flagship scale costs ~10 min
        # dispatched op-by-op over a tunneled chip (and ~8 min on the host
        # CPU); as ONE jitted program it compiles once (persistently
        # cached) and runs in seconds
        sample = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[:1]),
                              batch)

        def _init(key, s):
            return self.model.init(
                {'params': key, 'sample': key, 'dropout': key},
                s['image'], s['intrinsics'], s['extrinsics'],
                s['future_egomotion'],
                trajs=s['sample_trajectory'][:, :, 1:],
                gt_trajs=s['gt_trajectory'][:, 1:],
                commands=s['command'],
                target_points=s['target_point'],
                method=STP3.init_full)

        variables = jax.jit(_init)(rng, sample)
        params = variables['params']
        state = TrainState.create(apply_fn=self.model.apply, params=params,
                                  tx=self.tx,
                                  batch_stats=variables.get('batch_stats'))
        return jax.device_put(state, replicated(self.mesh))

    def param_count(self, state: TrainState) -> int:
        return sum(p.size for p in jax.tree.leaves(state.params))

    def warmup_compile(self, state: TrainState, batch, rng) -> None:
        """Multi-process only: AOT-compile the jitted steps on EVERY
        process, then barrier, before any process dispatches. The train
        step's gradient psum is a cross-process gloo/ICI collective whose
        pair connect times out (~30 s) if one process executes while
        another is still compiling — and compile skew of minutes is
        normal. The barrier is a coordination-service (gRPC) barrier, not
        a collective, so it tolerates that skew. ``batch`` is a HOST
        batch; it is shard_batch-placed here (after the single-process
        early return, so single-process startup pays no transfer).

        The compiled executables are KEPT and dispatched directly by
        ``train_step``/``val_step`` — ``jit.lower().compile()`` results
        do not populate the jit dispatch cache, so discarding them would
        re-trace and re-compile (or at best cache-deserialize) AFTER the
        barrier, re-opening the compile-skew window the barrier closed."""
        if jax.process_count() == 1:
            return
        from stp3_tpu.parallel.mesh import coordination_barrier, shard_batch
        batch = shard_batch(batch, self.mesh)
        self._train_step_aot = self._train_step.lower(
            state, batch, rng).compile()
        self._val_forward_aot = self._val_forward.lower(
            state.params, batch, state.batch_stats).compile()
        coordination_barrier('stp3_warmup_compile')

    # ------------------------------------------------------------- labels
    def prepare_future_labels(self, batch) -> Dict[str, jnp.ndarray]:
        """Warp GT to the present frame (reference trainer.py:254-360).
        All labels channels-last; int labels warped as float nearest."""
        cfg = self.cfg
        rf = self.rf
        ego = batch['future_egomotion']
        labels: Dict[str, jnp.ndarray] = {}
        labels['hdmap'] = batch['hdmap'][:, rf - 1].astype(jnp.int32)
        labels['gt_trajectory'] = batch['gt_trajectory']

        if cfg.LIFT.GT_DEPTH:
            down = cfg.MODEL.ENCODER.DOWNSAMPLE
            d = batch['depths'][:, :rf, :, ::down, ::down]
            d = jnp.clip(d, cfg.LIFT.D_BOUND[0], cfg.LIFT.D_BOUND[1] - 1)
            labels['depths'] = (d - cfg.LIFT.D_BOUND[0]).astype(jnp.int32)

        def warp_split(x, mode='nearest'):
            """past frames warped forward, future frames warped back
            (reference trainer.py:279-292)."""
            past = cumulative_warp_features(
                x[:, :rf].astype(jnp.float32), ego[:, :rf], mode,
                self.spatial_extent)[:, :-1]
            future = cumulative_warp_features_reverse(
                x[:, rf - 1:].astype(jnp.float32), ego[:, rf - 1:], mode,
                self.spatial_extent)
            return jnp.concatenate([past, future], axis=1)

        seg = warp_split(batch['segmentation'][..., None])
        labels['segmentation'] = seg[..., 0].astype(jnp.int32)
        if cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED:
            labels['pedestrian'] = warp_split(
                batch['pedestrian'][..., None])[..., 0].astype(jnp.int32)
        if cfg.INSTANCE_SEG.ENABLED:
            labels['instance'] = warp_split(
                batch['instance'][..., None])[..., 0].astype(jnp.int32)
            labels['centerness'] = warp_split(batch['centerness'])
            labels['offset'] = warp_split(batch['offset'])
        if cfg.INSTANCE_FLOW.ENABLED:
            labels['flow'] = warp_split(batch['flow'])
        return labels

    # ------------------------------------------------------------- loss
    def _compute_losses(self, params, output, labels, batch, rng,
                        params_c=None, batch_stats=None):
        """Returns (loss_dict, planner_batch_stats_or_None) — the planner
        apply is a separate model traversal, so its BN sites update in
        their own mutable pass."""
        cfg = self.cfg
        rf = self.rf
        if params_c is None:
            params_c = params
        plan_stats = None
        loss: Dict[str, jnp.ndarray] = {}

        def factor(name):
            return 1.0 / (2.0 * jnp.exp(params[name]))

        loss['segmentation'] = factor('segmentation_weight') * segmentation_loss(
            output['segmentation'], labels['segmentation'],
            cfg.SEMANTIC_SEG.VEHICLE.WEIGHTS, rf, cfg.FUTURE_DISCOUNT,
            cfg.SEMANTIC_SEG.VEHICLE.USE_TOP_K, cfg.SEMANTIC_SEG.VEHICLE.TOP_K_RATIO)
        loss['segmentation_uncertainty'] = 0.5 * params['segmentation_weight']

        if cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED:
            loss['pedestrian'] = factor('pedestrian_weight') * segmentation_loss(
                output['pedestrian'], labels['pedestrian'],
                cfg.SEMANTIC_SEG.PEDESTRIAN.WEIGHTS, rf, cfg.FUTURE_DISCOUNT,
                cfg.SEMANTIC_SEG.PEDESTRIAN.USE_TOP_K,
                cfg.SEMANTIC_SEG.PEDESTRIAN.TOP_K_RATIO)
            loss['pedestrian_uncertainty'] = 0.5 * params['pedestrian_weight']

        if cfg.SEMANTIC_SEG.HDMAP.ENABLED:
            loss['hdmap'] = factor('hdmap_weight') * hdmap_loss(
                output['hdmap'], labels['hdmap'], cfg.SEMANTIC_SEG.HDMAP.WEIGHTS,
                cfg.SEMANTIC_SEG.HDMAP.TRAIN_WEIGHT,
                cfg.SEMANTIC_SEG.HDMAP.USE_TOP_K, cfg.SEMANTIC_SEG.HDMAP.TOP_K_RATIO)
            loss['hdmap_uncertainty'] = 0.5 * params['hdmap_weight']

        if cfg.INSTANCE_SEG.ENABLED:
            loss['instance_center'] = factor('centerness_weight') * spatial_regression_loss(
                output['instance_center'], labels['centerness'], norm=2,
                n_present=rf, future_discount=cfg.FUTURE_DISCOUNT)
            loss['centerness_uncertainty'] = 0.5 * params['centerness_weight']
            loss['instance_offset'] = factor('offset_weight') * spatial_regression_loss(
                output['instance_offset'], labels['offset'], norm=1,
                n_present=rf, future_discount=cfg.FUTURE_DISCOUNT,
                ignore_index=cfg.DATASET.IGNORE_INDEX)
            loss['offset_uncertainty'] = 0.5 * params['offset_weight']

        if cfg.LIFT.GT_DEPTH:
            loss['depths'] = factor('depths_weight') * depth_loss(
                output['depth_prediction'], labels['depths'])
            loss['depths_uncertainty'] = 0.5 * params['depths_weight']

        if cfg.INSTANCE_FLOW.ENABLED:
            loss['instance_flow'] = factor('flow_weight') * spatial_regression_loss(
                output['instance_flow'], labels['flow'], norm=1,
                n_present=rf, future_discount=cfg.FUTURE_DISCOUNT,
                ignore_index=cfg.DATASET.IGNORE_INDEX)
            loss['flow_uncertainty'] = 0.5 * params['flow_weight']

        if cfg.PLANNING.ENABLED:
            occ_ped = (labels['pedestrian'][:, rf:] if 'pedestrian' in labels
                       else jnp.zeros_like(labels['segmentation'][:, rf:]))
            occupancy = jnp.logical_or(labels['segmentation'][:, rf:],
                                       occ_ped).astype(jnp.float32)
            dt = self.compute_dtype
            variables = {'params': params_c}
            if batch_stats is not None:
                variables['batch_stats'] = batch_stats
            plan_args = (
                jax.lax.stop_gradient(output['cam_front']).astype(dt),
                batch['sample_trajectory'][:, :, 1:],
                labels['gt_trajectory'][:, 1:],
                output['costvolume'][:, rf:],
                occupancy,
                labels['hdmap'].astype(jnp.float32),
                batch['command'],
                batch['target_point'])
            if batch_stats is not None:
                (pl_loss, final_traj), mut = self.model.apply(
                    variables, *plan_args, train=True, method=STP3.plan,
                    rngs={'dropout': rng}, mutable=['batch_stats'])
                plan_stats = mut['batch_stats']
            else:
                pl_loss, final_traj = self.model.apply(
                    variables, *plan_args, train=True, method=STP3.plan,
                    rngs={'dropout': rng})
            loss['planning'] = factor('planning_weight') * pl_loss.astype(jnp.float32)
            loss['planning_uncertainty'] = 0.5 * params['planning_weight']
        return loss, plan_stats

    def loss_fn(self, params, batch, rng, batch_stats=None):
        """Pure loss; aux is (loss_dict, new_batch_stats_or_None)."""
        labels = self.prepare_future_labels(batch)
        rng_sample, rng_drop, rng_plan = jax.random.split(rng, 3)
        params_c = cast_floating(params, self.compute_dtype)
        image = prepare_image(batch['image'], self.compute_dtype)
        fwd_args = (image, batch['intrinsics'], batch['extrinsics'],
                    batch['future_egomotion'])
        rngs = {'sample': rng_sample, 'dropout': rng_drop}
        if batch_stats is not None:
            output, mut = self.model.apply(
                {'params': params_c, 'batch_stats': batch_stats}, *fwd_args,
                train=True, rngs=rngs, mutable=['batch_stats'])
            new_stats = {**batch_stats, **mut['batch_stats']}
        else:
            output = self.model.apply({'params': params_c}, *fwd_args,
                                      train=True, rngs=rngs)
            new_stats = None
        # losses in fp32 (log-softmax etc. are unstable in bf16)
        output = cast_floating(output, jnp.float32)
        loss, plan_stats = self._compute_losses(
            params, output, labels, batch, rng_plan, params_c=params_c,
            batch_stats=batch_stats)
        if new_stats is not None and plan_stats is not None and 'planner' in plan_stats:
            # the planner traversal only touches its own subtree; everything
            # else in its returned collection is the stale input
            new_stats['planner'] = plan_stats['planner']
        total = sum(loss.values())
        return total, (loss, new_stats)

    # ------------------------------------------------------------- steps
    def _train_step_impl(self, state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (total, (loss_dict, new_stats)), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True)(state.params, batch, rng,
                                        state.batch_stats)
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        loss_dict = dict(loss_dict)
        loss_dict['total'] = total
        return state, loss_dict

    def train_step(self, state, batch, rng):
        if self._train_step_aot is not None:
            return self._train_step_aot(state, batch, rng)
        return self._train_step(state, batch, rng)

    def _val_forward_impl(self, params, batch, batch_stats=None):
        labels = self.prepare_future_labels(batch)
        params_c = cast_floating(params, self.compute_dtype)
        variables = {'params': params_c}
        if batch_stats is not None:
            # eval mode: running averages, collection NOT mutable
            variables['batch_stats'] = batch_stats
        image = prepare_image(batch['image'], self.compute_dtype)
        output = self.model.apply(
            variables, image, batch['intrinsics'],
            batch['extrinsics'], batch['future_egomotion'], train=False)
        if self.cfg.PLANNING.ENABLED:
            rf = self.rf
            seg_pred = output['segmentation'].argmax(-1)
            ped_pred = (output['pedestrian'].argmax(-1)
                        if self.cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED
                        else jnp.zeros_like(seg_pred))
            occupancy = jnp.logical_or(seg_pred, ped_pred)
            _, final_traj = self.model.apply(
                variables, output['cam_front'],
                batch['sample_trajectory'][:, :, 1:].astype(self.compute_dtype),
                labels['gt_trajectory'][:, 1:].astype(self.compute_dtype),
                output['costvolume'][:, rf:],
                occupancy[:, rf:].astype(self.compute_dtype),
                output['hdmap'], batch['command'],
                batch['target_point'].astype(self.compute_dtype),
                train=False, method=STP3.plan)
            output['final_traj'] = final_traj
        return cast_floating(output, jnp.float32), labels

    def val_forward(self, params, batch, batch_stats=None):
        """Forward-only dispatch, preferring the AOT executable kept by
        warmup_compile. Falls back to jit dispatch when the batch
        signature differs from the warmup batch: shape/dtype/pytree
        mismatches raise TypeError, but an input-SHARDING mismatch (the
        final val batch is replicated when not divisible by the mesh —
        the common case here) raises ValueError."""
        if self._val_forward_aot is not None:
            try:
                return self._val_forward_aot(params, batch, batch_stats)
            except (TypeError, ValueError):
                pass
        return self._val_forward(params, batch, batch_stats)

    def val_step(self, params, batch, batch_stats=None) -> Tuple[Dict, Dict]:
        """Forward + metric updates (reference trainer.py:199-250).

        Multi-process: outputs/labels live on the GLOBAL mesh (not fully
        addressable); each process pulls ITS batch rows to host
        (``process_local``) and updates its own metric accumulators —
        ``compute_metrics`` sums them across processes.

        A 'valid' batch key (per-row bool; NumpyLoader with_valid_mask)
        marks wrap-around padding duplicates on ragged multi-process val
        tails — those rows are masked out of every metric update, so the
        summed metrics equal the single-process run EXACTLY (torch's
        DistributedSampler double-counts them; we match the reference's
        VALUES by not double-counting). It is popped before the forward so
        the jit/AOT input pytree matches the warmup batch."""
        cfg = self.cfg
        rf = self.rf
        batch = dict(batch)
        valid = batch.pop('valid', None)
        output, labels = self.val_forward(params, batch, batch_stats)
        if jax.process_count() > 1:
            from stp3_tpu.parallel.mesh import process_local
            output = jax.tree.map(process_local, output)
            labels = jax.tree.map(process_local, labels)
            if valid is not None:
                valid = process_local(valid)
        if valid is not None:
            vmask = np.asarray(valid).astype(bool)
            m = (lambda a: a[vmask]) if not vmask.all() else (lambda a: a)
        else:
            m = lambda a: a

        seg_pred = m(np.asarray(output['segmentation'])).argmax(-1)
        self.metric_vehicle_val.update(
            seg_pred[:, rf - 1:],
            m(np.asarray(labels['segmentation']))[:, rf - 1:])
        if self.metric_pedestrian_val is not None:
            ped_pred = m(np.asarray(output['pedestrian'])).argmax(-1)
            self.metric_pedestrian_val.update(
                ped_pred[:, rf - 1:],
                m(np.asarray(labels['pedestrian']))[:, rf - 1:])
        if self.metric_hdmap_val is not None:
            hd = m(np.asarray(output['hdmap']))
            hdl = m(np.asarray(labels['hdmap']))
            for i, metric in enumerate(self.metric_hdmap_val):
                pred_i = hd[..., 2 * i:2 * (i + 1)].argmax(-1)
                metric.update(pred_i, hdl[..., i])
        if self.metric_panoptic_val is not None:
            consistent = predict_instance_segmentation_and_trajectories(output)
            self.metric_panoptic_val.update(
                m(np.asarray(consistent))[:, rf - 1:],
                m(np.asarray(labels['instance']))[:, rf - 1:])
        if self.metric_planning_val is not None:
            seg_lab = m(np.asarray(labels['segmentation']))[:, rf:]
            ped_lab = (m(np.asarray(labels['pedestrian']))[:, rf:]
                       if 'pedestrian' in labels else np.zeros_like(seg_lab))
            occupancy = np.logical_or(seg_lab, ped_lab)
            self.metric_planning_val.update(
                m(np.asarray(output['final_traj'])),
                m(np.asarray(labels['gt_trajectory']))[:, 1:], occupancy)
        return output, labels

    # ------------------------------------------------------------- metrics
    def _all_metrics(self):
        ms = [self.metric_vehicle_val, self.metric_pedestrian_val,
              self.metric_panoptic_val, self.metric_planning_val]
        if self.metric_hdmap_val is not None:
            ms.extend(self.metric_hdmap_val)
        return [m for m in ms if m is not None]

    def compute_metrics(self) -> Dict[str, Any]:
        cfg = self.cfg
        # cross-host metric sum (Lightning dist_reduce_fx='sum' equivalent);
        # no-op single-process
        from stp3_tpu.parallel.mesh import allreduce_host_tree
        for m in self._all_metrics():
            m.state = allreduce_host_tree(m.state)
        out: Dict[str, Any] = {}
        out['iou_vehicle'] = self.metric_vehicle_val.compute()
        if self.metric_pedestrian_val is not None:
            out['iou_pedestrian'] = self.metric_pedestrian_val.compute()
        if self.metric_hdmap_val is not None:
            for name, metric in zip(cfg.SEMANTIC_SEG.HDMAP.ELEMENTS, self.metric_hdmap_val):
                out[f'iou_hdmap_{name}'] = metric.compute()
        if self.metric_panoptic_val is not None:
            out['panoptic'] = self.metric_panoptic_val.compute()
        if self.metric_planning_val is not None:
            out['planning'] = self.metric_planning_val.compute()
        return out

    def reset_metrics(self):
        for m in (self.metric_vehicle_val, self.metric_pedestrian_val,
                  self.metric_panoptic_val, self.metric_planning_val):
            if m is not None:
                m.reset()
        if self.metric_hdmap_val is not None:
            for m in self.metric_hdmap_val:
                m.reset()
