"""Open-loop evaluation CLI (reference evaluate.py:28-169).

    python evaluate.py --checkpoint <ckpt_dir> [--dataroot <path>]
        [KEY VALUE ...]

Loads an Orbax checkpoint (+ its stored config), runs the no-grad loop
over the val split computing IoU / panoptic / planning metrics, with the
planning metrics bucketed per second of horizon
(PlanningMetric(cfg, 2*(i+1)); reference evaluate.py:70-73,135-137).
Planning consumes PREDICTED occupancy/HD-map while the collision metric
scores against GT occupancy (reference :121-137).
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp  # noqa: E402

from stp3_tpu.config import get_cfg  # noqa: E402
from stp3_tpu.datas.dataloaders import prepare_dataloaders  # noqa: E402
from stp3_tpu.metrics import (IoUMetric, PanopticMetric,  # noqa: E402
                              PlanningMetric)
from stp3_tpu.models.stp3 import STP3  # noqa: E402
from stp3_tpu.training import checkpoint as ckpt_lib  # noqa: E402
from stp3_tpu.training.trainer import Trainer  # noqa: E402
from stp3_tpu.utils.instance import \
    predict_instance_segmentation_and_trajectories  # noqa: E402


def evaluate(checkpoint_path: str, dataroot: str = '', extra_opts=None,
             save_visualisations: bool = True):
    cfg_dict = ckpt_lib.load_config_dict(checkpoint_path)
    cfg = get_cfg(cfg_dict=cfg_dict)
    # eval-time cfg surgery (reference evaluate.py:40-44)
    cfg.BATCHSIZE = 1
    cfg.LIFT.GT_DEPTH = False
    # remat is a train-only policy: on forward-only traces nn.remat still
    # changes the compiled program (verified: HLO differs), and only the
    # remat-free inference program is the one benchmarked/validated.
    cfg.MODEL.REMAT = 'none'
    if dataroot:
        cfg.DATASET.DATAROOT = dataroot
        cfg.DATASET.MAP_FOLDER = dataroot
    if extra_opts:
        cfg.merge_from_list(extra_opts)

    _, valloader = prepare_dataloaders(cfg, split='val')
    trainer = Trainer(cfg)

    restored = ckpt_lib.load_checkpoint(checkpoint_path)
    params = restored['params']
    batch_stats = restored.get('batch_stats')  # MODEL.NORM='bn' runs
    print(f'Loaded weights from {checkpoint_path}')

    rf = cfg.TIME_RECEPTIVE_FIELD
    n_classes = len(cfg.SEMANTIC_SEG.VEHICLE.WEIGHTS)
    hdmap_class = cfg.SEMANTIC_SEG.HDMAP.ELEMENTS
    future_second = cfg.N_FUTURE_FRAMES // 2

    metric_vehicle = IoUMetric(n_classes)
    metric_pedestrian = (IoUMetric(n_classes)
                         if cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED else None)
    metric_hdmap = ([IoUMetric(2, absent_score=1.0) for _ in hdmap_class]
                    if cfg.SEMANTIC_SEG.HDMAP.ENABLED else None)
    metric_panoptic = (PanopticMetric(n_classes)
                       if cfg.INSTANCE_SEG.ENABLED else None)
    metric_planning = ([PlanningMetric(cfg, 2 * (i + 1))
                        for i in range(future_second)]
                       if cfg.PLANNING.ENABLED else None)

    save_path = None
    if save_visualisations:
        save_path = os.path.join('imgs_eval', cfg.TAG)
        os.makedirs(save_path, exist_ok=True)

    for index, batch in enumerate(valloader):
        batch = dict(batch)
        # per-row padding mask (always all-true here: single-process eval
        # has no wrap-around padding) — popped so the forward's input
        # pytree stays the model-batch contract
        batch.pop('valid', None)
        output, labels = trainer.val_forward(params, batch, batch_stats)
        seg_pred = np.asarray(output['segmentation']).argmax(-1)
        metric_vehicle.update(seg_pred[:, rf - 1:],
                              np.asarray(labels['segmentation'])[:, rf - 1:])
        if metric_pedestrian is not None:
            ped_pred = np.asarray(output['pedestrian']).argmax(-1)
            metric_pedestrian.update(ped_pred[:, rf - 1:],
                                     np.asarray(labels['pedestrian'])[:, rf - 1:])
        if metric_hdmap is not None:
            hd = np.asarray(output['hdmap'])
            for i, metric in enumerate(metric_hdmap):
                metric.update(hd[..., 2 * i:2 * (i + 1)].argmax(-1),
                              np.asarray(labels['hdmap'])[..., i])
        if metric_panoptic is not None:
            consistent = predict_instance_segmentation_and_trajectories(output)
            metric_panoptic.update(consistent[:, rf - 1:],
                                   np.asarray(labels['instance'])[:, rf - 1:])
        if metric_planning is not None:
            final_traj = np.asarray(output['final_traj'])
            gt_traj = np.asarray(labels['gt_trajectory'])
            occ_ped = (np.asarray(labels['pedestrian'])[:, rf:]
                       if 'pedestrian' in labels
                       else np.zeros_like(np.asarray(labels['segmentation'])[:, rf:]))
            occupancy = np.logical_or(
                np.asarray(labels['segmentation'])[:, rf:], occ_ped)
            for i, metric in enumerate(metric_planning):
                t = (i + 1) * 2
                metric.update(final_traj[:, :t], gt_traj[:, 1:t + 1],
                              occupancy[:, :t])
        if save_path is not None and index % 100 == 0:
            try:
                from stp3_tpu.utils.visualisation import save_eval_figure
                save_eval_figure(output, labels, batch, rf, index, save_path, cfg)
            except Exception as exc:  # visualisation must never kill eval
                print(f'visualisation failed: {exc}')

    results = {}
    results['vehicle_iou'] = metric_vehicle.compute()[1]
    if metric_pedestrian is not None:
        results['pedestrian_iou'] = metric_pedestrian.compute()[1]
    if metric_hdmap is not None:
        for name, metric in zip(hdmap_class, metric_hdmap):
            results[f'{name}_iou'] = metric.compute()[1]
    if metric_panoptic is not None:
        for key, value in metric_panoptic.compute().items():
            results[f'vehicle_{key}'] = value[1]
    if metric_planning is not None:
        for i, metric in enumerate(metric_planning):
            for key, value in metric.compute().items():
                results[f'plan_{key}_{i + 1}s'] = np.asarray(value).mean()

    for key, value in results.items():
        print(f'{key} : {float(value):.6f}')
    return results


def main():
    parser = argparse.ArgumentParser(description='stp3_tpu open-loop evaluation')
    parser.add_argument('--checkpoint', required=True, help='Orbax checkpoint dir')
    parser.add_argument('--dataroot', default='', help='dataset root override')
    parser.add_argument('--no-save', action='store_true', help='skip visualisations')
    parser.add_argument('opts', nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()
    evaluate(args.checkpoint, args.dataroot, args.opts or None,
             save_visualisations=not args.no_save)


if __name__ == '__main__':
    main()
