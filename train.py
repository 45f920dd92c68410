"""Training CLI (reference train.py:14-61).

    python train.py --config-file stp3_tpu/configs/nuscenes/Perception.yml \
        [DATASET.NAME synthetic] [KEY VALUE ...]

TPU-first runtime: one jitted train step over a 1-D data mesh; Orbax
checkpoints every epoch + 'last' pointer; optional curriculum warm start
that drops decoder-head params (reference train.py:21-29); TensorBoard
scalars per step (reference trainer.py:369-375).
"""
from __future__ import annotations

import os
import socket
import time

import jax
import numpy as np

# persistent compile cache: the tunneled-TPU first compile is ~10 min for
# the full graph; cached reruns skip it entirely
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from stp3_tpu.config import get_cfg, get_parser
from stp3_tpu.datas.dataloaders import prepare_dataloaders
from stp3_tpu.parallel.mesh import (default_prefetch_size, host_tree,
                                    host_value, is_main_process,
                                    maybe_initialize_multihost,
                                    prefetch_to_device)
from stp3_tpu.training import checkpoint as ckpt_lib
from stp3_tpu.training.trainer import Trainer


def main():
    args = get_parser().parse_args()
    cfg = get_cfg(args)
    maybe_initialize_multihost(cfg)

    # rank-0 side effects (Lightning's DDP convention, reference
    # train.py:31-42): TensorBoard, prints, and pointer files are
    # process-0-only. Orbax checkpoint saves are COOPERATIVE — every
    # process calls save (orbax's internal barriers deadlock a solo
    # rank-0 save; primary-host-only file writes are orbax's job), so
    # every process needs the SAME run directory: process 0 names it and
    # broadcasts.
    from stp3_tpu.parallel.mesh import broadcast_string
    is_main = is_main_process()
    save_dir = os.path.join(
        cfg.LOG_DIR,
        time.strftime('%d%B%Y_%H%M') + '_' + socket.gethostname() + '_' + cfg.TAG)
    save_dir = broadcast_string(save_dir)
    ckpt_dir = os.path.join(save_dir, cfg.CHECKPOINT.DIR)
    writer = None
    if is_main:
        os.makedirs(save_dir, exist_ok=True)
        os.makedirs(ckpt_dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(save_dir)
        except Exception:
            writer = None
    # rank 0's writer existence, broadcast once: the train-vis forward is
    # a global-mesh SPMD program every process must dispatch together, but
    # if NO process renders (e.g. tensorboard import failed on rank 0)
    # the whole fleet would burn a discarded forward per VIS_INTERVAL
    have_writer = broadcast_string('1' if writer is not None else '0') == '1'

    if cfg.DEBUG.NAN_CHECK:
        jax.config.update('jax_debug_nans', True)

    trainloader, valloader = prepare_dataloaders(cfg)
    trainer = Trainer(cfg)
    if is_main:
        print(f'devices: {jax.devices()} mesh: {trainer.mesh} '
              f'processes: {jax.process_count()}')

    profile_dir = None
    if cfg.PROFILE.ENABLED and is_main:
        profile_dir = cfg.PROFILE.DIR or os.path.join(save_dir, 'profile')
        os.makedirs(profile_dir, exist_ok=True)

    rng = jax.random.PRNGKey(42)
    first_batch = next(iter(trainloader))
    t0 = time.time()
    state = trainer.init_state(rng, first_batch)
    if is_main:
        print(f'init: {trainer.param_count(state) / 1e6:.2f}M params '
              f'({time.time() - t0:.0f}s)')

    # curriculum warm start (reference train.py:21-29)
    if cfg.PRETRAINED.LOAD_WEIGHTS and cfg.PRETRAINED.PATH:
        restored = ckpt_lib.load_checkpoint(cfg.PRETRAINED.PATH)
        merged, n = ckpt_lib.filter_warm_start_params(restored['params'], state.params)
        state = state.replace(params=merged)
        print(f'warm start: loaded {n} tensors from {cfg.PRETRAINED.PATH} (decoder heads skipped)')

    # best-by-val-IoU monitor state — restored on resume (the reference
    # persists its ModelCheckpoint monitor inside the Lightning ckpt,
    # train.py:36-42, so a resumed run's first mediocre epoch cannot
    # overwrite a historically better `best` pointer)
    best_iou = -1.0
    if cfg.CHECKPOINT.RESUME:
        # restore WITH the live state as the orbax target: a target-less
        # restore decays the optax opt_state namedtuples to dicts and the
        # first post-resume step crashes (checkpoint.restore_train_state)
        state = ckpt_lib.restore_train_state(cfg.CHECKPOINT.RESUME, state)
        best_iou = float(ckpt_lib.load_meta(cfg.CHECKPOINT.RESUME)
                         .get('best_iou', -1.0))
        print(f'resumed from {cfg.CHECKPOINT.RESUME} at step {int(state.step)}'
              f' (best val vehicle IoU so far: {best_iou:.4f})')

    # multi-process: compile everywhere, THEN dispatch anywhere (gloo
    # pair connects time out across compile skew; see warmup_compile —
    # which shards the host batch itself, after its single-process
    # early-return, so single-process startup pays no wasted transfer)
    trainer.warmup_compile(state, first_batch, rng)

    step = int(host_value(state.step))
    for epoch in range(cfg.EPOCHS):
        # device prefetch: shard_batch (loader pull + host->device
        # transfer) can run one batch ahead in a background thread so
        # transfer overlaps compute — OFF by default until measured on a
        # multi-core host; STP3_DEVICE_PREFETCH=<n> opts in (see
        # mesh.default_prefetch_size for the measured rationale)
        for batch in prefetch_to_device(iter(trainloader), trainer.mesh,
                                        size=default_prefetch_size()):
            if profile_dir is not None and step == 1:
                jax.profiler.start_trace(profile_dir)
            t0 = time.time()
            state, loss = trainer.train_step(state, batch, rng)
            step += 1
            if profile_dir is not None and step == 1 + cfg.PROFILE.STEPS:
                jax.profiler.stop_trace()
                print(f'profiler trace written to {profile_dir}')
            # host readbacks only at logging points: a float() every step
            # would serialise async dispatch over the device link
            log_now = (step % max(cfg.LOGGING_INTERVAL, 1) == 0 or step <= 3) \
                and is_main
            if log_now:
                dt = time.time() - t0
                # host_value: replicated global-mesh arrays are not fully
                # addressable in multi-process runs; float() would raise
                print(f'epoch {epoch} step {step} loss '
                      f'{float(host_value(loss["total"])):.4f} '
                      f'({dt * 1000:.0f} ms)')
            if writer is not None and log_now:
                for k, v in loss.items():
                    writer.add_scalar(f'step_train_loss_{k}',
                                      float(host_value(v)), step)
            vis_now = (cfg.VIS_INTERVAL > 0 and step % cfg.VIS_INTERVAL == 0
                       and have_writer)
            if vis_now:
                # train-time panel video (reference trainer.py:374-375).
                # The forward is a global-mesh SPMD program, so EVERY
                # process must dispatch it — a rank-0-only dispatch would
                # wedge the others at the next collective; only the main
                # process renders and writes.
                try:
                    from stp3_tpu.utils.visualisation import visualise_output
                    # forward only — must not touch the val metric states
                    output, labels = trainer.val_forward(
                        state.params, batch, state.batch_stats)
                    if jax.process_count() > 1:
                        from stp3_tpu.parallel.mesh import process_local
                        output = jax.tree.map(process_local, output)
                        labels = jax.tree.map(process_local, labels)
                    if writer is not None:
                        panel = visualise_output(labels, output, cfg)
                        import torch
                        vid = torch.from_numpy(
                            np.ascontiguousarray(
                                panel.transpose(0, 3, 1, 2))[None])
                        writer.add_video('train_outputs', vid,
                                         global_step=step, fps=2)
                except Exception as exc:
                    print(f'train visualisation failed: {exc}')

        # validation epoch
        trainer.reset_metrics()
        for val_idx, batch in enumerate(
                prefetch_to_device(iter(valloader), trainer.mesh,
                                   size=default_prefetch_size())):
            output, labels = trainer.val_step(state.params, batch,
                                              state.batch_stats)
            if val_idx == 0 and writer is not None:
                # GT-vs-pred BEV panel video (reference trainer.py:362-367)
                try:
                    from stp3_tpu.utils.visualisation import visualise_output
                    panel = visualise_output(labels, output, cfg)  # (T,H,W,3)
                    import torch
                    vid = torch.from_numpy(
                        np.ascontiguousarray(panel.transpose(0, 3, 1, 2))[None])
                    writer.add_video(f'val_outputs', vid, global_step=step, fps=2)
                except Exception as exc:
                    print(f'visualisation failed: {exc}')
        metrics = trainer.compute_metrics()

        def log_metric(prefix, v):
            # every metric, every class/element — matching the reference's
            # per-metric coverage (reference trainer.py:390-448)
            arr = np.asarray(v)
            if not is_main:
                return
            print(f'epoch {epoch} val {prefix}: {arr}')
            if writer is None:
                return
            if arr.size == 1:
                writer.add_scalar(f'epoch_val_{prefix}', float(arr.reshape(())), step)
            else:
                for i, x in enumerate(arr.ravel()):
                    writer.add_scalar(f'epoch_val_{prefix}/{i}', float(x), step)

        for k, v in metrics.items():
            if isinstance(v, dict):
                for kk, vv in v.items():
                    log_metric(f'{k}/{kk}', vv)
            else:
                log_metric(k, v)

        # uncertainty-weight scalars — the main training diagnostic
        # (reference trainer.py:420-448). Full-tree walk so weights are
        # found wherever they live in the param tree, not only top-level.
        if writer is not None:
            for path, w in jax.tree_util.tree_flatten_with_path(state.params)[0]:
                name = '/'.join(str(getattr(p, 'key', p)) for p in path)
                if name.endswith('_weight') and np.ndim(w) == 0:
                    writer.add_scalar(
                        f'epoch_{name.replace("/", "_")}',
                        float(1.0 / (2.0 * np.exp(float(host_value(w))))), step)

        if cfg.CHECKPOINT.SAVE_EVERY_EPOCH:
            # best-by-val-IoU monitor (the reference's ModelCheckpoint
            # monitors step_val_seg_iou_dynamic, train.py:36-42 — the
            # dynamic/vehicle class IoU); updated BEFORE the save so the
            # checkpoint's meta sidecar persists the monitor state for
            # resume-safety
            iou = np.asarray(metrics['iou_vehicle']).ravel()
            iou_dyn = float(iou[1]) if iou.size > 1 else float(iou[0])
            is_new_best = iou_dyn > best_iou
            best_iou = max(best_iou, iou_dyn)
            # COOPERATIVE across processes (a solo rank-0 orbax save
            # deadlocks on orbax's internal barriers); the state is
            # replicated so host_tree holds the full value everywhere,
            # and orbax/our sidecar writes are primary-host-only
            path = ckpt_lib.save_checkpoint(ckpt_dir, step,
                                            host_tree(state.params),
                                            host_tree(state.opt_state),
                                            cfg.convert_to_dict(),
                                            batch_stats=host_tree(state.batch_stats),
                                            metrics={'best_iou': best_iou,
                                                     'monitor': 'iou_vehicle_dynamic'})
            if is_main:
                print(f'saved checkpoint {path}')
            if is_new_best and is_main:
                with open(os.path.join(ckpt_dir, 'best'), 'w') as f:
                    f.write(path)
                print(f'new best val vehicle IoU {iou_dyn:.4f} -> {path}')

    print('done.')


if __name__ == '__main__':
    main()
