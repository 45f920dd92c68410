"""On-chip flagship training SOAK: sustained steps + mid-run checkpoint +
resume-continuation proof (round-4 verdict next-round item 5).

sustained_train_bench.py measures steady-state step time over ~50 steps;
this bench answers the runtime-over-time questions the reference's
20-epoch recipe (reference train.py:43-57) would answer on a GPU box:

  * does the training RUNTIME hold up over a long stretch (no slow
    drift, no queue buildup, no leak-driven slowdown)?   -> p50/p90 of
    per-step wall time over N steps with the real loader in the loop;
  * does the model actually LEARN under the sustained loop?  -> total
    loss decreases, homoscedastic uncertainty weights move off 0;
  * does checkpoint/resume PRESERVE the trajectory?  -> a checkpoint is
    written mid-soak; after the soak a fresh Trainer restores it
    (checkpoint.restore_train_state) and replays the next 10 batches —
    the resumed losses must match the original run's step-for-step
    (same params/opt_state/step => same rng fold => identical math).

Run: python benchmarks/soak_train_bench.py [n_steps=200] [batch=2]
Env: REMAT (default encoder), WORKERS (default 5).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np  # noqa: E402

# Resume gate. NOT bitwise, and the reason is measured, not assumed
# (round-5 investigation, /tmp probes, all on the real chip):
#   * the checkpoint round-trip is BITWISE lossless — restored params and
#     opt_state compared exactly equal to the pre-save host snapshots;
#   * a restored state stepped in a drained dispatch queue is
#     deterministic (4 repeats, 2 processes, both trainer objects:
#     identical losses);
#   * yet it deviates from the ORIGINAL in-loop losses by up to ~1.6e-3
#     relative — the original step ran with ~100 async steps queued over
#     the axon tunnel, the replay runs drained; the execution context
#     changes the fp result deterministically. Step dtype (python int vs
#     device int32) and trainer identity were ruled out explicitly.
# So the gate asserts the trajectory CONTINUES (vs a restart, which is
# ~50% off at this point of training), not that it is bit-identical.
RESUME_TOL = float(os.environ.get('SOAK_RESUME_TOL', '1e-2'))


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    workers = int(os.environ.get('WORKERS', '5'))
    n_replay = 10
    ckpt_step = n_steps // 2
    assert n_steps >= ckpt_step + n_replay

    from __graft_entry__ import _flagship_cfg
    from stp3_tpu.datas.synthetic import NumpyLoader, SyntheticDataset
    from stp3_tpu.parallel.mesh import host_tree, make_mesh, shard_batch
    from stp3_tpu.training import checkpoint as ckpt_lib
    from stp3_tpu.training.trainer import Trainer

    cfg = _flagship_cfg()
    cfg.BATCHSIZE = batch_size
    cfg.MODEL.REMAT = os.environ.get('REMAT', 'encoder')

    mesh = make_mesh(1)
    trainer = Trainer(cfg, mesh=mesh)
    ds = SyntheticDataset(cfg, n_samples=max(2 * batch_size * 16, 64))

    rng = jax.random.PRNGKey(42)
    first = next(iter(NumpyLoader(ds, batch_size, shuffle=False, num_workers=0)))
    t0 = time.time()
    state = trainer.init_state(rng, first)
    print(f'init: {time.time() - t0:.0f}s', flush=True)
    t0 = time.time()
    state, loss = trainer.train_step(state, shard_batch(first, mesh), rng)
    print(f'compile+step0: {time.time() - t0:.0f}s '
          f'loss={float(loss["total"]):.3f}', flush=True)

    def endless(loader):
        while True:
            yield from loader

    loader = NumpyLoader(ds, batch_size, shuffle=True, drop_last=True,
                         num_workers=workers)
    stream = endless(loader)

    losses = []          # device scalars; converted after the soak so the
    deltas = []          # per-step host readback does not serialise dispatch
    replay_batches = []  # host copies of the n_replay batches after the ckpt
    ckpt_dir = os.environ.get('SOAK_CKPT_DIR', '/tmp/stp3_soak_ckpt')
    save_s = ckpt_path = None

    t_soak = time.time()
    for step in range(1, n_steps + 1):
        hb = next(stream)
        if ckpt_step < step <= ckpt_step + n_replay:
            replay_batches.append(hb)
        t0 = time.perf_counter()
        state, loss = trainer.train_step(state, shard_batch(hb, mesh), rng)
        deltas.append(time.perf_counter() - t0)
        losses.append(loss['total'])
        if step == ckpt_step:
            t0 = time.time()
            # host_tree forces the full param/opt readback (sync point)
            ckpt_path = ckpt_lib.save_checkpoint(
                ckpt_dir, step, host_tree(state.params),
                host_tree(state.opt_state), cfg.convert_to_dict(),
                metrics={'best_iou': 0.0})
            save_s = time.time() - t0
            deltas[-1] = np.nan   # the ckpt sync pollutes this delta
        if step % 25 == 0:
            print(f'step {step}: loss {float(losses[-1]):.4f} '
                  f'({time.time() - t_soak:.0f}s elapsed)', flush=True)
    losses = [float(x) for x in losses]
    soak_s = time.time() - t_soak

    d = np.asarray(deltas) * 1000.0
    d = d[~np.isnan(d)]
    win = max(min(20, n_steps // 3), 1)   # non-overlapping head/tail windows
    first20 = float(np.median(losses[:win]))
    last20 = float(np.median(losses[-win:]))
    seg_w = float(np.asarray(state.params['segmentation_weight']))
    plan_w = float(np.asarray(state.params['planning_weight']))

    # ---- resume: fresh Trainer, restore mid-soak ckpt, replay the next
    # n_replay batches — the loss trajectory must CONTINUE, not restart
    trainer2 = Trainer(cfg, mesh=mesh)
    state2 = trainer2.init_state(rng, first)
    state2 = ckpt_lib.restore_train_state(ckpt_dir, state2)
    assert int(state2.step) == ckpt_step, int(state2.step)
    replay_losses = []
    for hb in replay_batches:
        state2, loss2 = trainer2.train_step(state2, shard_batch(hb, mesh), rng)
        replay_losses.append(loss2['total'])
    replay_losses = [float(x) for x in replay_losses]
    orig = losses[ckpt_step:ckpt_step + n_replay]
    resume_max_rel = float(np.max(np.abs(
        (np.asarray(replay_losses) - np.asarray(orig))
        / np.maximum(np.abs(orig), 1e-6))))
    loader.close()

    # HEADLINE = sustained wall-clock per step (checkpoint save excluded):
    # train_step is an async jit dispatch over the tunnel, so the per-step
    # deltas measure loader+shard+dispatch latency, NOT device step time —
    # reporting their median as "step time" would overstate throughput
    # ~10x (the repo's own timing rule, CLAUDE.md / benchmarks/README.md).
    # The dispatch percentiles are kept as secondary queue-health fields.
    sustained_ms = (soak_s - (save_s or 0.0)) / n_steps * 1000.0
    print(json.dumps({
        'metric': 'soak_sustained_ms_per_step',
        'value': round(sustained_ms, 1),
        'unit': 'ms',
        'n_steps': n_steps,
        'batch': batch_size,
        'workers': workers,
        'host_cpus': os.cpu_count(),
        'dispatch_p50_ms': round(float(np.median(d)), 1),
        'dispatch_p90_ms': round(float(np.percentile(d, 90)), 1),
        'samples_per_sec': round(batch_size / sustained_ms * 1e3, 2),
        'soak_wall_s': round(soak_s, 1),
        'loss_first20_median': round(first20, 4),
        'loss_last20_median': round(last20, 4),
        'seg_weight': round(seg_w, 5),
        'planning_weight': round(plan_w, 5),
        'ckpt_save_s': round(save_s, 1),
        'resume_max_rel_loss_diff': resume_max_rel,
        'remat': cfg.MODEL.REMAT,
    }), flush=True)

    assert last20 < first20, \
        f'loss did not decrease: {first20:.4f} -> {last20:.4f}'
    assert seg_w != 0.0 and plan_w != 0.0, (seg_w, plan_w)
    assert resume_max_rel < RESUME_TOL, (
        f'resumed trajectory diverged: max rel {resume_max_rel:.2e}; '
        f'orig {orig[:3]} replay {replay_losses[:3]}')
    print('soak OK', flush=True)


if __name__ == '__main__':
    main()
