"""Multi-PROCESS training integration (SURVEY.md §2.5 DP "multi-host via
jax.distributed.initialize over DCN"; reference analogue: Lightning DDP
spawns one process per GPU with rank-0 I/O, reference train.py:43-56).

Two REAL processes (subprocesses of this test) each drive the actual
``train.py`` CLI over a 2x2-virtual-CPU-device global mesh with gloo
collectives:

  * each process loads its OWN contiguous slice of every global batch
    (NumpyLoader rank/world split) and `shard_batch` assembles the global
    array with jax.make_array_from_process_local_data — so the global
    batch is bit-identical to the single-process run's, and the training
    losses must match it;
  * only process 0 writes: exactly ONE checkpoint tree, one `best`
    pointer, one TB event dir;
  * val metrics are per-process accumulators summed across processes at
    compute() (allreduce_host_tree) — the printed epoch metrics must
    match the single-process run.
"""
import os
import re
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
DRIVER = str(REPO / 'tests' / 'mp_train_driver.py')

# tiny perception-only config: compiles in ~1 min on CPU, exercises the
# full train loop (losses, val metrics, checkpointing)
BASE_ARGS = [
    'DATASET.NAME', 'synthetic', 'DATASET.VERSION', 'mini',
    'IMAGE.FINAL_DIM', '(32, 64)',
    'IMAGE.NAMES', "['CAM_LEFT', 'CAM_RIGHT']",
    'LIFT.X_BOUND', '[-8.0, 8.0, 1.0]', 'LIFT.Y_BOUND', '[-8.0, 8.0, 1.0]',
    'LIFT.D_BOUND', '[2.0, 10.0, 1.0]',
    'MODEL.ENCODER.NAME', 'efficientnet-b0',
    'MODEL.ENCODER.OUT_CHANNELS', '16',
    'MODEL.TEMPORAL_MODEL.START_OUT_CHANNELS', '16',
    'TIME_RECEPTIVE_FIELD', '2', 'N_FUTURE_FRAMES', '0',
    'PROBABILISTIC.ENABLED', 'False', 'PLANNING.ENABLED', 'False',
    'INSTANCE_SEG.ENABLED', 'False', 'INSTANCE_FLOW.ENABLED', 'False',
    # 5 val samples do NOT divide the global batch of 4: the mp run pads
    # the ragged tail with 3 wrap-around duplicates, which the 'valid'
    # mask must exclude from the metric accumulators — the val-metric
    # equality below is only exact because of it
    'DATASET.VAL_SAMPLES', '5',
    'EPOCHS', '1', 'N_WORKERS', '0', 'LOGGING_INTERVAL', '1',
    # VIS_INTERVAL 2: one train-vis forward mid-epoch — the vis forward
    # is a global-mesh SPMD program that EVERY process must dispatch
    # (a rank-0-only dispatch wedges the other rank at the next
    # collective; this test would time out), while only rank 0 renders
    'VIS_INTERVAL', '2', 'PRECISION', '32',
]


def _free_port() -> int:
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(n_local_devices: int, extra=None) -> dict:
    env = dict(os.environ)
    env['XLA_FLAGS'] = (f'--xla_force_host_platform_device_count='
                        f'{n_local_devices}')
    env.pop('JAX_PLATFORMS', None)
    env.update(extra or {})
    return env


def _losses(stdout: str):
    return {int(m.group(1)): float(m.group(2)) for m in
            re.finditer(r'step (\d+) loss ([\d.]+)', stdout)}


def _val_lines(stdout: str):
    return sorted(ln.strip() for ln in stdout.splitlines()
                  if ' val ' in ln and 'iou' in ln)


@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    port = _free_port()
    mp_log = tmp_path / 'mp'
    sp_log = tmp_path / 'sp'

    # --- 2 processes x 2 local devices, per-process batch 2 (global 4)
    procs = []
    for pid in range(2):
        extra = {'STP3_COORDINATOR_ADDRESS': f'127.0.0.1:{port}',
                 'STP3_NUM_PROCESSES': '2', 'STP3_PROCESS_ID': str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, DRIVER] + BASE_ARGS + [
                'BATCHSIZE', '2', 'PARALLEL.MULTIHOST', 'True',
                'LOG_DIR', str(mp_log), 'TAG', 'mp'],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=_env(2, extra), cwd=str(REPO)))
    outs = []
    deadline = time.time() + 900
    for p in procs:
        out, _ = p.communicate(timeout=max(10, deadline - time.time()))
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, (
            f'rank failed:\n{out[-3000:]}\n--- other rank ---\n'
            f'{outs[1 - outs.index(out)][-3000:]}')

    # --- single process, 4 local devices, global batch 4 (same batches)
    sp = subprocess.run(
        [sys.executable, DRIVER] + BASE_ARGS + [
            'BATCHSIZE', '4', 'LOG_DIR', str(sp_log), 'TAG', 'sp'],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_env(4), cwd=str(REPO), timeout=900)
    assert sp.returncode == 0, f'single-process failed:\n{sp.stdout[-4000:]}'

    rank0 = outs[0] if 'step 1 loss' in outs[0] else outs[1]

    # losses match step for step: same global batch content, same mesh
    # size, same rng — only collective reassociation differs
    mp_losses, sp_losses = _losses(rank0), _losses(sp.stdout)
    assert mp_losses and set(mp_losses) == set(sp_losses)
    for s in sp_losses:
        np.testing.assert_allclose(mp_losses[s], sp_losses[s], rtol=2e-4,
                                   err_msg=f'step {s}')

    # val metrics summed across processes == single-process metrics,
    # EXACTLY — including the ragged val tail (5 samples vs global batch
    # 4): the mp run's 3 wrap-around padding duplicates are masked out of
    # the accumulators by the loader's 'valid' key (Trainer.val_step),
    # while the single-process run sees one ragged batch of 1 unpadded
    mp_val, sp_val = _val_lines(rank0), _val_lines(sp.stdout)
    assert mp_val and mp_val == sp_val

    # process-0-only I/O: exactly ONE checkpoint tree + one best pointer
    ckpts = list(mp_log.glob('*/checkpoints/step_*'))
    assert len(ckpts) == 1, f'expected 1 checkpoint tree, got {ckpts}'
    assert len(list(mp_log.glob('*/checkpoints/best'))) == 1
    assert len(list(mp_log.glob('*'))) == 1, 'non-rank-0 process wrote a run dir'

    # the non-rank-0 process printed nothing (rank-0 convention)
    other = outs[1] if rank0 is outs[0] else outs[0]
    assert 'step 1 loss' not in other and 'saved checkpoint' not in other
