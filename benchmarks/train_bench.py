"""Training throughput benchmark: flagship Planning stack, one chip.

Reports steady-state train-step latency and samples/sec at the largest
batch that fits (the reference trains at 2-3 samples/GPU, fp16, 4 GPUs;
configs/nuscenes/Planning.yml).

Run: python benchmarks/train_bench.py [batch]
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from __graft_entry__ import _flagship_cfg
    from stp3_tpu.datas.synthetic import SyntheticDataset, collate
    from stp3_tpu.parallel.mesh import make_mesh, shard_batch
    from stp3_tpu.training.trainer import Trainer

    cfg = _flagship_cfg()
    cfg.BATCHSIZE = batch_size
    cfg.MODEL.REMAT = os.environ.get('REMAT', 'encoder')

    mesh = make_mesh(1)
    trainer = Trainer(cfg, mesh=mesh)
    ds = SyntheticDataset(cfg, n_samples=batch_size)
    batch = collate([ds[i] for i in range(batch_size)])

    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    state = trainer.init_state(rng, batch)
    print(f'init: {time.time() - t0:.0f}s '
          f'({trainer.param_count(state) / 1e6:.1f}M params)', flush=True)
    batch = shard_batch(batch, mesh)

    # compile + warm
    t0 = time.time()
    state, loss = trainer.train_step(state, batch, rng)
    print(f'step compile: {time.time() - t0:.0f}s loss={float(loss["total"]):.3f}',
          flush=True)

    # steady state: state-chained by construction (state_{i+1} = f(state_i))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = trainer.train_step(state, batch, rng)
    float(loss['total'])  # drains the chain
    ms = (time.perf_counter() - t0) / n * 1000.0

    print(json.dumps({
        'metric': 'train_step_latency_p50',
        'value': round(ms, 1),
        'unit': 'ms',
        'batch': batch_size,
        'samples_per_sec': round(batch_size / ms * 1000.0, 2),
        'remat': cfg.MODEL.REMAT,
    }))


if __name__ == '__main__':
    main()
