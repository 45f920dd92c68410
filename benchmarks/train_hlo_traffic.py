"""HBM-traffic audit of the flagship TRAIN step (fwd + bwd + Adam).

Same methodology as hlo_traffic.py but on the jitted sharded train step:
reports cost_analysis flops/bytes with v5e roofline floors and the
materialized writes per model stage, with forward and backward
distinguished by the `transpose(...)` op_name prefix XLA puts on
gradient ops.

Usage: python benchmarks/train_hlo_traffic.py [batch] [--top N]
"""
from __future__ import annotations

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from hlo_traffic import audit, region_write_totals, stage_of  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('batch', nargs='?', type=int, default=2)
    ap.add_argument('--top', type=int, default=20)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from stp3_tpu.datas.synthetic import SyntheticDataset, collate
    from stp3_tpu.parallel.mesh import make_mesh, shard_batch
    from stp3_tpu.training.trainer import Trainer

    cfg = _flagship_cfg()
    cfg.BATCHSIZE = args.batch
    cfg.MODEL.REMAT = os.environ.get('REMAT', 'encoder')

    mesh = make_mesh(1)
    trainer = Trainer(cfg, mesh=mesh)
    ds = SyntheticDataset(cfg, n_samples=args.batch)
    batch = collate([ds[i] for i in range(args.batch)])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, batch)
    batch = shard_batch(batch, mesh)

    # trainer.train_step is the plain dispatch method; the jitted function
    # (the one with .lower) is trainer._train_step
    compiled = trainer._train_step.lower(state, batch, rng).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get('flops', 0.0)
    byt = ca.get('bytes accessed', 0.0)
    print(f'flops/step:          {flops/1e9:8.1f} GFLOP '
          f'(MXU floor {flops/197e12*1e3:6.1f} ms @197 bf16 TFLOP/s)')
    print(f'bytes accessed/step: {byt/1e9:8.1f} GB    '
          f'(HBM floor {byt/819e9*1e3:6.1f} ms @819 GB/s)')

    rows = list(audit(compiled.as_text()))
    total_w = sum(r[2] for r in rows)
    print(f'materialized writes: {total_w/1e9:8.1f} GB '
          f'({len(rows)} top-level instructions)')

    fwd = collections.Counter()
    bwd = collections.Counter()
    for _, opcode, b, op_name in rows:
        # XLA tags gradient ops with "transpose(...)" in the op_name path
        (bwd if 'transpose(' in op_name else fwd)[stage_of(op_name)] += b
    print('\n-- forward writes by stage --')
    for s_, b in fwd.most_common(args.top):
        print(f'{b/1e6:10.1f} MB  {s_}')
    print('\n-- backward writes by stage --')
    for s_, b in bwd.most_common(args.top):
        print(f'{b/1e6:10.1f} MB  {s_}')

    regions = sorted(region_write_totals(compiled.as_text()),
                     key=lambda r: -r[1])[:10]
    if regions:
        print('\n-- while/cond region bodies (bytes PER ITERATION, '
              'not in the totals above) --')
        for comp, b in regions:
            print(f'{b/1e6:10.1f} MB  {comp}')


if __name__ == '__main__':
    main()
