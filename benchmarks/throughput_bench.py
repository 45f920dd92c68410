"""
KNOWN ISSUE (round 1 end): this script reports ~4 s/step at batch 1 while
bench.py measures ~95 ms for the same computation on the same chip — the
chained-batch loop here has an undiagnosed dispatch problem (closures were
already ruled out; args are passed explicitly now). Trust bench.py /
serving_bench.py; re-validate this script before quoting its numbers.
Inference throughput: 6-cam BEV frames/sec/chip across batch sizes
(the BASELINE.md north-star harness: no reference number exists).

One "frame" = one 6-camera timestep fully processed through
perceive->predict->plan (the flagship Planning stack at batch B processes
B frames per step in steady state — past frames come from the rolling
window, so amortised cost per NEW frame is one forward / B).

Run: python benchmarks/throughput_bench.py [batches...]
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

from __graft_entry__ import _example_inputs, _flagship_cfg  # noqa: E402
from stp3_tpu.models.stp3 import STP3, STP3Config  # noqa: E402
from stp3_tpu.utils.precision import cast_floating, policy_dtype  # noqa: E402


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    cfg = _flagship_cfg()
    mc = STP3Config.from_cfg(cfg)
    model = STP3(mc)

    from __graft_entry__ import _init_flagship, _planning_extras
    variables, (img1, k1, e1, ego1), extras = _init_flagship(
        model, cfg, _planning_extras)
    trajs1, gt1 = extras['trajs'], extras['gt_trajs']
    dt = policy_dtype(cfg)
    variables = cast_floating(variables, dt)

    results = []
    for b in batches:
        image = jnp.broadcast_to(img1, (b,) + img1.shape[1:]).astype(dt)
        k = jnp.broadcast_to(k1, (b,) + k1.shape[1:])
        e = jnp.broadcast_to(e1, (b,) + e1.shape[1:])
        ego = jnp.broadcast_to(ego1, (b,) + ego1.shape[1:])
        trajs = jnp.broadcast_to(trajs1, (b,) + trajs1.shape[1:]).astype(dt)
        gt = jnp.broadcast_to(gt1, (b,) + gt1.shape[1:]).astype(dt)
        commands = jnp.zeros((b,), jnp.int32)
        target = jnp.zeros((b, 2), dt)

        # all arrays are ARGUMENTS: closed-over device arrays get baked
        # into the program as constants, which bloats the remote-compile
        # payload and wrecks steady-state dispatch (CLAUDE.md gotcha —
        # measured 40x slower as closures)
        @jax.jit
        def step(variables, image, k, e, ego, trajs, gt, commands, target,
                 carry):
            img = image + carry * 0.0
            out = model.apply(variables, img, k, e, ego, train=False)
            rf = mc.receptive_field
            seg = out['segmentation'].argmax(-1)
            ped = out['pedestrian'].argmax(-1)
            occ = jnp.logical_or(seg, ped).astype(dt)
            _, traj = model.apply(variables, out['cam_front'], trajs, gt,
                                  out['costvolume'][:, rf:], occ[:, rf:],
                                  out['hdmap'], commands, target,
                                  train=False, method=STP3.plan)
            return traj, traj[0, 0, 0]

        args = (variables, image, k, e, ego, trajs, gt, commands, target)
        try:
            carry = jnp.zeros((), dt)
            traj, carry = step(*args, carry)
            float(carry)
            t0 = time.perf_counter()
            c = jnp.zeros((), dt)
            n = 10
            for _ in range(n):
                _, c = step(*args, c)
            float(c)
            ms = (time.perf_counter() - t0) / n * 1000.0
            fps = b / ms * 1000.0
            results.append({'batch': b, 'latency_ms': round(ms, 1),
                            'frames_per_sec': round(fps, 2)})
            print(json.dumps(results[-1]), flush=True)
        except Exception as exc:
            print(json.dumps({'batch': b, 'error': str(exc)[:200]}), flush=True)
            break

    best = max((r for r in results if 'frames_per_sec' in r),
               key=lambda r: r['frames_per_sec'], default=None)
    if best:
        print(json.dumps({'metric': '6cam_bev_frames_per_sec_per_chip',
                          'value': best['frames_per_sec'], 'unit': 'frames/s',
                          'batch': best['batch']}))


if __name__ == '__main__':
    main()
