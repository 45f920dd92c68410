"""Benchmark: end-to-end 6-camera perceive->predict->plan latency, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput/latency numbers (SURVEY.md §6); the
north-star target from BASELINE.md is <100 ms p50 for a full 6-cam
forward + plan on one TPU v5e chip. ``vs_baseline`` = 100ms-target / p50
(>1 means beating the target by that factor).

Measures the flagship nuScenes Planning stack (EfficientNet-b4, 6 cams at
224x480, 200x200 BEV, 6 future frames, 1800 candidate trajectories):
model forward + planner select + GRU refinement, inputs already on-device
(steady-state serving; jit-compiled once, p50 over repeated calls).
"""
from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def main():
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from stp3_tpu.models.stp3 import STP3, STP3Config

    from __graft_entry__ import _init_flagship, _planning_extras
    cfg = _flagship_cfg()
    model_cfg = STP3Config.from_cfg(cfg)
    model = STP3(model_cfg)
    variables, (image, k, e, ego), extras = _init_flagship(
        model, cfg, _planning_extras)
    trajs, gt = extras['trajs'], extras['gt_trajs']
    commands, target = extras['commands'], extras['target_points']

    # bf16 serving policy (cfg PRECISION 16); geometry inputs stay fp32
    from stp3_tpu.utils.precision import cast_floating, policy_dtype
    dt = policy_dtype(cfg)
    variables = cast_floating(variables, dt)
    image = image.astype(dt)
    trajs = trajs.astype(dt)
    gt = gt.astype(dt)
    target = target.astype(dt)

    @jax.jit
    def plan_step(variables, image, k, e, ego, carry):
        # carry creates a serial dependency between iterations so the timing
        # loop cannot be pipelined/elided by the async runtime (the tunneled
        # backend's block_until_ready is unreliable; a data dependency +
        # one final host readback is the only honest clock)
        img = image + carry * 0.0
        out = model.apply(variables, img, k, e, ego, train=False)
        rf = model_cfg.receptive_field
        seg_pred = out['segmentation'].argmax(-1)
        ped_pred = out['pedestrian'].argmax(-1)
        occupancy = jnp.logical_or(seg_pred, ped_pred).astype(jnp.float32)
        _, traj = model.apply(variables, out['cam_front'], trajs, gt,
                              out['costvolume'][:, rf:], occupancy[:, rf:],
                              out['hdmap'], commands, target,
                              train=False, method=STP3.plan)
        return traj, traj[0, 0, 0]

    # compile + warmup
    carry = jnp.zeros((), dt)
    traj, carry = plan_step(variables, image, k, e, ego, carry)
    float(carry)

    def run_chain(n):
        c = jnp.zeros((), dt)
        t0 = time.perf_counter()
        for _ in range(n):
            _, c = plan_step(variables, image, k, e, ego, c)
        float(c)  # single readback drains the chain
        return (time.perf_counter() - t0) / n * 1000.0

    reps = [run_chain(5) for _ in range(5)]
    p50 = float(np.percentile(reps, 50))

    print(json.dumps({
        'metric': 'e2e_6cam_plan_latency_p50',
        'value': round(p50, 2),
        'unit': 'ms',
        'vs_baseline': round(100.0 / p50, 3),
    }))


if __name__ == '__main__':
    main()
