"""Steady-state serving latency: incremental serve_step vs full forward.

The driver's bench.py reports the reference-faithful full-recompute
latency; this measures the production serving mode (STP3.serve_step):
only the new frame is encoded+splatted, past BEV grids are cached and
grid-warped (stp3_tpu/models/stp3.py serve_step docstring).

Run: python benchmarks/serving_bench.py
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

from __graft_entry__ import _flagship_cfg  # noqa: E402
from stp3_tpu.models.stp3 import STP3, STP3Config  # noqa: E402
from stp3_tpu.utils.precision import cast_floating, policy_dtype  # noqa: E402


def main():
    from __graft_entry__ import _init_flagship, _planning_extras
    cfg = _flagship_cfg()
    mc = STP3Config.from_cfg(cfg)
    model = STP3(mc)
    variables, (image, k, e, ego), extras = _init_flagship(
        model, cfg, _planning_extras)
    trajs = extras['trajs']
    commands, target = extras['commands'], extras['target_points']

    dt = policy_dtype(cfg)
    variables = cast_floating(variables, dt)
    image = image.astype(dt)
    trajs = trajs.astype(dt)
    target = target.astype(dt)

    nx, ny = mc.bev_size
    cache0 = jnp.zeros((1, mc.receptive_field - 1, nx, ny,
                        mc.encoder_out_channels), dt)

    @jax.jit
    def tick(variables, img, cache):
        traj, _, new_cache = model.apply(
            variables, img, k[:, -1], e[:, -1], ego, cache, trajs, commands,
            target, train=False, method=STP3.serve_step)
        return traj, new_cache

    # static-geometry splat plan (fixed rig; ops/static_splat.py)
    from stp3_tpu.ops.geometry import (calculate_birds_eye_view_parameters,
                                       create_frustum)
    from stp3_tpu.ops.static_splat import build_static_splat_plan
    res, start, dim = calculate_birds_eye_view_parameters(
        cfg.LIFT.X_BOUND, cfg.LIFT.Y_BOUND, cfg.LIFT.Z_BOUND)
    frustum = create_frustum(tuple(cfg.IMAGE.FINAL_DIM),
                             cfg.MODEL.ENCODER.DOWNSAMPLE,
                             tuple(cfg.LIFT.D_BOUND))
    plan = build_static_splat_plan(frustum, np.asarray(k)[0, 0],
                                   np.asarray(e)[0, 0], res, start, dim)
    buckets = plan.device_buckets()

    from stp3_tpu.ops.static_splat import build_column_splat_plan
    cplan = build_column_splat_plan(frustum, np.asarray(k)[0, 0],
                                    np.asarray(e)[0, 0], res, start, dim)
    carrays = cplan.device_arrays()

    @jax.jit
    def tick_static(variables, img, cache, buckets):
        traj, _, new_cache = model.apply(
            variables, img, ego, cache, trajs, commands, target, buckets,
            train=False, method=STP3.serve_step_static)
        return traj, new_cache

    img1 = image[:, -1]

    def run_chain(fn, n, *extra):
        c = cache0
        t0 = time.perf_counter()
        for _ in range(n):
            traj, c = fn(variables, img1, c, *extra)  # cache chain = serial dep
        float(traj.ravel()[0].astype(jnp.float32))
        return (time.perf_counter() - t0) / n * 1000.0

    for name, fn, extra in [
            ('serving_6cam_incremental_plan_latency_p50', tick, ()),
            ('serving_6cam_static_column_splat_plan_latency_p50', tick_static,
             (carrays,)),
            ('serving_6cam_static_splat_plan_latency_p50', tick_static,
             (buckets,))]:
        traj, _ = fn(variables, img1, cache0, *extra)   # compile
        float(traj.ravel()[0].astype(jnp.float32))
        reps = [run_chain(fn, 5, *extra) for _ in range(5)]
        p50 = float(np.percentile(reps, 50))
        print(json.dumps({
            'metric': name,
            'value': round(p50, 2),
            'unit': 'ms',
            'vs_baseline': round(100.0 / p50, 3),
        }))


if __name__ == '__main__':
    main()
