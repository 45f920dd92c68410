"""Stage-wise latency breakdown of the flagship forward pass on one chip.

Times encoder / lift+splat / temporal / distribution+future / decoder /
planner separately (chained timing, see bev_pool_bench.py) to direct
kernel-optimisation effort.

Run: PYTHONPATH=. python benchmarks/forward_breakdown.py
"""
from __future__ import annotations

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


def timeit_chain(f, n=5):
    c = f(jnp.zeros(()))
    float(c)
    t0 = time.perf_counter()
    c = jnp.zeros(())
    for _ in range(n):
        c = f(c)
    float(c)
    return (time.perf_counter() - t0) / n * 1000.0



def dep(x, c):
    """Serial-dependency injection that PRESERVES x.dtype (a raw fp32 carry
    would silently promote bf16 inputs back to fp32)."""
    return x + (c * 0).astype(x.dtype)

def main():
    from __graft_entry__ import _init_flagship, _planning_extras
    cfg = _flagship_cfg()
    mc = STP3Config.from_cfg(cfg)
    model = STP3(mc)
    t0 = time.time()
    variables, (image, k, e, ego), extras = _init_flagship(
        model, cfg, _planning_extras)
    trajs, gt = extras['trajs'], extras['gt_trajs']
    commands, target = extras['commands'], extras['target_points']
    print(f'init: {time.time() - t0:.0f}s', flush=True)
    rng = np.random.RandomState(0)

    # serve in bf16 like bench.py (cfg PRECISION 16)
    from stp3_tpu.utils.precision import cast_floating, policy_dtype
    dt = policy_dtype(cfg)
    variables = cast_floating(variables, dt)
    image = image.astype(dt)
    trajs = trajs.astype(dt)
    gt = gt.astype(dt)
    target = target.astype(dt)

    # full forward
    @jax.jit
    def full(c):
        out = model.apply(variables, dep(image, c), k, e, ego, train=False)
        return out['segmentation'].ravel()[0].astype(jnp.float32)
    print(f'forward (no plan): {timeit_chain(full):.1f} ms', flush=True)

    # encoder only (18 images)
    flat_img = image.reshape((-1,) + image.shape[3:])

    @jax.jit
    def enc(c):
        feat, depth = model.apply(variables, dep(flat_img, c), train=False,
                                  method=lambda m, x, train: m.encoder(x, train=train))
        return feat.ravel()[0].astype(jnp.float32)
    print(f'encoder (18 imgs): {timeit_chain(enc):.1f} ms', flush=True)

    # lift + splat
    @jax.jit
    def lift_splat(c):
        x, depth, cam = model.apply(
            variables, dep(image, c), k, e, ego, train=False,
            method=lambda m, image, k, e, ego, train: m.calculate_birds_eye_view_features(
                image, k, e, ego, train=train))
        return x.ravel()[0].astype(jnp.float32)
    print(f'lift+splat (incl encoder): {timeit_chain(lift_splat):.1f} ms', flush=True)

    # temporal model on BEV states
    h, w = mc.bev_size
    states_in = jnp.asarray(rng.rand(1, mc.receptive_field, h, w,
                                     mc.temporal_in_channels).astype(np.float32)).astype(dt)

    @jax.jit
    def temporal(c):
        out = model.apply(variables, dep(states_in, c), train=False,
                          method=lambda m, x, train: m.temporal_model(x, train=train))
        return out.ravel()[0].astype(jnp.float32)
    print(f'temporal model: {timeit_chain(temporal):.1f} ms', flush=True)

    # distribution + future prediction
    states = jnp.asarray(rng.rand(1, mc.receptive_field, h, w,
                                  mc.future_pred_in_channels).astype(np.float32)).astype(dt)

    @jax.jit
    def future(c):
        def run(m, s, train):
            sample, _ = m.distribution_forward(s[:, -1:], train=train)
            return m.future_prediction(sample, s, train=train)
        out = model.apply(variables, dep(states, c), train=False,
                          method=lambda m, s, train: run(m, s, train))
        return out.ravel()[0].astype(jnp.float32)
    print(f'distribution+future: {timeit_chain(future):.1f} ms', flush=True)

    # decoder
    s_total = mc.receptive_field + mc.n_future
    dec_in = jnp.asarray(rng.rand(1, s_total, h, w,
                                  mc.future_pred_in_channels).astype(np.float32)).astype(dt)

    @jax.jit
    def dec(c):
        out = model.apply(variables, dep(dec_in, c), train=False,
                          method=lambda m, x, train: m.decoder(x, train=train))
        return out['segmentation'].ravel()[0].astype(jnp.float32)
    print(f'decoder: {timeit_chain(dec):.1f} ms', flush=True)

    # planner
    hf, wf = image.shape[3] // 8, image.shape[4] // 8
    cam_front = jnp.asarray(rng.rand(1, hf, wf, mc.encoder_out_channels).astype(np.float32)).astype(dt)
    cv = jnp.asarray(rng.rand(1, mc.n_future, h, w).astype(np.float32)).astype(dt)
    occ = jnp.asarray((rng.rand(1, mc.n_future, h, w) > 0.9).astype(np.float32)).astype(dt)
    hd = jnp.asarray(rng.rand(1, h, w, 4).astype(np.float32)).astype(dt)

    @jax.jit
    def plan(c):
        _, traj = model.apply(variables, dep(cam_front, c), trajs, gt, cv,
                              occ, hd, commands, target, train=False,
                              method=STP3.plan)
        return traj.ravel()[0].astype(jnp.float32)
    print(f'planner (1800 trajs): {timeit_chain(plan):.1f} ms', flush=True)


if __name__ == '__main__':
    main()
