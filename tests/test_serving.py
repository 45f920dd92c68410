"""Incremental serving path (STP3.serve_step): with zero ego-motion the
grid-warp temporal fusion is EXACTLY the full forward; with motion it
stays finite and shape-correct."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_test_cfg
from stp3_tpu.models.stp3 import STP3, STP3Config


def _rig(cfg, b=1):
    rf = cfg.TIME_RECEPTIVE_FIELD
    n = len(cfg.IMAGE.NAMES)
    h, w = cfg.IMAGE.FINAL_DIM
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(b, rf, n, h, w, 3), jnp.float32)
    k = jnp.asarray(np.tile(np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]],
                                     np.float32), (b, rf, n, 1, 1)))
    e = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, rf, n, 1, 1)))
    return image, k, e


@pytest.mark.slow
def test_serve_step_matches_full_forward_zero_ego():
    cfg = make_test_cfg()
    mc = STP3Config.from_cfg(cfg)
    model = STP3(mc)
    rf = cfg.TIME_RECEPTIVE_FIELD
    image, k, e = _rig(cfg)
    ego = jnp.zeros((1, rf, 6))
    rng = np.random.RandomState(1)
    trajs = jnp.asarray(rng.randn(1, cfg.PLANNING.SAMPLE_NUM,
                                  cfg.N_FUTURE_FRAMES + 1, 3).astype(np.float32))
    commands = jnp.ones((1,), jnp.int32)
    target = jnp.zeros((1, 2))
    gt = jnp.asarray(rng.randn(1, cfg.N_FUTURE_FRAMES, 3).astype(np.float32))

    variables = model.init(jax.random.PRNGKey(0), image, k, e, ego,
                           trajs=trajs[:, :, 1:], gt_trajs=gt,
                           commands=commands, target_points=target,
                           method=STP3.init_full)

    # full forward + plan (the exact path)
    out_full = model.apply(variables, image, k, e, ego, train=False)
    seg = out_full['segmentation'].argmax(-1)
    ped = out_full['pedestrian'].argmax(-1)
    occ = jnp.logical_or(seg, ped).astype(jnp.float32)
    gt_dummy = jnp.zeros((1, cfg.N_FUTURE_FRAMES, 3))
    _, traj_full = model.apply(variables, out_full['cam_front'],
                               trajs[:, :, 1:], gt_dummy,
                               out_full['costvolume'][:, rf:], occ[:, rf:],
                               out_full['hdmap'], commands, target,
                               train=False, method=STP3.plan)

    # incremental: build the cache from the past frames, then serve
    cache = []
    for t in range(rf - 1):
        bev, _ = model.apply(variables, image[:, t], k[:, t], e[:, t],
                             train=False, method=STP3.splat_single_frame)
        cache.append(bev)
    cache = jnp.stack(cache, axis=1)
    traj_inc, out_inc, new_cache = model.apply(
        variables, image[:, -1], k[:, -1], e[:, -1], ego, cache,
        trajs[:, :, 1:], commands, target, train=False,
        method=STP3.serve_step)

    np.testing.assert_allclose(np.asarray(traj_inc), np.asarray(traj_full),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_inc['segmentation']),
                               np.asarray(out_full['segmentation']),
                               rtol=1e-4, atol=1e-4)
    assert new_cache.shape == cache.shape


@pytest.mark.slow
def test_serve_step_with_motion_finite():
    cfg = make_test_cfg()
    mc = STP3Config.from_cfg(cfg)
    model = STP3(mc)
    rf = cfg.TIME_RECEPTIVE_FIELD
    image, k, e = _rig(cfg)
    ego = jnp.asarray(np.tile(np.array([-1.0, 0, 0, 0, 0, -0.05], np.float32),
                              (1, rf, 1)))
    rng = np.random.RandomState(2)
    trajs = jnp.asarray(rng.randn(1, cfg.PLANNING.SAMPLE_NUM,
                                  cfg.N_FUTURE_FRAMES, 3).astype(np.float32))
    commands = jnp.zeros((1,), jnp.int32)
    target = jnp.zeros((1, 2))
    variables = model.init(jax.random.PRNGKey(0), image, k, e, ego,
                           trajs=trajs, gt_trajs=trajs[:, 0],
                           commands=commands, target_points=target,
                           method=STP3.init_full)
    cache = jnp.zeros((1, rf - 1) + mc.bev_size + (mc.encoder_out_channels,))
    traj, out, new_cache = model.apply(
        variables, image[:, -1], k[:, -1], e[:, -1], ego, cache, trajs,
        commands, target, train=False, method=STP3.serve_step)
    assert np.isfinite(np.asarray(traj)).all()
    assert traj.shape == (1, cfg.N_FUTURE_FRAMES, 3)
