"""Static-geometry serving splat (ops/static_splat.py): exact agreement with
the dynamic scatter path, and serve_step_static == serve_step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_test_cfg
from stp3_tpu.models.stp3 import STP3, STP3Config
from stp3_tpu.ops.bev_pool import project_to_birds_eye_view
from stp3_tpu.ops.geometry import (calculate_birds_eye_view_parameters,
                                   create_frustum, get_geometry)
from stp3_tpu.ops.static_splat import (build_column_splat_plan,
                                       build_static_splat_plan, column_splat,
                                       static_splat)


def _rig(cfg, b=1):
    n = len(cfg.IMAGE.NAMES)
    h, w = cfg.IMAGE.FINAL_DIM
    k = np.tile(np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]],
                         np.float32), (n, 1, 1))
    e = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    # second camera looks 90 deg to the left so the rig is not degenerate
    if n > 1:
        e[1, :3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    return k, e


def _grid_params(cfg):
    return calculate_birds_eye_view_parameters(
        cfg.LIFT.X_BOUND, cfg.LIFT.Y_BOUND, cfg.LIFT.Z_BOUND)


def test_static_splat_matches_dynamic_scatter():
    cfg = make_test_cfg()
    mc = STP3Config.from_cfg(cfg)
    res, start, dim = _grid_params(cfg)
    frustum = create_frustum(tuple(cfg.IMAGE.FINAL_DIM),
                             cfg.MODEL.ENCODER.DOWNSAMPLE,
                             tuple(cfg.LIFT.D_BOUND))
    k, e = _rig(cfg)
    plan = build_static_splat_plan(frustum, k, e, res, start, dim)
    assert plan.n_rays > 0 and len(plan.buckets) >= 1

    b, n, d = 2, k.shape[0], mc.depth_channels
    hf, wf = np.asarray(frustum).shape[1:3]
    c = 5
    rng = np.random.RandomState(0)
    ctx = jnp.asarray(rng.randn(b, n, hf, wf, c).astype(np.float32))
    depth_logits = jnp.asarray(rng.randn(b, n, hf, wf, d).astype(np.float32))
    dp = jax.nn.softmax(depth_logits, axis=-1)

    # dynamic path: materialized lift + scatter splat (single frame, zero ego)
    lifted = jnp.moveaxis(dp, -1, 2)[..., None] * ctx[:, :, None]  # (B,N,D,Hf,Wf,C)
    geometry = get_geometry(jnp.asarray(np.asarray(frustum)),
                            jnp.asarray(k)[None, None].repeat(b, 0),
                            jnp.asarray(e)[None, None].repeat(b, 0))
    dyn = project_to_birds_eye_view(
        lifted[:, None], geometry, jnp.zeros((b, 1, 6)), res, start, dim)[:, 0]

    # static path
    sta = static_splat(ctx.reshape(b, -1, c), dp.reshape(b, -1, d),
                       [tuple(map(jnp.asarray, (bk.cells, bk.ray, bk.lo, bk.hi)))
                        for bk in plan.buckets],
                       plan.bev_dimension)
    np.testing.assert_allclose(np.asarray(sta), np.asarray(dyn),
                               rtol=1e-4, atol=1e-5)


def test_column_splat_matches_dynamic_scatter():
    """Column-collapsed plan == dynamic scatter splat, batched."""
    cfg = make_test_cfg()
    mc = STP3Config.from_cfg(cfg)
    res, start, dim = _grid_params(cfg)
    frustum = create_frustum(tuple(cfg.IMAGE.FINAL_DIM),
                             cfg.MODEL.ENCODER.DOWNSAMPLE,
                             tuple(cfg.LIFT.D_BOUND))
    k, e = _rig(cfg)
    plan = build_column_splat_plan(frustum, k, e, res, start, dim)
    assert plan.cells.shape[0] == plan.n_cams * plan.wf

    b, n, d = 2, k.shape[0], mc.depth_channels
    hf, wf = np.asarray(frustum).shape[1:3]
    c = 5
    rng = np.random.RandomState(0)
    ctx = jnp.asarray(rng.randn(b, n, hf, wf, c).astype(np.float32))
    depth_logits = jnp.asarray(rng.randn(b, n, hf, wf, d).astype(np.float32))
    dp = jax.nn.softmax(depth_logits, axis=-1)

    lifted = jnp.moveaxis(dp, -1, 2)[..., None] * ctx[:, :, None]
    geometry = get_geometry(jnp.asarray(np.asarray(frustum)),
                            jnp.asarray(k)[None, None].repeat(b, 0),
                            jnp.asarray(e)[None, None].repeat(b, 0))
    dyn = project_to_birds_eye_view(
        lifted[:, None], geometry, jnp.zeros((b, 1, 6)), res, start, dim)[:, 0]

    meta = (plan.n_cams, plan.hf, plan.wf, plan.depth_bins,
            plan.bev_dimension)
    col = column_splat(ctx.reshape(b, -1, c), dp.reshape(b, -1, d),
                       plan.device_arrays(), meta)
    np.testing.assert_allclose(np.asarray(col), np.asarray(dyn),
                               rtol=1e-4, atol=1e-5)


def test_column_splat_tilted_rig_matches_dynamic():
    """A rig WITH pitch/roll breaks the rows-share-a-cell structure — the
    column plan must stay exact anyway (per-row intervals)."""
    cfg = make_test_cfg()
    res, start, dim = _grid_params(cfg)
    frustum = create_frustum(tuple(cfg.IMAGE.FINAL_DIM),
                             cfg.MODEL.ENCODER.DOWNSAMPLE,
                             tuple(cfg.LIFT.D_BOUND))
    k, e = _rig(cfg)
    # tilt camera 0: 20 deg pitch + 10 deg roll
    cp, sp = np.cos(0.35), np.sin(0.35)
    cr, sr = np.cos(0.17), np.sin(0.17)
    pitch = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]], np.float32)
    roll = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]], np.float32)
    e = e.copy()
    e[0, :3, :3] = e[0, :3, :3] @ pitch @ roll
    plan = build_column_splat_plan(frustum, k, e, res, start, dim)

    n = k.shape[0]
    d = int((cfg.LIFT.D_BOUND[1] - cfg.LIFT.D_BOUND[0]) / cfg.LIFT.D_BOUND[2])
    hf, wf = np.asarray(frustum).shape[1:3]
    rng = np.random.RandomState(2)
    ctx = jnp.asarray(rng.randn(1, n, hf, wf, 4).astype(np.float32))
    dp = jax.nn.softmax(
        jnp.asarray(rng.randn(1, n, hf, wf, d).astype(np.float32)), axis=-1)

    lifted = jnp.moveaxis(dp, -1, 2)[..., None] * ctx[:, :, None]
    geometry = get_geometry(jnp.asarray(np.asarray(frustum)),
                            jnp.asarray(k)[None, None], jnp.asarray(e)[None, None])
    dyn = project_to_birds_eye_view(
        lifted[:, None], geometry, jnp.zeros((1, 1, 6)), res, start, dim)[:, 0]
    meta = (plan.n_cams, plan.hf, plan.wf, plan.depth_bins,
            plan.bev_dimension)
    col = column_splat(ctx.reshape(1, -1, 4), dp.reshape(1, -1, d),
                       plan.device_arrays(), meta)
    np.testing.assert_allclose(np.asarray(col), np.asarray(dyn),
                               rtol=1e-4, atol=1e-5)


def test_static_splat_uniform_depth_matches_repeat_lift():
    """dp = ones reproduces the no-depth-distribution uniform-repeat lift."""
    cfg = make_test_cfg()
    res, start, dim = _grid_params(cfg)
    frustum = create_frustum(tuple(cfg.IMAGE.FINAL_DIM),
                             cfg.MODEL.ENCODER.DOWNSAMPLE,
                             tuple(cfg.LIFT.D_BOUND))
    k, e = _rig(cfg)
    plan = build_static_splat_plan(frustum, k, e, res, start, dim)
    n = k.shape[0]
    d = int((cfg.LIFT.D_BOUND[1] - cfg.LIFT.D_BOUND[0]) / cfg.LIFT.D_BOUND[2])
    hf, wf = np.asarray(frustum).shape[1:3]
    rng = np.random.RandomState(1)
    ctx = jnp.asarray(rng.randn(1, n, hf, wf, 3).astype(np.float32))

    lifted = jnp.broadcast_to(ctx[:, :, None], (1, n, d, hf, wf, 3))
    geometry = get_geometry(jnp.asarray(np.asarray(frustum)),
                            jnp.asarray(k)[None, None], jnp.asarray(e)[None, None])
    dyn = project_to_birds_eye_view(
        lifted[:, None], geometry, jnp.zeros((1, 1, 6)), res, start, dim)[:, 0]
    sta = static_splat(ctx.reshape(1, -1, 3),
                       jnp.ones((1, n * hf * wf, d)),
                       [tuple(map(jnp.asarray, (bk.cells, bk.ray, bk.lo, bk.hi)))
                        for bk in plan.buckets],
                       plan.bev_dimension)
    np.testing.assert_allclose(np.asarray(sta), np.asarray(dyn),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_serve_step_static_matches_serve_step():
    cfg = make_test_cfg()
    mc = STP3Config.from_cfg(cfg)
    model = STP3(mc)
    rf = cfg.TIME_RECEPTIVE_FIELD
    n = len(cfg.IMAGE.NAMES)
    h, w = cfg.IMAGE.FINAL_DIM
    rng = np.random.RandomState(3)
    image = jnp.asarray(rng.rand(1, rf, n, h, w, 3), jnp.float32)
    k_np, e_np = _rig(cfg)
    k = jnp.asarray(np.tile(k_np, (1, rf, 1, 1, 1)))
    e = jnp.asarray(np.tile(e_np, (1, rf, 1, 1, 1)))
    ego = jnp.zeros((1, rf, 6))
    trajs = jnp.asarray(rng.randn(1, cfg.PLANNING.SAMPLE_NUM,
                                  cfg.N_FUTURE_FRAMES, 3).astype(np.float32))
    commands = jnp.zeros((1,), jnp.int32)
    target = jnp.zeros((1, 2))
    variables = model.init(jax.random.PRNGKey(0), image, k, e, ego,
                           trajs=trajs, gt_trajs=trajs[:, 0],
                           commands=commands, target_points=target,
                           method=STP3.init_full)

    res, start, dim = _grid_params(cfg)
    frustum = create_frustum(tuple(cfg.IMAGE.FINAL_DIM),
                             cfg.MODEL.ENCODER.DOWNSAMPLE,
                             tuple(cfg.LIFT.D_BOUND))
    plan = build_static_splat_plan(frustum, k_np, e_np, res, start, dim)

    cache = jnp.asarray(rng.rand(1, rf - 1, *mc.bev_size,
                                 mc.encoder_out_channels), jnp.float32)
    traj_d, out_d, cache_d = model.apply(
        variables, image[:, -1], k[:, -1], e[:, -1], ego, cache, trajs,
        commands, target, train=False, method=STP3.serve_step)
    traj_s, out_s, cache_s = model.apply(
        variables, image[:, -1], ego, cache, trajs, commands, target,
        plan.device_buckets(), train=False, method=STP3.serve_step_static)

    # the PRODUCTION path (AgentCore serves via the column plan's
    # device_arrays() dict — the isinstance-dict branch in the model)
    cplan = build_column_splat_plan(frustum, k_np, e_np, res, start, dim)
    traj_c, out_c, cache_c = model.apply(
        variables, image[:, -1], ego, cache, trajs, commands, target,
        cplan.device_arrays(), train=False, method=STP3.serve_step_static)

    for traj_x, out_x, cache_x in ((traj_s, out_s, cache_s),
                                   (traj_c, out_c, cache_c)):
        np.testing.assert_allclose(np.asarray(traj_x), np.asarray(traj_d),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out_x['segmentation']),
                                   np.asarray(out_d['segmentation']),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cache_x), np.asarray(cache_d),
                                   rtol=1e-4, atol=1e-4)
