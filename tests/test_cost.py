"""Cost-term tests: place obstacles in known cells, check costs
(SURVEY.md §4 'place an obstacle in a known cell, check cost')."""
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_test_cfg
from stp3_tpu.models.cost import CostConfig, CostFunction


@pytest.fixture(scope='module')
def cf():
    cfg = make_test_cfg()
    return CostFunction(CostConfig.from_cfg(cfg))


def _stay_still_traj(b=1, n=1, t=2):
    return jnp.zeros((b, n, t, 2))


def test_safety_cost_sees_obstacle_at_origin(cf):
    t = 2
    h, w = int(cf.bev_dimension[0]), int(cf.bev_dimension[1])
    sem = np.zeros((1, t, h, w), np.float32)
    # trajectory stays at the ego cell; obstacle under the ego footprint
    ci = int((0 - (cf.bx[0] - cf.dx[0] / 2)) / cf.dx[0])
    sem[:, :, ci, ci] = 1.0
    trajs = _stay_still_traj()
    c_occupied = np.asarray(cf.safety_term(trajs, jnp.asarray(sem)))
    c_free = np.asarray(cf.safety_term(trajs, jnp.zeros_like(jnp.asarray(sem))))
    assert (c_occupied > c_free).all()
    assert (c_free == 0).all()


def test_rule_cost_penalizes_off_drivable(cf):
    t = 2
    h, w = int(cf.bev_dimension[0]), int(cf.bev_dimension[1])
    drivable_all = jnp.ones((1, h, w, 1))
    drivable_none = jnp.zeros((1, h, w, 1))
    trajs = _stay_still_traj()
    on = np.asarray(cf.rule_term(trajs, drivable_all))
    off = np.asarray(cf.rule_term(trajs, drivable_none))
    assert (on == 0).all()
    assert (off > 0).all()


def test_comfort_cost_zero_for_constant_velocity(cf):
    # constant velocity 1 m/s forward from t=0: positions 0.5, 1.0, 1.5 ...
    t = 4
    pos = np.zeros((1, 1, t, 2), np.float32)
    pos[0, 0, :, 1] = 0.5 * (1 + np.arange(t))
    c = np.asarray(cf.comfort_term(jnp.asarray(pos)))
    np.testing.assert_allclose(c, 0.0, atol=1e-5)


def test_comfort_cost_penalizes_harsh_accel(cf):
    t = 4
    pos = np.zeros((1, 1, t, 2), np.float32)
    pos[0, 0, :, 1] = [0.0, 0.0, 8.0, 20.0]  # violent longitudinal jumps
    c = np.asarray(cf.comfort_term(jnp.asarray(pos)))
    assert (c > 0).all()


def test_progress_cost_prefers_forward(cf):
    t = 2
    fwd = np.zeros((1, 1, t, 2), np.float32)
    fwd[0, 0, :, 1] = [2.0, 4.0]
    still = np.zeros((1, 1, t, 2), np.float32)
    target = jnp.zeros((1, 2))  # no target -> -progress only
    c_fwd = float(cf.progress_term(jnp.asarray(fwd), target)[0, 0])
    c_still = float(cf.progress_term(jnp.asarray(still), target)[0, 0])
    assert c_fwd < c_still


def test_lr_divider_penalty_near_line(cf):
    h, w = int(cf.bev_dimension[0]), int(cf.bev_dimension[1])
    lane = np.zeros((1, h, w, 1), np.float32)
    # _discretize uses (p - bx)/dx (reference cost.py:133-138) -> origin cell
    ci = int((0 - cf.bx[0]) / cf.dx[0])
    lane[0, :, ci, 0] = 1.0  # divider through the ego cell -> d = 0
    trajs = _stay_still_traj()  # on the divider -> d=0 -> max penalty
    pen = np.asarray(cf.lr_divider_term(trajs, jnp.asarray(lane)))
    assert (pen > 0).all()
    # no divider anywhere -> zero
    pen0 = np.asarray(cf.lr_divider_term(trajs, jnp.zeros_like(jnp.asarray(lane))))
    np.testing.assert_allclose(pen0, 0.0)


def test_footprint_map_matches_exact_gather(cf):
    """Fast conv-map path == reference per-cell gather for in-grid trajs."""
    rng = np.random.RandomState(7)
    b, n, t = 2, 16, 3
    h, w = int(cf.bev_dimension[0]), int(cf.bev_dimension[1])
    sem = jnp.asarray(rng.rand(b, t, h, w).astype(np.float32))
    # trajectories well inside the grid (floor cell in range)
    trajs = jnp.asarray((rng.rand(b, n, t, 2) * 8 - 4).astype(np.float32))
    for fp in [cf._fp0, cf._fp_lam]:
        exact = np.asarray(cf._compute_area(sem, trajs, fp))
        fast = np.asarray(cf._gather_map(cf._footprint_map(sem, fp), trajs))
        np.testing.assert_allclose(fast, exact, rtol=1e-5, atol=1e-5)


def test_lambda_footprint_matches_reference_quirk():
    """The reference dilates the safety footprint by int(LAMBDA/dx) used as
    METRES (cost.py:111 + get_origin_points) — 2 m for nuScenes. The dilated
    footprint must cover (ego + 2*2m) x (ego + 2*2m) of 0.5 m cells."""
    from stp3_tpu.models.cost import ego_footprint_offsets
    xb = yb = (-50.0, 50.0, 0.5)
    zb = (-10.0, 10.0, 20.0)
    fp0 = ego_footprint_offsets(xb, yb, zb, 1.85, 4.084, 0.0)
    lam_pad = float(int(1.0 / 0.5))  # LAMBDA=1.0, dx=0.5 -> 2 m
    fp_lam = ego_footprint_offsets(xb, yb, zb, 1.85, 4.084, lam_pad)
    # rows span grows by ~2*2m/0.5m = 8 cells on each axis
    span0 = fp0[:, 0].max() - fp0[:, 0].min()
    span_lam = fp_lam[:, 0].max() - fp_lam[:, 0].min()
    assert span_lam - span0 == 8
    span0c = fp0[:, 1].max() - fp0[:, 1].min()
    span_lamc = fp_lam[:, 1].max() - fp_lam[:, 1].min()
    assert span_lamc - span0c == 8


def test_aggregate_contract(cf):
    b, n, t = 2, 6, 2
    h, w = int(cf.bev_dimension[0]), int(cf.bev_dimension[1])
    rng = np.random.RandomState(0)
    fc, fo = cf(jnp.asarray(rng.rand(b, t, h, w), jnp.float32),
                jnp.asarray(rng.randn(b, n, t, 2), jnp.float32),
                jnp.asarray(rng.rand(b, t, h, w) > 0.8, jnp.float32),
                jnp.asarray(rng.rand(b, h, w, 1), jnp.float32),
                jnp.asarray(np.ones((b, h, w, 1)), jnp.float32),
                jnp.zeros((b, 2)))
    assert fc.shape == (b, n)
    assert fo.shape == (b, n, t)
    assert np.isfinite(np.asarray(fc)).all() and np.isfinite(np.asarray(fo)).all()
