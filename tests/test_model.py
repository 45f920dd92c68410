"""Model shape/contract tests at tiny config (SURVEY.md §4
'shape/contract tests for the module graph'); gating matrix per §2.4."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_test_cfg
from stp3_tpu.models.stp3 import STP3, STP3Config


def _inputs(cfg, b=1):
    rf = cfg.TIME_RECEPTIVE_FIELD
    n = len(cfg.IMAGE.NAMES)
    h, w = cfg.IMAGE.FINAL_DIM
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(b, rf, n, h, w, 3), jnp.float32)
    K = jnp.asarray(np.tile(np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]],
                                     np.float32), (b, rf, n, 1, 1)))
    E = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, rf, n, 1, 1)))
    ego = jnp.asarray(np.zeros((b, rf, 6), np.float32))
    return image, K, E, ego


def test_forward_contract_full_config():
    cfg = make_test_cfg()
    mc = STP3Config.from_cfg(cfg)
    model = STP3(mc)
    img, K, E, ego = _inputs(cfg)
    variables = model.init(jax.random.PRNGKey(0), img, K, E, ego, train=False)
    out = model.apply(variables, img, K, E, ego, train=False)
    s_total = cfg.TIME_RECEPTIVE_FIELD + cfg.N_FUTURE_FRAMES
    hb, wb = mc.bev_size
    assert out['segmentation'].shape == (1, s_total, hb, wb, 2)
    assert out['pedestrian'].shape == (1, s_total, hb, wb, 2)
    assert out['hdmap'].shape == (1, hb, wb, 4)            # present frame only
    assert out['instance_center'].shape == (1, s_total, hb, wb, 1)
    assert out['instance_offset'].shape == (1, s_total, hb, wb, 2)
    assert out['instance_flow'].shape == (1, s_total, hb, wb, 2)
    assert out['costvolume'].shape == (1, s_total, hb, wb)
    assert out['cam_front'].shape[0] == 1                  # present front feature
    hf, wf = cfg.IMAGE.FINAL_DIM[0] // 8, cfg.IMAGE.FINAL_DIM[1] // 8
    d = int((cfg.LIFT.D_BOUND[1] - cfg.LIFT.D_BOUND[0]) / cfg.LIFT.D_BOUND[2])
    assert out['depth_prediction'].shape == (1, cfg.TIME_RECEPTIVE_FIELD,
                                             len(cfg.IMAGE.NAMES), hf, wf, d)


def test_forward_perception_only():
    cfg = make_test_cfg(N_FUTURE_FRAMES=0)
    cfg.PROBABILISTIC.ENABLED = False
    cfg.PLANNING.ENABLED = False
    cfg.INSTANCE_SEG.ENABLED = False
    cfg.INSTANCE_FLOW.ENABLED = False
    mc = STP3Config.from_cfg(cfg)
    model = STP3(mc)
    img, K, E, ego = _inputs(cfg)
    variables = model.init(jax.random.PRNGKey(0), img, K, E, ego, train=False)
    out = model.apply(variables, img, K, E, ego, train=False)
    rf = cfg.TIME_RECEPTIVE_FIELD
    hb, wb = mc.bev_size
    assert out['segmentation'].shape == (1, rf, hb, wb, 2)
    assert out['instance_center'] is None
    assert out['costvolume'] is None
    assert out['cam_front'] is None


@pytest.mark.parametrize('method', ['GAUSSIAN', 'MIXGAUSSIAN', 'BERNOULLI'])
def test_distribution_methods(method):
    cfg = make_test_cfg()
    cfg.PROBABILISTIC.METHOD = method
    cfg.PLANNING.ENABLED = False
    mc = STP3Config.from_cfg(cfg)
    model = STP3(mc)
    img, K, E, ego = _inputs(cfg)
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1),
            'dropout': jax.random.PRNGKey(2)}
    variables = model.init(rngs, img, K, E, ego, train=False)
    # train-mode sampling draws noise; eval is deterministic
    out1 = model.apply(variables, img, K, E, ego, train=False)
    out2 = model.apply(variables, img, K, E, ego, train=False)
    np.testing.assert_allclose(np.asarray(out1['segmentation']),
                               np.asarray(out2['segmentation']), atol=1e-6)


def test_identity_temporal_model():
    cfg = make_test_cfg(N_FUTURE_FRAMES=0, TIME_RECEPTIVE_FIELD=1)
    cfg.MODEL.TEMPORAL_MODEL.NAME = 'identity'
    cfg.PROBABILISTIC.ENABLED = False
    cfg.PLANNING.ENABLED = False
    cfg.INSTANCE_SEG.ENABLED = False
    cfg.INSTANCE_FLOW.ENABLED = False
    mc = STP3Config.from_cfg(cfg)
    model = STP3(mc)
    img, K, E, ego = _inputs(cfg)
    variables = model.init(jax.random.PRNGKey(0), img, K, E, ego, train=False)
    out = model.apply(variables, img, K, E, ego, train=False)
    hb, wb = mc.bev_size
    assert out['segmentation'].shape == (1, 1, hb, wb, 2)


def test_remat_noop_tags_rejected():
    """MODEL.REMAT tags that cannot apply to the instantiated architecture
    must raise instead of silently no-op'ing (a quiet remat miss is a
    memory-budget miscalculation waiting to OOM)."""
    cfg = make_test_cfg(N_FUTURE_FRAMES=0)
    cfg.PROBABILISTIC.ENABLED = False
    cfg.PLANNING.ENABLED = False
    cfg.INSTANCE_SEG.ENABLED = False
    cfg.INSTANCE_FLOW.ENABLED = False
    cfg.MODEL.REMAT = 'encoder+future'
    model = STP3(STP3Config.from_cfg(cfg))
    img, K, E, ego = _inputs(cfg)
    with pytest.raises(ValueError, match='N_FUTURE_FRAMES'):
        model.lazy_init(jax.random.PRNGKey(0), img, K, E, ego, train=False)

    cfg = make_test_cfg(N_FUTURE_FRAMES=0, TIME_RECEPTIVE_FIELD=1)
    cfg.MODEL.TEMPORAL_MODEL.NAME = 'identity'
    cfg.PROBABILISTIC.ENABLED = False
    cfg.PLANNING.ENABLED = False
    cfg.INSTANCE_SEG.ENABLED = False
    cfg.INSTANCE_FLOW.ENABLED = False
    cfg.MODEL.REMAT = 'temporal'
    model = STP3(STP3Config.from_cfg(cfg))
    img, K, E, ego = _inputs(cfg)
    with pytest.raises(ValueError, match='identity'):
        model.lazy_init(jax.random.PRNGKey(0), img, K, E, ego, train=False)


def test_no_depth_distribution():
    cfg = make_test_cfg(N_FUTURE_FRAMES=0)
    cfg.MODEL.ENCODER.USE_DEPTH_DISTRIBUTION = False
    cfg.PROBABILISTIC.ENABLED = False
    cfg.PLANNING.ENABLED = False
    cfg.INSTANCE_SEG.ENABLED = False
    cfg.INSTANCE_FLOW.ENABLED = False
    mc = STP3Config.from_cfg(cfg)
    model = STP3(mc)
    img, K, E, ego = _inputs(cfg)
    variables = model.init(jax.random.PRNGKey(0), img, K, E, ego, train=False)
    out = model.apply(variables, img, K, E, ego, train=False)
    assert out['depth_prediction'] is None
    assert np.isfinite(np.asarray(out['segmentation'])).all()


def test_planner_command_filtering():
    from stp3_tpu.models.planning_model import command_index_table
    tbl = command_index_table(12)
    assert tbl.shape == (4, 12)
    # LEFT tiles first third, RIGHT last third, row 3 = identity
    np.testing.assert_array_equal(tbl[0], np.tile(np.arange(4), 3))
    np.testing.assert_array_equal(tbl[2], np.tile(np.arange(8, 12), 3))
    np.testing.assert_array_equal(tbl[3], np.arange(12))
