"""Trainable ('bn') BatchNorm: torch parity, running-stat semantics,
frozen<->live conversion, trainer integration, sync-BN under a mesh.

The reference trains with BN + sync_batchnorm=True + momentum surgery
(/root/reference/train.py:45, stp3/utils/network.py:27-30,
stp3/config.py:109). The TPU-native 'bn' Norm kind keeps running stats in
the mutable ``batch_stats`` collection; train/eval mode is derived from
collection mutability; sync-BN is GSPMD (batch stats reduce globally over
a sharded batch).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from helpers import make_test_cfg
from stp3_tpu.layers.convolutions import Norm, set_bn_momentum
from stp3_tpu.training.checkpoint import merge_bn_to_frozen, split_frozen_bn


@pytest.fixture(autouse=True)
def _restore_momentum():
    yield
    set_bn_momentum(0.1)


def _torch_bn(c, momentum, scale, bias, mean=None, var=None):
    bn = torch.nn.BatchNorm2d(c, momentum=momentum)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        if mean is not None:
            bn.running_mean.copy_(torch.from_numpy(mean))
            bn.running_var.copy_(torch.from_numpy(var))
    return bn


@pytest.mark.parametrize('momentum', [0.1, 0.05])
def test_bn_train_forward_and_stats_match_torch(momentum):
    rng = np.random.RandomState(0)
    n, h, w, c = 4, 6, 5, 8
    x = rng.randn(n, h, w, c).astype(np.float32)
    scale = (rng.rand(c) + 0.5).astype(np.float32)
    bias = (rng.randn(c) * 0.3).astype(np.float32)

    set_bn_momentum(momentum)
    mod = Norm(kind='bn')
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = {'params': {'scale': jnp.asarray(scale), 'bias': jnp.asarray(bias)},
                 'batch_stats': variables['batch_stats']}
    y, mut = mod.apply(variables, jnp.asarray(x), mutable=['batch_stats'])

    bn = _torch_bn(c, momentum, scale, bias)
    bn.train()
    with torch.no_grad():
        yt = bn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(y),
                               yt.numpy().transpose(0, 2, 3, 1), atol=2e-5)
    # running stats: torch convention, unbiased variance
    np.testing.assert_allclose(np.asarray(mut['batch_stats']['mean']),
                               bn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mut['batch_stats']['var']),
                               bn.running_var.numpy(), rtol=1e-5)


def test_bn_eval_uses_running_stats():
    rng = np.random.RandomState(1)
    n, h, w, c = 2, 4, 4, 6
    x = rng.randn(n, h, w, c).astype(np.float32)
    scale = (rng.rand(c) + 0.5).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)
    mean = rng.randn(c).astype(np.float32)
    var = (rng.rand(c) + 0.5).astype(np.float32)

    mod = Norm(kind='bn')
    variables = {'params': {'scale': jnp.asarray(scale), 'bias': jnp.asarray(bias)},
                 'batch_stats': {'mean': jnp.asarray(mean), 'var': jnp.asarray(var)}}
    y = mod.apply(variables, jnp.asarray(x))  # no mutable -> eval

    bn = _torch_bn(c, 0.1, scale, bias, mean, var)
    bn.eval()
    with torch.no_grad():
        yt = bn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(y),
                               yt.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_bn_eval_matches_bn_frozen_after_split():
    """bn_frozen params split into ('bn' params, batch_stats) compute the
    identical eval-mode output — the fine-tune-an-imported-checkpoint path."""
    rng = np.random.RandomState(2)
    c = 6
    x = jnp.asarray(rng.randn(2, 5, 5, c).astype(np.float32))
    frozen_params = {'Sub_0': {'Norm_0': {
        'mean': jnp.asarray(rng.randn(c).astype(np.float32)),
        'var': jnp.asarray((rng.rand(c) + 0.5).astype(np.float32)),
        'scale': jnp.asarray((rng.rand(c) + 0.5).astype(np.float32)),
        'bias': jnp.asarray(rng.randn(c).astype(np.float32))}}}

    y_frozen = Norm(kind='bn_frozen').apply(
        {'params': frozen_params['Sub_0']['Norm_0']}, x)

    params, stats = split_frozen_bn(frozen_params)
    assert set(params['Sub_0']['Norm_0']) == {'scale', 'bias'}
    assert set(stats['Sub_0']['Norm_0']) == {'mean', 'var'}
    y_live = Norm(kind='bn').apply(
        {'params': params['Sub_0']['Norm_0'],
         'batch_stats': stats['Sub_0']['Norm_0']}, x)
    np.testing.assert_allclose(np.asarray(y_live), np.asarray(y_frozen),
                               atol=1e-6)

    # round trip back to the frozen layout (export path)
    merged = merge_bn_to_frozen(params, stats)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), merged, frozen_params)


def test_bn_sync_under_mesh_matches_single_device():
    """GSPMD sync-BN: with the batch sharded over a 4-device mesh the batch
    statistics are GLOBAL (Lightning sync_batchnorm=True equivalent)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.RandomState(3)
    x = rng.randn(8, 4, 4, 6).astype(np.float32)
    mod = Norm(kind='bn')
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))

    apply = jax.jit(lambda v, x: mod.apply(v, x, mutable=['batch_stats']))
    y1, m1 = apply(variables, jnp.asarray(x))

    mesh = Mesh(np.array(jax.devices()[:4]), ('data',))
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P('data')))
    y4, m4 = apply(variables, xs)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m4['batch_stats']['mean']),
                               np.asarray(m1['batch_stats']['mean']), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m4['batch_stats']['var']),
                               np.asarray(m1['batch_stats']['var']), rtol=1e-5)


def test_trainer_bn_smoke_perception():
    """MODEL.NORM=bn end-to-end: init carries batch_stats, the train step
    updates them, val runs in eval mode."""
    from stp3_tpu.datas.dataloaders import prepare_dataloaders
    from stp3_tpu.parallel.mesh import make_mesh, shard_batch
    from stp3_tpu.training.trainer import Trainer

    cfg = make_test_cfg(BATCHSIZE=2, N_FUTURE_FRAMES=0)
    cfg.MODEL.NORM = 'bn'
    cfg.TIME_RECEPTIVE_FIELD = 1
    cfg.PROBABILISTIC.ENABLED = False
    cfg.PLANNING.ENABLED = False
    cfg.INSTANCE_SEG.ENABLED = False
    cfg.INSTANCE_FLOW.ENABLED = False
    cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED = False
    cfg.SEMANTIC_SEG.HDMAP.ENABLED = False
    trainloader, _ = prepare_dataloaders(cfg)
    trainer = Trainer(cfg, mesh=make_mesh(2))
    rng = jax.random.PRNGKey(0)
    batch = next(iter(trainloader))
    state = trainer.init_state(rng, batch)
    assert state.batch_stats is not None
    stats0 = jax.tree.map(np.asarray, state.batch_stats)
    batch = shard_batch(batch, trainer.mesh)
    state, loss = trainer.train_step(state, batch, rng)
    assert np.isfinite(float(loss['total']))
    # running stats moved
    moved = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()),
                         state.batch_stats, stats0)
    assert max(jax.tree.leaves(moved)) > 1e-6
    trainer.reset_metrics()
    trainer.val_step(state.params, batch, state.batch_stats)


@pytest.mark.slow
def test_trainer_bn_full_config_updates_planner_stats():
    """Full config (planning on) with MODEL.NORM=bn: the planner's separate
    apply merges its BN stats back into the state."""
    from stp3_tpu.datas.dataloaders import prepare_dataloaders
    from stp3_tpu.parallel.mesh import make_mesh, shard_batch
    from stp3_tpu.training.trainer import Trainer

    cfg = make_test_cfg(BATCHSIZE=2)
    cfg.MODEL.NORM = 'bn'
    trainloader, _ = prepare_dataloaders(cfg)
    trainer = Trainer(cfg, mesh=make_mesh(1))
    rng = jax.random.PRNGKey(0)
    batch = next(iter(trainloader))
    state = trainer.init_state(rng, batch)
    assert 'planner' in state.batch_stats
    stats0 = jax.tree.map(np.asarray, state.batch_stats)
    state, loss = trainer.train_step(state, shard_batch(batch, trainer.mesh), rng)
    assert np.isfinite(float(loss['total']))
    planner_moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state.batch_stats['planner'], stats0['planner'])
    assert max(jax.tree.leaves(planner_moved)) > 1e-8
    # non-planner stats moved too (single merged collection)
    enc_moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state.batch_stats['encoder'], stats0['encoder'])
    assert max(jax.tree.leaves(enc_moved)) > 1e-8
