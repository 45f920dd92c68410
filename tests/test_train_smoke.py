"""End-to-end integration: synthetic data -> jitted sharded train step ->
val metrics (SURVEY.md §4 'synthetic-dataset integration test' +
'multi-device tests without a cluster').

These compile the full model graph on CPU (~2-3 min total) — kept to one
full-config smoke plus a cheap single-vs-multi-device equivalence check on
a reduced config.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_test_cfg
from stp3_tpu.datas.dataloaders import prepare_dataloaders
from stp3_tpu.parallel.mesh import make_mesh, shard_batch
from stp3_tpu.training.trainer import Trainer


@pytest.mark.slow
def test_full_train_and_val_step():
    cfg = make_test_cfg(BATCHSIZE=8)
    trainloader, _ = prepare_dataloaders(cfg)
    trainer = Trainer(cfg)
    rng = jax.random.PRNGKey(0)
    batch = next(iter(trainloader))
    state = trainer.init_state(rng, batch)
    batch = shard_batch(batch, trainer.mesh)

    state, loss1 = trainer.train_step(state, batch, rng)
    assert np.isfinite(float(loss1['total']))
    # every configured task contributed a loss term
    for key in ['segmentation', 'pedestrian', 'hdmap', 'instance_center',
                'instance_offset', 'instance_flow', 'planning']:
        assert key in loss1, key
    history = [float(loss1['total'])]
    for _ in range(4):
        state, loss = trainer.train_step(state, batch, rng)
        history.append(float(loss['total']))
    assert np.isfinite(history).all()
    # optimisation makes progress on a repeated batch within a few steps
    assert min(history[1:]) < history[0], history

    trainer.reset_metrics()
    trainer.val_step(state.params, batch)
    metrics = trainer.compute_metrics()
    assert 'iou_vehicle' in metrics and metrics['iou_vehicle'].shape == (2,)
    assert 'planning' in metrics
    assert np.isfinite(metrics['planning']['L2']).all()


@pytest.mark.slow
def test_bf16_train_step_finite():
    """PRECISION 16 path: bf16 activations, fp32 master params."""
    cfg = make_test_cfg(BATCHSIZE=4, N_FUTURE_FRAMES=0, PRECISION=16)
    cfg.PROBABILISTIC.ENABLED = False
    cfg.PLANNING.ENABLED = False
    cfg.INSTANCE_SEG.ENABLED = False
    cfg.INSTANCE_FLOW.ENABLED = False
    trainloader, _ = prepare_dataloaders(cfg)
    trainer = Trainer(cfg, mesh=make_mesh(4))
    assert trainer.compute_dtype == jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    batch = next(iter(trainloader))
    state = trainer.init_state(rng, batch)
    # master params stay fp32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))
    batch = shard_batch(batch, trainer.mesh)
    state, loss = trainer.train_step(state, batch, rng)
    assert np.isfinite(float(loss['total']))
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))


@pytest.mark.slow
def test_gt_depth_train_step():
    """LIFT.GT_DEPTH path: depth labels prepared + depth CE loss applied."""
    cfg = make_test_cfg(BATCHSIZE=2, N_FUTURE_FRAMES=0)
    cfg.LIFT.GT_DEPTH = True
    cfg.PROBABILISTIC.ENABLED = False
    cfg.PLANNING.ENABLED = False
    cfg.INSTANCE_SEG.ENABLED = False
    cfg.INSTANCE_FLOW.ENABLED = False
    trainloader, _ = prepare_dataloaders(cfg)
    trainer = Trainer(cfg, mesh=make_mesh(2))
    rng = jax.random.PRNGKey(0)
    batch = next(iter(trainloader))
    assert 'depths' in batch
    state = trainer.init_state(rng, batch)
    state, loss = trainer.train_step(state, shard_batch(batch, trainer.mesh), rng)
    assert 'depths' in loss
    assert np.isfinite(float(loss['total']))


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    """pjit-sharded step == single-device step (SURVEY.md §4). Perception
    config (no future/planning) keeps the graph small."""
    cfg = make_test_cfg(BATCHSIZE=4, N_FUTURE_FRAMES=0)
    cfg.PROBABILISTIC.ENABLED = False
    cfg.PLANNING.ENABLED = False
    cfg.INSTANCE_SEG.ENABLED = False
    cfg.INSTANCE_FLOW.ENABLED = False

    loaders = prepare_dataloaders(cfg)
    batch = next(iter(loaders[0]))
    rng = jax.random.PRNGKey(0)

    mesh4 = make_mesh(4)
    mesh1 = make_mesh(1)
    tr4 = Trainer(cfg, mesh=mesh4)
    tr1 = Trainer(cfg, mesh=mesh1)

    st4 = tr4.init_state(rng, batch)
    st1 = tr1.init_state(rng, batch)
    # same init params
    jax.tree.map(lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
                 st4.params, st1.params)

    st4, l4 = tr4.train_step(st4, shard_batch(batch, mesh4), rng)
    st1, l1 = tr1.train_step(st1, shard_batch(batch, mesh1), rng)
    np.testing.assert_allclose(float(l4['total']), float(l1['total']), rtol=2e-4)
    # updated params match across shardings. Exact equality is not expected:
    # the cross-device gradient psum reorders fp32 reductions, and Adam's
    # grad/sqrt(v) normalisation amplifies that noise up to ~2*lr where a
    # near-zero gradient flips sign. Bound by a small multiple of lr.
    lr = float(cfg.OPTIMIZER.LR)
    flat4 = jax.tree.leaves(st4.params)
    flat1 = jax.tree.leaves(st1.params)
    for a, b in zip(flat4, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4 * lr)


def _remat_grads(remat, n_future):
    cfg = make_test_cfg(BATCHSIZE=2, N_FUTURE_FRAMES=n_future)
    cfg.PROBABILISTIC.ENABLED = n_future > 0
    cfg.PLANNING.ENABLED = False
    cfg.INSTANCE_SEG.ENABLED = False
    cfg.INSTANCE_FLOW.ENABLED = False
    cfg.MODEL.REMAT = remat
    trainloader, _ = prepare_dataloaders(cfg)
    trainer = Trainer(cfg, mesh=make_mesh(1))
    rng = jax.random.PRNGKey(0)
    batch = next(iter(trainloader))
    state = trainer.init_state(rng, batch)
    batch = shard_batch(batch, trainer.mesh)
    (total, _), g = jax.jit(jax.value_and_grad(
        trainer.loss_fn, has_aux=True))(state.params, batch, rng)
    return float(total), g


@pytest.mark.slow
@pytest.mark.parametrize('remat,n_future', [
    ('encoder', 0),
    # the full compositional policy, with futures on so the 'future'
    # stage is actually traced under remat
    ('encoder+temporal+future+decoder', 2),
    # per-GRU-cell checkpointing (step-local recompute) composed with
    # the winning encoder stage remat
    ('encoder+cells', 2),
    # policy remat: save conv/dot outputs, recompute elementwise gates
    ('encoder+gates', 2),
])
def test_remat_gradient_parity(remat, n_future):
    """MODEL.REMAT is pure rematerialisation: loss and gradients must
    match the no-remat step up to recompute fp noise. Guards the
    nn.remat(static_argnums) wiring in models/stp3.py — a wrong
    static_argnums silently changes train/eval behaviour under remat
    (e.g. dropout flipping on), which shows as O(1) gradient changes.

    NOT bit-exact by design: XLA re-fuses the recomputed segment, so
    the backward's fp reassociation differs under the bf16 compute
    policy. Measured on this container's CPU codegen (the same tests
    were authored passing at rtol=1e-5/atol=1e-6 on a different host —
    the noise is machine-dependent): per-leaf relative-L2 deviation up
    to 0.75% ('cells') / 1.7% ('gates'), max element deviation up to
    2% of the leaf's own gradient scale, spread smoothly over the
    recomputed future_prediction leaves — exactly bf16-eps-scale
    reassociation noise. A genuine static_argnums bug (train-mode
    flip: dropout/drop-connect toggling) moves many leaves at ~100%
    relative-L2, so the 10% summary-statistic gate below keeps the
    guard while tolerating recompute noise."""
    ref_total, ref_g = _remat_grads('none', n_future)
    total, g = _remat_grads(remat, n_future)
    assert ref_total == pytest.approx(total, rel=1e-5)

    def leaf_close(a, b):
        a64 = np.asarray(a, np.float64)
        b64 = np.asarray(b, np.float64)
        scale = max(float(np.abs(b64).max()), 1e-6)
        rel_l2 = float(np.linalg.norm(a64 - b64)
                       / (np.linalg.norm(b64) + 1e-12))
        assert rel_l2 < 0.1, rel_l2
        assert float(np.abs(a64 - b64).max()) <= 0.1 * scale

    jax.tree.map(leaf_close, ref_g, g)


def test_allreduce_host_tree_multiprocess(monkeypatch):
    """allreduce_host_tree sums metric-state pytrees across processes
    (Lightning dist_reduce_fx='sum' equivalent). Single-process JAX cannot
    spawn real processes here, so the cross-host gather is monkeypatched:
    the sum semantics and tree structure are what this pins."""
    from stp3_tpu.parallel import mesh as M

    tree = {'tp': np.array([1, 2, 3], np.int64), 'l2': np.float64(1.5)}

    # single-process: identity (no gather call)
    out = M.allreduce_host_tree(tree)
    assert out is tree

    # simulated 3-process run: each "process" contributes its own state
    from jax.experimental import multihost_utils
    monkeypatch.setattr(jax, 'process_count', lambda: 3)
    monkeypatch.setattr(multihost_utils, 'process_allgather',
                        lambda x: np.stack([x, 2 * x, 3 * x]))
    out = M.allreduce_host_tree(tree)
    np.testing.assert_array_equal(out['tp'], np.array([6, 12, 18]))
    assert out['l2'] == pytest.approx(9.0)
    assert out['tp'].dtype == np.int64


def test_fast_two_device_train_step():
    """Fast-tier mesh coverage: a 2-device sharded train step on the
    smallest graph (identity temporal, perception-only) so parallel/mesh.py
    regressions surface in the default suite, not only in -m slow runs."""
    cfg = make_test_cfg(BATCHSIZE=2, N_FUTURE_FRAMES=0)
    cfg.TIME_RECEPTIVE_FIELD = 1          # TemporalModelIdentity path
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
    batch = shard_batch(batch, trainer.mesh)
    # the batch really is sharded over the 2-device mesh
    img_sharding = batch['image'].sharding
    assert len(img_sharding.device_set) == 2, img_sharding
    state, loss = trainer.train_step(state, batch, rng)
    assert np.isfinite(float(loss['total']))
