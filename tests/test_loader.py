"""NumpyLoader worker modes: thread pool, spawn process pool, serial —
identical batch streams (content + order) for a fixed seed.
"""
import numpy as np
import pytest

from helpers import make_test_cfg
from stp3_tpu.datas.synthetic import NumpyLoader, SyntheticDataset


def _stream(loader, epochs=2):
    out = []
    for _ in range(epochs):
        out.extend(batch['image'].sum() for batch in loader)
    return np.asarray(out)


@pytest.mark.parametrize('kw', [
    dict(num_workers=3),
    dict(num_workers=3, use_processes=True),
])
def test_worker_modes_match_serial(kw):
    cfg = make_test_cfg()
    ds = SyntheticDataset(cfg, n_samples=10, seed=0)
    serial = NumpyLoader(ds, 2, shuffle=True, drop_last=False, num_workers=0)
    pooled = NumpyLoader(ds, 2, shuffle=True, drop_last=False, **kw)
    try:
        np.testing.assert_allclose(_stream(serial), _stream(pooled))
    finally:
        pooled.close()


@pytest.mark.parametrize('kw', [
    dict(num_workers=2),
    dict(num_workers=2, use_processes=True),
])
def test_prefetch_zero_still_yields(kw):
    """prefetch=0 must degrade to prefetch=1, not silently yield an empty
    epoch (the in-flight seed loop would otherwise never start)."""
    cfg = make_test_cfg()
    ds = SyntheticDataset(cfg, n_samples=6, seed=0)
    loader = NumpyLoader(ds, 2, drop_last=False, prefetch=0, **kw)
    try:
        assert len(list(loader)) == 3
    finally:
        loader.close()


def test_loader_factory_wires_cfg_workers():
    from stp3_tpu.datas.dataloaders import prepare_dataloaders
    cfg = make_test_cfg()
    cfg.N_WORKERS = 2
    cfg.WORKER_KIND = 'process'
    trainloader, valloader = prepare_dataloaders(cfg)
    assert trainloader.num_workers == 2 and trainloader.use_processes
    assert valloader.use_processes
    batch = next(iter(trainloader))
    assert batch['image'].shape[0] == cfg.BATCHSIZE
    trainloader.close()
    valloader.close()


def test_rank_world_sampler_split():
    """NumpyLoader's multi-process split: process p takes the p-th
    contiguous batch_size rows of each global batch, so the global array
    shard_batch assembles (process-0 rows first) is bit-identical to the
    single-process batch; val (drop_last=False) pads by wrap-around to
    equal full batches on every process (torch DistributedSampler
    semantics)."""
    import numpy as np

    from stp3_tpu.datas.synthetic import NumpyLoader

    class Idx:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {'i': np.array([i])}

    ds = Idx()
    single = NumpyLoader(ds, 4, shuffle=True, drop_last=True, num_workers=0)
    r0 = NumpyLoader(ds, 2, shuffle=True, drop_last=True, num_workers=0,
                     rank=0, world=2)
    r1 = NumpyLoader(ds, 2, shuffle=True, drop_last=True, num_workers=0,
                     rank=1, world=2)
    gb = [b['i'].ravel() for b in single]
    b0 = [b['i'].ravel() for b in r0]
    b1 = [b['i'].ravel() for b in r1]
    assert len(gb) == len(b0) == len(b1) == 2   # 10 samples // global 4
    for g, a, b in zip(gb, b0, b1):
        np.testing.assert_array_equal(np.concatenate([a, b]), g)

    # val: 10 samples, gb=4 -> pad 2 by wrap-around, 3 equal batches
    v0 = NumpyLoader(ds, 2, shuffle=False, drop_last=False, num_workers=0,
                     rank=0, world=2)
    v1 = NumpyLoader(ds, 2, shuffle=False, drop_last=False, num_workers=0,
                     rank=1, world=2)
    a = np.concatenate([b['i'].ravel() for b in v0])
    b = np.concatenate([b['i'].ravel() for b in v1])
    assert len(a) == len(b) == 6
    seen = np.concatenate([a, b])
    assert set(seen.tolist()) == set(range(10))  # every sample covered


def test_prefetch_to_device_matches_sync_shard():
    """The background-thread device prefetcher yields the same batches,
    in order, as synchronous shard_batch on the loop's critical path."""
    import jax

    from stp3_tpu.parallel.mesh import make_mesh, prefetch_to_device, shard_batch

    cfg = make_test_cfg()
    ds = SyntheticDataset(cfg, n_samples=8, seed=0)
    mesh = make_mesh(2)
    sync = [shard_batch(b, mesh)
            for b in NumpyLoader(ds, 2, shuffle=True, num_workers=0)]
    pre = list(prefetch_to_device(
        iter(NumpyLoader(ds, 2, shuffle=True, num_workers=0)), mesh))
    assert len(pre) == len(sync) == 4
    for a, b in zip(pre, sync):
        assert a['image'].sharding == b['image'].sharding
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_prefetch_to_device_propagates_errors_and_closes():
    from stp3_tpu.parallel.mesh import make_mesh, prefetch_to_device

    mesh = make_mesh(1)

    def bad_iter():
        yield {'x': np.zeros((2, 3), np.float32)}
        raise RuntimeError('loader exploded')

    it = prefetch_to_device(bad_iter(), mesh)
    next(it)
    with pytest.raises(RuntimeError, match='loader exploded'):
        next(it)

    # early close while the producer still has items queued must not hang
    def endless():
        while True:
            yield {'x': np.zeros((2, 3), np.float32)}

    it = prefetch_to_device(endless(), mesh, size=1)
    next(it)
    it.close()

def test_prefetch_to_device_size_zero_passthrough(monkeypatch):
    """size=0 is the single-core degrade mode: synchronous shard_batch,
    no producer thread, identical stream. default_prefetch_size picks it
    on 1-CPU hosts and honors the env override."""
    import threading

    from stp3_tpu.parallel.mesh import (default_prefetch_size, make_mesh,
                                        prefetch_to_device)

    cfg = make_test_cfg()
    ds = SyntheticDataset(cfg, n_samples=4, seed=0)
    mesh = make_mesh(2)
    # count only prefetch-producer threads, by ident: a PREVIOUS test's
    # producer may still be draining its 0.5 s stop-poll when this test
    # starts, so a global active_count() equality races with its exit
    # (observed flake in file-order runs)
    def producer_idents():
        return {t.ident for t in threading.enumerate()
                if t.name == 'stp3-device-prefetch'}
    before = producer_idents()
    got = list(prefetch_to_device(
        iter(NumpyLoader(ds, 2, shuffle=False, num_workers=0)), mesh, size=0))
    assert producer_idents() <= before  # no NEW producer thread spawned
    want = list(prefetch_to_device(
        iter(NumpyLoader(ds, 2, shuffle=False, num_workers=0)), mesh))
    assert len(got) == len(want) == 2
    for a, b in zip(got, want):
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    monkeypatch.setenv('STP3_DEVICE_PREFETCH', '0')
    assert default_prefetch_size() == 0
    monkeypatch.setenv('STP3_DEVICE_PREFETCH', '3')
    assert default_prefetch_size() == 3
    monkeypatch.delenv('STP3_DEVICE_PREFETCH')
    # default-off-until-measured (round 5): the only measurement of the
    # prefetch thread is the 1-vCPU regression; multi-core auto-ON was
    # never benchmarked, so it is opt-in via the env until it is
    assert default_prefetch_size() == 0


def test_valid_mask_marks_padding_duplicates():
    """with_valid_mask marks exactly the wrap-around padding rows of a
    ragged multi-process val tail (VERDICT r4 weak #2: those duplicates
    must not enter the metric accumulators)."""
    class Idx:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {'i': np.array([i])}

    ds = Idx()
    # world=2, per-rank batch 2 -> global batch 4; 5 samples -> pad 3
    loaders = [NumpyLoader(ds, 2, shuffle=False, drop_last=False,
                           num_workers=0, rank=r, world=2,
                           with_valid_mask=True) for r in (0, 1)]
    per_rank = [list(l) for l in loaders]
    assert all(len(b) == 2 for b in per_rank)
    valid_ids = []
    for batches in zip(*per_rank):            # interleave rank rows in order
        for b in batches:
            assert b['valid'].dtype == bool and b['valid'].shape == (2,)
            valid_ids.extend(b['i'].ravel()[b['valid']].tolist())
    # exactly the 5 real samples survive the mask, each once, in order
    assert valid_ids == [0, 1, 2, 3, 4]

    # single-process ragged tail: no padding, every row valid
    sp = list(NumpyLoader(ds, 2, shuffle=False, drop_last=False,
                          num_workers=0, with_valid_mask=True))
    assert len(sp) == 3 and all(b['valid'].all() for b in sp)
    assert sp[-1]['valid'].shape == (1,)

    # with_valid_mask off: contract unchanged (no 'valid' key)
    off = list(NumpyLoader(ds, 2, shuffle=False, drop_last=False,
                           num_workers=0, rank=0, world=2))
    assert all('valid' not in b for b in off)


def test_valid_mask_excludes_rows_from_metrics():
    """Trainer.val_step must skip masked rows: duplicate a row with
    valid=False and assert the IoU accumulators equal the unpadded run."""
    import jax

    from stp3_tpu.datas.synthetic import collate
    from stp3_tpu.training.trainer import Trainer

    cfg = make_test_cfg()
    cfg.PLANNING.ENABLED = False
    cfg.INSTANCE_SEG.ENABLED = False
    cfg.INSTANCE_FLOW.ENABLED = False
    trainer = Trainer(cfg)
    ds = SyntheticDataset(cfg, n_samples=2, seed=0)
    batch = collate([ds[0], ds[1]])
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    trainer.reset_metrics()
    trainer.val_step(state.params, batch, state.batch_stats)
    want = {k: np.asarray(v).copy()
            for k, v in trainer.metric_vehicle_val.state.items()}

    # same two rows + the first row duplicated as padding (valid=False)
    padded = collate([ds[0], ds[1], ds[0]])
    padded['valid'] = np.array([True, True, False])
    trainer.reset_metrics()
    trainer.val_step(state.params, padded, state.batch_stats)
    got = trainer.metric_vehicle_val.state
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), want[k], err_msg=k)


def test_coordination_barrier_fallback(monkeypatch):
    """When the private jax._src.distributed client is unavailable (JAX
    upgrade), the barrier must fall back to the public
    sync_global_devices instead of raising (VERDICT r4 weak #3)."""
    import jax
    from jax.experimental import multihost_utils

    from stp3_tpu.parallel import mesh as mesh_mod

    calls = []
    monkeypatch.setattr(mesh_mod, '_coordination_client', lambda: None)
    monkeypatch.setattr(mesh_mod.jax, 'process_count', lambda: 2)
    monkeypatch.setattr(multihost_utils, 'sync_global_devices',
                        lambda name: calls.append(name))
    mesh_mod.coordination_barrier('round5_fallback')
    assert calls == ['round5_fallback']

    # single-process: still a no-op, no fallback call
    monkeypatch.setattr(mesh_mod.jax, 'process_count', lambda: 1)
    mesh_mod.coordination_barrier('noop')
    assert calls == ['round5_fallback']

    # and _coordination_client really feature-detects: with the private
    # module import broken it returns None instead of raising
    import builtins
    real_import = builtins.__import__

    def broken(name, globals=None, locals=None, fromlist=(), level=0):
        if name == 'jax._src' and fromlist and 'distributed' in fromlist:
            raise ImportError(name)
        if name == 'jax._src.distributed':
            raise ImportError(name)
        return real_import(name, globals, locals, fromlist, level)

    monkeypatch.undo()
    monkeypatch.setattr(builtins, '__import__', broken)
    assert mesh_mod._coordination_client() is None
