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
