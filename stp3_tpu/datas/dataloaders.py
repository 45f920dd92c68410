"""Dataloader factory (reference stp3/datas/dataloaders.py:8-42).

Dataset selection by ``cfg.DATASET.NAME``:
  * 'synthetic' — procedural scenes, no external data (always available);
  * 'nuscenes'  — requires the nuscenes-devkit + dataroot;
  * 'carla'     — requires a CARLA data dump.
Real datasets are gated on their SDKs being importable so the framework
runs end-to-end without them.
"""
from __future__ import annotations

from stp3_tpu.datas.synthetic import NumpyLoader, SyntheticDataset


def prepare_dataloaders(cfg, return_dataset: bool = False, split: str = 'both'):
    """split: 'both' | 'val' — evaluation only needs the val dataset (the
    train split's index build / CAN-bus / map loading is expensive)."""
    name = cfg.DATASET.NAME
    need_train = split != 'val'
    traindata = None
    if name == 'synthetic':
        n_train = 10 if cfg.DATASET.VERSION == 'mini' else 64
        if need_train:
            traindata = SyntheticDataset(cfg, n_samples=n_train, seed=0)
        n_val = int(cfg.DATASET.get('VAL_SAMPLES', 0)) or max(4, n_train // 4)
        valdata = SyntheticDataset(cfg, n_samples=n_val, seed=1)
    elif name == 'nuscenes':
        from stp3_tpu.datas.nuscenes_data import FuturePredictionDataset, make_nusc
        nusc = make_nusc(cfg)
        if need_train:
            traindata = FuturePredictionDataset(nusc, 0, cfg)
            if cfg.DATASET.VERSION == 'mini':
                traindata.indices = traindata.indices[:10]
        valdata = FuturePredictionDataset(nusc, 1, cfg)
    elif name == 'carla':
        from stp3_tpu.datas.carla_data import CarlaDataset
        if need_train:
            traindata = CarlaDataset(cfg.DATASET.DATAROOT, True, cfg)
        valdata = CarlaDataset(cfg.DATASET.DATAROOT, False, cfg)
    else:
        raise NotImplementedError(name)

    # multi-process runs: cfg.BATCHSIZE is PER PROCESS (the reference's
    # per-GPU DDP batch); each process loads its own contiguous slice of
    # every global batch (NumpyLoader rank/world split) and shard_batch
    # assembles the global array
    import jax
    kw = dict(num_workers=int(cfg.N_WORKERS),
              use_processes=cfg.get('WORKER_KIND', 'thread') == 'process',
              rank=jax.process_index(), world=jax.process_count())
    trainloader = (NumpyLoader(traindata, cfg.BATCHSIZE, shuffle=True,
                               drop_last=True, **kw)
                   if traindata is not None else None)
    # with_valid_mask: a ragged multi-process val tail is padded with
    # wrap-around duplicates (NumpyLoader._batches); the mask lets
    # Trainer.val_step exclude them from the metric accumulators, so the
    # multi-process metrics equal the single-process run EXACTLY (the
    # torch DistributedSampler double-counts them)
    valloader = NumpyLoader(valdata, cfg.BATCHSIZE, shuffle=False,
                            drop_last=False, with_valid_mask=True, **kw)
    if return_dataset:
        return trainloader, valloader, traindata, valdata
    return trainloader, valloader
