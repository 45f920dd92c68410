"""End-to-end exercise of the nuScenes backend against a fake devkit
(tests/fake_nuscenes.py): dataset construction, the canonical batch
contract (SURVEY.md §3.5), label rasterisation, GT trajectory/command,
depth-from-lidar, and a model forward on a real item."""
import numpy as np
import pytest

import fake_nuscenes
from helpers import make_test_cfg


@pytest.fixture
def nusc_cfg(tmp_path, monkeypatch):
    fake_nuscenes.install(monkeypatch)
    cfg = make_test_cfg()
    cfg.DATASET.NAME = 'nuscenes'
    cfg.DATASET.VERSION = 'mini'
    cfg.DATASET.DATAROOT = str(tmp_path)
    cfg.DATASET.MAP_FOLDER = str(tmp_path)
    cfg.IMAGE.NAMES = ['CAM_FRONT', 'CAM_BACK']
    cfg.IMAGE.ORIGINAL_HEIGHT = 128
    cfg.IMAGE.ORIGINAL_WIDTH = 224
    cfg.IMAGE.RESIZE_SCALE = 0.5
    cfg.IMAGE.TOP_CROP = 0
    return cfg


def _make_dataset(cfg, is_train=0):
    from stp3_tpu.datas.nuscenes_data import FuturePredictionDataset, make_nusc
    nusc = make_nusc(cfg)
    return FuturePredictionDataset(nusc, is_train, cfg)


def test_batch_contract(nusc_cfg):
    cfg = nusc_cfg
    ds = _make_dataset(cfg)
    assert len(ds) > 0
    item = ds[0]

    rf = cfg.TIME_RECEPTIVE_FIELD
    seq = rf + cfg.N_FUTURE_FRAMES
    n = len(cfg.IMAGE.NAMES)
    h, w = cfg.IMAGE.FINAL_DIM
    bh = bw = 16      # (-8, 8) @ 1 m

    assert item['image'].shape == (rf, n, h, w, 3)
    assert item['intrinsics'].shape == (rf, n, 3, 3)
    assert item['extrinsics'].shape == (rf, n, 4, 4)
    assert item['segmentation'].shape == (seq, bh, bw)
    assert item['instance'].shape == (seq, bh, bw)
    assert item['pedestrian'].shape == (seq, bh, bw)
    assert item['hdmap'].shape[-1] == len(cfg.SEMANTIC_SEG.HDMAP.ELEMENTS)
    assert item['future_egomotion'].shape == (seq, 6)
    assert item['gt_trajectory'].shape == (cfg.N_FUTURE_FRAMES + 1, 3)
    # (N, n_future+1, 3) incl. t=0; trainer slices [:, :, 1:]
    assert item['sample_trajectory'].shape == (
        cfg.PLANNING.SAMPLE_NUM, cfg.N_FUTURE_FRAMES + 1, 3)
    assert item['centerness'].shape == (seq, bh, bw, 1)
    assert item['offset'].shape == (seq, bh, bw, 2)
    assert item['flow'].shape == (seq, bh, bw, 2)
    assert item['target_point'].shape == (2,)

    # the scene drives straight at 4 m/s (2 m per 0.5 s sample):
    # egomotion (ego frame, x fwd) ~ -2 m per step; the GT trajectory lives
    # in the LIDAR sensor frame (mounted -90 deg: x=right, y=forward) like
    # the reference (get_global_pose composes calibrated_sensor), so it
    # advances ~2 m per frame in +y with x~0 -> command FORWARD
    np.testing.assert_allclose(item['future_egomotion'][:-1, 0], -2.0, atol=1e-3)
    np.testing.assert_allclose(item['gt_trajectory'][1, 1], 2.0, atol=1e-3)
    np.testing.assert_allclose(item['gt_trajectory'][1, 0], 0.0, atol=1e-3)
    assert int(item['command']) == 1

    # the vehicle and pedestrian boxes rasterise into the labels
    assert item['segmentation'].sum() > 0
    assert item['pedestrian'].sum() > 0
    # instance ids persist across frames (same id for the one car)
    ids = set(np.unique(item['instance'])) - {0}
    assert len(ids) >= 1


def test_extrinsics_are_metric(nusc_cfg):
    ds = _make_dataset(nusc_cfg)
    item = ds[0]
    e = item['extrinsics'][0, 0]       # CAM_FRONT -> flat-egopose frame
    # the frame origin is the EGO pose at the lidar sample's timestamp
    # (reference NuscenesData.py:197-206 — yaw-flattened ego pose, not the
    # lidar mount), so CAM_FRONT sits at its calibrated x=1.5 m; rotation is
    # orthonormal
    r = e[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(e[0, 3], 1.5, atol=1e-5)


def test_depth_from_lidar(nusc_cfg):
    cfg = nusc_cfg
    cfg.LIFT.GT_DEPTH = True
    ds = _make_dataset(cfg)
    item = ds[0]
    rf, n = cfg.TIME_RECEPTIVE_FIELD, len(cfg.IMAGE.NAMES)
    h, w = cfg.IMAGE.FINAL_DIM
    assert item['depths'].shape == (rf, n, h, w)
    assert np.isfinite(item['depths']).all()


def test_dataloader_factory_and_model_forward(nusc_cfg):
    import jax
    import jax.numpy as jnp

    from stp3_tpu.datas.dataloaders import prepare_dataloaders
    from stp3_tpu.models.stp3 import STP3, STP3Config

    cfg = nusc_cfg
    loader, _ = prepare_dataloaders(cfg, split='train')
    batch = next(iter(loader))
    assert batch['image'].shape[0] == cfg.BATCHSIZE

    mc = STP3Config.from_cfg(cfg)
    model = STP3(mc)
    image = jnp.asarray(batch['image'])
    k = jnp.asarray(batch['intrinsics'])
    e = jnp.asarray(batch['extrinsics'])
    ego = jnp.asarray(batch['future_egomotion'])
    variables = model.init(jax.random.PRNGKey(0), image, k, e, ego)
    out = model.apply(variables, image, k, e, ego, train=False)
    assert np.isfinite(np.asarray(out['segmentation'])).all()
    assert out['segmentation'].shape[1] == cfg.TIME_RECEPTIVE_FIELD + cfg.N_FUTURE_FRAMES
