"""CARLA data backend tests against a generated fake data dump."""
import json
import os

import numpy as np
import pytest

from helpers import make_test_cfg
from stp3_tpu.datas import carla_data as C

PIL = pytest.importorskip('PIL')
from PIL import Image  # noqa: E402


def test_depth_decode_known_value():
    # encoded = d/1000 * (256^3 - 1); pick a pixel at 123.0 m
    d = 123.0
    code = int(round(d / 1000.0 * (256 ** 3 - 1)))
    r, g, b = code // 65536, (code // 256) % 256, code % 256
    img = np.zeros((2, 2, 3), np.uint8)
    img[...] = [r, g, b]
    out = C.decode_depth(img)
    np.testing.assert_allclose(out, d, atol=1e-2)


def test_transform_2d_points_identity():
    xyz = np.array([[1.0, 2.0, 0.5]])
    out = C.transform_2d_points(xyz, 0.3, 1.0, -2.0, 0.3, 1.0, -2.0)
    np.testing.assert_allclose(out, xyz, atol=1e-9)


def test_cam_rig_contract():
    extr, intr = C.carla_cam_rig((256, 256))
    assert extr.shape == (4, 4, 4)
    assert intr.shape == (4, 3, 3)
    # front camera at +x, rear camera rotated 180
    np.testing.assert_allclose(extr[0, :3, 3], [1.3, 0.0, 2.3])
    np.testing.assert_allclose(extr[3, :3, :3] @ np.array([1.0, 0, 0]),
                               [-1.0, 0, 0], atol=1e-6)
    # intrinsics: principal point centred after 256-crop from 400x300
    np.testing.assert_allclose(intr[0, 0, 2], 400 / 2 - (400 - 256) / 2)
    np.testing.assert_allclose(intr[0, 1, 2], 300 / 2 - (300 - 256) / 2)


def _write_fake_route(root, n_frames=8):
    rd = os.path.join(root, 'Town05_short', 'route_00')
    for sub in ['rgb_front', 'rgb_left', 'rgb_right', 'rgb_rear',
                'depth_front', 'depth_left', 'depth_right', 'depth_rear',
                'topdown', 'hdmap', 'measurements']:
        os.makedirs(os.path.join(rd, sub), exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(1, n_frames + 1):
        name = f'{i:04d}'
        rgb = rng.randint(0, 255, (300, 400, 3), np.uint8)
        for cam in ['front', 'left', 'right', 'rear']:
            Image.fromarray(rgb).save(os.path.join(rd, f'rgb_{cam}', name + '.png'))
            Image.fromarray(np.zeros((300, 400, 3), np.uint8)).save(
                os.path.join(rd, f'depth_{cam}', name + '.png'))
        # topdown semantic: a vehicle blob (class 10) + pedestrian (4)
        td = np.zeros((256, 256), np.uint8)
        td[40:60, 100:120] = 10
        td[150:160, 60:70] = 4
        Image.fromarray(td).save(os.path.join(rd, 'topdown', name + '.png'))
        hd = np.zeros((220, 220, 3), np.uint8)
        hd[:, 100:120] = [54, 52, 46]     # drivable
        hd[:, 109:111] = [255, 0, 255]    # lane
        Image.fromarray(hd).save(os.path.join(rd, 'hdmap', name + '.png'))
        meas = {'x': float(i), 'y': 0.0, 'theta': 0.0, 'x_command': 50.0,
                'y_command': 0.0, 'steer': 0.1, 'throttle': 0.5,
                'brake': False, 'command': 3, 'speed': 4.0}
        with open(os.path.join(rd, 'measurements', name + '.json'), 'w') as f:
            json.dump(meas, f)
    return rd


def test_carla_dataset_end_to_end(tmp_path):
    cfg = make_test_cfg()
    cfg.IMAGE.FINAL_DIM = (256, 256)
    cfg.TIME_RECEPTIVE_FIELD = 2
    cfg.N_FUTURE_FRAMES = 2
    cfg.PLANNING.SAMPLE_NUM = 12
    root = str(tmp_path)
    _write_fake_route(root)
    ds = C.CarlaDataset(root, is_train=False, cfg=cfg)
    assert len(ds) == 8 - 4
    item = ds[0]
    s_total = 4
    assert item['image'].shape == (2, 4, 256, 256, 3)
    assert item['intrinsics'].shape == (2, 4, 3, 3)
    assert item['extrinsics'].shape == (2, 4, 4, 4)
    assert item['segmentation'].shape == (s_total, 200, 200)
    assert item['hdmap'].shape == (s_total, 200, 200, 2)
    assert item['future_egomotion'].shape == (s_total, 6)
    assert item['gt_trajectory'].shape == (3, 3)   # present + n_future
    assert item['sample_trajectory'].shape == (12, 3, 3)
    assert item['command'] == 1                     # CARLA 3 -> FORWARD code 1
    # vehicle blob must appear in the labels
    assert item['segmentation'].sum() > 0
    assert item['pedestrian'].sum() > 0
    assert item['hdmap'][..., 1].sum() > 0
    # moving +1 m/frame in x: egomotion vector x = -1 (vec(inv(e1) @ e0);
    # the old origin sits behind the new frame)
    np.testing.assert_allclose(item['future_egomotion'][0, 0], -1.0, atol=1e-5)
    # preload cache was written and reloads identically
    ds2 = C.CarlaDataset(root, is_train=False, cfg=cfg)
    assert len(ds2) == len(ds)


def test_hdmap_decode_roundtrip(tmp_path):
    # write an hdmap PNG, decode, check lane within drivable
    hd = np.zeros((220, 220, 3), np.uint8)
    hd[:, 100:120] = [54, 52, 46]
    hd[:, 109:111] = [255, 0, 255]
    p = str(tmp_path / 'x.png')
    Image.fromarray(hd).save(p)
    cfg = make_test_cfg()
    ds = C.CarlaDataset.__new__(C.CarlaDataset)  # no preload
    out = C.CarlaDataset.get_hdmap(ds, p, 1.0, 200)
    assert out.shape == (200, 200, 2)
    lane, drivable = out[..., 0], out[..., 1]
    assert lane.sum() > 0
    assert (drivable[lane > 0] == 1).all()  # lane is drivable
