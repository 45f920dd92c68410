"""Minimal in-memory nuscenes-devkit stand-in for end-to-end backend tests.

Implements exactly the API surface stp3_tpu/datas/nuscenes_data.py touches
(NuScenes tables + get(), NuScenesCanBus pose/steer messages, NuScenesMap
get_map_mask, create_splits_scenes, NuScenesExplorer.map_pointcloud_to_image)
over a tiny generated scene written to a temp dir. Installed by injecting
modules into sys.modules (see install()).

This is a test fixture, not a devkit reimplementation: geometry is simple
(straight drive along +x, two cameras), annotations are two boxes (one
vehicle, one pedestrian) that persist across frames.
"""
from __future__ import annotations

import os
import sys
import types
from typing import Dict, List

import numpy as np


def _quat_about_z(yaw: float) -> List[float]:
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


class FakeNuScenes:
    """Table database for one straight-line scene."""

    def __init__(self, version: str, dataroot: str, verbose: bool = False,
                 n_samples: int = 8, cam_names=('CAM_FRONT', 'CAM_BACK'),
                 img_hw=(128, 224)):
        self.version = version
        self.dataroot = dataroot
        self._tables: Dict[str, Dict[str, dict]] = {
            t: {} for t in ['scene', 'log', 'sample', 'sample_data',
                            'ego_pose', 'calibrated_sensor',
                            'sample_annotation', 'instance']}
        self.scene: List[dict] = []
        self.sample: List[dict] = []
        self._build(n_samples, cam_names, img_hw)

    # -- devkit API
    def get(self, table: str, token: str) -> dict:
        return self._tables[table][token]

    # -- construction
    def _add(self, table: str, token: str, rec: dict) -> dict:
        rec = dict(rec, token=token)
        self._tables[table][token] = rec
        return rec

    def _build(self, n_samples, cam_names, img_hw):
        from PIL import Image
        h, w = img_hw
        os.makedirs(os.path.join(self.dataroot, 'imgs'), exist_ok=True)

        self._add('log', 'log-1', {'location': 'boston-seaport'})
        scene = self._add('scene', 'scene-1',
                          {'name': 'scene-0001', 'log_token': 'log-1'})
        self.scene.append(scene)

        # camera calibrations: forward + backward cameras at the ego origin
        fx = 0.5 * w
        intr = [[fx, 0.0, w / 2.0], [0.0, fx, h / 2.0], [0.0, 0.0, 1.0]]
        # camera frame: z forward, x right, y down -> ego (x fwd, y left, z up)
        cam_rot_fwd = [0.5, -0.5, 0.5, -0.5]       # quaternion (w, x, y, z)
        for i, cam in enumerate(cam_names):
            yaw = 0.0 if i == 0 else np.pi
            qz = _quat_about_z(yaw)
            # compose yaw-about-z with the camera mounting rotation
            wq, xq, yq, zq = qz
            w2, x2, y2, z2 = cam_rot_fwd
            q = [wq * w2 - xq * x2 - yq * y2 - zq * z2,
                 wq * x2 + xq * w2 + yq * z2 - zq * y2,
                 wq * y2 - xq * z2 + yq * w2 + zq * x2,
                 wq * z2 + xq * y2 - yq * x2 + zq * w2]
            self._add('calibrated_sensor', f'cs-{cam}', {
                'translation': [1.5 if i == 0 else -1.5, 0.0, 1.6],
                'rotation': q, 'camera_intrinsic': intr})
        # real nuScenes mounts LIDAR_TOP rotated ~-90 deg about z (lidar
        # x=right, y=forward); the reference's GT-trajectory frame and its
        # command thresholds (x>=2 -> RIGHT) depend on this mount.
        self._add('calibrated_sensor', 'cs-LIDAR', {
            'translation': [0.9, 0.0, 1.8],
            'rotation': _quat_about_z(-np.pi / 2),
            'camera_intrinsic': None})

        rng = np.random.RandomState(0)
        prev = None
        for t in range(n_samples):
            ts = 1_000_000_000 + t * 500_000          # 2 Hz, microseconds
            x_ego = 2.0 * t                           # 4 m/s along +x
            ep = self._add('ego_pose', f'ep-{t}', {
                'translation': [x_ego, 0.0, 0.0],
                'rotation': _quat_about_z(0.0),
                'timestamp': ts})
            data = {}
            img_file = f'imgs/frame_{t}.jpg'
            Image.fromarray(
                rng.randint(0, 255, (128, 224, 3), np.uint8)).save(
                os.path.join(self.dataroot, img_file))
            for cam in cam_names:
                sd = self._add('sample_data', f'sd-{cam}-{t}', {
                    'ego_pose_token': ep['token'],
                    'calibrated_sensor_token': f'cs-{cam}',
                    'filename': img_file,
                    'sample_token': f'sample-{t}'})
                data[cam] = sd['token']
            sd = self._add('sample_data', f'sd-LIDAR-{t}', {
                'ego_pose_token': ep['token'],
                'calibrated_sensor_token': 'cs-LIDAR',
                'filename': '', 'sample_token': f'sample-{t}'})
            data['LIDAR_TOP'] = sd['token']

            anns = []
            # a vehicle 5 m ahead moving with the ego, and a pedestrian —
            # both inside the test BEV grid (±8 m in the backend tests)
            for j, (cat, inst, size, dx) in enumerate([
                    ('vehicle.car', 'inst-car', [2.0, 4.5, 1.6], 5.0),
                    ('human.pedestrian.adult', 'inst-ped', [0.7, 0.7, 1.8], 6.0)]):
                ann = self._add('sample_annotation', f'ann-{j}-{t}', {
                    'translation': [x_ego + dx, 2.0 * j, 0.8],
                    'size': size, 'rotation': _quat_about_z(0.0),
                    'category_name': cat, 'instance_token': inst,
                    'visibility_token': '4'})
                anns.append(ann['token'])

            sample = self._add('sample', f'sample-{t}', {
                'scene_token': 'scene-1', 'timestamp': ts,
                'data': data, 'anns': anns, 'prev': prev})
            self.sample.append(sample)
            prev = sample['token']


class FakeCanBus:
    can_blacklist: List[int] = []

    def __init__(self, dataroot: str):
        self.dataroot = dataroot

    def get_messages(self, scene_name: str, channel: str):
        times = [1_000_000_000 + t * 500_000 for t in range(16)]
        if channel == 'pose':
            return [{'utime': ts, 'vel': [4.0, 0.0, 0.0]} for ts in times]
        if channel == 'steeranglefeedback':
            return [{'utime': ts, 'value': 0.05} for ts in times]
        raise KeyError(channel)


class FakeMap:
    def __init__(self, dataroot: str, map_name: str):
        self.map_name = map_name

    def get_map_mask(self, box_coords, rot_deg, elements, canvas_size):
        h, w = canvas_size
        masks = np.zeros((len(elements), h, w), np.uint8)
        masks[:, h // 4: 3 * h // 4] = 1              # a straight "road" band
        return masks


class FakeExplorer:
    def __init__(self, nusc):
        self.nusc = nusc

    def map_pointcloud_to_image(self, lidar_token, cam_token):
        pts = np.stack([np.arange(10, 50, dtype=np.float64),
                        np.full(40, 20.0)])            # (2, P) pixel coords
        depth = np.linspace(5.0, 30.0, 40)
        return np.vstack([pts, np.ones((1, 40))]), depth, None


def create_splits_scenes():
    return {'mini_train': ['scene-0001'], 'mini_val': ['scene-0001'],
            'train': ['scene-0001'], 'val': ['scene-0001']}


def install(monkeypatch=None):
    """Inject fake 'nuscenes' modules into sys.modules. Returns a dict of the
    injected modules (for cleanup without monkeypatch)."""
    root = types.ModuleType('nuscenes')
    m_nusc = types.ModuleType('nuscenes.nuscenes')
    m_nusc.NuScenes = FakeNuScenes
    m_nusc.NuScenesExplorer = FakeExplorer
    m_can_pkg = types.ModuleType('nuscenes.can_bus')
    m_can = types.ModuleType('nuscenes.can_bus.can_bus_api')
    m_can.NuScenesCanBus = FakeCanBus
    m_map_pkg = types.ModuleType('nuscenes.map_expansion')
    m_map = types.ModuleType('nuscenes.map_expansion.map_api')
    m_map.NuScenesMap = FakeMap
    m_utils_pkg = types.ModuleType('nuscenes.utils')
    m_splits = types.ModuleType('nuscenes.utils.splits')
    m_splits.create_splits_scenes = create_splits_scenes
    mods = {'nuscenes': root, 'nuscenes.nuscenes': m_nusc,
            'nuscenes.can_bus': m_can_pkg,
            'nuscenes.can_bus.can_bus_api': m_can,
            'nuscenes.map_expansion': m_map_pkg,
            'nuscenes.map_expansion.map_api': m_map,
            'nuscenes.utils': m_utils_pkg, 'nuscenes.utils.splits': m_splits}
    root.nuscenes = m_nusc
    for name, mod in mods.items():
        if monkeypatch is not None:
            monkeypatch.setitem(sys.modules, name, mod)
        else:
            sys.modules[name] = mod
    return mods
