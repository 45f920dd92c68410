"""Offline CARLA HD-map raster generator (reference maps/hdmap_generate.py).

For every route folder in a CARLA data dump, reads the per-town global map
rasters (road + 4 lane-marking layers + world offset from ``<Town>.h5``),
warps a 512x512 ego-centric crop for each measurement frame, and writes
``hdmap/<frame>.png`` with drivable area in dark grey (54, 52, 46 RGB) and
lane markings in magenta — the colours ``CarlaDataset.get_hdmap`` decodes
(stp3_tpu/datas/carla_data.py).

Usage:
    python maps/hdmap_generate.py --dataroot <dump_root> --maps <h5_dir>
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

PIXELS_PER_METER = 5
WIDTH = 512
PIXELS_EV_TO_BOTTOM = 256

# BGR for cv2.imwrite; decoded as RGB (255,0,255) / (54,52,46) by the loader
COLOR_LANE_BGR = (255, 0, 255)
COLOR_DRIVABLE_BGR = (46, 52, 54)

TOWN_TO_MAP = {
    'town01': 'Town01.h5', 'town02': 'Town02.h5', 'town03': 'Town03.h5',
    'town04': 'Town04.h5', 'town05': 'Town05.h5', 'town06': 'Town06.h5',
    'town07': 'Town07.h5', 'town10': 'Town10HD.h5',
}


def world_to_pixel(location, world_offset):
    return np.array([
        PIXELS_PER_METER * (location[0] - world_offset[0]),
        PIXELS_PER_METER * (location[1] - world_offset[1]),
    ], np.float32)


def warp_transform(ev_loc, ev_rot_deg, world_offset):
    """Affine map from the global raster to the 512x512 ego crop."""
    import cv2
    loc_px = world_to_pixel(ev_loc, world_offset)
    yaw = np.deg2rad(ev_rot_deg)
    forward = np.array([np.cos(yaw), np.sin(yaw)])
    right = np.array([np.cos(yaw + 0.5 * np.pi), np.sin(yaw + 0.5 * np.pi)])
    bottom_left = loc_px - PIXELS_EV_TO_BOTTOM * forward - 0.5 * WIDTH * right
    top_left = loc_px + (WIDTH - PIXELS_EV_TO_BOTTOM) * forward - 0.5 * WIDTH * right
    top_right = loc_px + (WIDTH - PIXELS_EV_TO_BOTTOM) * forward + 0.5 * WIDTH * right
    src = np.stack([bottom_left, top_left, top_right]).astype(np.float32)
    dst = np.array([[0, WIDTH - 1], [0, 0], [WIDTH - 1, 0]], np.float32)
    return cv2.getAffineTransform(src, dst)


def load_town_layers(h5_path):
    import h5py
    with h5py.File(h5_path, 'r', libver='latest', swmr=True) as hf:
        layers = {
            'road': np.array(hf['road'], np.uint8),
            'lanes': [np.array(hf[k], np.uint8) for k in (
                'lane_marking_yellow_broken', 'lane_marking_yellow_solid',
                'lane_marking_white_broken', 'lane_marking_white_solid')],
            'world_offset': np.array(hf.attrs['world_offset_in_meters'], np.float32),
        }
    return layers


def generate_route(route_folder, layers, measurements_dir='measurements'):
    import cv2
    out_dir = os.path.join(route_folder, 'hdmap')
    os.makedirs(out_dir, exist_ok=True)
    meas_dir = os.path.join(route_folder, measurements_dir)
    if not os.path.isdir(meas_dir):
        meas_dir = os.path.join(route_folder, 'meta')
    for fname in sorted(os.listdir(meas_dir)):
        if not fname.endswith('.json'):
            continue
        with open(os.path.join(meas_dir, fname)) as f:
            m = json.load(f)
        theta = 0.0 if np.isnan(m['theta']) else m['theta']
        ev_loc = [m['y'], -m['x']]
        ev_rot = np.rad2deg(theta) - 90
        mw = warp_transform(ev_loc, ev_rot, layers['world_offset'])
        road = cv2.warpAffine(layers['road'], mw, (WIDTH, WIDTH)).astype(bool)
        lane = np.zeros((WIDTH, WIDTH), bool)
        for layer in layers['lanes']:
            lane |= cv2.warpAffine(layer, mw, (WIDTH, WIDTH)).astype(bool)
        image = np.zeros((WIDTH, WIDTH, 3), np.uint8)
        image[road] = COLOR_DRIVABLE_BGR
        image[lane] = COLOR_LANE_BGR
        cv2.imwrite(os.path.join(out_dir, fname.replace('json', 'png')), image)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--dataroot', required=True)
    parser.add_argument('--maps', required=True, help='directory with <Town>.h5')
    args = parser.parse_args()

    for town in sorted(os.listdir(args.dataroot)):
        key = town[:6].lower()
        if key not in TOWN_TO_MAP:
            continue
        layers = load_town_layers(os.path.join(args.maps, TOWN_TO_MAP[key]))
        town_folder = os.path.join(args.dataroot, town)
        for route in sorted(os.listdir(town_folder)):
            route_folder = os.path.join(town_folder, route)
            if os.path.isdir(route_folder):
                generate_route(route_folder, layers)
                print(f'{town}/{route}: hdmap written')


if __name__ == '__main__':
    main()
