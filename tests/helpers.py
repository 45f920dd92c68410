"""Shared test fixtures: a tiny config that exercises every subsystem fast.

Small BEV grid (16x16 @ 2 m), tiny images (32x64 -> 4x8 features), b0
encoder, 2 cameras — the full model graph compiles in seconds on CPU.
"""
import numpy as np

from stp3_tpu.config import get_cfg


def make_test_cfg(**overrides):
    cfg = get_cfg()
    cfg.PRECISION = 32   # exactness tests run fp32; bf16 covered separately
    cfg.BATCHSIZE = 2
    cfg.IMAGE.FINAL_DIM = (32, 64)
    cfg.IMAGE.NAMES = ['CAM_LEFT', 'CAM_RIGHT']
    cfg.LIFT.X_BOUND = [-8.0, 8.0, 1.0]
    cfg.LIFT.Y_BOUND = [-8.0, 8.0, 1.0]
    cfg.LIFT.D_BOUND = [2.0, 10.0, 1.0]      # 8 depth bins
    cfg.MODEL.ENCODER.NAME = 'efficientnet-b0'
    cfg.MODEL.ENCODER.OUT_CHANNELS = 16
    cfg.MODEL.TEMPORAL_MODEL.START_OUT_CHANNELS = 16
    cfg.TIME_RECEPTIVE_FIELD = 2
    cfg.N_FUTURE_FRAMES = 2
    cfg.MODEL.DISTRIBUTION.LATENT_DIM = 4
    cfg.PLANNING.SAMPLE_NUM = 12
    # front-cam feature: (4, 8, 16) -> reduce 3x downsample -> (1, 1, 2): GRU state 2
    cfg.PLANNING.GRU_STATE_SIZE = 2
    cfg.N_WORKERS = 0
    cfg.DATASET.NAME = 'synthetic'
    for key, value in overrides.items():
        node = cfg
        parts = key.split('.')
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value
    return cfg
