#!/usr/bin/env python
"""Checkpoint-import dress rehearsal: ONE command proving the full chain

    reference torch .ckpt  ->  scripts/import_torch_checkpoint.py
                           ->  Orbax checkpoint
                           ->  evaluate.py (nuScenes backend)

runs end-to-end — the exact sequence needed the moment real nuScenes data
and a real reference Planning.ckpt appear (reference evaluate.py:28-44).

Without real data this uses (a) a synthesized reference-FORMAT Lightning
checkpoint (correct keys/shapes, random values, via
utils.torch_import.synthesize_state_dict) and (b) the fake in-memory
devkit (tests/fake_nuscenes.py). With real assets:

    python scripts/import_torch_checkpoint.py \
        --checkpoint Planning.ckpt --output ./imported
    python evaluate.py --checkpoint ./imported --dataroot /data/nuscenes

Usage (self-contained rehearsal):
    python scripts/dress_rehearsal.py [--workdir DIR] [--keep-visualisations]
"""
import argparse
import os
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, 'tests'))


def tiny_cfg_opts(dataroot: str):
    """CLI override list for the tiny fake-devkit nuScenes config
    (mirrors tests/helpers.make_test_cfg + tests/test_nuscenes_data.py)."""
    return [
        'DATASET.NAME', 'nuscenes', 'DATASET.VERSION', 'mini',
        'DATASET.DATAROOT', dataroot, 'DATASET.MAP_FOLDER', dataroot,
        'IMAGE.NAMES', "['CAM_FRONT','CAM_BACK']",
        'IMAGE.ORIGINAL_HEIGHT', '128', 'IMAGE.ORIGINAL_WIDTH', '224',
        'IMAGE.RESIZE_SCALE', '0.5', 'IMAGE.TOP_CROP', '0',
        'IMAGE.FINAL_DIM', '(32, 64)',
        'LIFT.X_BOUND', '[-8.0, 8.0, 1.0]', 'LIFT.Y_BOUND', '[-8.0, 8.0, 1.0]',
        'LIFT.D_BOUND', '[2.0, 10.0, 1.0]',
        'MODEL.ENCODER.NAME', 'efficientnet-b0',
        'MODEL.ENCODER.OUT_CHANNELS', '16',
        'MODEL.TEMPORAL_MODEL.START_OUT_CHANNELS', '16',
        'TIME_RECEPTIVE_FIELD', '2', 'N_FUTURE_FRAMES', '2',
        'MODEL.DISTRIBUTION.LATENT_DIM', '4',
        'PLANNING.SAMPLE_NUM', '12', 'PLANNING.GRU_STATE_SIZE', '2',
        'N_WORKERS', '0', 'PRECISION', '32',
    ]


def main(workdir: str = '', keep_visualisations: bool = False) -> dict:
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import numpy as np
    import torch

    workdir = workdir or tempfile.mkdtemp(prefix='dress_rehearsal_')
    os.makedirs(workdir, exist_ok=True)
    dataroot = os.path.join(workdir, 'data')
    os.makedirs(dataroot, exist_ok=True)

    # ---- 0. fake devkit + tiny cfg
    import fake_nuscenes
    fake_nuscenes.install()

    from stp3_tpu.config import get_cfg
    from stp3_tpu.layers.convolutions import set_default_norm
    from stp3_tpu.models.stp3 import STP3Config
    from stp3_tpu.utils import torch_import as ti

    class _A:
        config_file = ''
        opts = tiny_cfg_opts(dataroot)
    cfg = get_cfg(_A())
    cfg.MODEL.NORM = 'bn_frozen'
    mcfg = STP3Config.from_cfg(cfg)

    # ---- 1. synthesize a reference-FORMAT Lightning checkpoint
    set_default_norm('bn_frozen')
    sd = ti.synthesize_state_dict(mcfg, seed=0)
    torch_ckpt = os.path.join(workdir, 'reference_format.ckpt')
    torch.save({'state_dict': {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                'hyper_parameters': cfg.convert_to_dict()}, torch_ckpt)
    print(f'[1/3] synthesized reference-format ckpt: {torch_ckpt} '
          f'({len(sd)} tensors)')

    # ---- 2. import via the CLI script (the real command)
    imported = os.path.join(workdir, 'imported')
    import importlib
    imp_mod = importlib.import_module('import_torch_checkpoint')
    argv = sys.argv
    sys.argv = ['import_torch_checkpoint.py', '--checkpoint', torch_ckpt,
                '--output', imported] + tiny_cfg_opts(dataroot)
    try:
        imp_mod.main()
    finally:
        sys.argv = argv
    print(f'[2/3] imported into Orbax checkpoint: {imported}')

    # ---- 3. evaluate.py on the (fake-devkit) nuScenes backend
    import evaluate as eval_mod
    results = eval_mod.evaluate(imported, dataroot=dataroot,
                                save_visualisations=keep_visualisations)
    assert results, 'evaluate produced no metrics'
    bad = {k: v for k, v in results.items() if not np.isfinite(float(v))}
    assert not bad, f'non-finite metrics: {bad}'
    assert any(k.startswith('plan_') for k in results), 'planning metrics missing'
    print(f'[3/3] evaluate.py produced {len(results)} finite metrics — '
          'dress rehearsal OK')
    return results


if __name__ == '__main__':
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--workdir', default='', help='scratch dir (tmp default)')
    p.add_argument('--keep-visualisations', action='store_true')
    a = p.parse_args()
    main(a.workdir, a.keep_visualisations)
