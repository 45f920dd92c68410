#!/usr/bin/env python
"""Import a reference ST-P3 (PyTorch-Lightning) checkpoint into an stp3_tpu
Orbax checkpoint.

Usage:
  python scripts/import_torch_checkpoint.py \
      --checkpoint /path/to/reference.ckpt \
      --output ./imported_ckpt \
      [--config-file stp3_tpu/configs/nuscenes/Planning.yml] [KEY VALUE ...]

The model MUST be built with MODEL.NORM=bn_frozen so the reference's
BatchNorm running statistics are carried as params; this script forces that
override. The resulting checkpoint can be used as PRETRAINED.PATH (curriculum
warm start, decoder filtered) or restored whole for evaluation
(evaluate.py --checkpoint).

If the .ckpt holds Lightning hyper_parameters, the cfg is rehydrated from
them first (reference trainer.py:19-22), then the CLI overrides apply.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--checkpoint', required=True,
                        help='reference Lightning .ckpt (or raw torch state_dict)')
    parser.add_argument('--output', required=True, help='output checkpoint dir')
    parser.add_argument('--config-file', default='', metavar='FILE')
    parser.add_argument('opts', nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')   # conversion is host-side

    import torch

    from stp3_tpu.config import get_cfg
    from stp3_tpu.models.stp3 import STP3Config
    from stp3_tpu.training import checkpoint as ckpt_lib
    from stp3_tpu.utils import torch_import as ti

    blob = torch.load(args.checkpoint, map_location='cpu')
    hparams = {}
    if isinstance(blob, dict) and 'hyper_parameters' in blob:
        hparams = dict(blob['hyper_parameters'])
    sd = ti.load_reference_checkpoint(args.checkpoint)

    cfg = get_cfg(args, cfg_dict=hparams or None)
    cfg.MODEL.NORM = 'bn_frozen'
    if ti.apply_cam_front_parity(cfg):
        print('NOTE: rig front camera is not at index 1 (CARLA order) — '
              'PLANNING.CAM_FRONT_PARITY=True was auto-set (and saved in '
              'the checkpoint config) so the imported planner consumes the '
              'same camera feature the reference fed it (reference '
              'stp3.py:203 hardcodes index 1; see PARITY.md)')
    mcfg = STP3Config.from_cfg(cfg)   # also sets the process default norm

    params, report = ti.import_state_dict(sd, mcfg, strict=False)
    print(f'converted {report.converted} tensors; '
          f'ignored {len(report.ignored)} bookkeeping keys')
    if report.missing:
        print(f'WARNING: {len(report.missing)} expected torch keys missing, '
              f'e.g. {report.missing[:5]}')
    if report.unexpected:
        print(f'WARNING: {len(report.unexpected)} unmapped model keys, '
              f'e.g. {report.unexpected[:5]}')

    # structure check against a fresh init (catches silent config mismatch)
    tree = ti.init_param_tree(mcfg)
    import jax.tree_util as jtu
    expect = {jtu.keystr(p) for p, _ in jtu.tree_flatten_with_path(tree)[0]}
    got = {jtu.keystr(p) for p, _ in jtu.tree_flatten_with_path(params)[0]}
    if expect != got:
        print(f'WARNING: param tree mismatch: {len(expect - got)} missing, '
              f'{len(got - expect)} extra leaves')

    path = ckpt_lib.save_checkpoint(args.output, step=0, params=params,
                                    cfg_dict=cfg.convert_to_dict())
    print(f'saved imported checkpoint to {path}')


if __name__ == '__main__':
    main()
