#!/usr/bin/env python
"""Import a bare efficientnet-pytorch ImageNet .pth into an stp3_tpu
checkpoint usable as PRETRAINED.PATH.

Usage:
  python scripts/import_backbone.py \
      --weights /path/to/efficientnet-b4-*.pth \
      --output ./imagenet_init \
      [--config-file stp3_tpu/configs/nuscenes/Perception.yml] [KEY VALUE ...]

The reference's encoder starts from EfficientNet.from_pretrained(cfg.NAME)
(/root/reference/stp3/models/encoder.py:18) — every published metric
assumes an ImageNet backbone init. This environment has no network egress,
so the .pth cannot be fetched here; when it exists, this script maps its
_conv_stem/_bn0/_blocks.N.* tensors onto the Encoder trunk (bn_frozen
Norms carrying the ImageNet running stats), leaves every other module at
its fresh init, and writes an Orbax checkpoint. Point PRETRAINED.PATH at
it (filter_warm_start_params merges everything whose shapes match) to run
the reference training curriculum from the proper init.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--weights', required=True,
                        help='bare efficientnet-pytorch state_dict (.pth)')
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

    cfg = get_cfg(args)
    cfg.MODEL.NORM = 'bn_frozen'   # carry the ImageNet running stats
    mcfg = STP3Config.from_cfg(cfg)

    blob = torch.load(args.weights, map_location='cpu')
    sd = blob.get('state_dict', blob) if isinstance(blob, dict) else blob
    subtree, report = ti.import_backbone_state_dict(
        sd, mcfg.encoder_name, strict=False)
    print(f'converted {report.converted} tensors; ignored '
          f'{len(report.ignored)} classifier/truncated keys')
    if report.missing:
        print(f'WARNING: {len(report.missing)} expected keys missing, '
              f'e.g. {report.missing[:5]}')
    if report.unexpected:
        print(f'WARNING: {len(report.unexpected)} unknown keys, '
              f'e.g. {report.unexpected[:5]}')

    params = ti.init_param_tree(mcfg)
    params = ti.merge_backbone(params, subtree)

    path = ckpt_lib.save_checkpoint(args.output, step=0, params=params,
                                    cfg_dict=cfg.convert_to_dict())
    print(f'saved ImageNet-initialized checkpoint to {path}')


if __name__ == '__main__':
    main()
