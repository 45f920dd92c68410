#!/usr/bin/env python
"""Export an stp3_tpu Orbax checkpoint back to the reference ST-P3
(PyTorch-Lightning) checkpoint format.

    python scripts/export_torch_checkpoint.py \
        --checkpoint ./runs/.../checkpoints          # dir, 'best' file, or step dir
        --output ./exported.ckpt \
        [KEY VALUE ...]

The inverse of scripts/import_torch_checkpoint.py: a model trained (or
fine-tuned) here can be handed back to the reference ecosystem —
``torch.load(...)['state_dict']`` has the reference TrainingModule's key
layout (``model.*``, reference trainer.py:40), plus
``hyper_parameters`` carrying the config dict so the reference can
rehydrate its cfg (reference trainer.py:19-22).

Norm requirements: the reference format stores BatchNorm running stats
at every norm site, so the checkpoint must have been built with
``MODEL.NORM=bn_frozen`` (imported weights / frozen fine-tune) or
``MODEL.NORM=bn`` (trainable sync-BN — the running statistics live in
the checkpoint's batch_stats collection and are folded back via
``checkpoint.merge_bn_to_frozen``). A gn/ln-trained model has no BN
statistics and cannot be expressed in the reference format — exporting
one raises.

Constant buffers: the exported state_dict includes the grid constants
the reference registers as non-trainable nn.Parameters
(``model.frustum``, ``model.bev_*`` — reference stp3.py:23-25,130,
rebuilt from the SAME formulas via ops.geometry) and zeroed
``num_batches_tracked`` bookkeeping. The reference Cost_Function's
constant buffers (``model.planning.cost_function.*``, cost.py:57-58)
are NOT emitted — its constructor rebuilds them from the cfg; load with
``strict=False`` (the reference's own curriculum loads do the same,
reference train.py:21-29).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--checkpoint', required=True,
                        help='Orbax checkpoint (root dir, pointer file, or step dir)')
    parser.add_argument('--output', required=True,
                        help='output .ckpt path (torch.save format)')
    parser.add_argument('opts', nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')   # conversion is host-side

    import numpy as np
    import torch

    from stp3_tpu.config import get_cfg
    from stp3_tpu.models.stp3 import STP3Config
    from stp3_tpu.ops.geometry import (calculate_birds_eye_view_parameters,
                                       create_frustum)
    from stp3_tpu.training import checkpoint as ckpt_lib
    from stp3_tpu.utils import torch_import as ti

    cfg_dict = ckpt_lib.load_config_dict(args.checkpoint)
    cfg = get_cfg(cfg_dict=cfg_dict)
    if args.opts:
        cfg.merge_from_list(args.opts)
    restored = ckpt_lib.load_checkpoint(args.checkpoint)
    params = restored['params']

    norm = cfg.MODEL.get('NORM', 'gn')
    if norm == 'bn':
        batch_stats = restored.get('batch_stats')
        if batch_stats is None:
            raise SystemExit('MODEL.NORM=bn checkpoint has no batch_stats '
                             'collection — cannot recover running statistics')
        params = ckpt_lib.merge_bn_to_frozen(params, batch_stats)
        cfg.MODEL.NORM = 'bn_frozen'
    elif norm != 'bn_frozen':
        raise SystemExit(
            f'MODEL.NORM={norm!r}: the reference format stores BatchNorm '
            f'running statistics at every norm site; only bn / bn_frozen '
            f'checkpoints are expressible. Train or fine-tune with '
            f'MODEL.NORM=bn to export.')

    mcfg = STP3Config.from_cfg(cfg)
    sd = ti.export_state_dict(params, mcfg)

    # constant grid buffers the reference registers as parameters
    res, start, dim = calculate_birds_eye_view_parameters(
        list(mcfg.x_bound), list(mcfg.y_bound), list(mcfg.z_bound))
    sd['model.bev_resolution'] = np.asarray(res, np.float32)
    sd['model.bev_start_position'] = np.asarray(start, np.float32)
    sd['model.bev_dimension'] = np.asarray(dim, np.int64)
    sd['model.frustum'] = np.asarray(
        create_frustum(mcfg.final_dim, mcfg.encoder_downsample,
                       mcfg.d_bound), np.float32)
    # BN bookkeeping the reference's strict load expects next to stats
    for key in [k for k in sd if k.endswith('.running_mean')]:
        sd[key[:-len('running_mean')] + 'num_batches_tracked'] = np.int64(0)

    # hyper_parameters must be the REFERENCE schema: its rehydration
    # (fvcore/yacs merge_from_other_cfg, reference config.py:173-189)
    # raises on unknown keys, so strip the TPU-side additions
    from stp3_tpu.config import strip_tpu_only_keys
    blob = {
        'state_dict': {k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
        'hyper_parameters': strip_tpu_only_keys(cfg.convert_to_dict()),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    torch.save(blob, args.output)
    print(f'exported {len(sd)} tensors to {args.output} '
          f'(reference-side load: strict=False — the Cost_Function '
          f'constant buffers are rebuilt by its constructor)')


if __name__ == '__main__':
    main()
