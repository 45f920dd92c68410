"""Checkpoint save/restore (Orbax) + curriculum warm-start helper.

Replaces Lightning's .ckpt flow (reference train.py:21-42,
evaluate.py:31): checkpoints hold {params, opt_state, step} plus the cfg
dict for rehydration (the reference stores hparams in the ckpt and
rebuilds the cfg from them, trainer.py:19-22).

The 3-stage curriculum (perception -> prediction -> planning,
reference README.md:40-53) warm-starts from the previous stage with all
decoder-head params dropped (train.py:27: ``'decoder' not in k``,
strict=False); ``filter_warm_start_params`` reproduces that.

FORMAT NOTE (round-1 -> round-2 break): the upsampling Bottleneck's
ConvTranspose switched to ``transpose_kernel=True`` with torch-style
padding for torch bit-compatibility (layers/convolutions.py:160). The
kernel SHAPE is unchanged (in==out channels), so a checkpoint saved
before that change restores without error but computes with transposed
kernels — numerically wrong. Checkpoints from before commit "Fix review
findings" (round 1 end) must be re-trained or re-imported from their
torch source; there are no such external checkpoints in circulation
(round-1 artifacts were synthetic-data smoke runs only).

Since round 5 the hazard is machine-detectable: every save stamps a
``meta.json`` sidecar with ``format_version`` (and the
transpose-convention flag); ``load_checkpoint`` hard-errors on a
checkpoint with no stamp (pre-round-5 vintage — possibly pre-transpose)
unless ``allow_unversioned=True`` / ``STP3_ALLOW_UNVERSIONED_CKPT=1``
asserts it is a known-good one. The same sidecar carries the training
monitor state (``best_iou``) so the best-checkpoint pointer is
resume-safe (Lightning persists its ModelCheckpoint monitor inside the
ckpt, reference train.py:36-42).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

# format 2 = transpose_kernel=True upsampling Bottleneck (round-2+ layout).
# Bump on any change that restores cleanly but computes differently.
FORMAT_VERSION = 2


def save_checkpoint(ckpt_dir: str, step: int, params, opt_state=None,
                    cfg_dict: Optional[Dict[str, Any]] = None,
                    batch_stats=None,
                    metrics: Optional[Dict[str, Any]] = None) -> str:
    """``metrics``: json-able training-monitor state persisted in the
    meta sidecar (e.g. ``{'best_iou': ...}``) and restored by
    ``load_meta`` on resume."""
    path = os.path.abspath(os.path.join(ckpt_dir, f'step_{step}'))
    ckptr = ocp.StandardCheckpointer()
    payload = {'params': params, 'step': np.int64(step)}
    if opt_state is not None:
        payload['opt_state'] = opt_state
    if batch_stats is not None:
        # MODEL.NORM='bn' running statistics (their own collection, not
        # params — they are neither trained nor weight-decayed)
        payload['batch_stats'] = batch_stats
    # multi-process runs call this from EVERY process (orbax saves are
    # cooperative: a solo rank-0 save deadlocks on orbax's internal
    # barriers, tests/test_multiprocess.py); orbax writes once. The
    # sidecar files below are primary-host-only.
    ckptr.save(os.path.join(path, 'state'), payload, force=True)
    ckptr.wait_until_finished()
    import jax
    if jax.process_index() == 0:
        meta = {'format_version': FORMAT_VERSION,
                'transpose_kernel': True, 'step': int(step)}
        if metrics:
            meta.update(_jsonable(metrics))
        with open(os.path.join(path, 'meta.json'), 'w') as f:
            json.dump(meta, f, indent=2)
        if cfg_dict is not None:
            with open(os.path.join(path, 'config.json'), 'w') as f:
                json.dump(_jsonable(cfg_dict), f, indent=2)
        # "last" pointer (reference ModelCheckpoint save_last, train.py:36-42)
        with open(os.path.join(ckpt_dir, 'last'), 'w') as f:
            f.write(path)
    return path


def load_meta(path: str) -> Dict[str, Any]:
    """The meta.json sidecar of a (resolved) checkpoint; {} when absent
    (pre-round-5 vintage)."""
    meta_path = os.path.join(resolve_checkpoint_path(path), 'meta.json')
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    last = os.path.join(ckpt_dir, 'last')
    if os.path.exists(last):
        with open(last) as f:
            return f.read().strip()
    return None


def resolve_checkpoint_path(path: str) -> str:
    """Accept either a concrete step dir (containing 'state') or a
    checkpoint ROOT dir — resolved via its 'last' pointer, falling back to
    the highest step_N. Lets ``evaluate.py --checkpoint <dir>`` take the
    directory the import/training CLI printed. A pointer FILE (the 'last'
    or 'best' marker train.py writes) is followed, so
    ``evaluate.py --checkpoint <dir>/best`` selects the best-val-IoU epoch
    (reference ModelCheckpoint monitor, train.py:36-42)."""
    path = os.path.abspath(path)
    if os.path.isfile(path):
        with open(path) as f:
            path = f.read().strip()
    if os.path.exists(os.path.join(path, 'state')):
        return path
    last = latest_checkpoint(path)
    if last and os.path.exists(os.path.join(last, 'state')):
        return last
    steps = sorted((d for d in os.listdir(path) if d.startswith('step_'))
                   if os.path.isdir(path) else [],
                   key=lambda d: int(d.split('_')[1]))
    if steps:
        return os.path.join(path, steps[-1])
    return path


def _validate_version(resolved: str, allow_unversioned: bool) -> None:
    """A checkpoint with no ``meta.json`` format stamp is rejected: it
    predates round 5, which means it MAY predate the ConvTranspose
    ``transpose_kernel=True`` switch — such checkpoints restore without
    error but compute with transposed upsample kernels (module
    docstring). ``allow_unversioned=True`` (or
    ``STP3_ALLOW_UNVERSIONED_CKPT=1``) asserts it is known-good."""
    meta = load_meta(resolved)
    if not meta:
        allow = allow_unversioned or (
            os.environ.get('STP3_ALLOW_UNVERSIONED_CKPT') == '1')
        if not allow:
            raise ValueError(
                f'checkpoint {resolved} has no meta.json format stamp: it '
                f'predates the round-5 format versioning and may predate '
                f'the upsampling-Bottleneck transpose_kernel switch (it '
                f'would restore cleanly but compute WRONG — see '
                f'stp3_tpu/training/checkpoint.py). If it is known '
                f'post-transpose, pass allow_unversioned=True or set '
                f'STP3_ALLOW_UNVERSIONED_CKPT=1.')
    elif int(meta.get('format_version', 0)) > FORMAT_VERSION:
        raise ValueError(
            f'checkpoint {resolved} has format_version '
            f'{meta.get("format_version")} > supported {FORMAT_VERSION}')


def load_checkpoint(path: str, target=None, *,
                    allow_unversioned: bool = False) -> Dict[str, Any]:
    """Restore {params[, opt_state]}; ``target`` is a matching pytree of
    abstract/concrete arrays (None -> restore as saved: plain nested
    dicts — fine for params, but an opt_state restored this way has LOST
    its optax namedtuple containers; use :func:`restore_train_state` to
    resume training)."""
    resolved = resolve_checkpoint_path(path)
    _validate_version(resolved, allow_unversioned)
    ckptr = ocp.StandardCheckpointer()
    state_path = os.path.join(resolved, 'state')
    if target is not None:
        return ckptr.restore(state_path, target=target)
    return ckptr.restore(state_path)


def restore_train_state(path: str, state, *, allow_unversioned: bool = False):
    """Resume restore: rebuild a FULL training state with the live
    ``state`` as the orbax target tree.

    Restoring without a target decays typed containers to plain dicts —
    the optax opt_state (chained/masked namedtuples) comes back as
    nested dicts and the first post-resume ``apply_gradients`` dies with
    ``'dict' object has no attribute 'inner_state'`` (latent since
    round 1; caught by the round-5 on-chip soak's mid-run resume).
    Passing the live state's own trees as the target makes orbax
    reconstruct every container type, and places leaves on the target's
    shardings (replicated on the mesh).

    Fields the checkpoint does not carry (e.g. opt_state in a
    params-only torch import) keep their live values."""
    resolved = resolve_checkpoint_path(path)
    _validate_version(resolved, allow_unversioned)
    ckptr = ocp.StandardCheckpointer()
    state_path = os.path.join(resolved, 'state')

    def build_target(keys):
        # 0-d ndarray, not np.int64 scalar: orbax targets take ndarrays
        target = {'params': state.params, 'step': np.zeros((), np.int64)}
        if 'opt_state' in keys:
            target['opt_state'] = state.opt_state
        if 'batch_stats' in keys and state.batch_stats is not None:
            target['batch_stats'] = state.batch_stats
        return target

    try:
        saved_keys = set(
            ckptr.metadata(state_path).item_metadata.tree.keys())
        candidates = [saved_keys]
    except Exception:
        # orbax metadata layout moved: probe richest-to-poorest targets
        # (a target must match the SAVED tree exactly, so a full save
        # needs the full target while a params-only torch import needs
        # the minimal one — try both rather than assuming either)
        candidates = [{'params', 'step', 'opt_state', 'batch_stats'},
                      {'params', 'step', 'opt_state'},
                      {'params', 'step'}]
    last_err = None
    for keys in candidates:
        try:
            restored = ckptr.restore(state_path, target=build_target(keys))
            break
        except Exception as exc:           # structure mismatch: next probe
            last_err = exc
    else:
        raise last_err
    return state.replace(
        params=restored['params'],
        opt_state=restored.get('opt_state', state.opt_state),
        step=int(restored['step']),
        batch_stats=restored.get('batch_stats', state.batch_stats))


def load_config_dict(path: str) -> Optional[Dict[str, Any]]:
    import json
    cfg_path = os.path.join(resolve_checkpoint_path(path), 'config.json')
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            return json.load(f)
    return None


def split_frozen_bn(params):
    """'bn_frozen' param tree -> ('bn' param tree, batch_stats collection).

    A bn_frozen Norm carries {mean, var, scale, bias} as params at one
    path; the trainable 'bn' kind keeps {scale, bias} as params and
    {mean, var} in the mutable batch_stats collection at the SAME path.
    This is the fine-tune-an-imported-reference-checkpoint-with-live-BN
    path (reference trains BN with sync_batchnorm, train.py:45): import
    with MODEL.NORM=bn_frozen (utils/torch_import.py), split, then train
    with MODEL.NORM=bn.

    Only dicts holding BOTH 'mean' and 'var' array leaves are split —
    that combination exists exclusively at bn_frozen Norm sites."""
    def walk(node):
        if not isinstance(node, dict):
            return node, None
        is_bn = ('mean' in node and 'var' in node
                 and not isinstance(node['mean'], dict)
                 and not isinstance(node['var'], dict))
        if is_bn:
            p = {k: v for k, v in node.items() if k not in ('mean', 'var')}
            s = {'mean': node['mean'], 'var': node['var']}
            return p, s
        p_out, s_out = {}, {}
        for k, v in node.items():
            p, s = walk(v)
            p_out[k] = p
            if s is not None:
                s_out[k] = s
        return p_out, (s_out or None)

    return walk(params)


def merge_bn_to_frozen(params, batch_stats):
    """Inverse of split_frozen_bn: fold a 'bn' run's running statistics
    back into a bn_frozen-style param tree (e.g. to export a trained model
    back to the reference format via utils.torch_import.export_state_dict)."""
    def walk(p, s):
        out = dict(p)
        is_stats_leaf = ('mean' in s and 'var' in s
                         and not isinstance(s['mean'], dict))
        if is_stats_leaf:
            out.update(s)
            return out
        for k, v in s.items():
            out[k] = walk(p[k], v)
        return out

    return walk(params, batch_stats)


def filter_warm_start_params(restored_params, init_params, exclude_substr: str = 'decoder'):
    """Merge ``restored_params`` into ``init_params``, skipping any subtree
    whose path contains ``exclude_substr`` and any leaf missing/mismatched
    (the reference's strict=False + decoder filter, train.py:21-29)."""
    flat_init = _flatten(init_params)
    flat_restored = _flatten(restored_params)
    merged = {}
    n_loaded = 0
    for key, val in flat_init.items():
        src = flat_restored.get(key)
        if (src is not None and exclude_substr not in key.lower()
                and np.shape(src) == np.shape(val)):
            merged[key] = src
            n_loaded += 1
        else:
            merged[key] = val
    return _unflatten(merged), n_loaded


def _flatten(tree, prefix=''):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f'{prefix}{k}/'))
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten(flat):
    out: Dict[str, Any] = {}
    for key, val in flat.items():
        node = out
        parts = key.split('/')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out
