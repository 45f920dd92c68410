"""Config schema contracts vs the reference stp3/config.py.

The repo's default tree mirrors the reference key-for-key PLUS a set of
TPU-side keys; the reference's checkpoint rehydration
(fvcore/yacs ``merge_from_other_cfg``, reference config.py:173-189)
raises on any unknown key, so config dicts handed back to the reference
(export CLI hyper_parameters) must carry EXACTLY the reference schema.
These tests keep ``TPU_ONLY_KEYS`` in machine-checked sync with the
actual reference source.
"""
import re

from stp3_tpu.config import TPU_ONLY_KEYS, get_cfg, strip_tpu_only_keys

REFERENCE_CONFIG = '/root/reference/stp3/config.py'


def _leaf_keys(d, prefix=''):
    out = set()
    for k, v in d.items():
        p = f'{prefix}{k}'
        if isinstance(v, dict):
            out |= _leaf_keys(v, p + '.')
        else:
            out.add(p)
    return out


def _reference_leaf_keys():
    """Parse the reference defaults tree textually (fvcore is not
    installed here): every `_C.X.Y = ...` assignment; paths that prefix
    other paths are group nodes, the rest are leaves."""
    keys = set()
    for line in open(REFERENCE_CONFIG):
        m = re.match(r"\s*_C\.([A-Za-z0-9_.]+)\s*=", line)
        if m:
            keys.add(m.group(1))
    groups = {k for k in keys if any(o.startswith(k + '.') for o in keys)}
    return keys - groups


def test_tpu_only_keys_in_sync_with_reference_schema():
    ours = _leaf_keys(get_cfg().convert_to_dict())
    ref = _reference_leaf_keys()
    assert ours - ref == set(TPU_ONLY_KEYS), (
        'TPU_ONLY_KEYS out of sync: update stp3_tpu/config.py '
        f'(extra here: {sorted((ours - ref) - set(TPU_ONLY_KEYS))}, '
        f'stale in list: {sorted(set(TPU_ONLY_KEYS) - (ours - ref))})')
    # every reference leaf exists here (the YAML-compat contract) — the
    # one exception is the reference's empty dead group MODEL.DECODER
    missing = {k for k in ref - ours if not k.startswith('MODEL.DECODER')}
    assert not missing, f'reference keys missing from our schema: {missing}'


def test_strip_tpu_only_keys():
    cfg_dict = get_cfg().convert_to_dict()
    stripped = _leaf_keys(strip_tpu_only_keys(cfg_dict))
    assert stripped == _leaf_keys(cfg_dict) - set(TPU_ONLY_KEYS)
    # emptied parent groups are pruned (the reference has no CHECKPOINT/
    # PROFILE/DEBUG/PARALLEL groups at all)
    out = strip_tpu_only_keys(cfg_dict)
    for group in ('CHECKPOINT', 'PROFILE', 'DEBUG', 'PARALLEL'):
        assert group not in out, group
    # and the original dict is untouched
    assert 'CHECKPOINT' in cfg_dict
