"""Checkpoint round-trip, curriculum warm start, and resume."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stp3_tpu.training import checkpoint as C


def _tree(seed=0):
    rng = np.random.RandomState(seed)
    return {
        'encoder': {'conv': {'kernel': jnp.asarray(rng.randn(3, 3, 2, 4), jnp.float32)}},
        'decoder': {'segmentation_head': {'kernel': jnp.asarray(rng.randn(1, 1, 4, 2), jnp.float32)}},
        'segmentation_weight': jnp.asarray(rng.randn(), jnp.float32),
    }


def test_save_load_roundtrip(tmp_path):
    params = _tree()
    path = C.save_checkpoint(str(tmp_path), 7, params,
                             cfg_dict={'TAG': 'x', 'OPTIMIZER': {'LR': 1e-3}})
    restored = C.load_checkpoint(path)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 params, restored['params'])
    cfg_dict = C.load_config_dict(path)
    assert cfg_dict['OPTIMIZER']['LR'] == 1e-3
    assert C.latest_checkpoint(str(tmp_path)) == path


def test_warm_start_filters_decoder_and_mismatches():
    """Reference train.py:21-29: load everything except decoder keys,
    skip shape mismatches (strict=False)."""
    restored = _tree(seed=1)
    init = _tree(seed=2)
    # introduce a shape mismatch in the encoder
    init['encoder']['conv']['kernel'] = jnp.zeros((5, 5, 2, 4))
    merged, n_loaded = C.filter_warm_start_params(restored, init)
    # decoder stays at init values
    np.testing.assert_array_equal(
        np.asarray(merged['decoder']['segmentation_head']['kernel']),
        np.asarray(init['decoder']['segmentation_head']['kernel']))
    # mismatched encoder kernel stays at init
    assert merged['encoder']['conv']['kernel'].shape == (5, 5, 2, 4)
    # the scalar uncertainty weight was loaded
    np.testing.assert_array_equal(np.asarray(merged['segmentation_weight']),
                                  np.asarray(restored['segmentation_weight']))
    assert n_loaded == 1


def test_warm_start_loads_everything_when_compatible():
    restored = _tree(seed=3)
    init = _tree(seed=4)
    merged, n_loaded = C.filter_warm_start_params(restored, init,
                                                  exclude_substr='__none__')
    assert n_loaded == 3
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 merged, restored)
