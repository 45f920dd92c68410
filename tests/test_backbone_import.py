"""Backbone-only ImageNet importer: efficientnet-pytorch state_dict ->
flax EfficientNetFeatures trunk (bn_frozen), forward parity vs a torch
oracle.

No efficientnet_pytorch in this environment, so the oracle is the
faithful torch re-implementation of its module/state-dict layout in
tests/reference_oracle.py (installed as the ``efficientnet_pytorch``
shim — the same class the reference Encoder builds from in the
whole-model parity test). Classifier head keys (_conv_head/_bn1/_fc)
exist in the state_dict and must be ignored by the importer, as must
blocks beyond the ST-P3 truncation (reference stp3/models/encoder.py:39-55).

The parity target: the two reduction endpoints the Encoder consumes
(reduction_3 stride-8 and reduction_4 stride-16; encoder.py:66-86).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from stp3_tpu.models.efficientnet import EfficientNetFeatures, _TRUNCATE_IDX
from stp3_tpu.utils.torch_import import (import_backbone_state_dict,
                                         merge_backbone)

import reference_oracle as ro

ro.install()

from efficientnet_pytorch import EfficientNet as _EfficientNetOracle  # noqa: E402


@pytest.fixture()
def bn_frozen_norm():
    from stp3_tpu.layers.convolutions import default_norm, set_default_norm
    prev = default_norm()
    set_default_norm('bn_frozen')
    yield
    set_default_norm(prev)


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for m in module.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape,
                                               generator=g) + 0.5)


@pytest.mark.parametrize('arch', ['efficientnet-b0',
                                  pytest.param('efficientnet-b4',
                                               marks=pytest.mark.slow)])
def test_backbone_import_forward_parity(bn_frozen_norm, arch):
    oracle = _EfficientNetOracle(arch)
    _randomize(oracle)
    oracle.eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

    subtree, report = import_backbone_state_dict(sd, arch)
    assert report.ok(), (report.missing[:5], report.unexpected[:5])
    # classifier + truncated-block keys were ignored, none silently dropped
    assert any(k.startswith('_conv_head') for k in report.ignored)
    assert any(k.startswith(f'_blocks.{_TRUNCATE_IDX[arch] + 1}.')
               for k in report.ignored)

    x = np.random.RandomState(0).rand(2, 64, 96, 3).astype(np.float32)
    feats = EfficientNetFeatures(arch=arch)
    got = feats.apply({'params': subtree['EfficientNetFeatures_0']},
                      jnp.asarray(x))
    with torch.no_grad():
        want = oracle.endpoints(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                _TRUNCATE_IDX[arch])
    assert set(got) == set(want)
    for name in ('reduction_3', 'reduction_4'):
        np.testing.assert_allclose(
            np.asarray(got[name]),
            want[name].numpy().transpose(0, 2, 3, 1),
            atol=1e-4, rtol=1e-4)


def test_backbone_import_strict_rejects_garbage(bn_frozen_norm):
    with pytest.raises(ValueError, match='unexpected'):
        import_backbone_state_dict(
            {'_conv_stem.weight': np.zeros((32, 3, 3, 3), np.float32),
             'not_a_real_key': np.zeros(3, np.float32)}, 'efficientnet-b0')


def test_merge_backbone_shape_guard(bn_frozen_norm):
    oracle = _EfficientNetOracle('efficientnet-b0')
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    subtree, _ = import_backbone_state_dict(sd, 'efficientnet-b0')

    # matching init: merge succeeds and replaces the trunk
    feats = EfficientNetFeatures(arch='efficientnet-b0')
    x = jnp.zeros((1, 32, 48, 3))
    init = feats.init(jax.random.PRNGKey(0), x)['params']
    full = {'encoder': {'EfficientNetFeatures_0': init, 'other': {}}}
    merged = merge_backbone(full, subtree)
    leaf = merged['encoder']['EfficientNetFeatures_0']['Conv_0']['kernel']
    np.testing.assert_array_equal(
        np.asarray(leaf),
        sd['_conv_stem.weight'].transpose(2, 3, 1, 0))

    # b4-shaped subtree against a b0 init: loud failure
    oracle4 = _EfficientNetOracle('efficientnet-b4')
    sd4 = {k: v.numpy() for k, v in oracle4.state_dict().items()}
    subtree4, _ = import_backbone_state_dict(sd4, 'efficientnet-b4')
    with pytest.raises(ValueError, match='backbone subtree'):
        merge_backbone(full, subtree4)
