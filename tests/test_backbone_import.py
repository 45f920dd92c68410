"""Backbone-only ImageNet importer: efficientnet-pytorch state_dict ->
flax EfficientNetFeatures trunk (bn_frozen), forward parity vs a torch
oracle.

No efficientnet_pytorch in this environment, so the oracle below is a
faithful torch re-implementation of its module/state-dict layout
(lukemelas/EfficientNet-PyTorch v0.7.0, the reference's pinned dep,
environment.yml:10) for the pieces the ST-P3 encoder uses:

  * ``_conv_stem`` / ``_bn0`` (eps=1e-3) + swish
  * ``_blocks.N`` MBConv: [_expand_conv/_bn0] -> _depthwise_conv/_bn1 ->
    SE (_se_reduce/_se_expand) -> _project_conv/_bn2, id-skip when
    stride 1 and in==out (drop-connect is identity in eval)
  * TF-style SAME padding (Conv2dDynamicSamePadding semantics)
  * classifier head keys (_conv_head/_bn1/_fc) exist in the state_dict
    and must be ignored by the importer, as must blocks beyond the
    ST-P3 truncation (reference stp3/models/encoder.py:39-55)

The parity target: the two reduction endpoints the Encoder consumes
(reduction_3 stride-8 and reduction_4 stride-16; encoder.py:66-86).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from stp3_tpu.models.efficientnet import (EfficientNetFeatures, _SCALING,
                                          _TRUNCATE_IDX, block_plan,
                                          round_filters)
from stp3_tpu.utils.torch_import import (import_backbone_state_dict,
                                         merge_backbone)


@pytest.fixture()
def bn_frozen_norm():
    from stp3_tpu.layers.convolutions import default_norm, set_default_norm
    prev = default_norm()
    set_default_norm('bn_frozen')
    yield
    set_default_norm(prev)


def _same_pad(x, k, s):
    ih, iw = x.shape[-2:]
    pad_h = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pad_w = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, [pad_w // 2, pad_w - pad_w // 2,
                     pad_h // 2, pad_h - pad_h // 2])


class _SameConv(tnn.Conv2d):
    def forward(self, x):
        x = _same_pad(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


def _swish(x):
    return x * torch.sigmoid(x)


class _MBConvOracle(tnn.Module):
    def __init__(self, k, s, e, ci, co, se_ratio):
        super().__init__()
        self.stride, self.expand = s, e
        self.ci, self.co = ci, co
        mid = ci * e
        if e != 1:
            self._expand_conv = _SameConv(ci, mid, 1, bias=False)
            self._bn0 = tnn.BatchNorm2d(mid, eps=1e-3)
        self._depthwise_conv = _SameConv(mid, mid, k, stride=s, groups=mid,
                                         bias=False)
        self._bn1 = tnn.BatchNorm2d(mid, eps=1e-3)
        sq = max(1, int(ci * se_ratio))
        self._se_reduce = _SameConv(mid, sq, 1)
        self._se_expand = _SameConv(sq, mid, 1)
        self._project_conv = _SameConv(mid, co, 1, bias=False)
        self._bn2 = tnn.BatchNorm2d(co, eps=1e-3)

    def forward(self, x):
        inp = x
        if self.expand != 1:
            x = _swish(self._bn0(self._expand_conv(x)))
        x = _swish(self._bn1(self._depthwise_conv(x)))
        s = F.adaptive_avg_pool2d(x, 1)
        s = self._se_expand(_swish(self._se_reduce(s)))
        x = torch.sigmoid(s) * x
        x = self._bn2(self._project_conv(x))
        if self.stride == 1 and self.ci == self.co:
            x = x + inp
        return x


class _EfficientNetOracle(tnn.Module):
    """Full (untruncated) net with efficientnet_pytorch key names."""

    def __init__(self, arch):
        super().__init__()
        width, _, _ = _SCALING[arch]
        stem = round_filters(32, width)
        self._conv_stem = _SameConv(3, stem, 3, stride=2, bias=False)
        self._bn0 = tnn.BatchNorm2d(stem, eps=1e-3)
        self._blocks = tnn.ModuleList(
            [_MBConvOracle(k, s, e, ci, co, se)
             for (k, s, e, ci, co, se) in block_plan(arch, truncate=False)])
        head_in = block_plan(arch, truncate=False)[-1][4]
        head = round_filters(1280, width)
        self._conv_head = _SameConv(head_in, head, 1, bias=False)
        self._bn1 = tnn.BatchNorm2d(head, eps=1e-3)
        self._fc = tnn.Linear(head, 10)

    def endpoints(self, x, truncate_idx):
        """Reference encoder endpoint extraction (encoder.py:57-86):
        record prev_x whenever the spatial size halves, over the
        TRUNCATED block list."""
        eps = {}
        x = _swish(self._bn0(self._conv_stem(x)))
        prev = x
        for idx, block in enumerate(self._blocks[:truncate_idx + 1]):
            x = block(x)
            if prev.shape[-2] > x.shape[-2]:
                eps[f'reduction_{len(eps) + 1}'] = prev
            prev = x
        eps[f'reduction_{len(eps) + 1}'] = x
        return eps


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
