"""Import /root/reference torch modules as numerical oracles.

The environment lacks several of the reference's dependencies (timm,
skimage, torchvision, pyquaternion, nuscenes, tqdm is present). This
module installs minimal functional stand-ins for exactly the names the
reference modules touch, then puts /root/reference on sys.path so
``import stp3.layers.temporal`` etc. work.

Only the shimmed *functionality actually exercised by the parity tests*
is implemented faithfully:
  * ``timm.models.layers.DropPath`` — identity (the reference always
    builds ConvNeXt blocks with drop_path=0, convolutions.py:331).
  * ``skimage.draw.polygon`` — the repo's own numpy rasterizer.
  * ``torchvision.models.resnet.resnet18`` — a minimal BasicBlock
    ResNet-18 with torchvision's exact submodule names (the reference
    decoder only uses bn1/relu/layer1-3, decoder.py:22-30).
  * ``efficientnet_pytorch.EfficientNet`` — a faithful torch
    re-implementation of lukemelas/EfficientNet-PyTorch v0.7.0's module
    layout and eval-mode forward for the pieces the ST-P3 encoder uses
    (reference stp3/models/encoder.py:3,18-81): TF-SAME-padded convs,
    MBConv with SE, ``_swish``/``_global_params``/``_blocks`` attributes,
    the classifier-side attrs ``delete_unused_layers`` deletes.
    ``from_pretrained`` returns RANDOM weights (no egress — parity tests
    randomize and convert the state_dict anyway).
  * ``pyquaternion.Quaternion`` / ``nuscenes...transform_matrix`` —
    import-time name stubs (not used by the modules under test).
"""
from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_ROOT = '/root/reference'


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def install() -> None:
    if REFERENCE_ROOT in sys.path and 'timm' in sys.modules:
        return
    import torch
    import torch.nn as tnn

    # ---- timm (DropPath only)
    if 'timm' not in sys.modules:
        timm = _module('timm')
        timm_models = _module('timm.models')
        timm_layers = _module('timm.models.layers')

        class DropPath(tnn.Module):
            # drop_prob > 0 is accepted but only in eval mode (identity),
            # matching timm. The reference even instantiates one with
            # drop_prob=in_channels: BiGRU passes Block(in, in) where
            # Block's 2nd positional arg is drop_path (temporal.py:184-185)
            # — dead code in the reference, identity at eval either way.
            def __init__(self, drop_prob: float = 0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                assert self.drop_prob == 0.0 or not self.training, \
                    'shim supports drop_prob>0 in eval mode only'
                return x

        timm_layers.DropPath = DropPath
        timm_models.layers = timm_layers
        timm.models = timm_models

    # ---- skimage.draw.polygon -> repo rasterizer
    if 'skimage' not in sys.modules:
        from stp3_tpu.utils.rasterize import polygon
        skimage = _module('skimage')
        draw = _module('skimage.draw')
        draw.polygon = polygon
        skimage.draw = draw

    # ---- pyquaternion / nuscenes (import-time names only)
    if 'pyquaternion' not in sys.modules:
        pyq = _module('pyquaternion')

        class Quaternion:  # pragma: no cover - never called by parity tests
            def __init__(self, *a, **k):
                raise NotImplementedError('pyquaternion shim is name-only')

        pyq.Quaternion = Quaternion
    if 'nuscenes' not in sys.modules:
        nus = _module('nuscenes')
        nus_utils = _module('nuscenes.utils')
        nus_geo = _module('nuscenes.utils.geometry_utils')

        def transform_matrix(*a, **k):  # pragma: no cover
            raise NotImplementedError('nuscenes shim is name-only')

        nus_geo.transform_matrix = transform_matrix
        nus_data = _module('nuscenes.utils.data_classes')

        class LidarPointCloud:  # pragma: no cover
            def __init__(self, *a, **k):
                raise NotImplementedError('nuscenes shim is name-only')

        nus_data.LidarPointCloud = LidarPointCloud
        nus_utils.geometry_utils = nus_geo
        nus_utils.data_classes = nus_data
        nus.utils = nus_utils
        nus_mapexp = _module('nuscenes.map_expansion')
        nus_mapapi = _module('nuscenes.map_expansion.map_api')

        class NuScenesMap:  # pragma: no cover
            def __init__(self, *a, **k):
                raise NotImplementedError('nuscenes shim is name-only')

        nus_mapapi.NuScenesMap = NuScenesMap
        nus_mapexp.map_api = nus_mapapi
        nus.map_expansion = nus_mapexp

    # ---- torchvision: transforms names + a real (minimal) resnet18
    if 'torchvision' not in sys.modules:
        tv = _module('torchvision')
        tv_transforms = _module('torchvision.transforms')
        tv_models = _module('torchvision.models')
        tv_resnet = _module('torchvision.models.resnet')

        class Normalize:
            def __init__(self, mean=None, std=None):
                self.mean, self.std = mean, std

            def __call__(self, x):
                raise NotImplementedError('torchvision shim transform')

        class Compose:
            def __init__(self, ts):
                self.ts = ts

            def __call__(self, x):
                raise NotImplementedError('torchvision shim transform')

        class ToPILImage:
            def __call__(self, x):
                raise NotImplementedError('torchvision shim transform')

        class ToTensor:
            def __call__(self, x):
                raise NotImplementedError('torchvision shim transform')

        tv_transforms.Normalize = Normalize
        tv_transforms.Compose = Compose
        tv_transforms.ToPILImage = ToPILImage
        tv_transforms.ToTensor = ToTensor

        class _BasicBlock(tnn.Module):
            def __init__(self, cin, cout, stride=1):
                super().__init__()
                self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
                self.bn1 = tnn.BatchNorm2d(cout)
                self.relu = tnn.ReLU(inplace=True)
                self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
                self.bn2 = tnn.BatchNorm2d(cout)
                self.downsample = None
                if stride != 1 or cin != cout:
                    self.downsample = tnn.Sequential(
                        tnn.Conv2d(cin, cout, 1, stride, bias=False),
                        tnn.BatchNorm2d(cout))

            def forward(self, x):
                identity = x if self.downsample is None else self.downsample(x)
                out = self.relu(self.bn1(self.conv1(x)))
                out = self.bn2(self.conv2(out))
                return self.relu(out + identity)

        class _ResNet18(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
                self.bn1 = tnn.BatchNorm2d(64)
                self.relu = tnn.ReLU(inplace=True)
                self.maxpool = tnn.MaxPool2d(3, 2, 1)
                self.layer1 = tnn.Sequential(_BasicBlock(64, 64), _BasicBlock(64, 64))
                self.layer2 = tnn.Sequential(_BasicBlock(64, 128, 2), _BasicBlock(128, 128))
                self.layer3 = tnn.Sequential(_BasicBlock(128, 256, 2), _BasicBlock(256, 256))
                self.layer4 = tnn.Sequential(_BasicBlock(256, 512, 2), _BasicBlock(512, 512))

        def resnet18(pretrained=False, zero_init_residual=False, **kw):
            assert not pretrained, 'shim has no pretrained weights'
            return _ResNet18()

        tv_resnet.resnet18 = resnet18
        tv_models.resnet = tv_resnet
        tv.models = tv_models
        tv.transforms = tv_transforms

    # ---- efficientnet_pytorch (EfficientNet with the real key layout)
    if 'efficientnet_pytorch' not in sys.modules:
        enp = _module('efficientnet_pytorch')
        enp.EfficientNet = _build_efficientnet_oracle()

    # ---- pytorch_lightning.metrics (old 0.x API): just enough for the
    # reference stp3/metrics.py to import and run single-process.
    #   * Metric — a state-container shim (add_state/reset/__call__->
    #     update); no distributed sync, which the oracle tests don't use.
    #   * reduction.reduce — the documented 'none'/'sum'/'elementwise_mean'
    #     semantics (IoU uses 'none': identity).
    #   * classification.stat_scores_multiple_classes — faithful
    #     per-class tp/fp/tn/fn/support counts. NOTE shim-implemented
    #     (lightning 0.x semantics): the IoU oracle leans on this; the
    #     Panoptic/Planning oracles do NOT (their math is entirely in the
    #     reference file).
    if 'pytorch_lightning' not in sys.modules:
        pl = _module('pytorch_lightning')
        pl_metrics = _module('pytorch_lightning.metrics')
        pl_metric_mod = _module('pytorch_lightning.metrics.metric')
        pl_func = _module('pytorch_lightning.metrics.functional')
        pl_cls = _module('pytorch_lightning.metrics.functional.classification')
        pl_red = _module('pytorch_lightning.metrics.functional.reduction')

        class Metric(tnn.Module):
            def __init__(self, compute_on_step=False, **kw):
                super().__init__()
                self._state_defaults = {}

            def add_state(self, name, default, dist_reduce_fx=None):
                self._state_defaults[name] = (
                    default.clone() if torch.is_tensor(default) else default)
                setattr(self, name, default)

            def reset(self):
                for k, v in self._state_defaults.items():
                    setattr(self, k, v.clone() if torch.is_tensor(v) else v)

            def forward(self, *a, **k):
                return self.update(*a, **k)

        def reduce(x, reduction='none'):
            if reduction == 'none':
                return x
            if reduction == 'sum':
                return x.sum()
            if reduction in ('elementwise_mean', 'mean'):
                return x.mean()
            raise ValueError(reduction)

        def stat_scores_multiple_classes(pred, target, num_classes):
            pred = pred.reshape(-1).long()
            target = target.reshape(-1).long()
            tps = torch.zeros(num_classes)
            fps = torch.zeros(num_classes)
            tns = torch.zeros(num_classes)
            fns = torch.zeros(num_classes)
            sups = torch.zeros(num_classes)
            for c in range(num_classes):
                p = pred == c
                t = target == c
                tps[c] = (p & t).sum()
                fps[c] = (p & ~t).sum()
                fns[c] = (~p & t).sum()
                tns[c] = (~p & ~t).sum()
                sups[c] = t.sum()
            return tps, fps, tns, fns, sups

        pl_metric_mod.Metric = Metric
        pl_red.reduce = reduce
        pl_cls.stat_scores_multiple_classes = stat_scores_multiple_classes
        pl_func.classification = pl_cls
        pl_func.reduction = pl_red
        pl_metrics.metric = pl_metric_mod
        pl_metrics.functional = pl_func
        pl.metrics = pl_metrics

    # ---- numpy<1.24 compat: the reference was written against numpy
    # with the deprecated `np.int` alias (stp3/models/encoder.py:27
    # `np.log2(...).astype(np.int)`); restore it so the reference modules
    # execute under this environment's numpy
    if not hasattr(np, 'int'):
        np.int = int

    if REFERENCE_ROOT not in sys.path:
        # APPEND, never prepend: the reference root also contains
        # carla_agent.py / train.py / evaluate.py, which would otherwise
        # shadow this repo's same-named root modules for every test that
        # runs after this module is imported at collection time (the
        # reference's carla_agent imports the real `carla` package ->
        # ModuleNotFoundError in test_agent). The reference's `stp3`
        # package name is unique, so append still resolves it.
        sys.path.append(REFERENCE_ROOT)


def _build_efficientnet_oracle():
    """The ``efficientnet_pytorch.EfficientNet`` stand-in: a faithful torch
    re-implementation of lukemelas/EfficientNet-PyTorch v0.7.0 (the
    reference's pinned dep, environment.yml:10) for everything the ST-P3
    encoder touches (reference stp3/models/encoder.py:18-81):

      * ``_conv_stem`` / ``_bn0`` (eps=1e-3) + ``_swish``
      * ``_blocks.N`` MBConv: [_expand_conv/_bn0] -> _depthwise_conv/_bn1
        -> SE (_se_reduce/_se_expand) -> _project_conv/_bn2, id-skip when
        stride 1 and in==out; ``forward(x, drop_connect_rate=...)`` with
        drop-connect = identity in eval (the only mode the shim supports)
      * TF-style SAME padding (Conv2dDynamicSamePadding semantics)
      * ``_global_params.drop_connect_rate`` and the classifier-side
        attrs (``_conv_head/_bn1/_avg_pooling/_dropout/_fc``) that
        ``Encoder.delete_unused_layers`` deletes

    ``from_pretrained`` returns RANDOM weights (zero egress): parity
    tests randomize and convert the full state_dict anyway, and the
    backbone importer test drives it with its own synthetic weights."""
    import math
    import types as _types

    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    from stp3_tpu.models.efficientnet import _SCALING, block_plan, round_filters

    def _same_pad(x, k, s):
        ih, iw = x.shape[-2:]
        pad_h = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
        pad_w = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
        return F.pad(x, [pad_w // 2, pad_w - pad_w // 2,
                         pad_h // 2, pad_h - pad_h // 2])

    class SameConv(tnn.Conv2d):
        def forward(self, x):
            x = _same_pad(x, self.kernel_size[0], self.stride[0])
            return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                            self.dilation, self.groups)

    class _Swish(tnn.Module):
        def forward(self, x):
            return x * torch.sigmoid(x)

    class MBConvOracle(tnn.Module):
        def __init__(self, k, s, e, ci, co, se_ratio):
            super().__init__()
            self.stride, self.expand = s, e
            self.ci, self.co = ci, co
            mid = ci * e
            if e != 1:
                self._expand_conv = SameConv(ci, mid, 1, bias=False)
                self._bn0 = tnn.BatchNorm2d(mid, eps=1e-3)
            self._depthwise_conv = SameConv(mid, mid, k, stride=s,
                                            groups=mid, bias=False)
            self._bn1 = tnn.BatchNorm2d(mid, eps=1e-3)
            sq = max(1, int(ci * se_ratio))
            self._se_reduce = SameConv(mid, sq, 1)
            self._se_expand = SameConv(sq, mid, 1)
            self._project_conv = SameConv(mid, co, 1, bias=False)
            self._bn2 = tnn.BatchNorm2d(co, eps=1e-3)

        def forward(self, x, drop_connect_rate=None):
            assert not (self.training and drop_connect_rate), \
                'shim supports drop_connect only in eval mode (identity)'
            inp = x
            if self.expand != 1:
                x = _swish_fn(self._bn0(self._expand_conv(x)))
            x = _swish_fn(self._bn1(self._depthwise_conv(x)))
            s = F.adaptive_avg_pool2d(x, 1)
            s = self._se_expand(_swish_fn(self._se_reduce(s)))
            x = torch.sigmoid(s) * x
            x = self._bn2(self._project_conv(x))
            if self.stride == 1 and self.ci == self.co:
                x = x + inp
            return x

    def _swish_fn(x):
        return x * torch.sigmoid(x)

    class EfficientNet(tnn.Module):
        """Full (untruncated) net with efficientnet_pytorch key names."""

        def __init__(self, arch):
            super().__init__()
            width, _, _ = _SCALING[arch]
            stem = round_filters(32, width)
            self._conv_stem = SameConv(3, stem, 3, stride=2, bias=False)
            self._bn0 = tnn.BatchNorm2d(stem, eps=1e-3)
            self._blocks = tnn.ModuleList(
                [MBConvOracle(k, s, e, ci, co, se)
                 for (k, s, e, ci, co, se) in block_plan(arch, truncate=False)])
            head_in = block_plan(arch, truncate=False)[-1][4]
            head = round_filters(1280, width)
            self._conv_head = SameConv(head_in, head, 1, bias=False)
            self._bn1 = tnn.BatchNorm2d(head, eps=1e-3)
            self._avg_pooling = tnn.AdaptiveAvgPool2d(1)
            self._dropout = tnn.Dropout(0.2)
            self._fc = tnn.Linear(head, 10)
            self._swish = _Swish()
            self._global_params = _types.SimpleNamespace(
                drop_connect_rate=0.2)

        @classmethod
        def from_name(cls, name, **kw):
            return cls(name)

        @classmethod
        def from_pretrained(cls, name, **kw):
            # RANDOM weights (zero egress): callers that need ImageNet
            # weights go through scripts/import_backbone.py instead
            return cls(name)

        def endpoints(self, x, truncate_idx):
            """Reference encoder endpoint extraction (encoder.py:57-86):
            record prev_x whenever the spatial size halves, over the
            TRUNCATED block list."""
            eps = {}
            x = _swish_fn(self._bn0(self._conv_stem(x)))
            prev = x
            for idx, block in enumerate(self._blocks[:truncate_idx + 1]):
                x = block(x)
                if prev.shape[-2] > x.shape[-2]:
                    eps[f'reduction_{len(eps) + 1}'] = prev
                prev = x
            eps[f'reduction_{len(eps) + 1}'] = x
            return eps

    return EfficientNet


# --------------------------------------------------------------- test helpers

def randomize_(module, seed: int = 0, scale: float = 0.2,
               exclude: tuple = ()) -> None:
    """Fill a torch module's params + BN running stats with reproducible
    random values (variances kept positive, stats O(0.1)).

    ``exclude``: key substrings to leave untouched — e.g. the reference
    Cost_Function registers its dx/bx grid CONSTANTS as nn.Parameters
    (cost.py:57-58), which must keep their geometric values."""
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if not v.is_floating_point() or any(s in k for s in exclude):
            continue
        if 'running_var' in k:
            sd[k] = torch.rand(v.shape, generator=g) * 0.5 + 0.5
        elif 'running_mean' in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        else:
            sd[k] = torch.randn(v.shape, generator=g) * scale
    module.load_state_dict(sd)


def convert(build_fn, torch_module):
    """Map a torch module's weights to a flax param dict.

    ``build_fn(b)`` populates a MapBuilder with entries whose torch keys are
    prefixed 'm.' and flax paths prefixed 'f/'. Unmapped torch keys are
    ignored (caller asserts coverage where it matters)."""
    from stp3_tpu.utils import torch_import as ti

    b = ti.MapBuilder()
    build_fn(b)
    sd = {f'm.{k}': v.detach().cpu().numpy()
          for k, v in torch_module.state_dict().items()}
    params = {}
    for e in b.entries:
        missing = [k for k in e.torch_keys if k not in sd]
        assert not missing, f'mapping expects absent torch keys: {missing}'
        vals = e.imp([np.asarray(sd[k]) for k in e.torch_keys])
        for path, v in zip(e.flax_paths, vals):
            assert path.startswith('f/'), path
            ti._put(params, path[2:], np.asarray(v, np.float32))
    return params


def nchw(x):
    """numpy channels-last -> torch channels-first tensor (any leading dims)."""
    import torch
    x = np.asarray(x, np.float32)
    return torch.from_numpy(np.moveaxis(x, -1, -3).copy())


def to_last(t):
    """torch channels-first tensor -> numpy channels-last."""
    x = t.detach().cpu().numpy()
    return np.moveaxis(x, -3, -1)
