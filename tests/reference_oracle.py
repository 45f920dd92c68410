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

    if REFERENCE_ROOT not in sys.path:
        # APPEND, never prepend: the reference root also contains
        # carla_agent.py / train.py / evaluate.py, which would otherwise
        # shadow this repo's same-named root modules for every test that
        # runs after this module is imported at collection time (the
        # reference's carla_agent imports the real `carla` package ->
        # ModuleNotFoundError in test_agent). The reference's `stp3`
        # package name is unique, so append still resolves it.
        sys.path.append(REFERENCE_ROOT)


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
