"""Tests for the torch ⇄ flax weight converter (stp3_tpu/utils/torch_import.py).

Leaf transforms are validated numerically against real torch ops (torch is
CPU-only in this environment — fine for parity checks); the full-model
mapping is validated by a round-trip (flax -> reference state_dict -> flax)
plus a structure-completeness check against ``model.init``.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp
from flax import linen as nn

from stp3_tpu.layers import convolutions as convlib
from stp3_tpu.layers.convolutions import Norm, set_default_norm
from stp3_tpu.layers.temporal import CausalConv3d, ConvGRUCell
from stp3_tpu.models.cost import CostConfig
from stp3_tpu.models.stp3 import STP3, STP3Config
from stp3_tpu.utils import torch_import as ti


@pytest.fixture
def bn_frozen_norm():
    prev = convlib.default_norm()
    set_default_norm('bn_frozen')
    yield
    set_default_norm(prev)


def _np(x):
    return x.detach().cpu().numpy()


# --------------------------------------------------------------------- leafs

def test_conv2d_stride2_pad1_matches_torch():
    """Explicit ((1,1),(1,1)) padding == torch Conv2d(3, s2, p1) on even/odd."""
    torch.manual_seed(0)
    for h, w in [(8, 12), (7, 9)]:
        m = torch.nn.Conv2d(5, 6, 3, stride=2, padding=1, bias=False)
        x = torch.randn(2, 5, h, w)
        y = _np(m(x))
        k = jnp.asarray(ti._t_conv(_np(m.weight)))
        yj = jax.lax.conv_general_dilated(
            jnp.asarray(_np(x).transpose(0, 2, 3, 1)), k, (2, 2),
            ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        np.testing.assert_allclose(np.asarray(yj).transpose(0, 3, 1, 2), y,
                                   atol=1e-5)


def test_conv7_stride2_pad3_matches_torch():
    """Decoder first_conv: torch Conv2d(7, s2, p3)."""
    torch.manual_seed(1)
    m = torch.nn.Conv2d(4, 8, 7, stride=2, padding=3, bias=False)
    x = torch.randn(1, 4, 16, 20)
    y = _np(m(x))
    k = jnp.asarray(ti._t_conv(_np(m.weight)))
    yj = jax.lax.conv_general_dilated(
        jnp.asarray(_np(x).transpose(0, 2, 3, 1)), k, (2, 2),
        ((3, 3), (3, 3)), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(yj).transpose(0, 3, 1, 2), y, atol=1e-5)


def test_convtranspose_matches_torch():
    """Bottleneck upsample: ConvTranspose2d(3, s2, p1, op1) == flax
    ConvTranspose(padding=((1,2),(1,2)), transpose_kernel=True)."""
    torch.manual_seed(2)
    m = torch.nn.ConvTranspose2d(6, 3, 3, stride=2, padding=1,
                                 output_padding=1, bias=False)
    x = torch.randn(2, 6, 9, 11)
    y = _np(m(x))
    fl = nn.ConvTranspose(3, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2)),
                          transpose_kernel=True, use_bias=False)
    k = jnp.asarray(ti._t_convT(_np(m.weight)))
    yj = fl.apply({'params': {'kernel': k}},
                  jnp.asarray(_np(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(yj).transpose(0, 3, 1, 2), y, atol=1e-5)


@pytest.mark.parametrize('eps', [1e-5, 1e-3])
def test_bn_frozen_matches_torch_eval_bn(eps):
    torch.manual_seed(3)
    m = torch.nn.BatchNorm2d(10, eps=eps)
    # randomize the stats so the test is non-trivial
    with torch.no_grad():
        m.running_mean.normal_()
        m.running_var.uniform_(0.5, 2.0)
        m.weight.normal_()
        m.bias.normal_()
    m.eval()
    x = torch.randn(2, 10, 4, 5)
    y = _np(m(x))
    params = {'scale': _np(m.weight), 'bias': _np(m.bias),
              'mean': _np(m.running_mean), 'var': _np(m.running_var)}
    yj = Norm(kind='bn_frozen', eps=eps).apply(
        {'params': params}, jnp.asarray(_np(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(yj).transpose(0, 3, 1, 2), y, atol=1e-5)


def test_torch_grucell_matches_flax(bn_frozen_norm):
    torch.manual_seed(4)
    cell = torch.nn.GRUCell(6, 16)
    x = torch.randn(3, 6)
    h = torch.randn(3, 16)
    y = _np(cell(x, h))

    b = ti.MapBuilder()
    b.torch_gru_cell('g', 'g')
    sd = {k: _np(getattr(cell, k.split('.')[-1])) for k in b.entries[0].torch_keys}
    vals = b.entries[0].imp([sd[k] for k in b.entries[0].torch_keys])
    params = {}
    for p, v in zip(b.entries[0].flax_paths, vals):
        ti._put(params, p, v)

    fcell = nn.GRUCell(features=16)
    new_h, _ = fcell.apply({'params': params['g']},
                           jnp.asarray(_np(h)), jnp.asarray(_np(x)))
    np.testing.assert_allclose(np.asarray(new_h), y, atol=1e-5)


def test_conv_gru_gate_fusion_matches_reference_formula(bn_frozen_norm):
    """Fused-gates ConvGRUCell == the reference gru_cell formula
    (stp3/layers/temporal.py:44-57) with separate update/reset convs."""
    torch.manual_seed(5)
    cin, ch = 4, 8
    conv_u = torch.nn.Conv2d(cin + ch, ch, 3, padding=1)
    conv_r = torch.nn.Conv2d(cin + ch, ch, 3, padding=1)
    conv_t = torch.nn.Conv2d(cin + ch, ch, 3, padding=1)
    x = torch.randn(2, cin, 6, 7)
    s = torch.randn(2, ch, 6, 7)

    xs = torch.cat([x, s], dim=1)
    upd = torch.sigmoid(conv_u(xs))
    rst = torch.sigmoid(conv_r(xs))
    tilde = conv_t(torch.cat([x, (1.0 - rst) * s], dim=1))
    ref = _np((1.0 - upd) * s + upd * tilde)

    b = ti.MapBuilder()
    b.gru_gates('u', 'r', 'cell/gates')
    b.conv('t', 'cell/candidate', bias=True)
    sd = {'u.weight': _np(conv_u.weight), 'u.bias': _np(conv_u.bias),
          'r.weight': _np(conv_r.weight), 'r.bias': _np(conv_r.bias),
          't.weight': _np(conv_t.weight), 't.bias': _np(conv_t.bias)}
    params = {}
    for e in b.entries:
        for p, v in zip(e.flax_paths, e.imp([sd[k] for k in e.torch_keys])):
            ti._put(params, p, v)

    out = ConvGRUCell(ch).apply({'params': params['cell']},
                                jnp.asarray(_np(x).transpose(0, 2, 3, 1)),
                                jnp.asarray(_np(s).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-5)


def test_causal_conv3d_matches_torch(bn_frozen_norm):
    """2-D-unfolded CausalConv3d == torch left-padded Conv3d + frozen BN + relu
    (reference stp3/layers/temporal.py:252-273)."""
    torch.manual_seed(6)
    cin, cout, t, h, w = 3, 5, 4, 6, 7
    conv = torch.nn.Conv3d(cin, cout, (2, 3, 3), bias=False)
    bn = torch.nn.BatchNorm3d(cout)
    with torch.no_grad():
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_()
        bn.bias.normal_()
    bn.eval()
    x = torch.randn(2, cin, t, h, w)
    xp = torch.nn.functional.pad(x, (1, 1, 1, 1, 1, 0))   # w, h, left-time
    ref = _np(torch.relu(bn(conv(xp))))

    b = ti.MapBuilder()
    b.causal_conv3d('c', 'mod')
    sd = {'c.conv.weight': _np(conv.weight),
          'c.norm.weight': _np(bn.weight), 'c.norm.bias': _np(bn.bias),
          'c.norm.running_mean': _np(bn.running_mean),
          'c.norm.running_var': _np(bn.running_var),
          'c.norm.num_batches_tracked': np.zeros(())}
    params = {}
    for e in b.entries:
        for p, v in zip(e.flax_paths, e.imp([sd[k] for k in e.torch_keys])):
            ti._put(params, p, v)

    out = CausalConv3d(cout, (2, 3, 3)).apply(
        {'params': params['mod']},
        jnp.asarray(_np(x).transpose(0, 2, 3, 4, 1)))     # (B,T,H,W,C)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3), ref,
                               rtol=1e-4, atol=1e-4)


def test_decoder_head_matches_torch(bn_frozen_norm):
    """Reference head Sequential [conv3x3, BN, ReLU, conv1x1]
    (stp3/models/decoder.py:37-44) == stp3_tpu decoder._Head."""
    from stp3_tpu.models.decoder import _Head
    torch.manual_seed(7)
    ch, out = 6, 3
    seq = torch.nn.Sequential(
        torch.nn.Conv2d(ch, ch, 3, padding=1, bias=False),
        torch.nn.BatchNorm2d(ch),
        torch.nn.ReLU(),
        torch.nn.Conv2d(ch, out, 1))
    with torch.no_grad():
        seq[1].running_mean.normal_()
        seq[1].running_var.uniform_(0.5, 2.0)
    seq.eval()
    x = torch.randn(2, ch, 5, 8)
    ref = _np(seq(x))

    b = ti.MapBuilder()
    b.head('h', 'h')
    sd = {f'h.{i}.{p}': _np(getattr(seq[i], p.replace("running_", "running_")))
          for i, ps in [(0, ['weight']), (3, ['weight', 'bias'])] for p in ps}
    for p in ['weight', 'bias', 'running_mean', 'running_var']:
        sd[f'h.1.{p}'] = _np(getattr(seq[1], p))
    params = {}
    for e in b.entries:
        for pth, v in zip(e.flax_paths, e.imp([sd[k] for k in e.torch_keys])):
            ti._put(params, pth, v)

    out_j = _Head(out, ch).apply({'params': params['h']},
                             jnp.asarray(_np(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out_j).transpose(0, 3, 1, 2), ref,
                               atol=1e-5)


# --------------------------------------------------------------- round trip

def _tiny_cfg(**kw):
    cost = CostConfig(x_bound=(-16.0, 16.0, 2.0), y_bound=(-16.0, 16.0, 2.0),
                      z_bound=(-10.0, 10.0, 20.0), ego_width=1.85,
                      ego_height=4.084, n_future=2, safety=0.1, lambda_=1.0,
                      headway=1.0, lrdivider=10.0, comfort=0.1, progress=0.5,
                      volume=100.0)
    base = dict(x_bound=(-16.0, 16.0, 2.0), y_bound=(-16.0, 16.0, 2.0),
                final_dim=(64, 96), encoder_name='efficientnet-b0',
                n_future=2, sample_num=6, gru_state_size=16, cost=cost)
    base.update(kw)
    return STP3Config(**base)


@pytest.mark.slow
def test_full_roundtrip_and_structure(bn_frozen_norm):
    cfg = _tiny_cfg()
    tree0 = ti.init_param_tree(cfg, seed=0)
    sd = ti.export_state_dict(tree0, cfg)
    # reference bookkeeping keys must be tolerated on import
    sd['model.bev_resolution'] = np.zeros(3, np.float32)
    sd['model.encoder.backbone._bn0.num_batches_tracked'] = np.zeros((), np.int64)
    tree1, report = ti.import_state_dict(sd, cfg)
    assert report.ok(), (report.missing, report.unexpected)
    assert len(report.ignored) == 2

    # exact structural + numerical identity with the init tree
    flat0 = jax.tree_util.tree_flatten_with_path(tree0)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(tree1)[0]
    paths0 = ['/'.join(str(getattr(k, 'key', k)) for k in p) for p, _ in flat0]
    paths1 = ['/'.join(str(getattr(k, 'key', k)) for k in p) for p, _ in flat1]
    assert paths0 == paths1
    for (_, a), (_, b) in zip(flat0, flat1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_imported_params_run_forward(bn_frozen_norm):
    cfg = _tiny_cfg(predict_pedestrian=False, predict_future_flow=False)
    sd = ti.synthesize_state_dict(cfg, seed=1)
    params, report = ti.import_state_dict(sd, cfg)
    assert report.ok()

    model = STP3(cfg)
    h, w = cfg.final_dim
    s = cfg.receptive_field + cfg.n_future
    img = jnp.ones((1, s, 2, h, w, 3)) * 0.1
    K = jnp.tile(jnp.eye(3) * 32, (1, s, 2, 1, 1)).at[..., 2, 2].set(1.0)
    E = jnp.tile(jnp.eye(4), (1, s, 2, 1, 1))
    ego = jnp.zeros((1, s, 6))
    out = model.apply({'params': params}, img, K, E, ego, train=False)
    assert out['segmentation'].shape[-1] == cfg.n_classes
    assert np.isfinite(np.asarray(out['segmentation'])).all()


@pytest.mark.slow
def test_export_cli_roundtrip(bn_frozen_norm, tmp_path, monkeypatch):
    """scripts/export_torch_checkpoint.py: Orbax checkpoint -> Lightning
    .ckpt with the reference key layout, constants, and bookkeeping —
    and the output is directly re-importable (closure)."""
    import importlib.util
    import os

    import torch

    from helpers import make_test_cfg
    from stp3_tpu.training import checkpoint as ckpt_lib

    cfg = make_test_cfg()
    cfg.MODEL.NORM = 'bn_frozen'
    mcfg = STP3Config.from_cfg(cfg)
    params = ti.init_param_tree(mcfg, seed=5)
    ckpt_lib.save_checkpoint(str(tmp_path / 'ck'), 0, params,
                             cfg_dict=cfg.convert_to_dict())

    spec = importlib.util.spec_from_file_location(
        'export_torch_checkpoint',
        os.path.join(os.path.dirname(__file__), '..', 'scripts',
                     'export_torch_checkpoint.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / 'exported.ckpt')
    monkeypatch.setattr('sys.argv', ['export_torch_checkpoint.py',
                                     '--checkpoint', str(tmp_path / 'ck'),
                                     '--output', out])
    mod.main()

    blob = torch.load(out, map_location='cpu', weights_only=False)
    sd = {k: v.numpy() for k, v in blob['state_dict'].items()}
    # reference-format essentials present
    assert 'model.frustum' in sd and 'model.bev_resolution' in sd
    assert any(k.endswith('num_batches_tracked') for k in sd)
    # hyper_parameters is REFERENCE-schema: TPU-only keys stripped (the
    # reference's yacs rehydration raises on unknown keys)
    from stp3_tpu.config import TPU_ONLY_KEYS
    hp = blob['hyper_parameters']
    for dotted in TPU_ONLY_KEYS:
        node = hp
        for p in dotted.split('.')[:-1]:
            node = node.get(p, {})
        assert dotted.split('.')[-1] not in node, dotted
    assert hp['MODEL']['ENCODER']['NAME'] == 'efficientnet-b0'
    # values round-trip: the exported tensors match a direct export
    direct = ti.export_state_dict(params, mcfg)
    for k in list(direct)[:20] + ['model.segmentation_weight']:
        np.testing.assert_array_equal(sd[k], np.asarray(direct[k]), k)
    # closure: the CLI's output is importable again, bit-exact
    params2, report = ti.import_state_dict(sd, mcfg)
    assert report.ok(), (report.missing[:5], report.unexpected[:5])
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(params2)[0]
    for (p, a), (_, b) in zip(flat, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_filter_decoder():
    params = {'decoder': {'x': 1}, 'encoder': {'y': 2}}
    out = ti.filter_decoder(params)
    assert 'decoder' not in out and 'encoder' in out


def test_cam_front_parity_mode():
    """PLANNING.CAM_FRONT_PARITY reproduces the reference's hardcoded
    cam_front_index=1 (reference stp3.py:203) for imported CARLA
    checkpoints: the planner must see the SAME camera feature the
    reference fed it (the LEFT camera in CARLA rig order), not the true
    front camera (PARITY.md deviation #6)."""
    from helpers import make_test_cfg
    from test_model import _inputs

    cfg = make_test_cfg()
    cfg.IMAGE.NAMES = ['front', 'rear']       # CARLA-like: front at 0
    mc_name = STP3Config.from_cfg(cfg)
    assert mc_name.cam_front_index == 0        # by-name resolution
    cfg.PLANNING.CAM_FRONT_PARITY = True
    mc_par = STP3Config.from_cfg(cfg)
    assert mc_par.cam_front_index == 1         # reference hardcode

    # feature-level check: the parity model on camera-swapped inputs sees
    # exactly the feature the by-name model sees on the original inputs
    # (cam_front is a per-camera encoder feature; index selection only)
    model_name, model_par = STP3(mc_name), STP3(mc_par)
    img, K, E, ego = _inputs(cfg)
    variables = model_name.init(jax.random.PRNGKey(0), img, K, E, ego,
                                train=False)
    out_name = model_name.apply(variables, img, K, E, ego, train=False)
    out_par = model_par.apply(variables, img[:, :, ::-1], K[:, :, ::-1],
                              E[:, :, ::-1], ego, train=False)
    np.testing.assert_allclose(np.asarray(out_par['cam_front']),
                               np.asarray(out_name['cam_front']),
                               rtol=1e-5, atol=1e-6)


def test_apply_cam_front_parity_autoset():
    """The torch importer auto-sets the parity flag exactly when the rig's
    by-name front index differs from the reference's hardcoded 1."""
    from helpers import make_test_cfg

    cfg = make_test_cfg()
    cfg.IMAGE.NAMES = ['front', 'left', 'right', 'rear']   # CARLA order
    assert ti.apply_cam_front_parity(cfg)
    assert cfg.PLANNING.CAM_FRONT_PARITY
    assert not ti.apply_cam_front_parity(cfg)              # idempotent

    cfg = make_test_cfg()                                  # front resolves to 1
    cfg.IMAGE.NAMES = ['CAM_FRONT_LEFT', 'CAM_FRONT', 'CAM_FRONT_RIGHT']
    assert not ti.apply_cam_front_parity(cfg)
    assert not cfg.PLANNING.get('CAM_FRONT_PARITY', False)

    cfg = make_test_cfg()                                  # no planner, no flag
    cfg.IMAGE.NAMES = ['front', 'rear']
    cfg.PLANNING.ENABLED = False
    assert not ti.apply_cam_front_parity(cfg)
