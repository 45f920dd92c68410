"""Module-level numerical parity vs the actual reference torch modules.

Round-1 torch parity was leaf-level (single convs, BN, GRU-cell formulas,
tests/test_torch_import.py). These tests import the reference's *composed*
modules from /root/reference (via tests/reference_oracle.py shims), drive
both sides with converter-mapped identical weights and identical random
inputs, and assert outputs agree to <=1e-4 — so a composition-level
sign/ordering bug (e.g. in the Dual_GRU warm-up order, the trusting-gate
mixing, pyramid-pooling causal padding, or the planner margin) cannot slip
through.

Oracles: /root/reference/stp3/layers/temporal.py:11-489,
stp3/models/{distributions,decoder,future_prediction,planning_model}.py.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax

from stp3_tpu.layers import convolutions as convlib
from stp3_tpu.layers.convolutions import set_default_norm

import reference_oracle as ro

ro.install()

from stp3.layers import temporal as ref_temporal  # noqa: E402  (reference)
from stp3.models import distributions as ref_distributions  # noqa: E402
from stp3.models import future_prediction as ref_future  # noqa: E402


@pytest.fixture(autouse=True)
def bn_frozen_norm():
    prev = convlib.default_norm()
    set_default_norm('bn_frozen')
    yield
    set_default_norm(prev)


def _rand(shape, seed, scale=1.0):
    return (np.random.RandomState(seed).randn(*shape) * scale).astype(np.float32)


def t5(x):
    """(B, T, H, W, C) -> torch (B, T, C, H, W)."""
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 2).copy())


def t5_3d(x):
    """(B, T, H, W, C) -> torch 3-D conv layout (B, C, T, H, W)."""
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


def from_t5(t):
    return np.moveaxis(t.detach().numpy(), 2, -1)


def from_t5_3d(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def _assert_close(jx, tx, atol=1e-4, what=''):
    np.testing.assert_allclose(np.asarray(jx), tx, atol=atol, rtol=1e-4,
                               err_msg=what)


# ----------------------------------------------------------------- SpatialGRU

def test_spatial_gru_parity():
    """reference temporal.py:11-57 (scan + fused gates vs python loop)."""
    from stp3_tpu.layers.temporal import SpatialGRU

    ref = ref_temporal.SpatialGRU(input_size=6, hidden_size=4)
    ro.randomize_(ref, seed=1)
    ref.eval()
    params = ro.convert(lambda b: b.spatial_gru('m', 'f'), ref)

    x = _rand((2, 3, 6, 5, 7), 0)                      # (B, T, C, H, W)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x))
    xj = np.moveaxis(x, 2, -1)                          # (B, T, H, W, C)
    out_j = SpatialGRU(input_size=6, hidden_size=4).apply({'params': params}, xj)
    _assert_close(out_j, from_t5(out_t), what='SpatialGRU')


# ------------------------------------------------------------------- Dual_GRU

@pytest.mark.parametrize('mixture', [True, False])
def test_dual_gru_parity(mixture):
    """reference temporal.py:59-160: warm-up order, rollout, trusting gate."""
    from stp3_tpu.layers.temporal import DualGRU

    latent, hidden = 4, 8
    ref = ref_temporal.Dual_GRU(latent, hidden, n_future=3, mixture=mixture)
    ro.randomize_(ref, seed=2)
    ref.eval()
    params = ro.convert(lambda b: b.dual_gru('m', 'f', hidden=hidden), ref)

    x = _rand((2, 1, latent, 6, 6), 3)
    state = _rand((2, 3, hidden, 6, 6), 4)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x), torch.from_numpy(state))
    out_j = DualGRU(latent, hidden, n_future=3, mixture=mixture).apply(
        {'params': params}, np.moveaxis(x, 2, -1), np.moveaxis(state, 2, -1))
    _assert_close(out_j, from_t5(out_t), what='Dual_GRU')


# --------------------------------------------------------------------- BiGRU

def test_bigru_parity():
    """reference temporal.py:162-249 — defined but unused in the reference
    forward path; kept for API parity, so it gets the same oracle test as
    the live GRUs (forward/backward pass order, decoder-per-step, reversed
    backward stack, res-block tail)."""
    from stp3_tpu.layers.temporal import BiGRU

    cin = 6
    ref = ref_temporal.BiGRU(cin)
    ro.randomize_(ref, seed=31)
    ref.eval()

    def build(b):
        b.gru_gates('m.conv_update_1', 'm.conv_reset_1', 'f/cell1/gates')
        b.conv('m.conv_state_tilde_1', 'f/cell1/candidate', bias=True)
        b.gru_gates('m.conv_update_2', 'm.conv_reset_2', 'f/cell2/gates')
        b.conv('m.conv_state_tilde_2', 'f/cell2/candidate', bias=True)
        b.bottleblock('m.conv_decoder_1', 'f/decoder1', in_ch=cin, out_ch=cin)
        b.bottleblock('m.conv_decoder_2', 'f/decoder2', in_ch=cin, out_ch=cin)
        b.bottleblock('m.res_blocks.0', 'f/Bottleblock_0',
                      in_ch=2 * cin, out_ch=cin)
        b.convnext_block('m.res_blocks.1', 'f/ConvNeXtBlock_0')
        b.convnext_block('m.res_blocks.2', 'f/ConvNeXtBlock_1')

    params = ro.convert(build, ref)
    x = _rand((2, 3, cin, 5, 7), 30)                   # (B, T, C, H, W)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x))
    out_j = BiGRU(cin).apply({'params': params}, np.moveaxis(x, 2, -1))
    _assert_close(out_j, from_t5(out_t), what='BiGRU')


# -------------------------------------------------- TemporalBlock/Bottleneck3D

def test_temporal_block_pyramid_parity():
    """reference temporal.py:426-489 + PyramidSpatioTemporalPooling :375-423
    (incl. AvgPool3d count_include_pad=False causal-time semantics)."""
    from stp3_tpu.layers.temporal import TemporalBlock

    cin, cout, h, w = 6, 8, 8, 8
    ref = ref_temporal.TemporalBlock(cin, cout, use_pyramid_pooling=True,
                                     pool_sizes=[(2, h, w)])
    ro.randomize_(ref, seed=5)
    ref.eval()
    params = ro.convert(
        lambda b: b.temporal_block('m', 'f', in_ch=cin, out_ch=cout,
                                   pyramid=True, n_pool=1), ref)

    x = _rand((2, cin, 3, h, w), 6)                     # (B, C, T, H, W)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x))
    out_j = TemporalBlock(cout, use_pyramid_pooling=True,
                          pool_sizes=[(2, h, w)]).apply(
        {'params': params}, np.moveaxis(x, 1, -1))
    _assert_close(out_j, from_t5_3d(out_t), what='TemporalBlock')


@pytest.mark.parametrize('ks', [(2, 3, 3), (1, 3, 3)])
def test_bottleneck3d_parity(ks):
    """reference temporal.py:328-372."""
    from stp3_tpu.layers.temporal import Bottleneck3D

    ref = ref_temporal.Bottleneck3D(8, 10, kernel_size=ks)
    ro.randomize_(ref, seed=7)
    ref.eval()
    params = ro.convert(
        lambda b: b.bottleneck3d('m', 'f', in_ch=8, out_ch=10), ref)

    x = _rand((1, 8, 3, 6, 6), 8)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x))
    out_j = Bottleneck3D(10, kernel_size=ks).apply(
        {'params': params}, np.moveaxis(x, 1, -1))
    _assert_close(out_j, from_t5_3d(out_t), what='Bottleneck3D')


# --------------------------------------------------------- DistributionModule

def test_distribution_gaussian_parity():
    """reference distributions.py:7-68 (4x downsample encoder + pool)."""
    from stp3_tpu.models.distributions import DistributionModule

    ref = ref_distributions.DistributionModule(8, 3, method='GAUSSIAN')
    ro.randomize_(ref, seed=9)
    ref.eval()

    def build(b):
        for i in range(4):
            b.bottleneck2d(f'm.encoder.model.{i}',
                           f'f/DistributionEncoder_0/Bottleneck_{i}',
                           in_ch=8 if i == 0 else 4, out_ch=4, downsample=True)
        b.conv('m.decoder.1', 'f/Conv_0', bias=True)

    params = ro.convert(build, ref)
    x = _rand((2, 1, 8, 16, 16), 10)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x))
    out_j = DistributionModule(latent_dim=3, method='GAUSSIAN').apply(
        {'params': params}, np.moveaxis(x, 2, -1))
    _assert_close(out_j, out_t.numpy(), what='DistributionModule GAUSSIAN')


def test_distribution_bernoulli_parity():
    from stp3_tpu.models.distributions import DistributionModule

    ref = ref_distributions.DistributionModule(8, 3, method='BERNOULLI')
    ro.randomize_(ref, seed=11)
    ref.eval()
    params = ro.convert(
        lambda b: b.bottleneck2d('m.encoder.0', 'f/Bottleneck_0',
                                 in_ch=8, out_ch=3), ref)
    x = _rand((2, 1, 8, 8, 8), 12)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x))
    out_j = DistributionModule(latent_dim=3, method='BERNOULLI').apply(
        {'params': params}, np.moveaxis(x, 2, -1))
    # reference emits (B, L, H, W); ours (B, H, W, L)
    _assert_close(out_j, np.moveaxis(out_t.numpy(), 1, -1),
                  what='DistributionModule BERNOULLI')


# -------------------------------------------------------------------- Decoder

def test_decoder_parity():
    """reference decoder.py:8-140 with every head enabled (trunk via the
    torchvision-shim resnet18, upsampling skips, present-frame hdmap)."""
    from stp3.models import decoder as ref_decoder
    from stp3_tpu.models.decoder import Decoder

    gate = dict(perceive_hdmap=True, predict_pedestrian=True,
                predict_instance=True, predict_future_flow=True, planning=True)
    ref = ref_decoder.Decoder(in_channels=8, n_classes=2, n_present=2,
                              n_hdmap=2, predict_gate=gate)
    ro.randomize_(ref, seed=13)
    ref.eval()

    def build(b):
        b.conv('m.first_conv', 'f/Conv_0')
        b.bn('m.bn1', 'f/Norm_0')
        b.basic_block('m.layer1.0', 'f/BasicBlock_0', downsample=False)
        b.basic_block('m.layer1.1', 'f/BasicBlock_1', downsample=False)
        b.basic_block('m.layer2.0', 'f/BasicBlock_2', downsample=True)
        b.basic_block('m.layer2.1', 'f/BasicBlock_3', downsample=False)
        b.basic_block('m.layer3.0', 'f/BasicBlock_4', downsample=True)
        b.basic_block('m.layer3.1', 'f/BasicBlock_5', downsample=False)
        b.upsampling_add('m.up3_skip', 'f/UpsamplingAdd_0')
        b.upsampling_add('m.up2_skip', 'f/UpsamplingAdd_1')
        b.upsampling_add('m.up1_skip', 'f/UpsamplingAdd_2')
        for head in ('segmentation_head', 'pedestrian_head', 'hdmap_head',
                     'instance_offset_head', 'instance_center_head',
                     'instance_future_head', 'costvolume_head'):
            b.head(f'm.{head}', f'f/{head}')

    params = ro.convert(build, ref)
    x = _rand((1, 3, 8, 16, 16), 14)                    # (B, S, C, H, W)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x))
    out_j = Decoder(n_classes=2, n_present=2, n_hdmap=2).apply(
        {'params': params}, np.moveaxis(x, 2, -1))

    _assert_close(out_j['segmentation'], from_t5(out_t['segmentation']), what='seg')
    _assert_close(out_j['pedestrian'], from_t5(out_t['pedestrian']), what='ped')
    _assert_close(out_j['hdmap'],
                  np.moveaxis(out_t['hdmap'].numpy(), 1, -1), what='hdmap')
    _assert_close(out_j['instance_center'], from_t5(out_t['instance_center']),
                  what='center')
    _assert_close(out_j['instance_offset'], from_t5(out_t['instance_offset']),
                  what='offset')
    _assert_close(out_j['instance_flow'], from_t5(out_t['instance_flow']),
                  what='flow')
    # reference costvolume: head -> squeeze(1) -> view (B, S, H, W)
    _assert_close(out_j['costvolume'], out_t['costvolume'].numpy(), what='cost')


# ----------------------------------------------------------- FuturePrediction

def test_future_prediction_parity():
    """reference future_prediction.py:7-46 (DualGRU + ConvNeXt res blocks +
    2 SpatialGRUs + DeepLabHead composition)."""
    from stp3_tpu.models.future_prediction import FuturePrediction

    cin, latent = 8, 4
    ref = ref_future.FuturePrediction(cin, latent, n_future=2, mixture=True,
                                      n_gru_blocks=2, n_res_layers=1)
    ro.randomize_(ref, seed=15)
    ref.eval()

    def build(b):
        b.dual_gru('m.dual_grus', 'f/DualGRU_0', hidden=cin)
        b.convnext_block('m.res_blocks1.0', 'f/ConvNeXtBlock_0')
        b.spatial_gru('m.spatial_grus.0', 'f/SpatialGRU_0')
        b.convnext_block('m.res_blocks.0.0', 'f/ConvNeXtBlock_1')
        b.spatial_gru('m.spatial_grus.1', 'f/SpatialGRU_1')
        b.deeplab_head('m.res_blocks.1', 'f/DeepLabHead_0')

    params = ro.convert(build, ref)
    x = _rand((1, 1, latent, 8, 8), 16)
    state = _rand((1, 2, cin, 8, 8), 17)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x), torch.from_numpy(state))
    out_j = FuturePrediction(cin, latent, n_future=2).apply(
        {'params': params}, np.moveaxis(x, 2, -1), np.moveaxis(state, 2, -1))
    _assert_close(out_j, from_t5(out_t), atol=2e-4, what='FuturePrediction')


# ------------------------------------------------------------------- Planning

def _planning_pair():
    """Build reference + flax planners with identical weights and a shared
    cfg (12 candidates, 4 future steps, 16x16 front-cam feature)."""
    from stp3.models import planning_model as ref_planning
    from stp3_tpu.config import get_cfg
    from stp3_tpu.models.cost import CostConfig
    from stp3_tpu.models.planning_model import Planning

    cfg = get_cfg()
    cfg.PLANNING.SAMPLE_NUM = 12
    ref = ref_planning.Planning(cfg, feature_channel=64, gru_input_size=6,
                                gru_state_size=32)
    ro.randomize_(ref, seed=20, exclude=('cost_function.',))
    ref.eval()

    def build(b):
        chans = [(64, 64), (64, 32), (32, 32), (32, 8)]
        for i, (ci, co) in enumerate(chans):
            b.bottleneck2d(f'm.reduce_channel.{i}', f'f/reduce_channel_{i}',
                           in_ch=ci, out_ch=co, downsample=i < 3)
        b.torch_gru_cell('m.GRU', 'f/gru')
        b.dense('m.decoder.0', 'f/decoder_fc1')
        b.dense('m.decoder.2', 'f/decoder_fc2')

    params = ro.convert(build, ref)
    model = Planning(cost_cfg=CostConfig.from_cfg(cfg), sample_num=12,
                     feature_channel=64, gru_state_size=32)
    return ref, model, params


def _planning_inputs(seed=21, n=12, t=4, hw=200):
    rng = np.random.RandomState(seed)
    trajs = np.cumsum(rng.randn(1, n, t, 3).astype(np.float32), axis=2)
    trajs[..., 2] = 0.0
    gt = np.cumsum(rng.randn(1, t, 3).astype(np.float32), axis=1)
    gt[..., 2] = 0.0
    cost_volume = rng.rand(1, t, hw, hw).astype(np.float32)
    sem = (rng.rand(1, t, hw, hw) < 0.05).astype(np.float32)
    hdmap = (rng.rand(1, 2, hw, hw) < 0.3).astype(np.float32)
    target = rng.randn(1, 2).astype(np.float32)
    cam_front = rng.randn(1, 64, 16, 16).astype(np.float32) * 0.2
    return trajs, gt, cost_volume, sem, hdmap, target, cam_front


@pytest.mark.slow
def test_planning_loss_select_parity():
    """reference planning_model.py:47-87 (max-margin loss + topk select),
    including the full 7-term Cost_Function underneath."""
    ref, model, params = _planning_pair()
    trajs, gt, cv, sem, hdmap, target, _ = _planning_inputs()
    lane_t, driv_t = hdmap[:, 0:1], hdmap[:, 1:2]

    with torch.no_grad():
        loss_t = ref.loss(torch.from_numpy(trajs), torch.from_numpy(gt),
                          torch.from_numpy(cv), torch.from_numpy(sem),
                          torch.from_numpy(lane_t), torch.from_numpy(driv_t),
                          torch.from_numpy(target))
        sel_t = ref.select(torch.from_numpy(trajs), torch.from_numpy(cv),
                           torch.from_numpy(sem), torch.from_numpy(lane_t),
                           torch.from_numpy(driv_t), torch.from_numpy(target))

    lane_j = np.moveaxis(lane_t, 1, -1)
    driv_j = np.moveaxis(driv_t, 1, -1)
    loss_j = model.apply({'params': params}, trajs, gt, cv, sem, lane_j,
                         driv_j, target, method='loss')
    sel_j = model.apply({'params': params}, trajs, cv, sem, lane_j, driv_j,
                        target, method='select')
    _assert_close(loss_j, loss_t.numpy(), atol=5e-4, what='Planning.loss')
    _assert_close(sel_j, sel_t.numpy(), what='Planning.select')


@pytest.mark.slow
@pytest.mark.parametrize('command', ['LEFT', 'FORWARD', 'RIGHT', 'LANE'])
def test_planning_forward_parity(command):
    """reference planning_model.py:89-150 eval path: command filtering,
    select, reduce_channel + GRU refinement."""
    ref, model, params = _planning_pair()
    trajs, gt, cv, sem, hdmap, target, cam_front = _planning_inputs(seed=22)
    cmd_code = {'LEFT': 0, 'FORWARD': 1, 'RIGHT': 2, 'LANE': 3}[command]

    with torch.no_grad():
        loss_t, traj_t = ref(torch.from_numpy(cam_front),
                             torch.from_numpy(trajs), torch.from_numpy(gt),
                             torch.from_numpy(cv), torch.from_numpy(sem),
                             torch.from_numpy(hdmap), [command],
                             torch.from_numpy(target))
    assert loss_t == 0

    loss_j, traj_j = model.apply(
        {'params': params}, np.moveaxis(cam_front, 1, -1), trajs, gt, cv, sem,
        np.moveaxis(hdmap, 1, -1), np.asarray([cmd_code], np.int32), target,
        train=False)
    assert float(loss_j) == 0.0
    _assert_close(traj_j, traj_t.numpy(), atol=5e-4, what='Planning.forward')
