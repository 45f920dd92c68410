"""Reference (torch / Lightning) checkpoint ⇄ stp3_tpu (flax) weight converter.

The reference trains with BatchNorm (stp3/trainer.py + torch modules
throughout); importing its checkpoints requires building the flax model with
``cfg.MODEL.NORM = 'bn_frozen'`` so every Norm site carries the running
statistics as (non-trainable-by-convention) params.  The converter maps every
torch ``state_dict`` tensor onto the corresponding flax param leaf:

  * Conv2d           OIHW  -> HWIO  (depthwise included: O=C, I=1)
  * Conv3d           OIDHW -> DHWIO (CausalConv3d kernels)
  * Conv3d 1x1x1     OI111 -> Dense (I, O)   (conv_1x1x1_norm_activated,
                     reference stp3/layers/temporal.py:315-325, lowered to
                     Dense in stp3_tpu.layers.temporal.Conv1x1x1NormActivated)
  * ConvTranspose2d  (I,O,kh,kw) -> (kh,kw,O,I) with transpose_kernel=True
                     and explicit padding (validated numerically in
                     tests/test_torch_import.py)
  * Linear           (O,I) -> (I,O)
  * BatchNorm{2,3}d  weight/bias/running_mean/running_var ->
                     Norm{scale,bias,mean,var}
  * GRU conv gates   the reference's separate conv_update / conv_reset
                     (stp3/layers/temporal.py:21-23) map onto the fused
                     2x-output 'gates' conv of stp3_tpu ConvGRUCell
                     (update first, reset second)
  * nn.GRUCell       (r,z,n)-stacked weight_ih/weight_hh/bias_ih/bias_hh ->
                     flax GRUCell ir/iz/in/hr/hz/hn (torch's two r/z biases
                     fold into the single flax input-dense bias)

The mapping is declarative and bidirectional: ``import_state_dict`` produces
a flax param tree from a torch state_dict; ``export_state_dict`` produces a
reference-format state_dict from a flax tree (useful for round-trip tests and
for handing weights back to the reference implementation).

Torch key names are cited from the reference sources:
  encoder        stp3/models/encoder.py:18-35 (+ efficientnet_pytorch module
                 attribute names: _conv_stem/_bn0/_blocks.N._expand_conv/...)
  temporal model stp3/models/temporal_model.py:22-48
  distribution   stp3/models/distributions.py:15-67
  future pred    stp3/models/future_prediction.py:13-26
  decoder        stp3/models/decoder.py:24-89 (+ torchvision resnet18 names)
  planner        stp3/models/planning_model.py:13-31
  uncertainty    stp3/trainer.py:42-97 (attached to the model)
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from stp3_tpu.models.efficientnet import block_plan, round_filters

Array = np.ndarray
StateDict = Dict[str, Array]
Params = Dict[str, object]

# --------------------------------------------------------------------------
# leaf transforms (torch -> flax); each has an exact inverse
# --------------------------------------------------------------------------


def _t_conv(w: Array) -> Array:          # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _t_conv_inv(w: Array) -> Array:
    return np.transpose(w, (3, 2, 0, 1))


def _t_conv3d(w: Array) -> Array:        # OIDHW -> DHWIO
    return np.transpose(w, (2, 3, 4, 1, 0))


def _t_conv3d_inv(w: Array) -> Array:
    return np.transpose(w, (4, 3, 0, 1, 2))


def _t_convT(w: Array) -> Array:         # (I,O,kh,kw) -> (kh,kw,O,I), transpose_kernel=True
    return np.transpose(w, (2, 3, 1, 0))


def _t_convT_inv(w: Array) -> Array:
    return np.transpose(w, (3, 2, 0, 1))


def _t_linear(w: Array) -> Array:        # (O,I) -> (I,O)
    return np.transpose(w, (1, 0))


def _t_dense_from_1x1x1(w: Array) -> Array:   # (O,I,1,1,1) -> (I,O)
    return np.transpose(w.reshape(w.shape[0], w.shape[1]), (1, 0))


def _t_dense_to_1x1x1(w: Array) -> Array:
    return np.transpose(w, (1, 0))[:, :, None, None, None]


# --------------------------------------------------------------------------
# declarative mapping entries
# --------------------------------------------------------------------------


@dataclasses.dataclass
class Entry:
    """One mapping unit: ``torch_keys`` <-> ``flax_paths``.

    imp(torch_values) -> flax_values; exp(flax_values) -> torch_values.
    Values are positional lists matching the key/path lists.
    """
    torch_keys: List[str]
    flax_paths: List[str]
    imp: Callable[[List[Array]], List[Array]]
    exp: Callable[[List[Array]], List[Array]]


def _simple(tkey: str, fpath: str, fwd, inv) -> Entry:
    return Entry([tkey], [fpath], lambda v: [fwd(v[0])], lambda v: [inv(v[0])])


class MapBuilder:
    """Accumulates Entries while walking the (config-dependent) module tree."""

    def __init__(self) -> None:
        self.entries: List[Entry] = []

    # -- primitives ---------------------------------------------------------
    def conv(self, t: str, f: str, bias: bool = False) -> None:
        self.entries.append(_simple(f'{t}.weight', f'{f}/kernel', _t_conv, _t_conv_inv))
        if bias:
            self.entries.append(_simple(f'{t}.bias', f'{f}/bias', lambda x: x, lambda x: x))

    def convT(self, t: str, f: str, bias: bool = False) -> None:
        self.entries.append(_simple(f'{t}.weight', f'{f}/kernel', _t_convT, _t_convT_inv))
        if bias:
            self.entries.append(_simple(f'{t}.bias', f'{f}/bias', lambda x: x, lambda x: x))

    def conv3d(self, t: str, f: str) -> None:
        self.entries.append(_simple(f'{t}.weight', f'{f}/kernel', _t_conv3d, _t_conv3d_inv))

    def dense(self, t: str, f: str, bias: bool = True) -> None:
        self.entries.append(_simple(f'{t}.weight', f'{f}/kernel', _t_linear, _t_linear))
        if bias:
            self.entries.append(_simple(f'{t}.bias', f'{f}/bias', lambda x: x, lambda x: x))

    def dense_1x1x1(self, t: str, f: str) -> None:
        # conv_1x1x1_norm_activated's Conv3d (bias=False) -> Dense
        self.entries.append(_simple(f'{t}.weight', f'{f}/kernel',
                                    _t_dense_from_1x1x1, _t_dense_to_1x1x1))

    def bn(self, t: str, f: str) -> None:
        """BatchNorm{1,2,3}d -> bn_frozen Norm params."""
        self.entries.append(Entry(
            [f'{t}.weight', f'{t}.bias', f'{t}.running_mean', f'{t}.running_var'],
            [f'{f}/scale', f'{f}/bias', f'{f}/mean', f'{f}/var'],
            lambda v: list(v), lambda v: list(v)))

    def ln(self, t: str, f: str) -> None:
        """torch LayerNorm / reference channels_first LayerNorm -> flax LayerNorm."""
        self.entries.append(Entry(
            [f'{t}.weight', f'{t}.bias'], [f'{f}/scale', f'{f}/bias'],
            lambda v: list(v), lambda v: list(v)))

    def scalar(self, t: str, f: str) -> None:
        self.entries.append(_simple(t, f, lambda x: np.asarray(x).reshape(()),
                                    lambda x: np.asarray(x).reshape(())))

    def gru_gates(self, t_update: str, t_reset: str, f_gates: str) -> None:
        """Fuse conv_update + conv_reset into the 2x-output 'gates' conv
        (update first, stp3_tpu.layers.temporal.ConvGRUCell)."""
        def imp(v):
            wu, bu, wr, br = v
            k = np.concatenate([_t_conv(wu), _t_conv(wr)], axis=-1)
            return [k, np.concatenate([bu, br], axis=0)]

        def exp(v):
            k, b = v
            h = k.shape[-1] // 2
            return [_t_conv_inv(k[..., :h]), b[:h],
                    _t_conv_inv(k[..., h:]), b[h:]]

        self.entries.append(Entry(
            [f'{t_update}.weight', f'{t_update}.bias',
             f'{t_reset}.weight', f'{t_reset}.bias'],
            [f'{f_gates}/kernel', f'{f_gates}/bias'], imp, exp))

    def torch_gru_cell(self, t: str, f: str) -> None:
        """nn.GRUCell -> flax GRUCell. torch stacks (r,z,n) along dim 0 of
        weight_ih/weight_hh; flax keeps six Dense layers (hr/hz bias-free,
        so torch's b_ir+b_hr folds into the flax ir bias)."""
        def imp(v):
            wih, whh, bih, bhh = v
            h = whh.shape[1]
            w_ir, w_iz, w_in = wih[:h], wih[h:2 * h], wih[2 * h:]
            w_hr, w_hz, w_hn = whh[:h], whh[h:2 * h], whh[2 * h:]
            b_ir, b_iz, b_in = bih[:h], bih[h:2 * h], bih[2 * h:]
            b_hr, b_hz, b_hn = bhh[:h], bhh[h:2 * h], bhh[2 * h:]
            return [_t_linear(w_ir), b_ir + b_hr,
                    _t_linear(w_iz), b_iz + b_hz,
                    _t_linear(w_in), b_in,
                    _t_linear(w_hr), _t_linear(w_hz),
                    _t_linear(w_hn), b_hn]

        def exp(v):
            ir_k, ir_b, iz_k, iz_b, in_k, in_b, hr_k, hz_k, hn_k, hn_b = v
            wih = np.concatenate([_t_linear(ir_k), _t_linear(iz_k), _t_linear(in_k)], 0)
            whh = np.concatenate([_t_linear(hr_k), _t_linear(hz_k), _t_linear(hn_k)], 0)
            bih = np.concatenate([ir_b, iz_b, in_b], 0)
            bhh = np.concatenate([np.zeros_like(ir_b), np.zeros_like(iz_b), hn_b], 0)
            return [wih, whh, bih, bhh]

        self.entries.append(Entry(
            [f'{t}.weight_ih', f'{t}.weight_hh', f'{t}.bias_ih', f'{t}.bias_hh'],
            [f'{f}/ir/kernel', f'{f}/ir/bias', f'{f}/iz/kernel', f'{f}/iz/bias',
             f'{f}/in/kernel', f'{f}/in/bias', f'{f}/hr/kernel', f'{f}/hz/kernel',
             f'{f}/hn/kernel', f'{f}/hn/bias'], imp, exp))

    # -- composite reference modules ----------------------------------------
    def aspp(self, t: str, f: str) -> None:
        """reference ASPP (convolutions.py:242-270): convs.0 (1x1), convs.1-3
        (rates 12/24/36), convs.4 (pooling), project."""
        self.conv(f'{t}.convs.0.0', f'{f}/Conv_0')
        self.bn(f'{t}.convs.0.1', f'{f}/Norm_0')
        for i in (1, 2, 3):
            self.conv(f'{t}.convs.{i}.0', f'{f}/Conv_{i}')
            self.bn(f'{t}.convs.{i}.1', f'{f}/Norm_{i}')
        self.conv(f'{t}.convs.4.1', f'{f}/Conv_4')
        self.bn(f'{t}.convs.4.2', f'{f}/Norm_4')
        self.conv(f'{t}.project.0', f'{f}/Conv_5')
        self.bn(f'{t}.project.1', f'{f}/Norm_5')

    def deeplab_head(self, t: str, f: str) -> None:
        """reference DeepLabHead (convolutions.py:272-280): Sequential
        [ASPP, conv3x3, BN, ReLU, conv1x1]."""
        self.aspp(f'{t}.0', f'{f}/ASPP_0')
        self.conv(f'{t}.1', f'{f}/Conv_0')
        self.bn(f'{t}.2', f'{f}/Norm_0')
        self.conv(f'{t}.4', f'{f}/Conv_1', bias=True)

    def upsampling_concat(self, t: str, f: str) -> None:
        """reference UpsamplingConcat (convolutions.py:183-201):
        conv.[0 conv,1 bn,3 conv,4 bn]."""
        self.conv(f'{t}.conv.0', f'{f}/Conv_0')
        self.bn(f'{t}.conv.1', f'{f}/Norm_0')
        self.conv(f'{t}.conv.3', f'{f}/Conv_1')
        self.bn(f'{t}.conv.4', f'{f}/Norm_1')

    def upsampling_add(self, t: str, f: str) -> None:
        """reference UpsamplingAdd (convolutions.py:204-215):
        upsample_layer.[1 conv,2 bn]."""
        self.conv(f'{t}.upsample_layer.1', f'{f}/Conv_0')
        self.bn(f'{t}.upsample_layer.2', f'{f}/Norm_0')

    def bottleneck2d(self, t: str, f: str, in_ch: int, out_ch: Optional[int],
                     downsample: bool = False, upsample: bool = False) -> None:
        """reference Bottleneck (convolutions.py:65-169). flax naming is
        per-type: the middle conv is ConvTranspose_0 in the upsample variant,
        shifting later Conv_i indices by one."""
        out_ch = out_ch or in_ch
        self.conv(f'{t}.layers.conv_down_project', f'{f}/Conv_0')
        self.bn(f'{t}.layers.abn_down_project.0', f'{f}/Norm_0')
        if upsample:
            self.convT(f'{t}.layers.conv', f'{f}/ConvTranspose_0')
            nxt = 1
        else:
            self.conv(f'{t}.layers.conv', f'{f}/Conv_1')
            nxt = 2
        self.bn(f'{t}.layers.abn.0', f'{f}/Norm_1')
        self.conv(f'{t}.layers.conv_up_project', f'{f}/Conv_{nxt}')
        self.bn(f'{t}.layers.abn_up_project.0', f'{f}/Norm_2')
        if out_ch != in_ch or downsample or upsample:
            self.conv(f'{t}.projection.conv_skip_proj', f'{f}/Conv_{nxt + 1}')
            self.bn(f'{t}.projection.bn_skip_proj', f'{f}/Norm_3')

    def bottleblock(self, t: str, f: str, in_ch: int, out_ch: Optional[int]) -> None:
        """reference Bottleblock (convolutions.py:348-380): layers
        [0 conv7,1 LN,3 conv1,4 LN,6 conv3,7 LN] + projection.0 conv."""
        out_ch = out_ch or in_ch
        self.conv(f'{t}.layers.0', f'{f}/Conv_0')
        self.ln(f'{t}.layers.1', f'{f}/LayerNorm_0')
        self.conv(f'{t}.layers.3', f'{f}/Conv_1')
        self.ln(f'{t}.layers.4', f'{f}/LayerNorm_1')
        self.conv(f'{t}.layers.6', f'{f}/Conv_2')
        self.ln(f'{t}.layers.7', f'{f}/LayerNorm_2')
        if out_ch != in_ch:
            self.conv(f'{t}.projection.0', f'{f}/Conv_3')

    def convnext_block(self, t: str, f: str) -> None:
        """reference ConvNeXt Block (convolutions.py:310-346)."""
        self.conv(f'{t}.dwconv', f'{f}/Conv_0', bias=True)
        self.ln(f'{t}.norm', f'{f}/LayerNorm_0')
        self.dense(f'{t}.pwconv1', f'{f}/Dense_0')
        self.dense(f'{t}.pwconv2', f'{f}/Dense_1')
        self.entries.append(_simple(f'{t}.gamma', f'{f}/gamma',
                                    lambda x: x, lambda x: x))

    def conv1x1x1_na(self, t: str, f: str) -> None:
        """reference conv_1x1x1_norm_activated (temporal.py:315-325)."""
        self.dense_1x1x1(f'{t}.conv', f'{f}/Dense_0')
        self.bn(f'{t}.norm', f'{f}/Norm_0')

    def causal_conv3d(self, t: str, f: str) -> None:
        """reference CausalConv3d (temporal.py:252-273), bias=False."""
        self.conv3d(f'{t}.conv', f)
        self.bn(f'{t}.norm', f'{f}/Norm_0')

    def temporal_block(self, t: str, f: str, in_ch: int, out_ch: int,
                       pyramid: bool, n_pool: int) -> None:
        """reference TemporalBlock (temporal.py:426-489)."""
        self.conv1x1x1_na(f'{t}.convolution_paths.0.0', f'{f}/Conv1x1x1NormActivated_0')
        self.causal_conv3d(f'{t}.convolution_paths.0.1', f'{f}/CausalConv3d_0')
        self.conv1x1x1_na(f'{t}.convolution_paths.1.0', f'{f}/Conv1x1x1NormActivated_1')
        self.causal_conv3d(f'{t}.convolution_paths.1.1', f'{f}/CausalConv3d_1')
        self.conv1x1x1_na(f'{t}.convolution_paths.2', f'{f}/Conv1x1x1NormActivated_2')
        if pyramid:
            for j in range(n_pool):
                self.conv1x1x1_na(
                    f'{t}.pyramid_pooling.features.{j}.conv_bn_relu',
                    f'{f}/PyramidSpatioTemporalPooling_0/Conv1x1x1NormActivated_{j}')
        self.conv1x1x1_na(f'{t}.aggregation.0', f'{f}/Conv1x1x1NormActivated_3')
        if out_ch != in_ch:
            self.dense_1x1x1(f'{t}.projection.0', f'{f}/Dense_0')
            self.bn(f'{t}.projection.1', f'{f}/Norm_0')

    def bottleneck3d(self, t: str, f: str, in_ch: int, out_ch: int) -> None:
        """reference Bottleneck3D (temporal.py:328-372)."""
        self.conv1x1x1_na(f'{t}.layers.conv_down_project', f'{f}/Conv1x1x1NormActivated_0')
        self.causal_conv3d(f'{t}.layers.conv', f'{f}/CausalConv3d_0')
        self.conv1x1x1_na(f'{t}.layers.conv_up_project', f'{f}/Conv1x1x1NormActivated_1')
        if out_ch != in_ch:
            self.dense_1x1x1(f'{t}.projection.0', f'{f}/Dense_0')
            self.bn(f'{t}.projection.1', f'{f}/Norm_0')

    def spatial_gru(self, t: str, f: str) -> None:
        """reference SpatialGRU (temporal.py:11-57)."""
        self.gru_gates(f'{t}.conv_update', f'{t}.conv_reset', f'{f}/cell/gates')
        self.conv(f'{t}.conv_state_tilde', f'{f}/cell/candidate', bias=True)
        self.conv(f'{t}.conv_decoder', f'{f}/decoder')

    def dual_gru(self, t: str, f: str, hidden: int) -> None:
        """reference Dual_GRU (temporal.py:59-160)."""
        self.gru_gates(f'{t}.conv_update_1', f'{t}.conv_reset_1', f'{f}/cell1/gates')
        self.conv(f'{t}.conv_state_tilde_1', f'{f}/cell1/candidate', bias=True)
        self.gru_gates(f'{t}.conv_update_2', f'{t}.conv_reset_2', f'{f}/cell2/gates')
        self.conv(f'{t}.conv_state_tilde_2', f'{f}/cell2/candidate', bias=True)
        self.conv(f'{t}.conv_decoder_2', f'{f}/decoder2', bias=True)
        self.bottleblock(f'{t}.trusting_gate.0', f'{f}/Bottleblock_0',
                         in_ch=2 * hidden, out_ch=hidden)
        self.conv(f'{t}.trusting_gate.1', f'{f}/Conv_0')

    def mbconv(self, t: str, f: str, expand: int) -> None:
        """efficientnet_pytorch MBConvBlock state keys (_expand_conv absent
        when expand_ratio == 1, as in the reference's first stage)."""
        ci = 0
        if expand != 1:
            self.conv(f'{t}._expand_conv', f'{f}/Conv_0')
            self.bn(f'{t}._bn0', f'{f}/Norm_0')
            ci = 1
        self.conv(f'{t}._depthwise_conv', f'{f}/Conv_{ci}')
        self.bn(f'{t}._bn1', f'{f}/Norm_{ci}')
        self.conv(f'{t}._se_reduce', f'{f}/SqueezeExcite_0/Conv_0', bias=True)
        self.conv(f'{t}._se_expand', f'{f}/SqueezeExcite_0/Conv_1', bias=True)
        self.conv(f'{t}._project_conv', f'{f}/Conv_{ci + 1}')
        self.bn(f'{t}._bn2', f'{f}/Norm_{ci + 1}')

    def efficientnet(self, t: str, f: str, arch: str) -> None:
        self.conv(f'{t}._conv_stem', f'{f}/Conv_0')
        self.bn(f'{t}._bn0', f'{f}/Norm_0')
        for i, (k, s, e, ci, co, se) in enumerate(block_plan(arch)):
            self.mbconv(f'{t}._blocks.{i}', f'{f}/MBConv_{i}', expand=e)

    def basic_block(self, t: str, f: str, downsample: bool) -> None:
        """torchvision resnet18 BasicBlock."""
        self.conv(f'{t}.conv1', f'{f}/Conv_0')
        self.bn(f'{t}.bn1', f'{f}/Norm_0')
        self.conv(f'{t}.conv2', f'{f}/Conv_1')
        self.bn(f'{t}.bn2', f'{f}/Norm_1')
        if downsample:
            self.conv(f'{t}.downsample.0', f'{f}/Conv_2')
            self.bn(f'{t}.downsample.1', f'{f}/Norm_2')

    def head(self, t: str, f: str) -> None:
        """reference decoder head Sequential [conv3x3, BN, ReLU, conv1x1]
        (decoder.py:37-89)."""
        self.conv(f'{t}.0', f'{f}/Conv_0')
        self.bn(f'{t}.1', f'{f}/Norm_0')
        self.conv(f'{t}.3', f'{f}/Conv_1', bias=True)


def build_mapping(cfg) -> List[Entry]:
    """Full STP3 mapping for an STP3Config (stp3_tpu.models.stp3)."""
    b = MapBuilder()
    c = cfg

    # ---- encoder (reference stp3/models/encoder.py:18-35)
    b.efficientnet('model.encoder.backbone', 'encoder/EfficientNetFeatures_0',
                   c.encoder_name)
    b.deeplab_head('model.encoder.feature_layer_1', 'encoder/DeepLabHead_0')
    b.upsampling_concat('model.encoder.feature_layer_2', 'encoder/UpsamplingConcat_0')
    if c.use_depth_distribution:
        b.deeplab_head('model.encoder.depth_layer_1', 'encoder/DeepLabHead_1')
        b.upsampling_concat('model.encoder.depth_layer_2', 'encoder/UpsamplingConcat_1')

    # ---- temporal model (reference stp3/models/temporal_model.py:22-48)
    if c.temporal_name == 'temporal_block':
        n_temporal = c.receptive_field - 1
        seq = 0
        in_ch = c.temporal_in_channels
        out_ch = c.start_out_channels
        b3d = 0
        for layer in range(n_temporal):
            b.temporal_block(f'model.temporal_model.model.{seq}',
                             f'temporal_model/TemporalBlock_{layer}',
                             in_ch=in_ch, out_ch=out_ch,
                             pyramid=c.pyramid_pooling, n_pool=1)
            seq += 1
            for _ in range(c.inbetween_layers):
                b.bottleneck3d(f'model.temporal_model.model.{seq}',
                               f'temporal_model/Bottleneck3D_{b3d}',
                               in_ch=out_ch, out_ch=out_ch)
                seq += 1
                b3d += 1
            in_ch = out_ch
            out_ch += c.extra_in_channels
        b.deeplab_head('model.temporal_model.final_conv', 'temporal_model/DeepLabHead_0')

    fut_ch = c.future_pred_in_channels

    # ---- distribution (reference stp3/models/distributions.py:15-33)
    if c.n_future > 0 and c.probabilistic:
        t, f = 'model.present_distribution', 'present_distribution'
        if c.prob_method in ('GAUSSIAN', 'MIXGAUSSIAN'):
            comp = fut_ch // 2
            chans = [(fut_ch, comp), (comp, comp), (comp, comp), (comp, comp)]
            for i, (ci, co) in enumerate(chans):
                b.bottleneck2d(f'{t}.encoder.model.{i}',
                               f'{f}/DistributionEncoder_0/Bottleneck_{i}',
                               in_ch=ci, out_ch=co, downsample=True)
            b.conv(f'{t}.decoder.1', f'{f}/Conv_0', bias=True)
        elif c.prob_method == 'BERNOULLI':
            b.bottleneck2d(f'{t}.encoder.0', f'{f}/Bottleneck_0',
                           in_ch=fut_ch, out_ch=c.latent_dim)

    # ---- future prediction (reference stp3/models/future_prediction.py:13-26)
    if c.n_future > 0:
        t, f = 'model.future_prediction', 'future_prediction'
        b.dual_gru(f'{t}.dual_grus', f'{f}/DualGRU_0', hidden=fut_ch)
        cnx = 0
        for j in range(c.n_res_layers):
            b.convnext_block(f'{t}.res_blocks1.{j}', f'{f}/ConvNeXtBlock_{cnx}')
            cnx += 1
        for i in range(c.n_gru_blocks):
            b.spatial_gru(f'{t}.spatial_grus.{i}', f'{f}/SpatialGRU_{i}')
            if i < c.n_gru_blocks - 1:
                for j in range(c.n_res_layers):
                    b.convnext_block(f'{t}.res_blocks.{i}.{j}', f'{f}/ConvNeXtBlock_{cnx}')
                    cnx += 1
            else:
                b.deeplab_head(f'{t}.res_blocks.{i}', f'{f}/DeepLabHead_0')

    # ---- decoder (reference stp3/models/decoder.py:24-89)
    t, f = 'model.decoder', 'decoder'
    b.conv(f'{t}.first_conv', f'{f}/Conv_0')
    b.bn(f'{t}.bn1', f'{f}/Norm_0')
    b.basic_block(f'{t}.layer1.0', f'{f}/BasicBlock_0', downsample=False)
    b.basic_block(f'{t}.layer1.1', f'{f}/BasicBlock_1', downsample=False)
    b.basic_block(f'{t}.layer2.0', f'{f}/BasicBlock_2', downsample=True)
    b.basic_block(f'{t}.layer2.1', f'{f}/BasicBlock_3', downsample=False)
    b.basic_block(f'{t}.layer3.0', f'{f}/BasicBlock_4', downsample=True)
    b.basic_block(f'{t}.layer3.1', f'{f}/BasicBlock_5', downsample=False)
    b.upsampling_add(f'{t}.up3_skip', f'{f}/UpsamplingAdd_0')
    b.upsampling_add(f'{t}.up2_skip', f'{f}/UpsamplingAdd_1')
    b.upsampling_add(f'{t}.up1_skip', f'{f}/UpsamplingAdd_2')
    b.head(f'{t}.segmentation_head', f'{f}/segmentation_head')
    if c.predict_pedestrian:
        b.head(f'{t}.pedestrian_head', f'{f}/pedestrian_head')
    if c.perceive_hdmap:
        b.head(f'{t}.hdmap_head', f'{f}/hdmap_head')
    if c.predict_instance:
        b.head(f'{t}.instance_offset_head', f'{f}/instance_offset_head')
        b.head(f'{t}.instance_center_head', f'{f}/instance_center_head')
    if c.predict_future_flow:
        b.head(f'{t}.instance_future_head', f'{f}/instance_future_head')
    if c.planning_enabled:
        b.head(f'{t}.costvolume_head', f'{f}/costvolume_head')

    # ---- planner (reference stp3/models/planning_model.py:13-31)
    if c.planning_enabled:
        t, f = 'model.planning', 'planner'
        fc = c.encoder_out_channels
        chans = [(fc, fc, True), (fc, fc // 2, True),
                 (fc // 2, fc // 2, True), (fc // 2, fc // 8, False)]
        for i, (ci, co, down) in enumerate(chans):
            b.bottleneck2d(f'{t}.reduce_channel.{i}', f'{f}/reduce_channel_{i}',
                           in_ch=ci, out_ch=co, downsample=down)
        b.torch_gru_cell(f'{t}.GRU', f'{f}/gru')
        b.dense(f'{t}.decoder.0', f'{f}/decoder_fc1')
        b.dense(f'{t}.decoder.2', f'{f}/decoder_fc2')

    # ---- uncertainty log-variances (reference stp3/trainer.py:42-97)
    b.scalar('model.segmentation_weight', 'segmentation_weight')
    if c.predict_pedestrian:
        b.scalar('model.pedestrian_weight', 'pedestrian_weight')
    if c.perceive_hdmap:
        b.scalar('model.hdmap_weight', 'hdmap_weight')
    if c.gt_depth:
        b.scalar('model.depths_weight', 'depths_weight')
    if c.predict_instance:
        b.scalar('model.centerness_weight', 'centerness_weight')
        b.scalar('model.offset_weight', 'offset_weight')
    if c.predict_future_flow:
        b.scalar('model.flow_weight', 'flow_weight')
    if c.planning_enabled:
        b.scalar('model.planning_weight', 'planning_weight')

    return b.entries


# --------------------------------------------------------------------------
# tree helpers
# --------------------------------------------------------------------------


def _put(tree: Params, path: str, value: Array) -> None:
    keys = path.split('/')
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _get(tree: Params, path: str) -> Array:
    node = tree
    for k in path.split('/'):
        node = node[k]
    return np.asarray(node)


# keys that exist in reference checkpoints but carry no learnable content:
# constant grid buffers (stp3.py:23-25), cost-function constants
# (cost.py:57-58,204), BN bookkeeping, and Lightning-side loss/metric state.
_IGNORED_SUBSTRINGS = (
    'num_batches_tracked',
    'model.bev_resolution', 'model.bev_start_position', 'model.bev_dimension',
    'model.frustum',             # constant grid buffer (stp3.py:111-130)
    'model.planning.cost_function.',
)


def _is_ignored(key: str) -> bool:
    if not key.startswith('model.'):
        return True
    return any(s in key for s in _IGNORED_SUBSTRINGS)


@dataclasses.dataclass
class ImportReport:
    converted: int
    ignored: List[str]
    missing: List[str]          # expected torch keys absent from the sd
    unexpected: List[str]       # model.* keys the mapping does not know

    def ok(self) -> bool:
        return not self.missing and not self.unexpected


def _convert_entries(sd: StateDict, entries: Sequence[Entry]):
    """Apply mapping entries to a numpy state_dict. Returns
    (params, consumed_keys, missing_keys, n_converted)."""
    params: Params = {}
    consumed = set()
    missing: List[str] = []
    n = 0
    for e in entries:
        if any(k not in sd for k in e.torch_keys):
            missing.extend(k for k in e.torch_keys if k not in sd)
            continue
        vals = e.imp([sd[k] for k in e.torch_keys])
        for path, v in zip(e.flax_paths, vals):
            _put(params, path, np.asarray(v, np.float32))
            n += 1
        consumed.update(e.torch_keys)
    return params, consumed, missing, n


def import_state_dict(sd: Dict[str, object], cfg, *,
                      strict: bool = True) -> Tuple[Params, ImportReport]:
    """torch state_dict -> flax param tree (requires MODEL.NORM='bn_frozen').

    ``sd`` values may be torch tensors or numpy arrays. Lightning checkpoints
    should be unwrapped to their ``state_dict`` first (see
    ``load_reference_checkpoint``)."""
    sd = {k: _to_np(v) for k, v in sd.items()}
    params, consumed, missing, n = _convert_entries(sd, build_mapping(cfg))
    ignored = [k for k in sd if k not in consumed and _is_ignored(k)]
    unexpected = [k for k in sd if k not in consumed and not _is_ignored(k)]
    report = ImportReport(n, sorted(ignored), sorted(missing), sorted(unexpected))
    if strict and not report.ok():
        raise ValueError(
            f'torch import mismatch: missing={report.missing[:10]} '
            f'({len(report.missing)} total), unexpected={report.unexpected[:10]} '
            f'({len(report.unexpected)} total)')
    return params, report


def import_backbone_state_dict(sd: Dict[str, object], arch: str, *,
                               strict: bool = True) -> Tuple[Params, ImportReport]:
    """Bare efficientnet-pytorch ImageNet state_dict -> Encoder trunk subtree.

    Maps ``_conv_stem/_bn0/_blocks.N.*`` onto the flax
    ``EfficientNetFeatures_0`` param tree (bn_frozen Norms carrying the
    ImageNet running stats), truncated at the downsample-8 endpoint exactly
    like the reference deletes blocks (stp3/models/encoder.py:18,39-55).
    Classifier-side keys (``_conv_head/_bn1/_fc``) and blocks beyond the
    truncation index are expected and ignored.

    Returns a subtree rooted at ``EfficientNetFeatures_0`` — merge it into a
    full model init with :func:`merge_backbone`. This is the "drop in the
    ImageNet .pth when egress exists" path: the reference's encoder starts
    from ``EfficientNet.from_pretrained(cfg.NAME)`` and every published
    metric assumes that init.
    """
    from stp3_tpu.models.efficientnet import _TRUNCATE_IDX

    sd = {k: _to_np(v) for k, v in sd.items()}
    prefixed = {f'backbone.{k}': v for k, v in sd.items()}
    b = MapBuilder()
    b.efficientnet('backbone', 'EfficientNetFeatures_0', arch)
    params, consumed, missing, n = _convert_entries(prefixed, b.entries)
    missing = [k[len('backbone.'):] for k in missing]

    trunc = _TRUNCATE_IDX[arch]

    def _backbone_ignored(key: str) -> bool:
        if 'num_batches_tracked' in key:
            return True
        if key.startswith(('_conv_head.', '_bn1.', '_fc.')):
            return True
        if key.startswith('_blocks.'):
            idx = int(key.split('.')[1])
            return idx > trunc
        return False

    rest = [k for k in sd if f'backbone.{k}' not in consumed]
    ignored = [k for k in rest if _backbone_ignored(k)]
    unexpected = [k for k in rest if not _backbone_ignored(k)]
    report = ImportReport(n, sorted(ignored), sorted(missing), sorted(unexpected))
    if strict and not report.ok():
        raise ValueError(
            f'backbone import mismatch: missing={report.missing[:10]} '
            f'({len(report.missing)} total), unexpected={report.unexpected[:10]} '
            f'({len(report.unexpected)} total)')
    return params, report


def merge_backbone(params: Params, backbone: Params) -> Params:
    """Replace the encoder trunk subtree of a full STP3 param tree with an
    imported backbone (output of :func:`import_backbone_state_dict`).

    Validates leaf shapes against the existing subtree so a b0/b4 or
    norm-kind mismatch fails loudly instead of at apply time."""
    import jax.tree_util as jtu

    sub = backbone['EfficientNetFeatures_0']
    cur = params['encoder']['EfficientNetFeatures_0']
    cur_leaves = {jtu.keystr(p): np.shape(v)
                  for p, v in jtu.tree_flatten_with_path(cur)[0]}
    new_leaves = {jtu.keystr(p): np.shape(v)
                  for p, v in jtu.tree_flatten_with_path(sub)[0]}
    if cur_leaves != new_leaves:
        only_cur = sorted(set(cur_leaves) - set(new_leaves))[:5]
        only_new = sorted(set(new_leaves) - set(cur_leaves))[:5]
        shape_mismatch = sorted(k for k in cur_leaves
                                if k in new_leaves and cur_leaves[k] != new_leaves[k])[:5]
        raise ValueError(
            'backbone subtree does not match model init: '
            f'missing={only_cur} extra={only_new} shape={shape_mismatch}')
    out = dict(params)
    enc = dict(out['encoder'])
    enc['EfficientNetFeatures_0'] = sub
    out['encoder'] = enc
    return out


def export_state_dict(params: Params, cfg) -> StateDict:
    """flax param tree -> reference-format torch state_dict (numpy values)."""
    entries = build_mapping(cfg)
    sd: StateDict = {}
    for e in entries:
        vals = e.exp([_get(params, p) for p in e.flax_paths])
        for k, v in zip(e.torch_keys, vals):
            sd[k] = np.asarray(v, np.float32)
    return sd


def _to_np(v) -> Array:
    if isinstance(v, np.ndarray):
        return v
    try:
        return v.detach().cpu().numpy()          # torch tensor
    except AttributeError:
        return np.asarray(v)


def synthesize_state_dict(cfg, seed: int = 0) -> StateDict:
    """Random reference-format state_dict with the right keys/shapes, derived
    by inverse-transforming a flax init tree — used by tests and by the
    structure self-check without needing a real reference checkpoint."""
    import jax

    from stp3_tpu.layers.convolutions import default_norm
    assert default_norm() == 'bn_frozen', 'set_default_norm("bn_frozen") first'
    tree = init_param_tree(cfg, seed)
    sd = export_state_dict(tree, cfg)
    return sd


def apply_cam_front_parity(cfg) -> bool:
    """Auto-set PLANNING.CAM_FRONT_PARITY for an imported REFERENCE
    checkpoint whose rig order puts the front camera somewhere other than
    index 1 (CARLA: front,left,right,rear). The reference hardcodes
    cam_front_index=1 (reference stp3.py:203) — for CARLA that is the
    LEFT camera — so a checkpoint trained by the reference expects the
    planner to consume THAT camera's feature; feeding the true front
    camera instead is a train/serve distribution shift that silently
    degrades imported-checkpoint parity. Mutates ``cfg`` in place and
    returns True if the flag was newly set. See PARITY.md."""
    from stp3_tpu.models.stp3 import _cam_front_index
    if not cfg.PLANNING.ENABLED:
        return False
    if cfg.PLANNING.get('CAM_FRONT_PARITY', False):
        return False
    if _cam_front_index(cfg.IMAGE.NAMES) != 1:
        cfg.PLANNING.CAM_FRONT_PARITY = True
        return True
    return False


def init_param_tree(cfg, seed: int = 0) -> Params:
    """Init the STP3 flax model (tiny inputs) and return its param tree."""
    import jax
    import jax.numpy as jnp

    from stp3_tpu.models.stp3 import STP3

    model = STP3(cfg)
    h, w = cfg.final_dim
    s = cfg.receptive_field + max(cfg.n_future, 1)
    n = max(cfg.cam_front_index + 1, 2)
    img = jnp.zeros((1, s, n, h, w, 3))
    K = jnp.tile(jnp.eye(3) * (h // 2), (1, s, n, 1, 1)).at[..., 2, 2].set(1.0)
    E = jnp.tile(jnp.eye(4), (1, s, n, 1, 1))
    ego = jnp.zeros((1, s, 6))
    kwargs = {}
    if cfg.planning_enabled:
        nf = max(cfg.n_future, 1)
        kwargs = dict(trajs=jnp.zeros((1, cfg.sample_num, nf, 3)),
                      gt_trajs=jnp.zeros((1, nf, 3)),
                      commands=jnp.zeros((1,), jnp.int32),
                      target_points=jnp.zeros((1, 2)))
    v = model.init({'params': jax.random.PRNGKey(seed),
                    'sample': jax.random.PRNGKey(seed + 1)},
                   img, K, E, ego, method=model.init_full, **kwargs)
    return jax.tree_util.tree_map(np.asarray, v['params'])


def load_reference_checkpoint(path: str) -> Dict[str, Array]:
    """Load a Lightning .ckpt (or raw torch state_dict) to numpy arrays."""
    import torch
    blob = torch.load(path, map_location='cpu')
    sd = blob.get('state_dict', blob) if isinstance(blob, dict) else blob
    return {k: _to_np(v) for k, v in sd.items()}


def filter_decoder(params: Params) -> Params:
    """Curriculum warm-start filter: drop decoder params (the reference loads
    pretrained stage weights with 'decoder' keys excluded, train.py:21-29)."""
    return {k: v for k, v in params.items() if k != 'decoder'}
