"""Planner: command-conditioned candidate selection, cost evaluation,
max-margin training loss, and GRU trajectory refinement.

Mirrors reference stp3/models/planning_model.py:10-150, TPU-first:
  * command filtering (reference :101-113, a python loop over batch with
    string commands) becomes a static (4, N) gather-index table indexed by
    an integer command code — fixed shapes under jit;
  * the per-step GRU refinement python loop (reference :136-141) stays a
    short unrolled loop (n_future <= 6) over a flax GRUCell;
  * cost evaluation is the fully vectorized CostFunction (models/cost.py).

Command codes: 0=LEFT, 1=FORWARD, 2=RIGHT, 3=other (keep all candidates,
the reference's fall-through branch for CARLA's LANE command).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from stp3_tpu.layers.convolutions import Bottleneck
from stp3_tpu.models.cost import CostConfig, CostFunction

CMD_LEFT, CMD_FORWARD, CMD_RIGHT, CMD_OTHER = 0, 1, 2, 3


def command_index_table(sample_num: int) -> np.ndarray:
    """(4, N) gather indices: rows LEFT/FORWARD/RIGHT tile their third of the
    (terminal-x-sorted) candidate set 3x; row 3 keeps all (reference
    planning_model.py:101-113)."""
    assert sample_num % 3 == 0
    num = sample_num // 3
    rows = [np.tile(np.arange(i * num, (i + 1) * num), 3) for i in range(3)]
    rows.append(np.arange(sample_num))
    return np.stack(rows).astype(np.int32)


class Planning(nn.Module):
    cost_cfg: CostConfig
    sample_num: int
    feature_channel: int = 64
    gru_state_size: int = 256
    gru_input_size: int = 6

    def setup(self):
        fc = self.feature_channel
        self.reduce_channel = [
            Bottleneck(fc, downsample=True),
            Bottleneck(fc // 2, downsample=True),
            Bottleneck(fc // 2, downsample=True),
            Bottleneck(fc // 8),
        ]
        self.gru = nn.GRUCell(features=self.gru_state_size)
        self.decoder_fc1 = nn.Dense(self.gru_state_size)
        self.decoder_fc2 = nn.Dense(2)
        self._cmd_table = command_index_table(self.sample_num)
        self._cost_fn = CostFunction(self.cost_cfg)

    def select_trajs_by_command(self, trajs: jnp.ndarray, commands: jnp.ndarray) -> jnp.ndarray:
        """trajs (B, N, T, 3), commands (B,) int32 -> (B, N, T, 3)."""
        idx = jnp.asarray(self._cmd_table)[commands]          # (B, N)
        return jnp.take_along_axis(trajs, idx[:, :, None, None], axis=1)

    @staticmethod
    def _split_hdmap(hd_map: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """hd_map channels-last (B, H, W, 2 or 4) -> (lane_divider,
        drivable_area), each (B, H, W, 1 or 2) (reference :115-123)."""
        c = hd_map.shape[-1]
        if c == 2:
            return hd_map[..., 0:1], hd_map[..., 1:2]
        if c == 4:
            return hd_map[..., 0:2], hd_map[..., 2:4]
        raise NotImplementedError(f'hd_map channels {c}')

    def compute_cost(self, trajs, cost_volume, semantic_pred, lane_divider,
                     drivable_area, target_points):
        return self._cost_fn(cost_volume, trajs[..., :2], semantic_pred,
                             lane_divider, drivable_area, target_points)

    def loss(self, trajs, gt_trajs, cost_volume, semantic_pred, lane_divider,
             drivable_area, target_points) -> jnp.ndarray:
        """Max-margin loss vs the GT trajectory (reference :66-87)."""
        sm_fc, sm_fo = self.compute_cost(trajs, cost_volume, semantic_pred,
                                         lane_divider, drivable_area, target_points)
        gt = gt_trajs[:, None] if gt_trajs.ndim == 3 else gt_trajs
        gt_fc, gt_fo = self.compute_cost(gt, cost_volume, semantic_pred,
                                         lane_divider, drivable_area, target_points)
        l2 = ((trajs[..., :2] - gt[..., :2]) ** 2).sum(-1)      # (B, N, T)
        margin = (nn.relu(gt_fo - sm_fo).sum(-1) + (gt_fc - sm_fc) + l2.mean(-1))
        return nn.relu(margin).max(axis=-1).mean()

    def select(self, trajs, cost_volume, semantic_pred, lane_divider,
               drivable_area, target_points) -> jnp.ndarray:
        """argmin-cost candidate (reference :47-64, topk k=1)."""
        fc, fo = self.compute_cost(trajs, cost_volume, semantic_pred,
                                   lane_divider, drivable_area, target_points)
        cs = fc + fo.sum(-1)                                    # (B, N)
        kk = jnp.argmin(cs, axis=-1)
        return jnp.take_along_axis(trajs, kk[:, None, None, None], axis=1)[:, 0]

    def __call__(self, cam_front, trajs, gt_trajs, cost_volume, semantic_pred,
                 hd_map, commands, target_points, *, train: bool = False):
        """Reference Planning.forward (:89-150).

        cam_front: (B, Hf, Wf, C) present-frame front-cam feature
        trajs: (B, N, T, 3) candidates (terminal-x sorted); gt_trajs (B, T, 3)
        cost_volume: (B, T, H, W); semantic_pred (B, T, H, W) occupancy
        hd_map: (B, H, W, 2 or 4) channels-last logits/labels
        commands: (B,) int32; target_points (B, 2)
        Returns (loss, refined_traj (B, T, 3)).
        """
        cur_trajs = self.select_trajs_by_command(trajs, commands)
        lane_divider, drivable_area = self._split_hdmap(hd_map)

        loss = jnp.zeros(())
        if train:
            loss = self.loss(cur_trajs, gt_trajs, cost_volume, semantic_pred,
                             lane_divider, drivable_area, target_points)

        h = cam_front
        for blk in self.reduce_channel:
            h = blk(h, train=train)
        # flatten in torch (C, H, W) ravel order: the reference GRU's h0
        # basis (planning_model.py:130 flatten of NCHW) — imported torch
        # GRU weights would otherwise see a permuted state
        h0 = jnp.moveaxis(h, -1, 1).reshape(h.shape[0], -1)     # (B, state)
        assert h0.shape[-1] == self.gru_state_size, (
            f'front-cam feature flattens to {h0.shape[-1]}, expected '
            f'GRU_STATE_SIZE={self.gru_state_size}')

        final_traj = self.select(cur_trajs, cost_volume, semantic_pred,
                                 lane_divider, drivable_area, target_points)

        b, s, _ = final_traj.shape
        x = jnp.zeros((b, 2), h0.dtype)
        tp = target_points.astype(h0.dtype)
        outs = []
        for i in range(s):
            inp = jnp.concatenate([x, final_traj[:, i, :2], tp], axis=-1)
            h0, _ = self.gru(h0, inp)
            x = self.decoder_fc2(nn.relu(self.decoder_fc1(h0)))
            outs.append(x)
        out = jnp.stack(outs, axis=1)                           # (B, T, 2)
        out3 = jnp.concatenate([out, jnp.zeros_like(out[..., :1])], axis=-1)

        if train:
            # smooth-L1 to GT with x-axis weighted 10x (reference :148)
            diff = out - gt_trajs[..., :2]
            absd = jnp.abs(diff)
            huber = jnp.where(absd < 1.0, 0.5 * diff ** 2, absd - 0.5)
            loss = loss * 0.5 + (huber * jnp.asarray([10.0, 1.0])).mean()

        return loss, out3
