"""Planner cost terms over the BEV grid — fully vectorized, jit-friendly.

Mirrors reference stp3/cost.py: seven costs (learned cost volume, rule /
off-drivable, safety, headway, lane-divider distance, comfort, progress)
evaluated for every candidate trajectory at every future step; aggregated
into a per-timestep sum (cost_fo) and a whole-trajectory sum (cost_fc).

TPU-first rewrites:
  * the per-batch python loops and fancy indexing become batched gathers
    over (B, N, T) (reference cost.py:104-155);
  * the lane-divider nearest-pixel search (reference cost.py:286-304,
    torch.nonzero -> dynamic shapes) becomes a fixed-radius exact local
    distance field: the penalty is zero beyond L=1 m anyway, so min-ing
    over a (2R+1)^2 window of shifted masks is exact and static-shape.
  * the ego-footprint cell offsets are precomputed host-side once
    (reference does the same via skimage polygon, cost.py:68-81).
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stp3_tpu.ops.geometry import calculate_birds_eye_view_parameters
from stp3_tpu.utils.rasterize import polygon


@dataclasses.dataclass(frozen=True)
class CostConfig:
    """Hashable subset of the config the cost terms need (usable as a flax
    module field; mirrors reference Cost_Function.__init__ cost.py:12-23)."""
    x_bound: Tuple[float, float, float]
    y_bound: Tuple[float, float, float]
    z_bound: Tuple[float, float, float]
    ego_width: float
    ego_height: float
    n_future: int
    safety: float
    lambda_: float
    headway: float
    lrdivider: float
    comfort: float
    progress: float
    volume: float

    @classmethod
    def from_cfg(cls, cfg) -> "CostConfig":
        cf = cfg.COST_FUNCTION
        return cls(
            x_bound=tuple(cfg.LIFT.X_BOUND), y_bound=tuple(cfg.LIFT.Y_BOUND),
            z_bound=tuple(cfg.LIFT.Z_BOUND), ego_width=cfg.EGO.WIDTH,
            ego_height=cfg.EGO.HEIGHT, n_future=cfg.N_FUTURE_FRAMES,
            safety=cf.SAFETY, lambda_=cf.LAMBDA, headway=cf.HEADWAY,
            lrdivider=cf.LRDIVIDER, comfort=cf.COMFORT, progress=cf.PROGRESS,
            volume=cf.VOLUME)


@lru_cache(maxsize=8)
def ego_footprint_offsets(x_bound: Tuple, y_bound: Tuple, z_bound: Tuple,
                          ego_w: float, ego_h: float, lambda_pad: float = 0.0) -> np.ndarray:
    """Integer (row, col) cell offsets covered by the ego footprint polygon,
    relative to the grid origin (reference cost.py:68-81 get_origin_points).

    ``lambda_pad`` dilates the footprint by that many METRES on every side.
    NB the reference passes ``int(LAMBDA / dx)`` here and uses it directly
    as metres (cost.py:111,71-75) — 2 m for nuScenes, 5 m for CARLA — a
    units quirk we reproduce exactly (callers pass the same value)."""
    res, start, _ = calculate_birds_eye_view_parameters(list(x_bound), list(y_bound), list(z_bound))
    dx, bx = res[:2], start[:2]
    lam = float(lambda_pad)
    pts = np.array([
        [-ego_h / 2.0 + 0.5 - lam, ego_w / 2.0 + lam],
        [ego_h / 2.0 + 0.5 + lam, ego_w / 2.0 + lam],
        [ego_h / 2.0 + 0.5 + lam, -ego_w / 2.0 - lam],
        [-ego_h / 2.0 + 0.5 - lam, -ego_w / 2.0 - lam],
    ])
    pts = (pts - bx) / dx
    pts[:, [0, 1]] = pts[:, [1, 0]]
    rr, cc = polygon(pts[:, 1], pts[:, 0])
    return np.stack([rr, cc], axis=-1).astype(np.int32)  # (K, 2)


class CostFunction:
    """Stateless, jit-friendly aggregate of the seven cost terms.

    __call__(cost_volume, trajs, semantic_pred, lane_divider, drivable_area,
    target_points) -> (cost_fc (B, N), cost_fo (B, N, T)); same contract as
    reference Cost_Function.forward (cost.py:25-46). ``trajs`` here are raw
    sampler outputs — the reference's leading ``trajs * [-1, 1]`` flip
    (cost.py:34) is applied internally.
    """

    def __init__(self, cc: CostConfig):
        res, start, dim = calculate_birds_eye_view_parameters(
            list(cc.x_bound), list(cc.y_bound), list(cc.z_bound))
        self.dx = res[:2]
        self.bx = start[:2]
        self.bev_dimension = dim
        self.W = cc.ego_width
        self.H = cc.ego_height
        self.n_future = cc.n_future
        self.f_safety = cc.safety
        self.f_lambda = cc.lambda_
        self.f_headway = cc.headway
        self.f_lrdivider = cc.lrdivider
        self.f_comfort = cc.comfort
        self.f_progress = cc.progress
        self.f_volume = cc.volume
        xb, yb, zb = cc.x_bound, cc.y_bound, cc.z_bound
        # keep footprints as HOST numpy: CostFunction may be constructed
        # inside a jit trace (Planning.setup), where jnp constants become
        # tracers and break the static shifted-slice construction
        self._fp0 = ego_footprint_offsets(xb, yb, zb, self.W, self.H, 0.0)
        # reference quirk: int(LAMBDA/dx) cells used as METRES of padding
        # (cost.py:111 -> get_origin_points lambda_)
        lam_pad = float(int(self.f_lambda / float(self.dx[0])))
        self._fp_lam = ego_footprint_offsets(xb, yb, zb, self.W, self.H, lam_pad)

    @classmethod
    def from_cfg(cls, cfg) -> "CostFunction":
        return cls(CostConfig.from_cfg(cfg))

    # ---------------------------------------------------------------- utils
    def _traj_cells(self, trajs, footprint):
        """trajs (B,N,T,2) in the flipped frame -> footprint cell indices
        (B,N,T,K,2), clamped (reference cost.py:83-102 get_points)."""
        cells = trajs / self.dx                                  # (B,N,T,2)
        cells = cells[..., ::-1]                                  # swap -> (row-ish, col-ish)
        cells = cells[..., None, :] + footprint                  # (B,N,T,K,2)
        rr = jnp.clip(cells[..., 0].astype(jnp.int32), 0, int(self.bev_dimension[0]) - 1)
        cc = jnp.clip(cells[..., 1].astype(jnp.int32), 0, int(self.bev_dimension[1]) - 1)
        return rr, cc

    def _compute_area(self, semantic, trajs, footprint, ego_velocity=None):
        """Sum of semantic occupancy under the ego footprint along the
        trajectory (reference cost.py:104-123). semantic: (B,T,H,W).

        Exact reference semantics: per-footprint-cell gather with clamping
        (K=~32 gathers per trajectory point). Kept for parity tests; the
        default fast path is _footprint_map + _gather_map."""
        rr, cc = self._traj_cells(trajs, footprint)              # (B,N,T,K)
        t = jnp.arange(rr.shape[2])[None, None, :, None]
        sub = semantic[
            jnp.arange(semantic.shape[0])[:, None, None, None], t, rr, cc
        ].sum(axis=-1)                                           # (B,N,T)
        if ego_velocity is not None:
            sub = sub * ego_velocity
        return sub

    def _footprint_map(self, grid: jnp.ndarray, footprint):
        """Precompute per-center-cell footprint sums on an EXTENDED domain:
        ext[i', j'] = sum_k grid[clip(i' - rmax + rr_k), clip(j' - cmax + cc_k)]
        for center cells fi = i' - rmax in [-rmax, H-1-rmin] (the footprint
        offsets encode the grid-origin shift, so valid centers are negative).

        TPU-first rewrite of the (B, N, T, K) gather storm: K static shifted
        slices of an edge-padded grid, fused by XLA into one vector pass;
        evaluating a trajectory then costs ONE gather instead of K. Matches
        the reference per-cell clamped gather (cost.py:83-123) exactly for
        every center cell in the extended range; centers even further out
        freeze at the boundary value instead of the reference's
        progressively-clamped sums (>2 grid-widths outside the map)."""
        h, w = grid.shape[-2], grid.shape[-1]
        fp = np.asarray(footprint)
        if fp.size == 0:
            z = jnp.zeros_like(grid)
            return z, 0, 0
        rmin, rmax = int(fp[:, 0].min()), int(fp[:, 0].max())
        cmin, cmax = int(fp[:, 1].min()), int(fp[:, 1].max())
        lr, lc = rmax - rmin, cmax - cmin
        pad = [(0, 0)] * (grid.ndim - 2) + [(lr, lr), (lc, lc)]
        padded = jnp.pad(grid, pad, mode='edge')
        hext, wext = h + lr, w + lc

        is_rect = fp.shape[0] == (lr + 1) * (lc + 1)
        if is_rect:
            # ego footprints are axis-aligned rectangles: the window sum is
            # a box filter -> integral image, O(1) per cell instead of K
            # shifted adds (K~320 for the lambda-dilated footprint)
            ii = jnp.cumsum(jnp.cumsum(padded.astype(jnp.float32), axis=-2), axis=-1)
            zrow = [(0, 0)] * (grid.ndim - 2) + [(1, 0), (1, 0)]
            ii = jnp.pad(ii, zrow)
            r1, c1 = lr + 1, lc + 1
            out = (ii[..., r1:r1 + hext, c1:c1 + wext]
                   - ii[..., :hext, c1:c1 + wext]
                   - ii[..., r1:r1 + hext, :wext]
                   + ii[..., :hext, :wext]).astype(grid.dtype)
            return out, rmax, cmax

        out = None
        for rr_k, cc_k in fp:
            piece = jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(padded, int(rr_k) - rmin, hext, axis=-2),
                int(cc_k) - cmin, wext, axis=-1)
            out = piece if out is None else out + piece
        return out, rmax, cmax

    def _gather_map(self, fmap_r0_c0, trajs: jnp.ndarray,
                    ego_velocity=None) -> jnp.ndarray:
        """Gather a footprint-sum map at trajectory floor center cells
        -> (B,N,T). fmap_r0_c0 = output of _footprint_map."""
        fmap, r0, c0 = fmap_r0_c0
        cells = jnp.floor(trajs / self.dx)[..., ::-1]            # (B,N,T,2)
        ri = jnp.clip(cells[..., 0].astype(jnp.int32) + r0, 0, fmap.shape[-2] - 1)
        ci = jnp.clip(cells[..., 1].astype(jnp.int32) + c0, 0, fmap.shape[-1] - 1)
        t = jnp.arange(trajs.shape[2])[None, None, :]
        sub = fmap[jnp.arange(fmap.shape[0])[:, None, None], t, ri, ci]
        if ego_velocity is not None:
            sub = sub * ego_velocity
        return sub

    def _discretize(self, trajs):
        """(B,N,T,2) flipped-frame metres -> (row, col) cell indices
        (reference cost.py:125-140)."""
        xx, yy = trajs[..., 0], trajs[..., 1]
        yi = jnp.clip(((yy - self.bx[0]) / self.dx[0]).astype(jnp.int32),
                      0, int(self.bev_dimension[0]) - 1)
        xi = jnp.clip(((xx - self.bx[1]) / self.dx[1]).astype(jnp.int32),
                      0, int(self.bev_dimension[1]) - 1)
        return yi, xi

    def _evaluate(self, trajs, grid):
        """Gather grid (B,T,H,W) at discretized traj points -> (B,N,T)
        (reference cost.py:142-155)."""
        yi, xi = self._discretize(trajs)
        t = jnp.arange(trajs.shape[2])[None, None, :]
        return grid[jnp.arange(grid.shape[0])[:, None, None], t, yi, xi]

    @staticmethod
    def _binary_from_logits(x):
        """2-channel logits -> prob of class 1, zeroed below 0.5; or
        pass-through single channel (reference cost.py:184-191 etc.).
        x: (B, H, W, 1or2) channels-last."""
        if x.shape[-1] == 2:
            p = jax.nn.softmax(x, axis=-1)[..., 1]
            return jnp.where(p < 0.5, 0.0, p)
        return x[..., 0]

    def _velocity(self, trajs):
        """Stepwise speed (B,N,T) at 2 Hz (reference cost.py:216-221)."""
        prev = jnp.concatenate([jnp.zeros_like(trajs[:, :, :1]), trajs[:, :, :-1]], axis=2)
        return jnp.sqrt(((trajs - prev) ** 2).sum(-1)) / 0.5

    # ---------------------------------------------------------------- terms
    def cost_volume_term(self, trajs, cost_volume):
        cv = jnp.clip(cost_volume, 0, 1000)
        return self._evaluate(trajs, cv) * self.f_volume

    def rule_term(self, trajs, drivable_area):
        da = self._binary_from_logits(drivable_area)
        dangerous = jnp.logical_not(da.astype(bool)).astype(jnp.float32)
        t = trajs.shape[2]
        dangerous = jnp.broadcast_to(dangerous[:, None], (dangerous.shape[0], t) + dangerous.shape[1:])
        fmap = self._footprint_map(dangerous, self._fp0)
        return self._gather_map(fmap, trajs) * 5.0

    def safety_term(self, trajs, semantic_pred):
        vel = self._velocity(trajs)
        sub1 = self._gather_map(self._footprint_map(semantic_pred, self._fp0), trajs)
        sub2 = self._gather_map(self._footprint_map(semantic_pred, self._fp_lam),
                                trajs, vel)
        return (sub1 + sub2) * self.f_safety

    def headway_term(self, trajs, semantic_pred, drivable_area):
        da = self._binary_from_logits(drivable_area)
        sem = semantic_pred * da[:, None]
        shifted = trajs.at[..., 1].add(10.0)  # 10 m longitudinal keep-out
        return self._gather_map(self._footprint_map(sem, self._fp0), shifted) * self.f_headway

    def lr_divider_term(self, trajs, lane_divider, radius_cells: int = 4):
        """Distance penalty < L=1 m to the nearest lane-divider pixel.

        Exact within ``radius_cells`` (penalty is identically zero beyond
        L); replaces the reference's dynamic nonzero+min (cost.py:286-304).
        """
        ld = self._binary_from_logits(lane_divider)
        mask = (ld > 0).astype(jnp.float32)                       # (B,H,W)
        L = 1.0
        big = 1e6
        dists = []
        dxr = float(self.dx[1])  # row offsets scale by reversed(dx): rows * dx[1]
        dxc = float(self.dx[0])
        for di in range(-radius_cells, radius_cells + 1):
            for dj in range(-radius_cells, radius_cells + 1):
                d = np.sqrt((di * dxr) ** 2 + (dj * dxc) ** 2)
                if d - 1e-6 > L:
                    continue
                shifted = jnp.roll(mask, (-di, -dj), axis=(1, 2))
                # zero out wrap-around
                if di > 0:
                    shifted = shifted.at[:, -di:, :].set(0)
                elif di < 0:
                    shifted = shifted.at[:, :-di, :].set(0)
                if dj > 0:
                    shifted = shifted.at[:, :, -dj:].set(0)
                elif dj < 0:
                    shifted = shifted.at[:, :, :-dj].set(0)
                dists.append(jnp.where(shifted > 0, d, big))
        dist_field = jnp.min(jnp.stack(dists, 0), axis=0)        # (B,H,W)
        has_any = mask.sum(axis=(1, 2)) > 0

        yi, xi = self._discretize(trajs)
        d_at = dist_field[jnp.arange(trajs.shape[0])[:, None, None], yi, xi]  # (B,N,T)
        pen = jnp.where(d_at <= L, (L - d_at) ** 2, 0.0)
        pen = jnp.where(has_any[:, None, None], pen, 0.0)
        return pen * self.f_lrdivider

    def comfort_term(self, trajs):
        """Lateral/longitudinal accel + jerk thresholds (reference cost.py:307-370)."""
        prev = jnp.concatenate([jnp.zeros_like(trajs[:, :, :1]), trajs[:, :, :-1]], axis=2)
        vel_xy = (trajs - prev) / 0.5                             # (B,N,T,2)
        lat_v, lon_v = vel_xy[..., 0], vel_xy[..., 1]

        def accel(v):
            a = (v[:, :, 1:] - v[:, :, :-1]) / 0.5
            return jnp.concatenate([jnp.zeros_like(v[:, :, :1]), a], axis=2)

        lat_a = jnp.abs(accel(lat_v)).max(axis=-1)
        lon_a = jnp.abs(accel(lon_v)).max(axis=-1)

        speed = self._velocity(trajs)
        acc = accel(speed)
        jerk = jnp.concatenate([jnp.zeros_like(acc[:, :, :1]),
                                (acc[:, :, 1:] - acc[:, :, :-1]) / 0.5], axis=2)
        # reference zeroes index 1 too (loop starts at 2)
        jerk = jerk.at[:, :, 1].set(0.0) if jerk.shape[2] > 1 else jerk
        jerk = jnp.abs(jerk).max(axis=-1)

        sub = jnp.clip(lat_a - 3.0, 0, 30) ** 2
        sub += jnp.clip(lon_a - 3.0, 0, 30) ** 2
        sub += jnp.clip(jerk - 1.0, 0, 20) ** 2
        return sub * self.f_comfort

    def progress_term(self, trajs, target_points):
        sub1 = trajs[..., 1].max(axis=-1)                         # (B,N)
        has_target = target_points.sum() >= 0.5
        end = trajs[:, :, -1]                                     # (B,N,2)
        sub2 = ((end - target_points[:, None, :]) ** 2).sum(-1)
        sub2 = jnp.where(has_target, sub2, 0.0)
        return (sub2 - sub1) * self.f_progress

    # ------------------------------------------------------------ aggregate
    def __call__(self, cost_volume, trajs, semantic_pred, lane_divider,
                 drivable_area, target_points):
        trajs = trajs * jnp.array([-1.0, 1.0], dtype=trajs.dtype)
        safety = jnp.clip(self.safety_term(trajs, semantic_pred), 0, 100)
        headway = jnp.clip(self.headway_term(trajs, semantic_pred, drivable_area), 0, 100)
        lrdiv = jnp.clip(self.lr_divider_term(trajs, lane_divider), 0, 100)
        comfort = jnp.clip(self.comfort_term(trajs), 0, 100)
        progress = jnp.clip(self.progress_term(trajs, target_points), -100, 100)
        rule = jnp.clip(self.rule_term(trajs, drivable_area), 0, 100)
        volume = jnp.clip(self.cost_volume_term(trajs, cost_volume), 0, 100)

        cost_fo = safety + headway + lrdiv + volume + rule        # (B,N,T)
        cost_fc = comfort + progress                              # (B,N)
        return cost_fc, cost_fo
