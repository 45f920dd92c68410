"""Visualisation: BEV panels, optical-flow colouring, planning plots.

Mirrors reference stp3/utils/visualisation.py (flow colorwheel :13-164,
``visualise_output`` video panels :208-322, ``plot_planning`` :331-379,
instance palette :381-460) with matplotlib/numpy only; everything is
host-side and eval/debug-only.
"""
from __future__ import annotations

from typing import Dict, Optional

import matplotlib
import numpy as np

matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402


# --------------------------------------------------------------------------
# Optical-flow colorwheel (Baker et al. convention, as in the reference)
# --------------------------------------------------------------------------
def _make_colorwheel() -> np.ndarray:
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    ncols = ry + yg + gc + cb + bm + mr
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:ry, 0] = 255
    wheel[0:ry, 1] = np.floor(255 * np.arange(ry) / ry)
    col += ry
    wheel[col:col + yg, 0] = 255 - np.floor(255 * np.arange(yg) / yg)
    wheel[col:col + yg, 1] = 255
    col += yg
    wheel[col:col + gc, 1] = 255
    wheel[col:col + gc, 2] = np.floor(255 * np.arange(gc) / gc)
    col += gc
    wheel[col:col + cb, 1] = 255 - np.floor(255 * np.arange(cb) / cb)
    wheel[col:col + cb, 2] = 255
    col += cb
    wheel[col:col + bm, 2] = 255
    wheel[col:col + bm, 0] = np.floor(255 * np.arange(bm) / bm)
    col += bm
    wheel[col:col + mr, 2] = 255 - np.floor(255 * np.arange(mr) / mr)
    wheel[col:col + mr, 0] = 255
    return wheel


_COLORWHEEL = _make_colorwheel()


def flow_to_image(flow: np.ndarray, max_flow: Optional[float] = None) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) uint8 colour image."""
    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u ** 2 + v ** 2)
    if max_flow is None:
        max_flow = max(np.max(rad), 1e-6)
    u, v = u / max_flow, v / max_flow
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    ncols = _COLORWHEEL.shape[0]
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros(flow.shape[:2] + (3,), np.uint8)
    for i in range(3):
        col0 = _COLORWHEEL[k0, i] / 255.0
        col1 = _COLORWHEEL[k1, i] / 255.0
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] = col[~idx] * 0.75
        img[..., i] = np.floor(255 * col)
    return img


# --------------------------------------------------------------------------
# Instance palette (stable pseudo-random colours per id)
# --------------------------------------------------------------------------
def instance_colours(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    colours = rng.randint(50, 255, size=(max(n, 1), 3)).astype(np.uint8)
    colours[0] = [0, 0, 0]  # background black
    return colours


def colourise_instances(instance_map: np.ndarray) -> np.ndarray:
    """(H, W) int -> (H, W, 3) uint8."""
    n = int(instance_map.max()) + 1
    return instance_colours(n + 1)[instance_map]


# --------------------------------------------------------------------------
# Panels
# --------------------------------------------------------------------------
def _seg_rgb(seg: np.ndarray, colour=(70, 130, 180)) -> np.ndarray:
    img = np.full(seg.shape + (3,), 255, np.uint8)
    img[seg > 0] = colour
    return img


def visualise_output(labels: Dict, output: Dict, cfg) -> np.ndarray:
    """Build a (T, H, W*rows, 3) uint8 panel video comparing GT vs
    prediction for seg / centerness / offset / flow / pedestrian
    (reference visualise_output :208-322). Channels-last inputs."""
    seg_pred = np.asarray(output['segmentation']).argmax(-1)[0]      # (S,H,W)
    seg_gt = np.asarray(labels['segmentation'])[0]
    rows = [np.stack([_seg_rgb(s) for s in seg_gt]),
            np.stack([_seg_rgb(s) for s in seg_pred])]

    if output.get('pedestrian') is not None and 'pedestrian' in labels:
        ped_pred = np.asarray(output['pedestrian']).argmax(-1)[0]
        ped_gt = np.asarray(labels['pedestrian'])[0]
        rows.append(np.stack([_seg_rgb(s, (255, 140, 0)) for s in ped_gt]))
        rows.append(np.stack([_seg_rgb(s, (255, 140, 0)) for s in ped_pred]))

    if output.get('instance_center') is not None:
        c = np.asarray(output['instance_center'])[0, :, :, :, 0]
        c = (np.clip(c, 0, 1) * 255).astype(np.uint8)
        rows.append(np.stack([np.stack([v] * 3, -1) for v in c]))

    if output.get('instance_flow') is not None:
        f = np.asarray(output['instance_flow'])[0]
        rows.append(np.stack([flow_to_image(v) for v in f]))

    t = min(r.shape[0] for r in rows)
    panel = np.concatenate([r[:t] for r in rows], axis=2)            # (T,H,W*k,3)
    return panel


def plot_planning(ax, trajs: np.ndarray, gt_traj: np.ndarray,
                  occupancy: Optional[np.ndarray] = None,
                  bev_extent: float = 50.0):
    """Matplotlib planning plot: candidates faint, GT green, selected red
    (reference plot_planning :331-379)."""
    if occupancy is not None:
        ax.imshow(occupancy, extent=[-bev_extent, bev_extent, -bev_extent,
                                     bev_extent], origin='lower', cmap='Greys')
    if trajs is not None:
        ax.plot(trajs[:, 0], trajs[:, 1], 'r-o', markersize=2, label='plan')
    ax.plot(gt_traj[:, 0], gt_traj[:, 1], 'g-o', markersize=2, label='GT')
    ax.legend(loc='upper right', fontsize=6)
    ax.set_xlabel('x (m)')
    ax.set_ylabel('y (m)')


def save_eval_panel(output: Dict, labels: Dict, n_present: int, index: int,
                    save_path: str, cfg) -> str:
    """Save one evaluation figure (reference evaluate.py save :171-272)."""
    import os
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    seg_pred = np.asarray(output['segmentation']).argmax(-1)[0, n_present - 1]
    seg_gt = np.asarray(labels['segmentation'])[0, n_present - 1]
    axes[0].imshow(_seg_rgb(seg_gt))
    axes[0].set_title('GT segmentation')
    axes[1].imshow(_seg_rgb(seg_pred))
    axes[1].set_title('pred segmentation')
    gt_traj = np.asarray(labels['gt_trajectory'])[0]
    final = (np.asarray(output['final_traj'])[0]
             if output.get('final_traj') is not None else None)
    plot_planning(axes[2], final, gt_traj,
                  bev_extent=cfg.LIFT.X_BOUND[1])
    axes[2].set_title('planning')
    out = os.path.join(save_path, f'{index:06d}.png')
    fig.tight_layout()
    fig.savefig(out, dpi=100)
    plt.close(fig)
    return out
