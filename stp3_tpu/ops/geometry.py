"""Pose / camera / BEV-grid geometry, pure jnp.

Semantics mirror the reference's stp3/utils/geometry.py (pose converters,
BEV grid parameters, frustum construction) but are written as pure,
batched, jit-friendly functions. All functions accept arbitrary leading
batch dims where the reference required explicit loops.

BEV frame convention (single documented frame; SURVEY.md hard-part #3):
  * axis 0 of the BEV grid ("rows") indexes ego-frame X (forward),
  * axis 1 ("cols") indexes ego-frame Y (left/right side),
  * grid cell (i, j) covers x in [x0 + i*dx, ...), computed via
    index = (p - (start - res/2)) / res, like reference stp3.py:287-289.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def posemm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pose-matrix product at fp32 MXU precision.

    TPU matmuls default to bf16 accumulate-fp32; for 3x3/4x4 pose chains
    the ~5e-3 relative error is enough to shift voxel quantization, so all
    pose composition goes through this helper (precision='highest').
    """
    return jnp.matmul(a, b, precision='highest')


# --------------------------------------------------------------------------
# BEV grid parameters (reference geometry.py:40-59, tools.py:176-181)
# --------------------------------------------------------------------------

def calculate_birds_eye_view_parameters(x_bounds, y_bounds, z_bounds):
    """Returns (resolution, start_position, dimension) as numpy arrays.

    Matches reference geometry.py:40-59: start = lower + res/2, dim =
    (upper-lower)/res.
    """
    rows = [x_bounds, y_bounds, z_bounds]
    resolution = np.array([r[2] for r in rows], dtype=np.float32)
    start_position = np.array([r[0] + r[2] / 2.0 for r in rows], dtype=np.float32)
    dimension = np.array([(r[1] - r[0]) / r[2] for r in rows], dtype=np.int64)
    return resolution, start_position, dimension


def gen_dx_bx(xbound, ybound, zbound):
    """Alias matching reference tools.py:176-181 (dx, bx, nx)."""
    dx, bx, nx = calculate_birds_eye_view_parameters(xbound, ybound, zbound)
    return dx, bx, nx


def ego_footprint_grid_pts(ego_width: float, ego_height: float,
                           bx, dx) -> np.ndarray:
    """Ego-vehicle footprint corners in BEV GRID coordinates, (4, 2)
    float64, axes already swapped to (col, row) plot/raster order.

    The single source of the reference's subtle footprint convention
    (metrics.py:298-307, visualisation.py:360-371): +0.5 m longitudinal
    offset (rear-axle to bbox-center shift) on the HEIGHT (length) axis,
    ``(pts - bx) / dx`` grid quantization, then a row/col swap. Consumed
    by PlanningMetric (collision cells), plot_planning_bev and
    save_eval_figure (rasterized ego), which previously hand-copied it.
    """
    bx = np.asarray(bx)[:2]
    dx = np.asarray(dx)[:2]
    h, w = float(ego_height), float(ego_width)
    pts = np.array([[-h / 2.0 + 0.5, w / 2.0], [h / 2.0 + 0.5, w / 2.0],
                    [h / 2.0 + 0.5, -w / 2.0], [-h / 2.0 + 0.5, -w / 2.0]])
    pts = (pts - bx) / dx
    pts[:, [0, 1]] = pts[:, [1, 0]]
    return pts


# --------------------------------------------------------------------------
# Camera frustum & un-projection (reference stp3.py:111-130, :186-201)
# --------------------------------------------------------------------------

def create_frustum(final_dim: Sequence[int], downsample: int, d_bound: Sequence[float]) -> np.ndarray:
    """Image-plane x depth grid -> (D, Hf, Wf, 3) of (u, v, depth).

    u spans [0, W-1] over Wf columns, v spans [0, H-1] over Hf rows,
    depth spans arange(*d_bound); matches reference stp3.py:111-130.
    """
    h, w = final_dim
    hf, wf = h // downsample, w // downsample
    depth_grid = np.arange(*d_bound, dtype=np.float32)          # (D,)
    d = depth_grid.shape[0]
    x = np.linspace(0, w - 1, wf, dtype=np.float32)             # (Wf,)
    y = np.linspace(0, h - 1, hf, dtype=np.float32)             # (Hf,)
    frustum = np.stack(
        [
            np.broadcast_to(x[None, None, :], (d, hf, wf)),
            np.broadcast_to(y[None, :, None], (d, hf, wf)),
            np.broadcast_to(depth_grid[:, None, None], (d, hf, wf)),
        ],
        axis=-1,
    )
    return frustum


def get_geometry(frustum: jnp.ndarray, intrinsics: jnp.ndarray, extrinsics: jnp.ndarray) -> jnp.ndarray:
    """Un-project frustum pixels into the ego frame.

    frustum: (D, Hf, Wf, 3) of (u, v, depth)
    intrinsics: (..., N, 3, 3); extrinsics: (..., N, 4, 4) camera->ego.
    Returns (..., N, D, Hf, Wf, 3) ego-frame points.

    points_cam = depth * K^-1 @ (u, v, 1); points_ego = R @ points_cam + t
    (reference stp3.py:186-201 computes R @ K^-1 @ (u*d, v*d, d)).
    """
    rotation = extrinsics[..., :3, :3]
    translation = extrinsics[..., :3, 3]
    # (u*d, v*d, d)
    points = jnp.concatenate(
        [frustum[..., :2] * frustum[..., 2:3], frustum[..., 2:3]], axis=-1
    )  # (D,Hf,Wf,3)
    combined = posemm(rotation, jnp.linalg.inv(intrinsics))  # (...,N,3,3)
    # batched matvec: (...,N,1,1,1,3,3) @ (D,Hf,Wf,3,1)
    pts = jnp.einsum('...ij,dhwj->...dhwi', combined, points, precision='highest')
    return pts + translation[..., None, None, None, :]


def update_intrinsics(intrinsics: jnp.ndarray, top_crop: float = 0.0, left_crop: float = 0.0,
                      scale_width: float = 1.0, scale_height: float = 1.0) -> jnp.ndarray:
    """Adjust K for resize + crop (reference geometry.py:16-37). Batched."""
    fx = intrinsics[..., 0, 0] * scale_width
    fy = intrinsics[..., 1, 1] * scale_height
    cx = intrinsics[..., 0, 2] * scale_width - left_crop
    cy = intrinsics[..., 1, 2] * scale_height - top_crop
    out = jnp.array(intrinsics)
    out = out.at[..., 0, 0].set(fx)
    out = out.at[..., 1, 1].set(fy)
    out = out.at[..., 0, 2].set(cx)
    out = out.at[..., 1, 2].set(cy)
    return out


# --------------------------------------------------------------------------
# 6-DoF pose vector <-> 4x4 matrix (reference geometry.py:97-193)
# --------------------------------------------------------------------------

def mat2pose_vec(matrix: jnp.ndarray) -> jnp.ndarray:
    """4x4 pose matrix -> (tx, ty, tz, rx, ry, rz); batched (...,4,4)->(...,6)."""
    rotx = jnp.arctan2(-matrix[..., 1, 2], matrix[..., 2, 2])
    cosy = jnp.sqrt(matrix[..., 1, 2] ** 2 + matrix[..., 2, 2] ** 2)
    roty = jnp.arctan2(matrix[..., 0, 2], cosy)
    rotz = jnp.arctan2(-matrix[..., 0, 1], matrix[..., 0, 0])
    rotation = jnp.stack([rotx, roty, rotz], axis=-1)
    translation = matrix[..., :3, 3]
    return jnp.concatenate([translation, rotation], axis=-1)


def euler2mat(angle: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (...,3) -> rotation matrix (...,3,3); R = Rx @ Ry @ Rz
    (reference geometry.py:124-155).

    The product is expanded in closed form rather than multiplying three
    matrices: on TPU the default matmul precision is bf16, which corrupts
    pose matrices by ~5e-3 — enough to shift voxel quantization. Closed
    form keeps everything in fp32 on the VPU and is cheaper anyway.
    """
    x, y, z = angle[..., 0], angle[..., 1], angle[..., 2]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    # R = Rx @ Ry @ Rz, expanded:
    r00 = cy * cz
    r01 = -cy * sz
    r02 = sy
    r10 = cx * sz + sx * sy * cz
    r11 = cx * cz - sx * sy * sz
    r12 = -sx * cy
    r20 = sx * sz - cx * sy * cz
    r21 = sx * cz + cx * sy * sz
    r22 = cx * cy
    return jnp.stack([r00, r01, r02, r10, r11, r12, r20, r21, r22],
                     axis=-1).reshape(*z.shape, 3, 3)


def pose_vec2mat(vec: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) (tx,ty,tz,rx,ry,rz) -> (..., 4, 4) (reference geometry.py:158-172)."""
    translation = vec[..., :3, None]
    rot_mat = euler2mat(vec[..., 3:])
    top = jnp.concatenate([rot_mat, translation], axis=-1)  # (...,3,4)
    bottom = jnp.zeros_like(top[..., :1, :])
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def invert_pose_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid 4x4 pose; batched (reference geometry.py:175-193)."""
    rot_t = jnp.swapaxes(x[..., :3, :3], -1, -2)
    t = x[..., :3, 3:]
    top = jnp.concatenate([rot_t, -posemm(rot_t, t)], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :])
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


# --------------------------------------------------------------------------
# Cumulative ego-motion chains (used by the BEV splat and label warping)
# --------------------------------------------------------------------------

def cumulative_prewarp_transforms(future_egomotion: jnp.ndarray, s: int) -> jnp.ndarray:
    """Transforms that bring each past frame's geometry into the present frame.

    The reference warps past geometry in-place inside the splat loop
    (stp3.py:269-277): after the loop, frame t's points have been multiplied
    by M_{s-2} @ ... @ M_t where M_k = pose_vec2mat(future_egomotion[:, k]).
    We compute those products once.

    future_egomotion: (B, S, 6) with motion from frame k to k+1.
    Returns (B, S, 4, 4); entry t = M_{s-2} @ ... @ M_t, identity for t=s-1.
    """
    mats = pose_vec2mat(future_egomotion)  # (B,S,4,4)
    b = mats.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=mats.dtype), (b, 4, 4))
    out = [eye]  # t = s-1
    cum = eye
    for t in range(s - 2, -1, -1):
        cum = posemm(cum, mats[:, t])
        out.append(cum)
    return jnp.stack(out[::-1], axis=1)
