"""Static-geometry BEV splat for serving (BEVPoolv2-style, TPU-first).

With a fixed camera rig (constant intrinsics/extrinsics — the CARLA agent's
rig, carla_agent.py:136-185, and any production vehicle) the present-frame
point->cell assignment of the lift-splat (reference stp3.py:226-301) is a
pure function of the frustum geometry: it can be precomputed once. The
runtime splat then needs **no scatter, no sort** — it becomes gathers with
static indices, which map far better onto the TPU than scatter-add
(the dynamic path's XLA scatter costs ~13 ms of the serve_step budget;
see CLAUDE.md perf notes).

Two standard tricks compose here (cf. BEVPoolv2, PAPERS.md):

1. **Per-cell contributor lists.** At setup, every BEV cell gets the static
   list of (ray, depth-interval) crossings that land in it. At runtime the
   cell value is a weighted sum of gathered context rows.
2. **Depth-interval prefix sums.** Along a ray, the depth bins that fall in
   one cell are CONSECUTIVE (bins are ordered by distance), so the summed
   depth probability over a run [lo, hi) is a difference of prefix sums:
   sum_d dp[ray, lo:hi] = S[ray, hi] - S[ray, lo]. One cumsum over D
   replaces per-bin accumulation, and the (rays*D)-point problem shrinks to
   the number of distinct (ray, cell) crossings.

Cells are bucketed by crossing count (the distribution is heavy-tailed:
near-ego cells catch hundreds of rays, far cells one or two) so padding
waste stays bounded; each bucket is a dense (m, K) gather + einsum, and the
bucket results are placed with a unique-index set (a permutation, not an
accumulating scatter).

The plan is exact — same voxel quantization as ops.bev_pool.voxelize_coords
— so static and dynamic splats agree to float tolerance (tests/test_static_splat.py).
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stp3_tpu.ops.bev_pool import _ranks, voxelize_coords
from stp3_tpu.ops.geometry import get_geometry


@dataclasses.dataclass(frozen=True)
class SplatBucket:
    """Cells with <= K crossings, padded to K (pad: ray 0, lo == hi -> w=0)."""
    cells: np.ndarray      # (m,)   int32 flat cell ids
    ray: np.ndarray        # (m, K) int32 ray index
    lo: np.ndarray         # (m, K) int32 prefix-sum interval start
    hi: np.ndarray         # (m, K) int32 prefix-sum interval end


@dataclasses.dataclass(frozen=True)
class StaticSplatPlan:
    buckets: Tuple[SplatBucket, ...]
    n_rays: int
    depth_bins: int
    bev_dimension: Tuple[int, int, int]

    @property
    def ncells(self) -> int:
        nx, ny, nz = self.bev_dimension
        return nx * ny * nz

    def device_buckets(self):
        """Bucket arrays as a jax pytree — pass this INTO jitted functions as
        an argument (baking the ~MBs of index constants into the program
        would bloat the remote-compile payload; see CLAUDE.md)."""
        return [(jnp.asarray(b.cells), jnp.asarray(b.ray),
                 jnp.asarray(b.lo), jnp.asarray(b.hi)) for b in self.buckets]


def _rig_runs(frustum, intrinsics, extrinsics, bev_resolution,
              bev_start_position, bev_dimension):
    """Shared plan-build front end: voxelize one rig's frustum and
    run-length-encode consecutive equal cells along each ray.

    Returns (run_cell, run_ray, run_lo, run_hi, (n, d, hf, wf)) where ray
    = n*Hf*Wf + h*Wf + w and [lo, hi) is the depth-bin interval.

    Runs on the host CPU backend: plan building is one-time precompute and
    eager dispatch over a tunneled TPU costs minutes (CLAUDE.md)."""
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        frustum = jnp.asarray(np.asarray(frustum, np.float32))
        k = jnp.asarray(np.asarray(intrinsics, np.float32))[None, None]
        e = jnp.asarray(np.asarray(extrinsics, np.float32))[None, None]
        geometry = get_geometry(frustum, k, e)             # (1,1,N,D,Hf,Wf,3)
        coords, valid = voxelize_coords(geometry, bev_resolution,
                                        bev_start_position, bev_dimension)
        bev_dim = tuple(int(v) for v in np.asarray(bev_dimension))
        ranks = np.asarray(_ranks(coords, valid, np.asarray(bev_dim)))[0, 0]
        valid = np.asarray(valid)[0, 0]                   # (N,D,Hf,Wf)

    n, d, hf, wf = valid.shape
    # ray-major layout: ray = n*Hf*Wf + h*Wf + w, bins along axis 1
    ranks_rd = np.moveaxis(ranks, 1, -1).reshape(n * hf * wf, d)
    valid_rd = np.moveaxis(valid, 1, -1).reshape(n * hf * wf, d)
    ranks_rd = np.where(valid_rd, ranks_rd, -1)

    # vectorised run-length encode of consecutive equal cells along each ray
    # (the flagship rig has ~500k (ray, bin) points — a Python loop here
    # costs minutes of agent startup)
    flat = ranks_rd.reshape(-1)
    total = flat.size
    is_start = np.ones(total, bool)
    is_start[1:] = flat[1:] != flat[:-1]
    is_start[::d] = True                                  # runs never span rays
    start_idx = np.flatnonzero(is_start)
    end_idx = np.append(start_idx[1:], total)
    # a run also ends at the end of its own ray
    end_idx = np.minimum(end_idx, (start_idx // d + 1) * d)
    keep = flat[start_idx] >= 0
    run_cell = flat[start_idx[keep]].astype(np.int64)
    run_ray = (start_idx[keep] // d).astype(np.int32)
    run_lo = (start_idx[keep] % d).astype(np.int32)
    run_hi = run_lo + (end_idx[keep] - start_idx[keep]).astype(np.int32)
    return run_cell, run_ray, run_lo, run_hi, (n, d, hf, wf)


def build_static_splat_plan(frustum, intrinsics, extrinsics, bev_resolution,
                            bev_start_position, bev_dimension,
                            bucket_caps: Sequence[int] = (4, 16, 64, 256, 1024, 8192),
                            ) -> StaticSplatPlan:
    """Precompute the point->cell crossings for ONE camera rig.

    frustum: (D, Hf, Wf, 3); intrinsics: (N, 3, 3); extrinsics: (N, 4, 4).
    Uses the exact dynamic-path functions (get_geometry, voxelize_coords) so
    quantization is identical.
    """
    run_cell, run_ray, run_lo, run_hi, (n, d, hf, wf) = _rig_runs(
        frustum, intrinsics, extrinsics, bev_resolution, bev_start_position,
        bev_dimension)
    bev_dim = tuple(int(v) for v in np.asarray(bev_dimension))

    # group crossings by cell (stable: preserves ray-major order per cell)
    order_x = np.argsort(run_cell, kind='stable')
    cells_u, cell_off, counts = np.unique(
        run_cell[order_x], return_index=True, return_counts=True)

    buckets: List[SplatBucket] = []
    caps = sorted(set(int(c) for c in bucket_caps))
    if counts.max(initial=0) > caps[-1]:
        caps.append(int(counts.max()))
    csort = np.argsort(counts, kind='stable')
    lo_i = 0
    for cap in caps:
        hi_i = np.searchsorted(counts[csort], cap, side='right')
        sel = csort[lo_i:hi_i]
        lo_i = hi_i
        if sel.size == 0:
            continue
        m = sel.size
        cnt = counts[sel]
        ray = np.zeros((m, cap), np.int32)
        lo = np.zeros((m, cap), np.int32)
        hi = np.zeros((m, cap), np.int32)
        # (row, col) of every crossing in the (m, cap) pad, gathered from the
        # cell-sorted crossing list
        rows = np.repeat(np.arange(m), cnt)
        cols = np.arange(cnt.sum()) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        src = order_x[np.concatenate(
            [np.arange(cell_off[c], cell_off[c] + counts[c]) for c in sel])]
        ray[rows, cols] = run_ray[src]
        lo[rows, cols] = run_lo[src]
        hi[rows, cols] = run_hi[src]
        buckets.append(SplatBucket(cells_u[sel].astype(np.int32), ray, lo, hi))

    return StaticSplatPlan(tuple(buckets), n_rays=n * hf * wf, depth_bins=d,
                           bev_dimension=bev_dim)


@dataclasses.dataclass(frozen=True)
class ColumnSplatPlan:
    """Column-collapsed static splat plan (the fast path; see column_splat).

    For a camera with no roll/pitch the ego-frame (x, y) of a frustum point
    depends only on (image column u, depth bin) — every image ROW of a
    column hits the same BEV cell, so the splat reduces over rows with a
    dense per-column matmul before any scatter. The plan below does not
    ASSUME that structure; it just exploits whatever cell-sharing exists:
    per (column b, distinct cell r) it stores a depth-interval [lo, hi) for
    every row h (lo == hi where row h never crosses cell r), giving

        val[b, r, :] = sum_h (S[b, h, hi] - S[b, h, lo]) * ctx[b, h, :]

    with S the depth-probability prefix sum — a (rmax x H) @ (H x C)
    batched matmul on the MXU. Only ncols*rmax rows (~17k at flagship
    scale vs 484k raw frustum points) reach the final sorted segment-sum.
    """
    cells: np.ndarray        # (ncols, rmax) int32, pad rows -> ncells sentinel
    lo: np.ndarray           # (ncols, hf, rmax) int32 prefix-sum interval start
    hi: np.ndarray           # (ncols, hf, rmax) int32 prefix-sum interval end
    n_cams: int
    hf: int
    wf: int
    depth_bins: int
    bev_dimension: Tuple[int, int, int]

    @property
    def ncells(self) -> int:
        nx, ny, nz = self.bev_dimension
        return nx * ny * nz

    def host_arrays(self):
        """NumPy twin of ``device_arrays`` — same pytree, host-resident.
        Use when the leaves will be stacked/re-laid-out before placement
        (parallel/serving.py stacks per-shard plans host-side and ships
        them with ONE sharded device_put; stacking device leaves would
        upload to the default device first and re-transfer)."""
        d = self.depth_bins
        bins = np.arange(d, dtype=np.int32)
        mask = ((bins >= self.lo[..., None]) & (bins < self.hi[..., None]))
        # (ncols, hf, rmax, D) bool; empty slots (lo == hi) are all-False
        flat_cells = self.cells.reshape(-1)
        perm = np.argsort(flat_cells, kind='stable').astype(np.int32)
        return {
            'mask': mask,
            'perm': perm,
            'cells_sorted': flat_cells[perm],
        }

    def device_arrays(self):
        """Index pytree for column_splat — pass INTO jit as an argument
        (don't bake ~MB constants into the program; CLAUDE.md).

        The depth intervals ship as a dense (ncols, hf, rmax, D) 0/1 mask,
        NOT as gatherable lo/hi indices: on TPU a take_along_axis over the
        ~500k (col, row, slot) triples costs ~12 ms (scalar gathers),
        while contracting a dense mask against dp is a ~23 M-MAC einsum
        (~0.5 ms) — the classic gather->matmul trade (measured in
        benchmarks/static_splat_bench.py)."""
        return jax.tree.map(jnp.asarray, self.host_arrays())


def build_column_splat_plan(frustum, intrinsics, extrinsics, bev_resolution,
                            bev_start_position, bev_dimension,
                            ) -> ColumnSplatPlan:
    """Precompute the column-collapsed crossing plan for ONE camera rig.

    Same quantization as the dynamic path (get_geometry + voxelize_coords,
    reference stp3.py:226-301) — exact to float tolerance vs the scatter
    splat (tests/test_static_splat.py)."""
    run_cell, run_ray, run_lo, run_hi, (n, d, hf, wf) = _rig_runs(
        frustum, intrinsics, extrinsics, bev_resolution, bev_start_position,
        bev_dimension)
    ncells = int(np.prod(np.asarray(bev_dimension)))

    col = (run_ray // (hf * wf)) * wf + run_ray % wf        # (n*wf) columns
    h = (run_ray // wf) % hf
    ncols = n * wf

    # distinct cells per column -> slot index r
    key = col.astype(np.int64) * ncells + run_cell
    order = np.argsort(key, kind='stable')
    key_s = key[order]
    new_pair = np.ones(key_s.size, bool)
    new_pair[1:] = key_s[1:] != key_s[:-1]
    pair_id = np.cumsum(new_pair) - 1                       # per sorted run
    pair_col = (key_s[new_pair] // ncells).astype(np.int64)
    pair_cell = (key_s[new_pair] % ncells).astype(np.int64)
    # slot r = rank of the pair within its column
    first_of_col = np.ones(pair_col.size, bool)
    first_of_col[1:] = pair_col[1:] != pair_col[:-1]
    col_start = np.cumsum(first_of_col) - 1
    col_start_idx = np.flatnonzero(first_of_col)
    r_of_pair = np.arange(pair_col.size) - col_start_idx[col_start]
    rmax = int(r_of_pair.max()) + 1 if r_of_pair.size else 1

    cells = np.full((ncols, rmax), ncells, np.int32)        # sentinel pad
    cells[pair_col, r_of_pair] = pair_cell.astype(np.int32)
    lo = np.zeros((ncols, hf, rmax), np.int32)
    hi = np.zeros((ncols, hf, rmax), np.int32)
    rr = r_of_pair[pair_id]                                 # slot per run
    cc = col[order]
    hh = h[order]
    if np.unique(np.stack([cc, hh, rr]), axis=1).shape[1] != cc.size:
        raise ValueError('duplicate (column,row,cell) runs — non-monotone '
                         'ray path should be impossible')
    lo[cc, hh, rr] = run_lo[order]
    hi[cc, hh, rr] = run_hi[order]
    return ColumnSplatPlan(cells, lo, hi, n_cams=n, hf=hf, wf=wf,
                           depth_bins=d,
                           bev_dimension=tuple(int(v) for v in
                                               np.asarray(bev_dimension)))


def pad_column_plan(plan: ColumnSplatPlan, rmax: int) -> ColumnSplatPlan:
    """Pad a plan's per-column slot axis to ``rmax`` (sentinel cells,
    empty lo==hi intervals — padded slots contribute exact zeros and land
    on the segment-sum overflow row). Used to give the per-shard plans of
    a camera-parallel rig (parallel/serving.py) a uniform shape so they
    stack into one shard_map input."""
    extra = rmax - plan.cells.shape[1]
    if extra < 0:
        raise ValueError(f'rmax {rmax} < plan rmax {plan.cells.shape[1]}')
    if extra == 0:
        return plan
    cells = np.pad(plan.cells, ((0, 0), (0, extra)),
                   constant_values=plan.ncells)
    lo = np.pad(plan.lo, ((0, 0), (0, 0), (0, extra)))
    hi = np.pad(plan.hi, ((0, 0), (0, 0), (0, extra)))
    return dataclasses.replace(plan, cells=cells, lo=lo, hi=hi)


def column_splat(ctx: jnp.ndarray, dp: jnp.ndarray, arrays, plan_meta,
                 ) -> jnp.ndarray:
    """Splat one frame with a ColumnSplatPlan.

    ctx: (..., rays, C); dp: (..., rays, D) — ray-major like static_splat
    (ray = n*Hf*Wf + h*Wf + w). arrays: ColumnSplatPlan.device_arrays().
    plan_meta: (n_cams, hf, wf, depth_bins, bev_dimension) static ints.
    Returns (..., nx, ny, nz*C)."""
    n, hf, wf, d, bev_dimension = plan_meta
    nx, ny, nz = bev_dimension
    ncells = nx * ny * nz
    ncols = n * wf
    rmax = arrays['mask'].shape[2]

    def one(ctx2, dp2):
        c = ctx2.shape[-1]
        # ray-major -> column-major (ncols, hf, ...)
        ctx_c = ctx2.reshape(n, hf, wf, c).transpose(0, 2, 1, 3).reshape(
            ncols, hf, c)
        dp_c = dp2.reshape(n, hf, wf, d).transpose(0, 2, 1, 3).reshape(
            ncols, hf, d)
        mask = arrays['mask'].astype(dp_c.dtype)
        w = jnp.einsum('bhrd,bhd->bhr', mask, dp_c)         # (ncols, hf, rmax)
        vals = jnp.einsum('bhr,bhc->brc', w.astype(ctx_c.dtype), ctx_c)
        vals = vals.reshape(ncols * rmax, c)[arrays['perm']]
        out = jax.ops.segment_sum(vals, arrays['cells_sorted'],
                                  num_segments=ncells + 1,
                                  indices_are_sorted=True)[:ncells]
        return out.reshape(nx, ny, nz * c)

    batch_shape = ctx.shape[:-2]
    out = jax.vmap(one)(ctx.reshape((-1,) + ctx.shape[-2:]),
                        dp.reshape((-1,) + dp.shape[-2:]))
    return out.reshape(batch_shape + out.shape[1:])


def static_splat(ctx: jnp.ndarray, dp: jnp.ndarray, buckets,
                 bev_dimension: Tuple[int, int, int]) -> jnp.ndarray:
    """Splat one frame with precomputed crossing buckets.

    ctx: (..., rays, C) per-ray context features (ray = n*Hf*Wf + h*Wf + w);
    dp:  (..., rays, D) depth probabilities (softmaxed, or ones when the
         depth distribution is disabled — matching the uniform-repeat lift);
    buckets: ``StaticSplatPlan.device_buckets()`` (a pytree of index arrays —
         pass through jit as an argument, not a closure constant).
    Returns (..., nx, ny, nz*C).
    """
    nx, ny, nz = bev_dimension
    ncells = nx * ny * nz

    def one(ctx2, dp2):
        c = ctx2.shape[-1]
        s = jnp.concatenate(
            [jnp.zeros_like(dp2[:, :1]), jnp.cumsum(dp2, axis=1)], axis=1)
        out = jnp.zeros((ncells, c), ctx2.dtype)
        for cells, ray, lo, hi in buckets:
            # pointwise 2-index gathers: (m, K) scalars each
            w = (s[ray, hi] - s[ray, lo]).astype(ctx2.dtype)
            vals = jnp.einsum('mk,mkc->mc', w, ctx2[ray])
            out = out.at[cells].set(vals, unique_indices=True,
                                    indices_are_sorted=False)
        return out.reshape(nx, ny, nz * c)

    batch_shape = ctx.shape[:-2]
    ctx2 = ctx.reshape((-1,) + ctx.shape[-2:])
    dp2 = dp.reshape((-1,) + dp.shape[-2:])
    out = jax.vmap(one)(ctx2, dp2)
    return out.reshape(batch_shape + out.shape[1:])
