"""Pallas TPU kernel: BEV voxel-pooling scatter-accumulate.

Replaces XLA's generic scatter lowering for the lift-splat hot loop
(reference ``VoxelsSumming``, stp3/utils/geometry.py:299-330): the full
(ncells, C) accumulator lives in VMEM across the whole kernel while point
chunks stream in; each point does one row-accumulate. The backward pass is
just a gather (d feats[p] = g[rank[p]]), wired via custom_vjp — the
reference needed a hand-written backward for the same reason.

Layout: feats (P, C) fp32/bf16, ranks (P,) int32 in [0, ncells]; rank ==
ncells marks invalid points (skipped). ncells * C * 4B must fit VMEM
(200*200*64 fp32 = 10.2 MB on a 16 MB core). Ranks are staged to SMEM as
(chunk/128, 128) blocks to satisfy Mosaic's (8, 128) tiling rules.

Two generations live here. The round-1 v1 kernel (``bev_pool_pallas``)
measured 1.5x faster than XLA standalone but LOST end-to-end: it staged
the whole (P, C) array to fp32 in HBM and ran a branchy per-point loop
with div/mod rank indexing. The round-2 v2 kernel
(``bev_pool_pallas_v2``) fixes all three (bf16 blocks converted in a
VMEM scratch per chunk, branch-free overflow-row accumulate, nested
row/lane rank walk) and WINS both standalone (3.8 vs 6.6 ms per
484k-point frame vs XLA's deg-16 split scatter, ~7.6 cycles/point) and
end-to-end (flagship bench 92.5 -> 85.5 ms), so ``method='auto'``
resolves to 'pallas2' on a single-device TPU backend. Neither kernel
vmaps — batch via a static python loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 8192
_LANE = 128


def _scatter_kernel(ranks_ref, feats_ref, out_ref, *, ncells: int, chunk: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(i, _):
        r = ranks_ref[i // _LANE, i % _LANE]

        @pl.when(r < ncells)
        def _():
            # accumulate fp32 regardless of input dtype: numerically safer
            # AND required — bf16 tiles are (16, 128), so Mosaic cannot do
            # a dynamic single-row bf16 store
            out_ref[pl.ds(r, 1), :] += feats_ref[pl.ds(i, 1), :].astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bev_pool_pallas(feats: jnp.ndarray, ranks: jnp.ndarray, ncells: int) -> jnp.ndarray:
    """feats (P, C); ranks (P,) int32, ncells = invalid marker.
    Returns (ncells, C) scatter-add of valid points."""
    return _forward(feats, ranks, ncells)


def _forward(feats, ranks, ncells):
    in_dtype = feats.dtype
    # stage fp32: dynamic single-row bf16 loads/stores violate Mosaic's
    # (16, 128) bf16 tiling; fp32 rows are supported
    feats = feats.astype(jnp.float32)
    p, c = feats.shape
    # chunk must be a multiple of the 128-lane SMEM row
    chunk = min(_CHUNK, -(-p // _LANE) * _LANE)
    n_chunks = -(-p // chunk)
    pad = n_chunks * chunk - p
    if pad:
        feats = jnp.pad(feats, ((0, pad), (0, 0)))
        ranks = jnp.pad(ranks, (0, pad), constant_values=ncells)
    ranks2d = ranks.reshape(n_chunks * chunk // _LANE, _LANE)
    rows = chunk // _LANE

    out = pl.pallas_call(
        functools.partial(_scatter_kernel, ncells=ncells, chunk=chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((rows, _LANE), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ncells, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncells, c), jnp.float32),
        # the revisited output block is double-buffered by the pipeline, so
        # peak VMEM is ~2x the accumulator + streamed chunks; raise the
        # scoped limit above the 16M default (v5e has 128M VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(ranks2d, feats)
    return out.astype(in_dtype)


# =====================================================================
# v2 scatter: branch-free, bf16 in-kernel staging, no div/mod
# =====================================================================
def _scatter_kernel_v2(ranks_ref, feats_ref, out_ref, scratch_ref, *,
                       rows: int, unroll: int):
    """Differences vs _scatter_kernel (each measured to matter):
      * branch-free: invalid points land on a dedicated overflow row
        (ncells) instead of a per-point @pl.when branch;
      * feats stream in as bf16 HBM blocks and are converted to fp32 in a
        VMEM scratch ONCE per chunk (vectorized) — the old kernel staged
        the whole (P, C) array to fp32 in HBM first, which is exactly the
        HBM traffic the kernel exists to avoid;
      * the rank SMEM walk is a nested (row, lane) loop with the inner
        lane loop unrolled — no integer div/mod per point."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    scratch_ref[...] = feats_ref[...].astype(jnp.float32)

    def row_body(row, _):
        def lane_body(l0, _):
            for u in range(unroll):
                lane = l0 * unroll + u
                r = ranks_ref[row, lane]
                i = row * _LANE + lane
                out_ref[pl.ds(r, 1), :] += scratch_ref[pl.ds(i, 1), :]
            return 0
        jax.lax.fori_loop(0, _LANE // unroll, lane_body, 0)
        return 0

    jax.lax.fori_loop(0, rows, row_body, 0)


def _forward_v2(feats, ranks, ncells, chunk=_CHUNK, unroll=8):
    in_dtype = feats.dtype
    p, c = feats.shape
    chunk = min(chunk, -(-p // _LANE) * _LANE)
    n_chunks = -(-p // chunk)
    pad = n_chunks * chunk - p
    if pad:
        feats = jnp.pad(feats, ((0, pad), (0, 0)))
        ranks = jnp.pad(ranks, (0, pad), constant_values=ncells)
    ranks2d = ranks.reshape(n_chunks * chunk // _LANE, _LANE)
    rows = chunk // _LANE

    out = pl.pallas_call(
        functools.partial(_scatter_kernel_v2, rows=rows, unroll=unroll),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((rows, _LANE), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ncells + 8, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncells + 8, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((chunk, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(ranks2d, feats)
    return out[:ncells].astype(in_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bev_pool_pallas_v2(feats: jnp.ndarray, ranks: jnp.ndarray, ncells: int) -> jnp.ndarray:
    """feats (P, C) bf16/fp32; ranks (P,) int32, ncells = invalid marker.
    Returns (ncells, C) scatter-add of valid points (fp32 accumulation)."""
    return _forward_v2(feats, ranks, ncells)


def _fwd_v2(feats, ranks, ncells):
    return _forward_v2(feats, ranks, ncells), ranks


def _use_pallas_bwd() -> bool:
    """Trace-time choice of the splat backward. Round-3 on-chip A/B: the
    row-gather kernel WINS the train step (498.0 vs 524.5 ms @ batch 2,
    /tmp/tpu_queue4 train_gbwd vs round-2 train_base) — XLA's gather is
    index-bound just like its scatter. Auto ON on a single-device TPU
    (where the pallas forward runs anyway); STP3_SPLAT_BWD=xla/off forces
    the XLA gather, =pallas forces the kernel (e.g. interpret-mode tests)."""
    from stp3_tpu.ops.pallas.gating import single_tpu_auto
    return single_tpu_auto('STP3_SPLAT_BWD')


def _bwd_v2(ncells, ranks, g):
    """d feats[p] = g[rank[p]] (overflow row -> 0)."""
    table = jnp.concatenate([g, jnp.zeros_like(g[:1])], axis=0)
    idx = jnp.clip(ranks, 0, ncells)
    if _use_pallas_bwd():
        return gather_rows_pallas(table, idx), None
    return table[idx], None


bev_pool_pallas_v2.defvjp(_fwd_v2, _bwd_v2)


def _scatter_kernel_v2b(ranks_ref, feats_ref, out_ref, scratch_ref, *,
                        rows: int, unroll: int):
    """Frame-batched variant: grid (F, n_chunks); the accumulator block is
    per-frame (zeroed when the chunk index wraps to 0) and the pipeline
    streams all frames in ONE kernel launch."""
    chunk_idx = pl.program_id(1)

    @pl.when(chunk_idx == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    scratch_ref[...] = feats_ref[...].astype(jnp.float32)

    def row_body(row, _):
        def lane_body(l0, _):
            for u in range(unroll):
                lane = l0 * unroll + u
                r = ranks_ref[0, row, lane]
                i = row * _LANE + lane
                out_ref[0, pl.ds(r, 1), :] += scratch_ref[0, pl.ds(i, 1), :]
            return 0
        jax.lax.fori_loop(0, _LANE // unroll, lane_body, 0)
        return 0

    jax.lax.fori_loop(0, rows, row_body, 0)


def _forward_v2_batched(feats, ranks, ncells, chunk=_CHUNK, unroll=8):
    """feats (F, P, C); ranks (F, P) int32 -> (F, ncells, C)."""
    in_dtype = feats.dtype
    f, p, c = feats.shape
    chunk = min(chunk, -(-p // _LANE) * _LANE)
    n_chunks = -(-p // chunk)
    pad = n_chunks * chunk - p
    if pad:
        feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
        ranks = jnp.pad(ranks, ((0, 0), (0, pad)), constant_values=ncells)
    ranks3d = ranks.reshape(f, n_chunks * chunk // _LANE, _LANE)
    rows = chunk // _LANE

    out = pl.pallas_call(
        functools.partial(_scatter_kernel_v2b, rows=rows, unroll=unroll),
        grid=(f, n_chunks),
        in_specs=[
            pl.BlockSpec((1, rows, _LANE), lambda fi, i: (fi, i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, c), lambda fi, i: (fi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ncells + 8, c), lambda fi, i: (fi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f, ncells + 8, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, chunk, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(ranks3d, feats)
    return out[:, :ncells].astype(in_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bev_pool_pallas_v2_batched(feats, ranks, ncells: int):
    """feats (F, P, C); ranks (F, P) int32 in [0, ncells] (ncells =
    invalid). Returns (F, ncells, C): per-frame scatter-adds in one
    pipelined kernel launch."""
    return _forward_v2_batched(feats, ranks, ncells)


def _fwd_v2b(feats, ranks, ncells):
    return _forward_v2_batched(feats, ranks, ncells), ranks


def _bwd_v2b(ncells, ranks, g):
    """Batched VJP: d feats[f, p] = g[f, rank[f, p]] (overflow row -> 0).
    Same backward choice as the per-frame _bwd_v2 (per-frame row-gather
    kernel launches when the pallas backward is selected)."""
    g_ext = jnp.concatenate([g, jnp.zeros_like(g[:, :1])], axis=1)
    idx = jnp.clip(ranks, 0, ncells)
    if _use_pallas_bwd():
        dfeats = jnp.stack([gather_rows_pallas(g_ext[f], idx[f])
                            for f in range(g.shape[0])])
        return dfeats, None
    dfeats = jnp.take_along_axis(g_ext, idx[..., None], axis=1)
    return dfeats, None


bev_pool_pallas_v2_batched.defvjp(_fwd_v2b, _bwd_v2b)


# =====================================================================
# v2 backward: row gather from a VMEM-resident table
# =====================================================================
def _gather_kernel_v2(ranks_ref, table_ref, out_ref, scratch_ref, *,
                      rows: int, unroll: int):
    """out[i] = table[ranks[i]] — the VJP of the v2 scatter. The (ncells,
    C) cotangent table is VMEM-resident for the whole kernel; each point
    does one dynamic row read + one sequential scratch write, and the
    chunk converts to the output dtype as a single vector op. Mirrors the
    v2 scatter's structure (same reason it beats XLA's index-bound
    gather)."""
    del rows
    scratch_ref  # touched below

    def row_body(row, _):
        def lane_body(l0, _):
            for u in range(unroll):
                lane = l0 * unroll + u
                r = ranks_ref[row, lane]
                i = row * _LANE + lane
                scratch_ref[pl.ds(i, 1), :] = table_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, _LANE // unroll, lane_body, 0)
        return 0

    jax.lax.fori_loop(0, ranks_ref.shape[0], row_body, 0)
    out_ref[...] = scratch_ref[...].astype(out_ref.dtype)


def gather_rows_pallas(table: jnp.ndarray, ranks: jnp.ndarray,
                       out_dtype=None, chunk: int = _CHUNK,
                       unroll: int = 8) -> jnp.ndarray:
    """table (T, C) — rows indexed by ranks (P,) int32 in [0, T).
    Returns (P, C) in out_dtype (default table.dtype). The caller is
    responsible for clipping ranks into range (the splat VJP maps the
    overflow row to zeros by appending a zero row to the cotangent)."""
    out_dtype = out_dtype or table.dtype
    t, c = table.shape
    p = ranks.shape[0]
    table32 = table.astype(jnp.float32)
    chunk = min(chunk, -(-p // _LANE) * _LANE)
    n_chunks = -(-p // chunk)
    pad = n_chunks * chunk - p
    if pad:
        ranks = jnp.pad(ranks, (0, pad))
    ranks2d = ranks.reshape(n_chunks * chunk // _LANE, _LANE)
    rows = chunk // _LANE

    out = pl.pallas_call(
        functools.partial(_gather_kernel_v2, rows=rows, unroll=unroll),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((rows, _LANE), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((t, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks * chunk, c), out_dtype),
        scratch_shapes=[pltpu.VMEM((chunk, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(ranks2d, table32)
    return out[:p]


# =====================================================================
# Fused lift + splat
# =====================================================================
def _lift_scatter_kernel(ranks_ref, rays_ref, dp_ref, ctx_ref, out_ref, *,
                         ncells: int, chunk: int):
    """out[rank[p]] += depth_prob[p] * ctx[ray[p]] — the depth-softmax x
    context outer product (reference stp3.py:214-217) fused into the
    scatter so the (N, D, Hf, Wf, C) lifted tensor never exists."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(i, _):
        r = ranks_ref[i // _LANE, i % _LANE]

        @pl.when(r < ncells)
        def _():
            dp = dp_ref[i // _LANE, i % _LANE]
            ray = rays_ref[i // _LANE, i % _LANE]
            out_ref[pl.ds(r, 1), :] += dp * ctx_ref[pl.ds(ray, 1), :]
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def _lift_splat_forward(ctx, depth_prob, ranks, ray_ids, ncells):
    """ctx (R, C) fp32; depth_prob (P,) fp32; ranks/ray_ids (P,) int32.
    Returns (ncells, C) fp32."""
    p = ranks.shape[0]
    c = ctx.shape[-1]
    chunk = min(_CHUNK, -(-p // _LANE) * _LANE)
    n_chunks = -(-p // chunk)
    pad = n_chunks * chunk - p
    if pad:
        ranks = jnp.pad(ranks, (0, pad), constant_values=ncells)
        ray_ids = jnp.pad(ray_ids, (0, pad))
        depth_prob = jnp.pad(depth_prob, (0, pad))
    shape2d = (n_chunks * chunk // _LANE, _LANE)
    rows = chunk // _LANE

    out = pl.pallas_call(
        functools.partial(_lift_scatter_kernel, ncells=ncells, chunk=chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((rows, _LANE), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, _LANE), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, _LANE), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ctx.shape[0], c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ncells, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncells, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(ranks.reshape(shape2d), ray_ids.reshape(shape2d),
      depth_prob.astype(jnp.float32).reshape(shape2d), ctx.astype(jnp.float32))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lift_splat_pallas(ctx, depth_prob, ranks, ray_ids, ncells):
    """Fused depth-prob x context scatter (see _lift_scatter_kernel).
    ctx (R, C); depth_prob (P,); ranks (P,) int32 in [0, ncells] (ncells =
    invalid); ray_ids (P,) int32 in [0, R). Returns (ncells, C) in
    ctx.dtype."""
    return _lift_splat_forward(ctx, depth_prob, ranks, ray_ids,
                               ncells).astype(ctx.dtype)


def _ls_fwd(ctx, depth_prob, ranks, ray_ids, ncells):
    out = lift_splat_pallas(ctx, depth_prob, ranks, ray_ids, ncells)
    return out, (ctx, depth_prob, ranks, ray_ids)


def _ls_bwd(ncells, res, g):
    ctx, depth_prob, ranks, ray_ids = res
    g = g.astype(jnp.float32)
    g_ext = jnp.concatenate([g, jnp.zeros_like(g[:1])], axis=0)
    g_rows = g_ext[jnp.clip(ranks, 0, ncells)]                   # (P, C)
    valid = (ranks < ncells)[:, None]
    g_rows = jnp.where(valid, g_rows, 0.0)
    # d ctx[r] = sum_{p: ray=r} dp[p] * g[rank[p]]
    d_ctx = jax.ops.segment_sum(depth_prob[:, None].astype(jnp.float32) * g_rows,
                                ray_ids, num_segments=ctx.shape[0])
    # d dp[p] = <g[rank[p]], ctx[ray[p]]>
    d_dp = (g_rows * ctx[ray_ids].astype(jnp.float32)).sum(-1)
    return (d_ctx.astype(ctx.dtype), d_dp.astype(depth_prob.dtype), None, None)


lift_splat_pallas.defvjp(_ls_fwd, _ls_bwd)


def _fwd(feats, ranks, ncells):
    return _forward(feats, ranks, ncells), ranks


def _bwd(ncells, ranks, g):
    # d out[cell] / d feats[p] = 1[rank[p] == cell]; invalid rows read the
    # zero-padded overflow row
    g_ext = jnp.concatenate([g, jnp.zeros_like(g[:1])], axis=0)
    dfeats = g_ext[jnp.clip(ranks, 0, ncells)]
    return dfeats, None


bev_pool_pallas.defvjp(_fwd, _bwd)
