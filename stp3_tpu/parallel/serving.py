"""Camera-parallel latency sharding for the full-recompute serving path.

The reference has no multi-GPU inference story at all (its serving is one
model per process, carla_agent.py); this module is TPU-native scaling
machinery: when more than one chip is available, the front of the network
— per-camera EfficientNet encode, depth⊗context lift, and BEV splat,
together ~31 ms of the 84 ms single-chip flagship forward
(benchmarks/README.md stage split) — is embarrassingly parallel over the
6 cameras. We shard it over an ICI mesh axis ``'cam'`` with
``jax.shard_map``:

  * each shard encodes and lifts its ``6/k`` cameras and splats them into
    a FULL (200,200,C) grid — the splat scatter-add is linear over
    cameras, and the ego-motion pre-warp + exponential discount
    accumulate are per-frame (camera-independent) linear maps, so the
    per-shard partial grids sum EXACTLY to the single-device result;
  * one ``psum`` over 'cam' merges the partials (rf x 200x200x64 bf16
    ≈ 15 MB over ICI — sub-ms at v5e's 186 GB/s ICI per link);
  * the front-camera context feature the planner needs is selected with
    a global one-hot mask + the same psum (the owning shard contributes
    the feature, the rest zeros);
  * the tail (temporal model -> future prediction -> decoder -> planner)
    is replicated: every chip runs it on the merged grid, so its latency
    is unchanged and no further collectives are needed.

Parity is exact by construction (float reassociation of the scatter sums
aside) and is asserted against the single-device forward in
tests/test_cam_parallel.py on a CPU mesh. Projected flagship latency at
k=3 (2 cams/shard): ~84 - 31*(1-1/3) ≈ 63 ms; at k=6: ~58 ms. NOT
measurable in this environment (one physical chip) — the numbers above
are stage-split arithmetic, not measurements; run
``benchmarks/cam_parallel_bench.py`` on a real multi-chip host.

Both serving modes are covered: ``make_cam_parallel_forward`` shards the
full-recompute forward (all rf frames re-encoded each call) and
``make_cam_parallel_serve_step`` shards the production incremental path
(``STP3.serve_step``: only the present frame is encoded+splatted; past
grids come from the rolling cache).

The TRAINING analogue of this module is ordinary data parallelism
(parallel/mesh.py) — at batch >= 2 sharding the batch is strictly better
than sharding cameras (no psum inside the step). This module exists for
the batch=1 latency-critical closed-loop case.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stp3_tpu.models.stp3 import (STP3, context_depth_rays,
                                  lift_depth_context, lift_uniform)
from stp3_tpu.ops.bev_pool import project_to_birds_eye_view
from stp3_tpu.ops.geometry import (calculate_birds_eye_view_parameters,
                                   create_frustum, get_geometry)


# concrete bev_pool dispatch names (ops/bev_pool.py); 'auto' is NOT one of
# them — it must be resolved here, per-shard, not forwarded (see below)
_KNOWN_SPLAT_METHODS = ('sort', 'scatter', 'pallas', 'pallas2', 'pallas2b')


def _shard_splat_method() -> str:
    """Splat method for the per-shard program. bev_pool's 'auto' keys on
    ``jax.device_count() == 1`` (pallas custom calls have no GSPMD
    partitioning rule), but inside shard_map each shard is a manual
    single-device program where the pallas kernel IS valid — relying on
    'auto' would silently drop to the ~2x-slower XLA scatter on exactly
    the multi-chip hosts this module targets. Honors the same
    STP3_SPLAT_METHOD env hatch as bev_pool, but resolves 'auto' to the
    per-shard default and raises on unknown names instead of letting a
    typo flow into the shard program and silently regress."""
    env = os.environ.get('STP3_SPLAT_METHOD', '')
    if env and env != 'auto':
        if env not in _KNOWN_SPLAT_METHODS:
            raise ValueError(
                f'STP3_SPLAT_METHOD={env!r} is not a known splat method '
                f'{_KNOWN_SPLAT_METHODS}')
        return env
    return 'pallas2b' if jax.default_backend() == 'tpu' else 'scatter'


def _shard_cam_front(cfg, feat_present):
    """Planner front-camera feature under the 'cam' shard axis: the front
    camera is ONE global index (cfg.cam_front_index — already
    CAM_FRONT_PARITY-resolved), so the owning shard contributes its
    present-frame context feature via a global-index one-hot and a psum
    merges (the other shards contribute zeros). feat_present is the
    shard-local present-frame feature (B, nl, Hf, Wf, C). Shared by all
    three shard fronts so the selection cannot drift from the
    single-device path the parity tests compare against."""
    if not cfg.planning_enabled:
        return None
    nl = feat_present.shape[1]
    gidx = lax.axis_index('cam') * nl + jnp.arange(nl)
    mask = (gidx == cfg.cam_front_index).astype(feat_present.dtype)
    return lax.psum(
        jnp.einsum('n,bnhwc->bhwc', mask, feat_present), 'cam')


def cam_mesh(n_shards: int, devices=None) -> Mesh:
    """1-D mesh over the camera axis. n_shards must divide the camera
    count (6 -> 1, 2, 3 or 6 shards). Devices are filtered to a single
    platform (the first device's) so a host exposing mixed backends
    (e.g. a TPU plus host CPU devices) never builds a mesh whose psum
    would cross PCIe or fail at runtime."""
    devices = list(devices) if devices is not None else jax.devices()
    if not devices:
        raise ValueError('no devices')
    platform = devices[0].platform
    devices = [d for d in devices if d.platform == platform]
    if len(devices) < n_shards:
        raise ValueError(f'need {n_shards} {platform} devices, '
                         f'have {len(devices)}')
    return Mesh(np.asarray(devices[:n_shards]), ('cam',))


def make_cam_parallel_forward(model: STP3, mesh: Mesh):
    """Build ``fn(variables, image, K, E, ego) -> output dict`` equal to
    ``model.apply(variables, image, K, E, ego, train=False)`` but with the
    encoder+lift+splat sharded over mesh axis 'cam'.

    image (B, S, N, H, W, 3) with N % mesh.shape['cam'] == 0; the returned
    function is jitted over the mesh.
    """
    c = model.cfg
    n_shards = mesh.shape['cam']
    frustum = create_frustum(c.final_dim, c.encoder_downsample, c.d_bound)
    res, start, dim = calculate_birds_eye_view_parameters(
        list(c.x_bound), list(c.y_bound), list(c.z_bound))

    def _front(variables, image, intrinsics, extrinsics, ego):
        # SHARD-LOCAL shapes: image (B, S, nl, H, W, 3), nl = N / n_shards
        b, s, nl = image.shape[:3]
        flat = image.reshape(b * s * nl, *image.shape[3:])
        feat, depth = model.apply(variables, flat, False,
                                  method=lambda m, x, t: m.encoder(x, t))
        feat = feat.reshape(b, s, nl, *feat.shape[1:])      # (B,S,nl,Hf,Wf,C)

        cam_front = _shard_cam_front(c, feat[:, -1])

        if c.use_depth_distribution:
            depth = depth.reshape(b, s, nl, *depth.shape[1:])  # (B,S,nl,Hf,Wf,D)
            lifted = lift_depth_context(feat, depth)  # shared with encoder_forward
        else:
            lifted = lift_uniform(feat, c.depth_channels)
            depth = None

        geometry = get_geometry(jnp.asarray(frustum), intrinsics, extrinsics)
        x = project_to_birds_eye_view(
            lifted, geometry, ego, res, start, dim, discount=c.discount,
            method=_shard_splat_method())
        # scatter-add is linear over cameras; partial grids sum exactly
        x = lax.psum(x, 'cam')
        return x, depth, cam_front

    front = jax.shard_map(
        _front, mesh=mesh,
        in_specs=(P(), P(None, None, 'cam'), P(None, None, 'cam'),
                  P(None, None, 'cam'), P()),
        out_specs=(P(), P(None, None, 'cam'), P()),
        check_vma=False)  # psum-merged outputs; the splat may be a pallas
    #                       custom call whose replication the checker
    #                       cannot see through

    # replicated boundary sharding: accept arrays committed to any single
    # device (e.g. __graft_entry__._init_flagship puts them on devices[0])
    # and let jit reshard them onto the mesh; the camera split happens
    # inside the shard_map
    rep = NamedSharding(mesh, P())

    @partial(jax.jit, in_shardings=rep)
    def forward(variables, image, intrinsics, extrinsics, ego):
        rf = c.receptive_field
        image, intrinsics = image[:, :rf], intrinsics[:, :rf]
        extrinsics, ego = extrinsics[:, :rf], ego[:, :rf]
        if image.shape[2] % n_shards:
            raise ValueError(f'{image.shape[2]} cameras do not split over '
                             f'{n_shards} shards')
        x, depth, cam_front = front(variables, image, intrinsics,
                                    extrinsics, ego)
        return model.apply(variables, x, depth, cam_front, ego,
                           False, method=STP3.forward_from_bev,
                           rngs=None)

    return forward


def make_cam_parallel_serve_step(model: STP3, mesh: Mesh):
    """``STP3.serve_step`` — the production incremental serving path —
    with the present-frame encoder+lift+splat sharded over mesh axis
    'cam': ``fn(variables, image, K, E, future_egomotion, cached_bev,
    trajs, commands, target_points) -> (refined traj, output dict,
    new cache)``, equal to ``model.apply(..., method=STP3.serve_step)``.

    image (B, N, H, W, 3) is the present frame only. The shard front is
    the single-frame analogue of ``make_cam_parallel_forward``'s: each
    shard encodes + lifts + splats its N/k cameras into a full
    present-frame grid (no ego pre-warp — one frame in its own ego
    frame), one psum merges the partials, and the replicated
    ``STP3._serve_tail`` (cache grid-warp + discount accumulate +
    temporal + future + decode + plan) runs unchanged. The fixed-rig
    ``serve_step_static`` variant is sharded by
    ``make_cam_parallel_serve_step_static`` (per-shard column plans)."""
    c = model.cfg
    n_shards = mesh.shape['cam']
    frustum = create_frustum(c.final_dim, c.encoder_downsample, c.d_bound)
    res, start, dim = calculate_birds_eye_view_parameters(
        list(c.x_bound), list(c.y_bound), list(c.z_bound))

    def _front(variables, image, intrinsics, extrinsics):
        # SHARD-LOCAL shapes: image (B, nl, H, W, 3), nl = N / n_shards
        b, nl = image.shape[:2]
        flat = image.reshape(b * nl, *image.shape[2:])
        feat, depth = model.apply(variables, flat, False,
                                  method=lambda m, x, t: m.encoder(x, t))
        feat = feat.reshape(b, nl, *feat.shape[1:])          # (B,nl,Hf,Wf,C)

        cam_front = _shard_cam_front(c, feat)

        if c.use_depth_distribution:
            depth = depth.reshape(b, nl, *depth.shape[1:])
            lifted = lift_depth_context(feat, depth)         # (B,nl,D,Hf,Wf,C)
        else:
            lifted = lift_uniform(feat, c.depth_channels)

        geometry = get_geometry(jnp.asarray(frustum),
                                intrinsics[:, None], extrinsics[:, None])
        zero_ego = jnp.zeros((b, 1, 6), lifted.dtype)
        bev = project_to_birds_eye_view(
            lifted[:, None], geometry, zero_ego, res, start, dim,
            discount=c.discount, method=_shard_splat_method())[:, 0]
        return lax.psum(bev, 'cam'), cam_front

    front = jax.shard_map(
        _front, mesh=mesh,
        in_specs=(P(), P(None, 'cam'), P(None, 'cam'), P(None, 'cam')),
        out_specs=(P(), P()),
        check_vma=False)

    rep = NamedSharding(mesh, P())

    @partial(jax.jit, in_shardings=rep)
    def serve(variables, image, intrinsics, extrinsics, future_egomotion,
              cached_bev, trajs, commands, target_points):
        if image.shape[1] % n_shards:
            raise ValueError(f'{image.shape[1]} cameras do not split over '
                             f'{n_shards} shards')
        bev_new, cam_front = front(variables, image, intrinsics, extrinsics)
        return model.apply(variables, bev_new, cam_front, cached_bev,
                           future_egomotion, trajs, commands, target_points,
                           train=False, method=STP3._serve_tail)

    return serve


def make_cam_parallel_serve_step_static(model: STP3, mesh: Mesh,
                                        intrinsics, extrinsics):
    """``STP3.serve_step_static`` — the FASTEST serving path (fixed-rig
    column splat, 73.1 ms single-chip) — with the present-frame
    encoder+lift+splat sharded over mesh axis 'cam'.

    intrinsics (N, 3, 3) / extrinsics (N, 4, 4): the FIXED rig (host
    numpy), frozen into per-shard column splat plans at build time — one
    ``build_column_splat_plan`` per shard over that shard's N/k cameras,
    padded to a common slot width so the plans stack into one sharded
    shard_map operand. Each shard splats its cameras into a full
    (nx,ny,C) grid (the column plan's segment-sum is linear over
    cameras), one psum merges the partials, and the replicated
    ``STP3._serve_tail`` runs unchanged.

    Returns ``fn(variables, image, future_egomotion, cached_bev, trajs,
    commands, target_points) -> (refined traj, output dict, new cache)``
    equal to ``model.apply(..., plan, method=STP3.serve_step_static)``
    with the whole-rig plan (float reassociation of the psum aside;
    exact-parity tested on the CPU mesh, tests/test_cam_parallel.py)."""
    from stp3_tpu.ops.static_splat import (build_column_splat_plan,
                                           column_splat, pad_column_plan)
    c = model.cfg
    n_shards = mesh.shape['cam']
    intrinsics = np.asarray(intrinsics)
    extrinsics = np.asarray(extrinsics)
    n = intrinsics.shape[0]
    if n % n_shards:
        raise ValueError(f'{n} cameras do not split over {n_shards} shards')
    nl = n // n_shards
    frustum = create_frustum(c.final_dim, c.encoder_downsample, c.d_bound)
    res, start, dim = calculate_birds_eye_view_parameters(
        list(c.x_bound), list(c.y_bound), list(c.z_bound))
    bev_dim = (int(dim[0]), int(dim[1]), int(dim[2]))
    _, hf, wf = np.asarray(frustum).shape[:3]

    # one plan per shard over ITS cameras (host-side precompute), padded
    # to a uniform slot width and stacked on a leading 'cam' axis
    plans = [build_column_splat_plan(
        frustum, intrinsics[i * nl:(i + 1) * nl],
        extrinsics[i * nl:(i + 1) * nl], res, start, dim)
        for i in range(n_shards)]
    rmax = max(p.cells.shape[1] for p in plans)
    # stack HOST-side and place with one sharded device_put: stacking
    # device leaves would upload each multi-MB mask to the default
    # device, dispatch the stack remotely, then re-transfer to the mesh
    # layout (CLAUDE.md: keep one-time plan precompute off the tunnel)
    arrays = [pad_column_plan(p, rmax).host_arrays() for p in plans]
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *arrays)
    plan_sharded = jax.device_put(stacked, NamedSharding(mesh, P('cam')))

    def _front(variables, image, plan_arrays):
        # SHARD-LOCAL: image (B, nl, H, W, 3); plan leaves (1, ...)
        plan_arrays = jax.tree.map(lambda x: x[0], plan_arrays)
        b, nl_ = image.shape[:2]
        flat = image.reshape(b * nl_, *image.shape[2:])
        feat, depth = model.apply(variables, flat, False,
                                  method=lambda m, x, t: m.encoder(x, t))
        feat = feat.reshape(b, nl_, *feat.shape[1:])         # (B,nl,Hf,Wf,C)

        cam_front = _shard_cam_front(c, feat)

        # ray-major context + depth distribution, shared with the
        # single-device static path (models/stp3.py) so they cannot drift
        ctx, dp = context_depth_rays(c, feat, depth)
        bev = column_splat(ctx, dp, plan_arrays,
                           (nl_, hf, wf, c.depth_channels, bev_dim))
        return lax.psum(bev, 'cam'), cam_front

    front = jax.shard_map(
        _front, mesh=mesh,
        in_specs=(P(), P(None, 'cam'), P('cam')),
        out_specs=(P(), P()),
        check_vma=False)

    rep = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(rep,) * 7 + (NamedSharding(mesh, P('cam')),))
    def _serve(variables, image, future_egomotion, cached_bev, trajs,
               commands, target_points, plan_arrays):
        bev_new, cam_front = front(variables, image, plan_arrays)
        return model.apply(variables, bev_new, cam_front, cached_bev,
                           future_egomotion, trajs, commands, target_points,
                           train=False, method=STP3._serve_tail)

    def serve(variables, image, future_egomotion, cached_bev, trajs,
              commands, target_points):
        return _serve(variables, image, future_egomotion, cached_bev,
                      trajs, commands, target_points, plan_sharded)

    return serve


def make_cam_parallel_plan_step(model: STP3, mesh: Mesh):
    """The bench.py plan_step (forward -> occupancy -> planner) with the
    camera-parallel forward: ``fn(variables, image, K, E, ego, trajs,
    gt_trajs, commands, target_points) -> refined traj``."""
    c = model.cfg
    forward = make_cam_parallel_forward(model, mesh)
    rep = NamedSharding(mesh, P())

    @partial(jax.jit, in_shardings=rep)
    def plan_step(variables, image, intrinsics, extrinsics, ego,
                  trajs, gt_trajs, commands, target_points):
        out = forward(variables, image, intrinsics, extrinsics, ego)
        rf = c.receptive_field
        occupancy = out['segmentation'].argmax(-1)
        if c.predict_pedestrian:  # head is None when disabled (Perception cfg)
            occupancy = jnp.logical_or(occupancy,
                                       out['pedestrian'].argmax(-1))
        occupancy = occupancy.astype(jnp.float32)
        _, traj = model.apply(variables, out['cam_front'], trajs, gt_trajs,
                              out['costvolume'][:, rf:], occupancy[:, rf:],
                              out['hdmap'], commands, target_points,
                              train=False, method=STP3.plan)
        return traj

    return plan_step
