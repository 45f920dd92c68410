"""Device mesh + sharding helpers — the whole "distributed backend".

The reference's multi-GPU story is Lightning DDP over NCCL
(train.py:43-56); the TPU-native equivalent is a 1-D data mesh with the
batch sharded over it and XLA inserting the gradient psum over ICI
(SURVEY.md §2.5). Multi-host (DCN) attaches via jax.distributed.initialize.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, devices=None) -> Mesh:
    """1-D data-parallel mesh; dp=-1 uses every visible device."""
    devices = devices if devices is not None else jax.devices()
    if dp == -1:
        dp = len(devices)
    return Mesh(np.asarray(devices[:dp]), ('data',))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over 'data', rest replicated."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict on the mesh, batch-dim sharded.

    Falls back to replication when the batch size does not divide the mesh
    (e.g. the final val batch with drop_last=False) — correct, just not
    parallel for that batch."""
    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0] if leaves else 0
    sh = batch_sharding(mesh) if n % mesh.size == 0 else replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def allreduce_host_tree(tree):
    """Sum a host-side additive pytree (metric states) across processes.

    The TPU-native equivalent of Lightning's ``dist_reduce_fx='sum'`` metric
    reduction (reference stp3/metrics.py:32-35): metric states here are host
    numpy int64/float64 accumulators, so the cross-host sum happens once at
    ``compute()`` over DCN (process_allgather), not per update. No-op in
    single-process runs (the sharded val step already covers every device's
    shard on this host)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    def _sum(x):
        gathered = multihost_utils.process_allgather(np.asarray(x))
        return np.asarray(gathered).sum(axis=0)

    return jax.tree.map(_sum, tree)


def maybe_initialize_multihost(cfg) -> None:
    """Multi-host DCN init (no-op single-host; reference has no equivalent —
    Lightning DDP is single-host multi-GPU in all published configs)."""
    if cfg.PARALLEL.MULTIHOST:
        jax.distributed.initialize()
