"""Device mesh + sharding helpers — the whole "distributed backend".

The reference's multi-GPU story is Lightning DDP over NCCL
(train.py:43-56); the TPU-native equivalent is a 1-D data mesh with the
batch sharded over it and XLA inserting the gradient psum over ICI
(SURVEY.md §2.5). Multi-host (DCN) attaches via jax.distributed.initialize.
"""
from __future__ import annotations

from typing import Optional

import os

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

    Single-process: a plain ``device_put``, falling back to replication
    when the batch size does not divide the mesh (e.g. the final val
    batch with drop_last=False) — correct, just not parallel for that
    batch.

    Multi-process: each process holds only ITS slice of the global batch
    (the dataloader's rank/world split, ``datas/synthetic.NumpyLoader``),
    so the global array is assembled with
    ``jax.make_array_from_process_local_data`` — a plain ``device_put``
    onto a global-mesh sharding would require data for devices this
    process cannot address. The loaders pad every process to equal full
    batches, so the global batch always divides the mesh; a mismatch
    here is a wiring bug and raises."""
    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0] if leaves else 0
    if jax.process_count() > 1:
        gn = n * jax.process_count()
        if gn % mesh.size:
            raise ValueError(
                f'global batch {gn} ({n}/process x {jax.process_count()} '
                f'processes) does not divide the {mesh.size}-device mesh; '
                f'use a per-process BATCHSIZE divisible by '
                f'{mesh.size // jax.process_count()} local devices')
        sh = batch_sharding(mesh)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    sh = batch_sharding(mesh) if n % mesh.size == 0 else replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2):
    """Wrap a host-batch iterator so ``shard_batch`` (and its
    host->device transfer) runs in a background thread, ``size`` batches
    ahead of the consumer.

    TPU-first input pipeline: a synchronous ``device_put`` on the train
    loop's critical path serialises transfer behind compute; prefetching
    overlaps them (the JAX analogue of torch DataLoader's
    ``pin_memory`` + async ``.cuda()``; flax's ``prefetch_to_device``
    pattern). ``size=2`` is enough — one batch transferring while one
    waits; deeper queues only add host RAM pressure (each slot pins a
    full device-resident batch).

    Exceptions from the loader/transfer are re-raised at the consuming
    ``next()``. Closing the generator early (``.close()`` / GC) stops
    the producer thread promptly via a poisoned slot handshake.

    ``size=0`` degrades to a synchronous pass-through (shard_batch on the
    caller's thread, no producer thread) — see ``default_prefetch_size``
    for when that is the right call.
    """
    if size <= 0:
        for batch in iterator:
            yield shard_batch(batch, mesh)
        return

    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(size, 1))
    done = object()
    stop = threading.Event()
    err: list = []

    def producer():
        try:
            for batch in iterator:
                item = shard_batch(batch, mesh)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:       # noqa: BLE001 — re-raised below
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(done, timeout=0.5)
                    break
                except queue.Full:
                    continue

    thread = threading.Thread(target=producer, daemon=True,
                              name='stp3-device-prefetch')
    thread.start()
    try:
        while True:
            item = q.get()
            if item is done:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def default_prefetch_size() -> int:
    """Device-prefetch depth for training loops: 0 (synchronous
    pass-through) unless ``STP3_DEVICE_PREFETCH=<n>`` opts in.

    Default-off-until-measured (round-5 posture): the only measurement
    of the prefetch thread is a REGRESSION — round-4
    sustained_train_bench @ batch 2 on the 1-vCPU container showed the
    background device_put thread STEALS the only core from the loader's
    sample-generation threads (808.6 ms/step with prefetch vs 601.6
    without). The multi-core case (where the producer thread would run
    on a spare core and the transfer overlap would be free) has never
    been measured — no multi-core TPU-attached host is reachable from
    this environment — so auto-enabling it there would put training on
    an unbenchmarked code path. When such a host exists: run
    ``benchmarks/sustained_train_bench.py`` with
    ``STP3_DEVICE_PREFETCH=2`` vs ``0`` and flip this default if 2 wins.
    """
    env = os.environ.get('STP3_DEVICE_PREFETCH')
    if env is not None:
        return int(env)
    return 0


def is_main_process() -> bool:
    """True on the process that owns side effects (checkpoint writes,
    TensorBoard, the `best` pointer) — Lightning's rank-0 convention."""
    return jax.process_index() == 0


def host_value(x) -> np.ndarray:
    """Host numpy view of a REPLICATED (or addressable) array. In a
    multi-process run, jax.Arrays on the global mesh are not fully
    addressable and ``np.asarray``/``float()`` on them raise; every
    process holds a full copy of replicated values, so local shard 0 IS
    the value."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.asarray(x.addressable_data(0))
    return np.asarray(x)


def host_tree(tree):
    """``host_value`` over a pytree — used to turn the (replicated)
    train state into plain numpy before a process-0-only checkpoint
    write."""
    return jax.tree.map(host_value, tree)


def _coordination_client():
    """The jax distributed-coordination-service client, or None when the
    private API it lives behind is unavailable (``jax._src.distributed``
    has no stability guarantee across JAX upgrades — feature-detect, do
    not crash the multi-process path on an import error)."""
    try:
        from jax._src import distributed
        client = distributed.global_state.client
    except Exception:
        return None
    return client


def coordination_barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """Cross-process barrier over the coordination service (gRPC) — NOT a
    device collective. Safe to call when processes are MINUTES apart:
    a gloo/ICI collective's pair connect times out (~30 s) if one process
    dispatches while another is still compiling, which is exactly the
    skew around big-program compilation this barrier exists to absorb
    (tests/test_multiprocess.py found the failure). No-op single-process.

    Fallback when the private coordination client is unavailable (JAX
    upgrade moved ``jax._src.distributed``):
    ``multihost_utils.sync_global_devices`` — public API, but a DEVICE
    collective, so it only tolerates the collective-transport connect
    window (~30 s of skew) instead of ``timeout_ms``. Better a barrier
    with a shorter fuse than an ImportError at train start."""
    if jax.process_count() == 1:
        return
    client = _coordination_client()
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def broadcast_string(s: str, maxlen: int = 512) -> str:
    """Process-0's string on every process (run-directory names must be
    identical across processes or cooperative Orbax saves write to
    different paths). No-op single-process."""
    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils
    buf = np.zeros(maxlen + 8, np.uint8)
    b = s.encode()
    if len(b) > maxlen:
        raise ValueError(f'string longer than {maxlen} bytes')
    buf[:8] = np.frombuffer(np.int64(len(b)).tobytes(), np.uint8)
    buf[8:8 + len(b)] = np.frombuffer(b, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    n = int(np.frombuffer(out[:8].tobytes(), np.int64)[0])
    return bytes(out[8:8 + n]).decode()


def process_local(x) -> np.ndarray:
    """Host numpy view of THIS process's rows of a batch-dim-sharded
    global array (or the full value for replicated/addressable arrays).
    Used by the val path so each process updates its metric accumulators
    from its own batch slice; ``allreduce_host_tree`` sums the
    accumulators at ``compute()``."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    shards = x.addressable_shards
    starts = {None if not s.index else (s.index[0].start or 0) for s in shards}
    if len(starts) == 1:          # replicated across local devices
        return np.asarray(shards[0].data)
    ordered = sorted(shards, key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in ordered], axis=0)


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
    """Multi-host DCN init (no-op single-host; the reference's analogue is
    Lightning spawning one DDP process per GPU, reference train.py:43-56).

    On TPU pods / managed clusters ``jax.distributed.initialize()``
    auto-detects the coordinator. For manual launches (and the 2-process
    CPU integration test, tests/test_multiprocess.py) the coordinator is
    passed via env: STP3_COORDINATOR_ADDRESS, STP3_NUM_PROCESSES,
    STP3_PROCESS_ID."""
    if cfg.PARALLEL.MULTIHOST:
        import os
        kw = {}
        addr = os.environ.get('STP3_COORDINATOR_ADDRESS')
        if addr:
            kw = dict(coordinator_address=addr,
                      num_processes=int(os.environ['STP3_NUM_PROCESSES']),
                      process_id=int(os.environ['STP3_PROCESS_ID']))
        jax.distributed.initialize(**kw)
