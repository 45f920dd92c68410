"""Shared trace-time gate for the opt-in pallas kernels.

Every pallas kernel in this package follows the same policy, previously
copy-pasted at each site (round-3 review finding):

  * an env hatch for benchmarks to A/B variants without code edits
    (``<ENV_KEY>=pallas`` forces the kernel ON, ``=off``/``=xla`` forces
    the XLA path; unset in production);
  * otherwise auto = ON only on a **single-device TPU**. pallas custom
    calls neither run on CPU (tests, the multichip dryrun) nor partition
    under GSPMD (sharded multi-chip training) — but inside
    ``jax.shard_map`` each per-shard program is manual single-device
    SPMD where the kernels ARE valid, so shard_map call sites must pick
    an explicit method / force the env instead of relying on 'auto'
    (``parallel/serving.py`` does).
"""
from __future__ import annotations

import os

import jax


def single_device_tpu() -> bool:
    """True iff this process drives exactly one TPU device — the regime
    where the pallas kernels are known-valid and A/B-measured wins."""
    return jax.default_backend() == 'tpu' and jax.device_count() == 1


def single_tpu_auto(env_key: str, *, auto: bool = True) -> bool:
    """The standard gate: env ``pallas`` forces ON, ``off``/``xla``
    forces OFF; otherwise ``auto and single_device_tpu()``. ``auto``
    lets callers narrow the auto regime further (e.g. training traces
    only for the fused ConvNeXt MLP)."""
    env = os.environ.get(env_key, '')
    if env == 'pallas':
        return True
    if env in ('off', 'xla'):
        return False
    return auto and single_device_tpu()
