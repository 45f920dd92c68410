"""Test harness: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4: multi-device tests without a cluster via
``xla_force_host_platform_device_count``. In this image an `axon` TPU
backend is force-registered by a sitecustomize hook and ignores
``JAX_PLATFORMS`` from the environment, so we must also override the
``jax_platforms`` config *after* import (backends initialise lazily, so
this still takes effect).
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)
# persistent compile cache: full-graph smoke tests recompile in seconds
# (JAX_CACHE_DIR override matches train.py — e.g. point at a fresh dir to
# rule out stale/foreign-host cache entries when chasing numeric diffs)
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/tmp/jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

assert jax.default_backend() == 'cpu', jax.default_backend()
