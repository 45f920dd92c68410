"""Tracing / profiling utilities (SURVEY.md §5).

The reference's only profiling is Lightning's ``profiler='simple'``
(train.py:54). TPU-native replacements:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing
    a TensorBoard-loadable trace (xplane) of device activity;
  * ``start_server(port)`` — live profiling endpoint for
    ``tensorboard --logdir`` capture;
  * ``timed(fn)`` — wall-clock timing with ``block_until_ready`` (the only
    honest way to time async dispatch);
  * ``nan_guard()`` — enables ``jax_debug_nans`` (the analogue of the
    reference README's NaN warning, README.md:53).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


def timed(fn: Callable, *args, n: int = 10, warmup: int = 1, **kwargs) -> Tuple[float, object]:
    """Median wall-clock ms over n calls (device-synchronised)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1000.0)
    times.sort()
    return times[len(times) // 2], out


@contextlib.contextmanager
def nan_guard():
    old = jax.config.jax_debug_nans
    jax.config.update('jax_debug_nans', True)
    try:
        yield
    finally:
        jax.config.update('jax_debug_nans', old)
