"""Timing and profiling helpers.

The reference's only observability is coarse ``time.time()`` brackets
(lbfgs_calibrator.py:247,310). Here: block_until_ready-correct timers that
separate compile from steady state, and a jax.profiler trace context for
TPU-level inspection.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, NamedTuple

import jax


class Timing(NamedTuple):
    compile_s: float      # first call (trace + compile + run)
    steady_s: float       # median of subsequent runs
    runs: list


def time_jitted(fn: Callable, *args, repeats: int = 3, **kwargs) -> Timing:
    """Time a jitted callable: first call (compile) vs steady-state median."""
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args, **kwargs))
    compile_s = time.perf_counter() - t0
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return Timing(compile_s=compile_s, steady_s=runs[len(runs) // 2],
                  runs=runs)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_timer():
    """Host wall-clock bracket; read ``.elapsed_s`` after the block."""
    class _T:
        elapsed_s = 0.0
    t = _T()
    t0 = time.perf_counter()
    try:
        yield t
    finally:
        t.elapsed_s = time.perf_counter() - t0
