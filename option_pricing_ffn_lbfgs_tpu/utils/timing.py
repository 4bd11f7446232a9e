"""Timing and profiling helpers — sync-correct on remote-dispatch backends.

The reference's only observability is coarse ``time.time()`` brackets
(lbfgs_calibrator.py:247,310). Here the problem is harder than it looks:
on a tunneled/remote TPU backend (axon), ``jax.block_until_ready`` can
return after the dispatch is *enqueued*, not after the device finishes
(measured 2026-08-20 on v5e: a single 8192^3 bf16 matmul "timed" at
0.056 ms => an implied 19,665 TFLOP/s, 100x the chip's 197 TFLOP/s peak;
the same matmul chained x20 inside one program times at 147 ms = 149
TFLOP/s, i.e. the real number). Every timer here therefore ends with a
forced device->host fetch of a result element — data cannot be fetched
before it exists, so the fetch is a true barrier — and per-dispatch times
are derived from N back-to-back dispatches divided by N, which amortizes
the fetch round-trip (~20-30 ms on the tunnel) and keeps the device queue
busy. This is the audited protocol behind results/perf_audit.json
(VERDICT r3 item 1: the 0.162 ms-vs-21 ms artifact contradiction was
exactly unsynced launch time vs real compute).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, NamedTuple, Sequence

import numpy as np
import jax


def force_sync(tree) -> float:
    """True device barrier: fetch one element of one output to the host.

    ``jax.block_until_ready`` is NOT sufficient on tunneled backends (see
    module docstring); fetching an output element is — the value cannot
    exist on the host before the program that produces it has run.
    Returns the fetched element as a float (cast-safe dtypes only).
    """
    leaf = jax.tree.leaves(tree)[0]
    return float(np.asarray(jax.device_get(leaf)).ravel()[0])


class Timing(NamedTuple):
    compile_s: float      # first call (trace + compile + run + sync)
    steady_s: float       # per-dispatch steady state (chained protocol)
    runs: list            # per-trial chained estimates


def time_jitted(fn: Callable, *args, repeats: int = 3,
                chain: int = 4, **kwargs) -> Timing:
    """Time a jitted callable with the chained-dispatch protocol.

    First call = compile (plus first run and a forced sync). Steady state:
    ``chain`` back-to-back dispatches ended by a forced fetch, divided by
    ``chain``; median over ``repeats`` trials. With identical args the
    device still executes every dispatch (verified: N chained identical
    matmuls cost N x single-matmul time) — pass fresh inputs via
    ``time_dispatches`` when input-dependent runtime matters (e.g.
    convergence loops).
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    force_sync(out)
    compile_s = time.perf_counter() - t0
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = fn(*args, **kwargs)
        force_sync(out)
        runs.append((time.perf_counter() - t0) / chain)
    runs.sort()
    return Timing(compile_s=compile_s, steady_s=runs[len(runs) // 2],
                  runs=runs)


def time_dispatches(fn: Callable, inputs: Sequence, repeats: int = 3
                    ) -> Timing:
    """Chained-protocol timing over a list of FRESH input tuples.

    ``fn(*inputs[i])`` is dispatched for every i back-to-back, one forced
    fetch at the end; per-dispatch time = total / len(inputs). inputs[0]
    is used for the compile measurement. Fresh inputs rule out any
    result-identity shortcuts and exercise input-dependent convergence.
    """
    t0 = time.perf_counter()
    out = fn(*inputs[0])
    force_sync(out)
    compile_s = time.perf_counter() - t0
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for inp in inputs:
            out = fn(*inp)
        force_sync(out)
        runs.append((time.perf_counter() - t0) / len(inputs))
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
