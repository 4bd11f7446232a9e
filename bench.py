"""Benchmark: batched multi-start Double Heston calibration on TPU.

Protocol mirrors the reference's headline benchmark
(/root/reference/results/lbfgs_actual_results.json — 5 samples, 15-option
surface, 3 starts, maxiter 300, Apple M1: mean 117.8 s/calibration at
0.0236 % mean relative pricing error):

  * 5 synthetic surfaces with ground-truth parameters drawn from the
    generator's empirical market ranges (synthetic_generator.py:75-89),
    noiseless prices (the achievable-precision protocol);
  * all 5 calibrated in ONE jitted device program (vmapped multi-start
    L-BFGS, autodiff gradients), steady-state timed after a warmup compile;
  * float32 fast path first; if its mean error misses the <=0.03 % target,
    rerun in (TPU-emulated) float64 and report that.

Prints exactly one JSON line:
  {"metric": ..., "value": <s per calibration>, "unit": "s",
   "vs_baseline": <117.8 / value>, ...extras}
"""
import json
import os
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache (disable with BENCH_COMPILE_CACHE=0).

    The production answer to the XLA compile wall: identical programs
    compile once per machine, ever. Round 2 shipped this disabled because
    serializing the huge f64-EMULATED executables stalled the axon tunnel
    indefinitely; the mixed pipeline is now float32-only end to end
    (double-float polish, models/double_heston_dd.py), whose executables
    serialize fine."""
    if os.environ.get("BENCH_COMPILE_CACHE") == "0":
        return
    try:
        import jax
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   "/root/.cache/jax_compilation")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


BASELINE_S = 117.8          # reference mean wall-clock (README.md:16)
BASELINE_ERR_PCT = 0.0236   # reference mean rel. error (README.md:16)
N_SURFACES = 5
TARGET_ERR_PCT = 0.03


def build_problem(dtype):
    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
        DHParams, price_options)

    rng = np.random.default_rng(2026)
    ranges = {  # synthetic_generator.py:75-89
        "v1_0": (0.025, 0.080), "kappa1": (1.5, 4.5), "theta1": (0.025, 0.065),
        "sigma1": (0.20, 0.50), "rho1": (-0.85, -0.40),
        "v2_0": (0.020, 0.070), "kappa2": (0.30, 1.20), "theta2": (0.025, 0.070),
        "sigma2": (0.10, 0.35), "rho2": (-0.70, -0.20),
        "lambda_j": (0.05, 0.25), "mu_j": (-0.08, -0.01), "sigma_j": (0.03, 0.12),
    }
    true = np.stack([rng.uniform(lo, hi, N_SURFACES)
                     for lo, hi in ranges.values()], axis=-1)
    strikes = np.tile([90.0, 95.0, 100.0, 105.0, 110.0], 3)
    mats = np.repeat([0.25, 0.5, 1.0], 5)

    spots = jnp.full((N_SURFACES,), 100.0, dtype)
    bs = jnp.broadcast_to(jnp.asarray(strikes, dtype), (N_SURFACES, 15))
    bm = jnp.broadcast_to(jnp.asarray(mats, dtype), (N_SURFACES, 15))
    bc = jnp.ones((N_SURFACES, 15), bool)
    # Ground-truth prices are benchmark SETUP, not the measured program.
    # They are computed at native float64 in a CPU SUBPROCESS: (a) the same
    # program x64-EMULATED on TPU costs minutes of XLA compile, and (b)
    # touching the CPU backend inside the TPU process degrades every
    # subsequent TPU dispatch ~50-90x on the axon tunnel (measured
    # 2026-08-19: identical search program 2.8 ms vs 106 ms steady with/
    # without prior jax.devices("cpu") use) — the TPU process must stay
    # pure. See option_pricing_ffn_lbfgs_tpu/utils/hostpricer.py.
    from option_pricing_ffn_lbfgs_tpu.utils.hostpricer import (
        price_truth_subprocess)
    prices = jnp.asarray(price_truth_subprocess(
        true, np.full(N_SURFACES, 100.0), strikes, mats), dtype)
    keys = jax.random.split(jax.random.key(0), N_SURFACES)
    return spots, bs, bm, bc, prices, keys


def run(dtype_name):
    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.calibration.calibrator import (
        calibrate_batch, calibrate_batch_mixed)

    if dtype_name in ("float64", "mixed"):
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64

    spots, bs, bm, bc, prices, keys = build_problem(dtype)

    if dtype_name == "mixed":
        def go():
            return calibrate_batch_mixed(spots, jnp.asarray(0.03, dtype), bs,
                                         bm, bc, prices, keys, n_starts=3)
    else:
        def go():
            return calibrate_batch(spots, jnp.asarray(0.03, dtype), bs, bm,
                                   bc, prices, keys, n_starts=3)

    t0 = time.time()
    out = jax.block_until_ready(go())        # compile + first run
    compile_s = time.time() - t0
    # Median of 3 steady-state runs (the axon tunnel occasionally lands a
    # slow dispatch; a single sample is too noisy for the headline).
    runs = []
    for _ in range(3):
        t0 = time.time()
        out = jax.block_until_ready(go())
        runs.append(time.time() - t0)
    steady_s = float(np.median(runs))

    rel = np.abs((np.asarray(out.model_prices) - np.asarray(prices))
                 / np.asarray(prices))
    mean_err_pct = float(rel.mean(axis=-1).mean() * 100.0)
    return {
        "per_surface_s": steady_s / N_SURFACES,
        "steady_s": steady_s,
        "compile_s": compile_s,
        "mean_error_pct": mean_err_pct,
        "iterations": [int(i) for i in np.asarray(out.iterations)],
        "dtype": dtype_name,
    }


def main():
    _enable_compile_cache()
    r = run("mixed")
    if r["mean_error_pct"] > TARGET_ERR_PCT:
        r = run("float64")
    value = r["per_surface_s"]
    print(json.dumps({
        "metric": "calibration_wall_clock_per_surface",
        "value": round(value, 6),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / value, 1),
        "mean_error_pct": round(r["mean_error_pct"], 5),
        "baseline_error_pct": BASELINE_ERR_PCT,
        "dtype": r["dtype"],
        "batch": N_SURFACES,
        "compile_s": round(r["compile_s"], 2),
    }))


if __name__ == "__main__":
    main()
