"""Benchmark: batched multi-start Double Heston calibration on TPU.

Protocol mirrors the reference's headline benchmark
(/root/reference/results/lbfgs_actual_results.json — 5 samples, 15-option
surface, 3 starts, maxiter 300, Apple M1: mean 117.8 s/calibration at
0.0236 % mean relative pricing error):

  * 5-surface problem sets with ground-truth parameters drawn from the
    generator's empirical market ranges (synthetic_generator.py:75-89),
    noiseless prices (the achievable-precision protocol);
  * each problem set is calibrated in ONE jitted device program (vmapped
    multi-start L-BFGS search in f32 + per-start double-float LM polish);
  * TIMING IS THE AUDITED CHAINED PROTOCOL (utils/timing.py): N back-to-back
    dispatches over FRESH problem sets, closed by a forced device->host
    fetch, divided by N. ``jax.block_until_ready`` alone is NOT a barrier on
    the axon tunnel (round-3's 0.162 ms/surface headline was launch latency;
    the audit that established this is results/perf_audit.json).

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
    compile once per machine, ever. The mixed pipeline is float32-only
    XLA end to end (double-float polish, models/double_heston_dd.py),
    whose executables serialize fine."""
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
N_PROBLEM_SETS = 6          # fresh input sets chained per timing trial
TARGET_ERR_PCT = 0.03


def build_problems(dtype, n_sets):
    """n_sets independent 5-surface problems, truth priced at f64 on host.

    Ground-truth prices are benchmark SETUP, not the measured program; they
    come from a CPU-only SUBPROCESS (utils/hostpricer.py) so the TPU
    process stays pure (x64-emulated TPU pricing costs minutes of compile,
    and in-process CPU-backend use degrades subsequent tunnel dispatch)."""
    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.utils.hostpricer import (
        price_truth_subprocess)

    ranges = {  # synthetic_generator.py:75-89
        "v1_0": (0.025, 0.080), "kappa1": (1.5, 4.5), "theta1": (0.025, 0.065),
        "sigma1": (0.20, 0.50), "rho1": (-0.85, -0.40),
        "v2_0": (0.020, 0.070), "kappa2": (0.30, 1.20), "theta2": (0.025, 0.070),
        "sigma2": (0.10, 0.35), "rho2": (-0.70, -0.20),
        "lambda_j": (0.05, 0.25), "mu_j": (-0.08, -0.01), "sigma_j": (0.03, 0.12),
    }
    strikes = np.tile([90.0, 95.0, 100.0, 105.0, 110.0], 3)
    mats = np.repeat([0.25, 0.5, 1.0], 5)
    sets = []
    for i in range(n_sets):
        rng = np.random.default_rng(2026 + i)
        true = np.stack([rng.uniform(lo, hi, N_SURFACES)
                         for lo, hi in ranges.values()], axis=-1)
        prices = price_truth_subprocess(
            true, np.full(N_SURFACES, 100.0), strikes, mats)
        args = jax.device_put((
            jnp.full((N_SURFACES,), 100.0, dtype),
            jnp.asarray(np.broadcast_to(strikes, (N_SURFACES, 15)), dtype),
            jnp.asarray(np.broadcast_to(mats, (N_SURFACES, 15)), dtype),
            jnp.ones((N_SURFACES, 15), bool),
            jnp.asarray(prices, dtype),
            jax.random.split(jax.random.key(i), N_SURFACES)))
        sets.append((args, prices))
    return sets


def run(dtype_name):
    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.calibration.calibrator import (
        calibrate_batch, calibrate_batch_mixed)
    from option_pricing_ffn_lbfgs_tpu.utils.timing import force_sync

    if dtype_name in ("float64", "mixed"):
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64

    sets = build_problems(dtype, N_PROBLEM_SETS)

    if dtype_name == "mixed":
        def go(a):
            return calibrate_batch_mixed(
                a[0], jnp.asarray(0.03, dtype), a[1], a[2], a[3], a[4], a[5],
                n_starts=3)
    else:
        def go(a):
            return calibrate_batch(
                a[0], jnp.asarray(0.03, dtype), a[1], a[2], a[3], a[4], a[5],
                n_starts=3)

    t0 = time.time()
    out = go(sets[0][0])
    force_sync(out.loss)
    compile_s = time.time() - t0

    # Audited steady state: chain all fresh problem sets back-to-back,
    # force-fetch at the end, divide; median of 3 trials.
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        for args, _truth in sets:
            out = go(args)
        force_sync(out.loss)
        runs.append((time.perf_counter() - t0) / len(sets))
    steady_s = float(np.median(runs))

    # Accuracy over every problem set (re-dispatch, fetch full outputs).
    errs = []
    for args, truth in sets:
        model = np.asarray(go(args).model_prices)
        errs.append(np.abs((model - truth) / truth).mean(axis=-1))
    mean_err_pct = float(np.concatenate(errs).mean() * 100.0)
    return {
        "per_surface_s": steady_s / N_SURFACES,
        "steady_s": steady_s,
        "compile_s": compile_s,
        "mean_error_pct": mean_err_pct,
        "dtype": dtype_name,
    }


def compile_probe():
    """Fresh-process compile probe: build the bench shapes, jit the mixed
    pipeline once, print the elapsed seconds. With the persistent XLA
    compilation cache warmed by a prior run, this measures the REAL
    deployment cold-start (trace + cache hits), not a from-scratch
    compile."""
    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.calibration.calibrator import (
        calibrate_batch_mixed)
    from option_pricing_ffn_lbfgs_tpu.utils.timing import force_sync

    jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64
    sets = build_problems(dtype, 1)
    t0 = time.time()
    out = calibrate_batch_mixed(
        sets[0][0][0], jnp.asarray(0.03, dtype), *sets[0][0][1:],
        n_starts=3)
    force_sync(out.loss)
    print(json.dumps({"compile_probe_s": round(time.time() - t0, 2)}))


def _warm_compile_probe_subprocess():
    """Run compile_probe in a FRESH process (same persistent cache dir);
    returns its compile seconds, or None if the probe failed."""
    import subprocess
    import sys
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--compile-probe"],
            capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in reversed(out.stdout.strip().splitlines()):
            if "compile_probe_s" in line:
                return json.loads(line)["compile_probe_s"]
    except Exception:
        pass
    return None


def main():
    _enable_compile_cache()
    r = run("mixed")
    if r["mean_error_pct"] > TARGET_ERR_PCT:
        r = run("float64")
    # Demonstrate the warm-cache deployment path: a fresh process against
    # the now-warm persistent cache (VERDICT r4 item 5 — the honest
    # "compile wall" number is the warm one; cold compiles happen once per
    # machine, ever).
    warm = _warm_compile_probe_subprocess()
    value = r["per_surface_s"]
    payload = {
        "metric": "calibration_wall_clock_per_surface",
        "value": round(value, 6),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / value, 1),
        "mean_error_pct": round(r["mean_error_pct"], 5),
        "baseline_error_pct": BASELINE_ERR_PCT,
        "dtype": r["dtype"],
        "batch": N_SURFACES,
        "n_problem_sets": N_PROBLEM_SETS,
        "timing_protocol": "chained-fresh-inputs+forced-fetch",
        "compile_s": round(r["compile_s"], 2),
    }
    if warm is not None:
        payload["compile_warm_s"] = warm
    print(json.dumps(payload))


if __name__ == "__main__":
    import sys
    if "--compile-probe" in sys.argv:
        _enable_compile_cache()
        compile_probe()
    else:
        main()
