"""Phase-wise compile/runtime breakdown of the benchmark program (VERDICT r2
weak #1): measures XLA compile seconds and steady-state runtime SEPARATELY
for each phase of the mixed-precision calibration so every wall-clock claim
in the repo traces to a committed artifact (results/compile_breakdown.json).

Phases measured (AOT: .lower() then .compile(), so compile time is isolated
from tracing and from the first execution):
  f32_search      — calibrate_batch: vmapped multi-start Wolfe L-BFGS, f32
  polish_lm_dd    — _polish_batch_lm with the double-float residual (default)
  polish_lm_native— _polish_batch_lm with f64-emulated residuals
  polish_lbfgs_f64— _polish_batch (round-1 behavior, Wolfe L-BFGS in f64)

Usage: python scripts/profile_compile.py [--batch 5] [--skip slow]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--out", default="results/compile_breakdown.json")
    ap.add_argument("--skip-slow", action="store_true",
                    help="skip the known-slow f64-emulated phases")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)

    from option_pricing_ffn_lbfgs_tpu.calibration.calibrator import (
        POLISH_LM, POLISH_LBFGS, _polish_batch, _polish_batch_lm,
        calibrate_batch)
    from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
        DHParams, price_options)
    from option_pricing_ffn_lbfgs_tpu.utils.config import CalibrationConfig

    B = args.batch
    f32, f64 = jnp.float32, jnp.float64
    config = CalibrationConfig()

    rng = np.random.default_rng(2026)
    ranges = [(0.025, 0.080), (1.5, 4.5), (0.025, 0.065), (0.20, 0.50),
              (-0.85, -0.40), (0.020, 0.070), (0.30, 1.20), (0.025, 0.070),
              (0.10, 0.35), (-0.70, -0.20), (0.05, 0.25), (-0.08, -0.01),
              (0.03, 0.12)]
    true = np.stack([rng.uniform(lo, hi, B) for lo, hi in ranges], axis=-1)
    strikes = np.tile([90.0, 95.0, 100.0, 105.0, 110.0], 3)
    mats = np.repeat([0.25, 0.5, 1.0], 5)

    spots64 = jnp.full((B,), 100.0, f64)
    bs64 = jnp.broadcast_to(jnp.asarray(strikes, f64), (B, 15))
    bm64 = jnp.broadcast_to(jnp.asarray(mats, f64), (B, 15))
    bc = jnp.ones((B, 15), bool)
    # Setup pricing on host CPU (native f64) — not part of what we measure.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        prices64 = jax.device_put(np.asarray(jax.jit(jax.vmap(
            lambda s, v: price_options(DHParams.from_vector(v), s, 0.03,
                                       jnp.asarray(strikes, f64),
                                       jnp.asarray(mats, f64),
                                       jnp.ones(15, bool))))(
            jax.device_put(spots64, cpu),
            jax.device_put(jnp.asarray(true, f64), cpu))))
    keys = jax.random.split(jax.random.key(0), B)
    x0 = jnp.zeros((B, 13), f64) - 1.0  # placeholder warm starts for polish

    def measure(name, fn, example_args, n_runs=3):
        t0 = time.perf_counter()
        lowered = fn.lower(*example_args)
        trace_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = jax.block_until_ready(compiled(*example_args))
        first_run_s = time.perf_counter() - t0
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            out = jax.block_until_ready(compiled(*example_args))
            runs.append(time.perf_counter() - t0)
        try:
            hlo_ops = lowered.as_text().count("\n")
        except Exception:
            hlo_ops = -1
        rec = dict(trace_s=round(trace_s, 3), compile_s=round(compile_s, 3),
                   first_run_s=round(first_run_s, 4),
                   steady_s=round(float(np.median(runs)), 5),
                   stablehlo_lines=hlo_ops)
        print(f"{name}: {json.dumps(rec)}", flush=True)
        return rec

    results = {"batch": B, "device": str(jax.devices()[0])}

    # Phase 1: f32 multi-start search
    a32 = (spots64.astype(f32), jnp.asarray(0.03, f32), bs64.astype(f32),
           bm64.astype(f32), bc, prices64.astype(f32), keys)
    fn = jax.jit(lambda s, r, k, m, c, p, ky: calibrate_batch(
        s, r, k, m, c, p, ky, config, 3))
    results["f32_search"] = measure("f32_search", fn, a32)
    x0 = jnp.asarray(fn(*a32).x, f64)

    # Phase 2a: LM polish with DD residuals (default)
    fn = jax.jit(lambda s, k, m, c, p, x: _polish_batch_lm(
        s, jnp.asarray(0.03, f64), k, m, c, p, x, config, POLISH_LM))
    a64 = (spots64, bs64, bm64, bc, prices64, x0)
    results["polish_lm_dd"] = measure("polish_lm_dd", fn, a64)

    if not args.skip_slow:
        # Phase 2b: LM polish with native f64-emulated residuals
        nat = dataclasses.replace(POLISH_LM, residual_impl="native")
        fn = jax.jit(lambda s, k, m, c, p, x: _polish_batch_lm(
            s, jnp.asarray(0.03, f64), k, m, c, p, x, config, nat))
        results["polish_lm_native"] = measure("polish_lm_native", fn, a64)

        # Phase 2c: round-1 Wolfe L-BFGS f64 polish
        fn = jax.jit(lambda s, k, m, c, p, x: _polish_batch(
            s, jnp.asarray(0.03, f64), k, m, c, p, x, config, POLISH_LBFGS))
        results["polish_lbfgs_f64"] = measure("polish_lbfgs_f64", fn, a64)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"written {args.out}", flush=True)


if __name__ == "__main__":
    main()
