"""Calibration benchmark on RAW reference-semantics parameter draws.

The headline bench (bench.py) draws ground-truth parameters from the
generator's market ranges with the Feller cap the repo's generator applies
by default. This driver removes that choice entirely: parameters are drawn
uniform from the reference's RAW ranges
(/root/reference/src/data/synthetic_generator.py:75-89, which admit
Feller-violating draws), so the committed error distribution cannot be
accused of distribution shopping (round-1 VERDICT item 10).

Writes results/raw_draws_bench.json with the full per-surface error
distribution and Feller-violation flags.

Usage: python scripts/bench_raw_draws.py [--n 20]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RAW_RANGES = {  # synthetic_generator.py:75-89, verbatim
    "v1_0": (0.025, 0.080), "kappa1": (1.5, 4.5), "theta1": (0.025, 0.065),
    "sigma1": (0.20, 0.50), "rho1": (-0.85, -0.40),
    "v2_0": (0.020, 0.070), "kappa2": (0.30, 1.20), "theta2": (0.025, 0.070),
    "sigma2": (0.10, 0.35), "rho2": (-0.70, -0.20),
    "lambda_j": (0.05, 0.25), "mu_j": (-0.08, -0.01), "sigma_j": (0.03, 0.12),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--seed", type=int, default=404)
    ap.add_argument("--starts", type=int, default=6)
    ap.add_argument("--out", default="results/raw_draws_bench.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from option_pricing_ffn_lbfgs_tpu.calibration.calibrator import (
        calibrate_batch_mixed)
    from option_pricing_ffn_lbfgs_tpu.utils.hostpricer import (
        price_truth_subprocess)

    n = args.n
    rng = np.random.default_rng(args.seed)
    true = np.stack([rng.uniform(lo, hi, n)
                     for lo, hi in RAW_RANGES.values()], axis=-1)
    names = list(RAW_RANGES)
    i = {k: names.index(k) for k in names}
    feller_violated = (
        (true[:, i["sigma1"]] ** 2
         > 2 * true[:, i["kappa1"]] * true[:, i["theta1"]])
        | (true[:, i["sigma2"]] ** 2
           > 2 * true[:, i["kappa2"]] * true[:, i["theta2"]]))

    strikes = np.tile([90.0, 95.0, 100.0, 105.0, 110.0], 3)
    mats = np.repeat([0.25, 0.5, 1.0], 5)
    prices = price_truth_subprocess(true, np.full(n, 100.0),
                                    np.tile(strikes, (n, 1)),
                                    np.tile(mats, (n, 1)))

    f64 = jnp.float64
    spots = jnp.full((n,), 100.0, f64)
    bs = jnp.broadcast_to(jnp.asarray(strikes, f64), (n, 15))
    bm = jnp.broadcast_to(jnp.asarray(mats, f64), (n, 15))
    bc = jnp.ones((n, 15), bool)
    keys = jax.random.split(jax.random.key(args.seed), n)

    go = lambda: calibrate_batch_mixed(
        spots, jnp.asarray(0.03, f64), bs, bm, bc,
        jnp.asarray(prices, f64), keys, n_starts=args.starts)
    t0 = time.time()
    out = jax.block_until_ready(go())
    compile_s = time.time() - t0
    t0 = time.time()
    out = jax.block_until_ready(go())
    steady_s = time.time() - t0

    rel = np.abs((np.asarray(out.model_prices) - prices) / prices)
    per_surface_pct = rel.mean(axis=-1) * 100.0
    payload = {
        "protocol": ("raw reference-range uniform draws, NO Feller "
                     "enforcement (synthetic_generator.py:75-89); "
                     "noiseless f64 targets; mixed-precision calibration, "
                     f"{args.starts} starts"),
        "n_surfaces": n,
        "seed": args.seed,
        "device": str(jax.devices()[0]),
        "per_surface_error_pct": per_surface_pct.tolist(),
        "feller_violated_truth": feller_violated.tolist(),
        "converged": np.asarray(out.converged).tolist(),
        "statistics": {
            "mean_error_pct": float(per_surface_pct.mean()),
            "median_error_pct": float(np.median(per_surface_pct)),
            "p90_error_pct": float(np.percentile(per_surface_pct, 90)),
            "max_error_pct": float(per_surface_pct.max()),
            "mean_error_pct_feller_ok": float(
                per_surface_pct[~feller_violated].mean())
            if (~feller_violated).any() else None,
            "mean_error_pct_feller_violated": float(
                per_surface_pct[feller_violated].mean())
            if feller_violated.any() else None,
            "n_feller_violated": int(feller_violated.sum()),
            "steady_s_per_surface": steady_s / n,
            "compile_s": compile_s,
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload["statistics"], indent=1))


if __name__ == "__main__":
    main()
