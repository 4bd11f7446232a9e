"""Regenerate the committed results artifacts on real TPU hardware.

Drives compare.py::run_comparison — the reconstruction of the reference's
unshipped benchmark driver — with the committed trained surrogate and
noiseless float64 targets, writing:
  results/lbfgs_actual_results.json
  results/hybrid_actual_results.json
  results/COMPARISON_TABLE.txt

(the artifact set tests/test_results_artifacts.py validates; schema matches
/root/reference/results/*.json).

Usage: python scripts/make_results.py [--n-eval 10]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-eval", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out-dir", default="results")
    ap.add_argument("--surrogate", default="results/models/ffn_surrogate.pkl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    # Persistent compile cache: identical programs compile once per machine.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from option_pricing_ffn_lbfgs_tpu.compare import run_comparison
    from option_pricing_ffn_lbfgs_tpu.data.synthetic import (
        SyntheticDataset, sample_paths, _surface_grid)
    from option_pricing_ffn_lbfgs_tpu.surrogate.train import load_surrogate
    from option_pricing_ffn_lbfgs_tpu.utils.config import GeneratorConfig
    from option_pricing_ffn_lbfgs_tpu.utils.hostpricer import (
        price_truth_subprocess)

    n = args.n_eval
    f32, f64 = jnp.float32, jnp.float64
    cfg = GeneratorConfig(n_samples=n)
    # Parameter/spot paths in f32 on-device (arithmetic only, compiles
    # instantly); targets at f64 from the host subprocess (hostpricer.py
    # explains why neither emulated-f64 nor in-process CPU is acceptable).
    params, spots = sample_paths(jax.random.key(args.seed), cfg, f32)
    rel, mats = _surface_grid(cfg, f32)
    strikes = spots[:, None] * rel[None, :] / 100.0
    b_mats = jnp.broadcast_to(mats, strikes.shape)
    truth = price_truth_subprocess(
        np.asarray(params, np.float64), np.asarray(spots, np.float64),
        np.asarray(strikes, np.float64), np.asarray(b_mats, np.float64),
        rate=cfg.surface.rate)
    model_prices = jnp.asarray(truth, f64)
    ds = SyntheticDataset(
        params=jnp.asarray(params, f64),
        spots=jnp.asarray(spots, f64),
        strikes=jnp.asarray(strikes, f64),
        maturities=jnp.asarray(b_mats, f64),
        model_prices=model_prices,
        market_prices=model_prices,      # noiseless protocol
        losses=jnp.zeros((n,), f64))

    surrogate = load_surrogate(args.surrogate)
    payload = run_comparison(ds, surrogate, n_eval=n,
                             rate=cfg.surface.rate, out_dir=args.out_dir)
    print(json.dumps({
        "ffn_mean_error_pct": payload["ffn"]["mean_error"],
        "lbfgs": payload["lbfgs"]["statistics"],
        "hybrid": payload["hybrid"]["statistics"],
        "lbfgs_batched_s": payload["lbfgs"]["batched"]["time_per_surface"],
        "hybrid_batched_s": payload["hybrid"]["batched"]["time_per_surface"],
    }, indent=1))


if __name__ == "__main__":
    main()
