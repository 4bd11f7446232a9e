"""Throughput scaling benchmark: surfaces/sec vs batch size on one chip.

Complements bench.py (which measures the reference's 5-surface protocol).
Sweeps the surface-batch size for the f32 fast path and the mixed-precision
path, printing a JSON line per config:
  {"batch": B, "mode": "f32"|"mixed", "surfaces_per_s": ..., "ms_per_surface": ...}

Timing uses the audited chained-fresh-inputs + forced-fetch protocol
(utils/timing.py — jax.block_until_ready is not a barrier on the axon
tunnel; see results/perf_audit.json).

Usage: python bench_scaling.py [--batches 8,64,256,1024] [--modes f32,mixed]
"""
import argparse
import json

import numpy as np


def build(b, seed, dtype):
    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.data.synthetic import sample_paths
    from option_pricing_ffn_lbfgs_tpu.utils.config import GeneratorConfig
    from option_pricing_ffn_lbfgs_tpu.utils.hostpricer import (
        price_truth_subprocess)

    cfg = GeneratorConfig(n_samples=b)
    params, spots = sample_paths(jax.random.key(seed), cfg, dtype)
    strikes = spots[:, None] * jnp.asarray(
        np.tile([90.0, 95.0, 100.0, 105.0, 110.0], 3), dtype)[None, :] / 100.0
    mats = jnp.broadcast_to(
        jnp.asarray(np.repeat([0.25, 0.5, 1.0], 5), dtype), strikes.shape)
    is_call = jnp.ones_like(strikes, bool)
    # Noiseless f64 targets from the host subprocess (see hostpricer.py —
    # neither x64-emulated TPU pricing nor in-process CPU-backend use is
    # acceptable in the measured TPU process).
    prices = jnp.asarray(price_truth_subprocess(
        np.asarray(params, np.float64), np.asarray(spots, np.float64),
        np.asarray(strikes, np.float64), np.asarray(mats, np.float64)),
        dtype)
    keys = jax.random.split(jax.random.key(seed + 1), b)
    return jax.device_put((spots, strikes, mats, is_call, prices, keys))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,64,256,1024")
    ap.add_argument("--modes", default="f32,mixed")
    ap.add_argument("--starts", type=int, default=3)
    ap.add_argument("--sets", type=int, default=3,
                    help="fresh input sets chained per timing trial")
    ap.add_argument("--search-impl", default=None,
                    help="override CalibrationConfig.search_impl")
    ap.add_argument("--polish-impl", default=None,
                    help="override CalibrationConfig.polish_impl")
    ap.add_argument("--out", default=None,
                    help="optional JSON file (e.g. results/scaling.json)")
    args = ap.parse_args()

    from bench import _enable_compile_cache
    _enable_compile_cache()
    import dataclasses
    import jax
    import jax.numpy as jnp
    modes = args.modes.split(",")
    if "mixed" in modes:
        jax.config.update("jax_enable_x64", True)
    from option_pricing_ffn_lbfgs_tpu.calibration.calibrator import (
        calibrate_batch, calibrate_batch_mixed)
    from option_pricing_ffn_lbfgs_tpu.utils.config import CalibrationConfig
    from option_pricing_ffn_lbfgs_tpu.utils.timing import time_dispatches

    cfg = CalibrationConfig()
    if args.search_impl:
        cfg = dataclasses.replace(cfg, search_impl=args.search_impl)
    if args.polish_impl:
        cfg = dataclasses.replace(cfg, polish_impl=args.polish_impl)

    results = []
    for b in [int(x) for x in args.batches.split(",")]:
        for mode in modes:
            dtype = jnp.float32 if mode == "f32" else (
                jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
            inputs = [(build(b, 7 + 10 * i, dtype),)
                      for i in range(args.sets)]
            if mode == "f32":
                go = lambda a: calibrate_batch(
                    a[0], jnp.asarray(0.03, dtype), a[1], a[2], a[3], a[4],
                    a[5], config=cfg, n_starts=args.starts)
            else:
                go = lambda a: calibrate_batch_mixed(
                    a[0], jnp.asarray(0.03, dtype), a[1], a[2], a[3], a[4],
                    a[5], config=cfg, n_starts=args.starts)
            t = time_dispatches(go, inputs, repeats=3)
            out = go(*inputs[-1])
            a = inputs[-1][0]
            rel = np.abs((np.asarray(out.model_prices) - np.asarray(a[4]))
                         / np.asarray(a[4])).mean() * 100
            row = {"batch": b, "mode": mode,
                   "surfaces_per_s": round(b / t.steady_s, 1),
                   "ms_per_surface": round(t.steady_s / b * 1e3, 4),
                   "mean_error_pct": round(float(rel), 5)}
            results.append(row)
            print(json.dumps(row), flush=True)
    if args.out:
        import os
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"device": str(jax.devices()[0]),
                       "n_starts": args.starts,
                       "search_impl": cfg.search_impl,
                       "polish_impl": cfg.polish_impl,
                       "timing_protocol":
                       "chained-fresh-inputs+forced-fetch (utils/timing.py)",
                       "results": results}, f, indent=2)
    return results


if __name__ == "__main__":
    main()
