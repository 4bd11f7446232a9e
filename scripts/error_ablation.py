"""Controlled A/B for the r3->r4 error shift (VERDICT r4 item 8).

BENCH error moved 0.004 % (r3, 1 problem set) -> 0.0102 % (r4, 6 problem
sets). Candidate causes: the search_maxeval=160 cap, N=64 search terms,
polish-all-starts winner selection, or plain problem-set variance. This
driver runs the SAME fixed problem sets through ablated configs and writes
per-config error statistics, so the attribution is data, not narrative.

Usage: python scripts/error_ablation.py [--n-sets 6] [--batch 5]
Writes results/error_ablation.json.
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import build_problems, _enable_compile_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-sets", type=int, default=6)
    ap.add_argument("--out", default="results/error_ablation.json")
    args = ap.parse_args()

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from option_pricing_ffn_lbfgs_tpu.calibration.calibrator import (
        calibrate_batch_mixed)
    from option_pricing_ffn_lbfgs_tpu.utils.config import CalibrationConfig

    f64 = jnp.float64
    sets = build_problems(f64, args.n_sets)
    base = CalibrationConfig()

    configs = {
        "default": (base, True),
        "uncapped_search": (
            dataclasses.replace(base, search_maxeval=0), True),
        "search_N128": (
            dataclasses.replace(base, search_n_terms=128), True),
        "polish_winner_only": (base, False),
        "polish_N128": (
            dataclasses.replace(base, polish_n_terms=128), True),
    }

    out_rows = {}
    for name, (cfg, all_starts) in configs.items():
        errs = []
        for (a, truth) in sets:
            out = calibrate_batch_mixed(
                a[0], jnp.asarray(0.03, f64), a[1], a[2], a[3], a[4], a[5],
                config=cfg, n_starts=3, polish_all_starts=all_starts)
            model = np.asarray(out.model_prices)
            errs.append(np.abs((model - truth) / truth).mean(axis=-1))
        e = np.concatenate(errs) * 100.0
        out_rows[name] = {
            "mean_error_pct": round(float(e.mean()), 5),
            "max_error_pct": round(float(e.max()), 5),
            "median_error_pct": round(float(np.median(e)), 5),
            "per_surface_error_pct": [round(float(v), 5) for v in e],
        }
        print(json.dumps({name: out_rows[name]["mean_error_pct"]}),
              flush=True)

    payload = {
        "question": "what moved BENCH mean error 0.004% (r3) -> 0.0102% "
                    "(r4)?",
        "protocol": f"{args.n_sets} fixed problem sets x 5 surfaces, "
                    "identical across configs (bench.build_problems seeds "
                    "2026+i)",
        "device": str(jax.devices()[0]),
        "configs": out_rows,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
