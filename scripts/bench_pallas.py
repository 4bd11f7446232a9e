"""Pallas-vs-XLA pricing throughput on real TPU hardware (VERDICT r2 #6).

Prices a large batch of surfaces with (a) the fused Pallas COS kernel
(ops/cos_pallas.py, non-interpret) and (b) the XLA-fused jnp pricer
(models/double_heston.py), checks they agree at f32 tolerance, and records
throughput for both in results/pallas_bench.json — settling whether the
hand-written kernel beats the XLA compiler on this op.

Usage: python scripts/bench_pallas.py [--batches 1024,4096]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1024,4096")
    ap.add_argument("--n-terms", type=int, default=128)
    ap.add_argument("--out", default="results/pallas_bench.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
        DHParams, price_options)
    from option_pricing_ffn_lbfgs_tpu.ops.cos_pallas import (
        price_surfaces_pallas)

    f32 = jnp.float32
    rng = np.random.default_rng(11)
    ranges = [(0.025, 0.080), (1.5, 4.5), (0.025, 0.065), (0.20, 0.50),
              (-0.85, -0.40), (0.020, 0.070), (0.30, 1.20), (0.025, 0.070),
              (0.10, 0.35), (-0.70, -0.20), (0.05, 0.25), (-0.08, -0.01),
              (0.03, 0.12)]
    strikes = np.tile([90.0, 95.0, 100.0, 105.0, 110.0], 3)
    mats = np.repeat([0.25, 0.5, 1.0], 5)

    from option_pricing_ffn_lbfgs_tpu.utils.timing import time_dispatches

    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        spots = jnp.full((b,), 100.0, f32)
        bs = jnp.broadcast_to(jnp.asarray(strikes, f32), (b, 15))
        bm = jnp.broadcast_to(jnp.asarray(mats, f32), (b, 15))
        bc = jnp.ones((b, 15), bool)
        # Fresh parameter sets per dispatch + forced-fetch chained timing
        # (utils/timing.py) — block_until_ready alone is not a barrier on
        # the axon tunnel (results/perf_audit.json, sanity section).
        inputs = [(jax.device_put(jnp.asarray(np.stack(
            [rng.uniform(lo, hi, b) for lo, hi in ranges], -1), f32)),)
            for _ in range(6)]
        params = inputs[0][0]

        xla_fn = jax.jit(jax.vmap(
            lambda p, s, k, m, c: price_options(
                DHParams.from_vector(p), s, 0.03, k, m, c,
                n_terms=args.n_terms)))
        fx = lambda p: xla_fn(p, spots, bs, bm, bc)
        fp = lambda p: price_surfaces_pallas(
            p, spots, 0.03, bs, bm, bc, n_terms=args.n_terms)

        t_x = time_dispatches(fx, inputs).steady_s
        t_p = time_dispatches(fp, inputs).steady_s
        px = np.asarray(fx(params))
        pp = np.asarray(fp(params))
        rel = np.abs(pp / px - 1)
        row = {
            "batch": b, "n_options": 15, "n_terms": args.n_terms,
            "xla_ms": round(t_x * 1e3, 3),
            "pallas_ms": round(t_p * 1e3, 3),
            "xla_options_per_s": round(b * 15 / t_x, 0),
            "pallas_options_per_s": round(b * 15 / t_p, 0),
            "pallas_vs_xla_speedup": round(t_x / t_p, 3),
            "max_rel_disagreement": float(rel.max()),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    payload = {"device": str(jax.devices()[0]),
               "timing_protocol":
               "chained-fresh-inputs+forced-fetch (utils/timing.py)",
               "results": rows}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)


if __name__ == "__main__":
    main()
