"""Decompose where the f32 search phase's time goes (VERDICT r4 item 2).

Three measurements per batch size B (each over [B, S=3] lanes, 15 options,
N=64 COS terms — the search-phase shapes):

  scan_eval      K chained value_and_grad(loss) evaluations under lax.scan —
                 the pure pricer+gradient cost per while-loop trip, no
                 optimizer bookkeeping;
  scan_bookkeep  K chained two-loop-recursion direction computations — the
                 L-BFGS register cost per trip, no pricer;
  full_search    calibrate_batch (flat engine, maxeval-capped) — the real
                 thing, reported per-eval using the max lane eval count.

All timings use the audited chained-dispatch protocol (utils/timing.py).
Output: one JSON line per (B, section) + a summary to results/.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,64,512,2048")
    ap.add_argument("--k", type=int, default=64, help="chained trips per scan")
    ap.add_argument("--n-terms", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.calibration.calibrator import (
        calibrate_batch)
    from option_pricing_ffn_lbfgs_tpu.calibration.loss import make_loss_fn
    from option_pricing_ffn_lbfgs_tpu.calibration.initial_guess import (
        initial_guesses)
    from option_pricing_ffn_lbfgs_tpu.ops.lbfgs import _two_loop_direction
    from option_pricing_ffn_lbfgs_tpu.utils.config import (
        CalibrationConfig, LBFGSConfig, PricerConfig)
    from option_pricing_ffn_lbfgs_tpu.utils.timing import time_jitted

    dt = jnp.float32
    S = 3
    cfg = CalibrationConfig(pricer=PricerConfig(n_terms=args.n_terms),
                            lbfgs=LBFGSConfig(maxeval=160))
    strikes = jnp.asarray(np.tile([90.0, 95.0, 100.0, 105.0, 110.0], 3), dt)
    mats = jnp.asarray(np.repeat([0.25, 0.5, 1.0], 5), dt)
    is_call = jnp.ones(15, bool)

    results = []
    for b in [int(x) for x in args.batches.split(",")]:
        key = jax.random.key(b)
        bs = jnp.broadcast_to(strikes, (b, 15))
        bm = jnp.broadcast_to(mats, (b, 15))
        bc = jnp.broadcast_to(is_call, (b, 15))
        # plausible market prices (any positive values exercise the math)
        bp = jnp.broadcast_to(
            jnp.asarray(np.linspace(2.0, 14.0, 15), dt), (b, 15))
        spots = jnp.full((b,), 100.0, dt)
        keys = jax.random.split(key, b)
        # [B, S, 13] start matrix, as the real search uses
        x0 = jax.vmap(lambda s, k, m, c, p, ky: initial_guesses(
            S, ky, s, k, m, p, dt))(spots, bs, bm, bc, bp, keys)

        # ---- 1. pure chained evals: K x value_and_grad over [B*S] lanes
        @jax.jit
        def scan_eval(x0_flat, spots_r, bs_r, bm_r, bc_r, bp_r):
            def vg_one(x, s, kk, mm, cc, pp):
                loss_fn = make_loss_fn(s, jnp.asarray(0.03, dt), kk, mm, cc,
                                       pp, cfg)
                return jax.value_and_grad(loss_fn)(x)

            vg = jax.vmap(vg_one)

            def step(x, _):
                f, g = vg(x, spots_r, bs_r, bm_r, bc_r, bp_r)
                # fold the gradient back in so nothing is dead code
                return x - 1e-6 * g, f

            xK, fs = jax.lax.scan(step, x0_flat, None, length=args.k)
            return fs[-1].sum() + xK.sum()

        rep = lambda a: jnp.repeat(a, S, axis=0)
        flat_args = (x0.reshape(b * S, 13), rep(spots), rep(bs), rep(bm),
                     rep(bc), rep(bp))
        t_eval = time_jitted(scan_eval, *flat_args, repeats=3, chain=1)

        # ---- 2. pure bookkeeping: K x two-loop direction over [B*S] lanes
        m_hist = 10
        kx = jax.random.normal(jax.random.key(1), (b * S, 13), dt)
        s_h = jax.random.normal(jax.random.key(2), (b * S, m_hist, 13), dt)
        y_h = jax.random.normal(jax.random.key(3), (b * S, m_hist, 13), dt)
        rho = jnp.abs(jax.random.normal(jax.random.key(4), (b * S, m_hist), dt))
        hl = jnp.full((b * S,), m_hist, jnp.int32)
        hd = jnp.zeros((b * S,), jnp.int32)
        gm = jnp.ones((b * S,), dt)

        @jax.jit
        def scan_dir(g, s_h, y_h, rho, hl, hd, gm):
            two = jax.vmap(_two_loop_direction)

            def step(g, _):
                d = two(g, s_h, y_h, rho, hl, hd, gm)
                return d * 0.999 + g * 1e-3, d.sum()

            gK, ds = jax.lax.scan(step, g, None, length=args.k)
            return gK.sum() + ds[-1]

        t_dir = time_jitted(scan_dir, kx, s_h, y_h, rho, hl, hd, gm,
                            repeats=3, chain=1)

        # ---- 3. the real search solve
        go = lambda: calibrate_batch(spots, jnp.asarray(0.03, dt), bs, bm,
                                     bc, bp, keys, cfg, S)
        t_full = time_jitted(go, repeats=3, chain=1)
        out = go()
        max_evals = int(np.asarray(out.n_evals).max())

        flops_per_eval_lane = 15 * args.n_terms * 1100  # fwd+bwd, see audit
        row = {
            "batch": b, "lanes": b * S,
            "eval_ms_per_trip": round(t_eval.steady_s / args.k * 1e3, 3),
            "bookkeep_ms_per_trip": round(t_dir.steady_s / args.k * 1e3, 3),
            "full_solve_s": round(t_full.steady_s, 3),
            "winner_max_evals": max_evals,
            "full_ms_per_eval": round(
                t_full.steady_s / max(max_evals, 1) * 1e3, 3),
            "eval_gflops": round(
                b * S * flops_per_eval_lane / (t_eval.steady_s / args.k)
                / 1e9, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            import jax
            json.dump({"device": str(jax.devices()[0]), "k": args.k,
                       "n_terms": args.n_terms, "results": results},
                      f, indent=2)


if __name__ == "__main__":
    main()
