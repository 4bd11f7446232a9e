"""Command-line entry points: demo / generate / calibrate / benchmark / train.

The reference has only ad-hoc entries (the pricer's __main__ demo at
double_heston.py:196-303, the generator CLI at synthetic_generator.py:237-250,
and an unshipped benchmark driver). This consolidates them:

  python -m option_pricing_ffn_lbfgs_tpu demo
  python -m option_pricing_ffn_lbfgs_tpu generate  --n-samples 500 --out d.pkl
  python -m option_pricing_ffn_lbfgs_tpu calibrate --data d.pkl --index 0
  python -m option_pricing_ffn_lbfgs_tpu benchmark --n-surfaces 5 --out r.json
  python -m option_pricing_ffn_lbfgs_tpu train --pretrain a.npz --finetune b.pkl --out ffn.pkl
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _jnp():
    import jax.numpy as jnp
    return jnp


def cmd_demo(args):
    """Price the reference demo option with/without jumps + parity check
    (double_heston.py:196-303 semantics, assertions instead of prints-only)."""
    jnp = _jnp()
    from .models.double_heston import DHParams, price_single
    base = dict(v1_0=0.04, kappa1=2.0, theta1=0.04, sigma1=0.3, rho1=-0.5,
                v2_0=0.04, kappa2=1.5, theta2=0.04, sigma2=0.2, rho2=-0.3,
                lambda_j=0.5, mu_j=-0.05, sigma_j=0.10)
    nojump = dict(base, lambda_j=0.0, mu_j=0.0, sigma_j=0.0)
    dt = jnp.float64 if args.f64 else jnp.float32
    s, k, t, r = 100.0, 100.0, 1.0, 0.05
    rows = {}
    for name, p in [("jumps", base), ("no_jumps", nojump)]:
        params = DHParams.from_dict(p, dt)
        rows[name] = {
            "call": float(price_single(params, s, jnp.asarray(k, dt), t, r, True)),
            "put": float(price_single(params, s, jnp.asarray(k, dt), t, r, False)),
        }
    parity = rows["jumps"]["call"] - rows["jumps"]["put"] - (s - k * np.exp(-r * t))
    print(f"call (jumps):    {rows['jumps']['call']:.6f}")
    print(f"put  (jumps):    {rows['jumps']['put']:.6f}")
    print(f"call (no jumps): {rows['no_jumps']['call']:.6f}")
    print(f"put  (no jumps): {rows['no_jumps']['put']:.6f}")
    print(f"jump premium (call): {rows['jumps']['call'] - rows['no_jumps']['call']:.6f}")
    print(f"put-call parity residual: {parity:.2e}  "
          f"[{'PASS' if abs(parity) < 0.01 else 'FAIL'}]")
    return 0 if abs(parity) < 0.01 else 1


def cmd_generate(args):
    import dataclasses
    import jax
    from .data.synthetic import generate_dataset, save_dataset
    from .utils.config import GeneratorConfig
    cfg = GeneratorConfig(n_samples=args.n_samples)
    t0 = time.time()
    ds = jax.block_until_ready(generate_dataset(
        jax.random.key(args.seed), cfg,
        dtype=_jnp().float64 if args.f64 else _jnp().float32))
    print(f"generated {ds.n_samples} surfaces in {time.time() - t0:.2f}s "
          f"(mean loss {float(np.mean(np.asarray(ds.losses))):.6f})")
    save_dataset(ds, args.out, cfg)
    print(f"saved to {args.out}")
    return 0


def cmd_calibrate(args):
    import jax
    jnp = _jnp()
    from .calibration.calibrator import DoubleHestonJumpCalibrator
    from .data.synthetic import load_dataset
    ds = load_dataset(args.data)
    i = args.index
    opts = [dict(strike=float(k), maturity=float(t), price=float(p),
                 option_type="call")
            for k, t, p in zip(np.asarray(ds.strikes[i]),
                               np.asarray(ds.maturities[i]),
                               np.asarray(ds.market_prices[i]))]
    cal = DoubleHestonJumpCalibrator(
        float(ds.spots[i]), args.rate, opts,
        dtype=jnp.float64 if args.f64 else jnp.float32, seed=args.seed)
    res = cal.calibrate(maxiter=args.maxiter, multi_start=args.multi_start)
    print(json.dumps({
        "final_loss": res.final_loss,
        "mean_rel_error_pct": res.mean_rel_error_pct,
        "iterations": res.iterations,
        "calibration_time_s": res.calibration_time,
        "success": res.success,
        "parameters": res.parameters,
    }, indent=2))
    return 0 if res.success else 1


def cmd_benchmark(args):
    """Multi-surface benchmark emitting the reference results-JSON schema."""
    import jax
    jnp = _jnp()
    from .calibration.calibrator import calibrate_batch
    from .data.synthetic import generate_dataset
    from .utils.config import GeneratorConfig
    from .utils.results import write_benchmark_json
    dt = jnp.float64 if args.f64 else jnp.float32
    ds = generate_dataset(jax.random.key(args.seed),
                          GeneratorConfig(n_samples=args.n_surfaces), dtype=dt)
    market = ds.model_prices if args.noiseless else ds.market_prices
    keys = jax.random.split(jax.random.key(args.seed + 1), args.n_surfaces)
    run = lambda: calibrate_batch(ds.spots, jnp.asarray(args.rate, dt),
                                  ds.strikes, ds.maturities,
                                  jnp.ones_like(ds.strikes, bool), market,
                                  keys, n_starts=args.multi_start)
    t0 = time.time()
    out = jax.block_until_ready(run())
    compile_s = time.time() - t0
    t0 = time.time()
    out = jax.block_until_ready(run())
    steady = time.time() - t0
    rel = np.abs((np.asarray(out.model_prices) - np.asarray(market))
                 / np.asarray(market))
    errors = rel.mean(axis=-1) * 100.0
    per = steady / args.n_surfaces
    payload = write_benchmark_json(
        args.out, errors, [per] * args.n_surfaces,
        np.asarray(out.iterations), np.asarray(out.converged),
        extra={"compile_s": compile_s, "batch": args.n_surfaces,
               "dtype": str(np.asarray(out.loss).dtype)})
    print(json.dumps(payload["statistics"], indent=2))
    print(f"wrote {args.out}")
    return 0


def cmd_train(args):
    import jax
    from .data.synthetic import generate_dataset, load_dataset
    from .surrogate.train import (FINETUNE, TrainConfig, dataset_to_xy, fit,
                                  pretrain_and_finetune, save_surrogate)
    from .utils.config import GeneratorConfig
    if args.pretrain:
        pre = load_dataset(args.pretrain)
    else:
        print(f"generating {args.n_pretrain} pretraining surfaces...")
        pre = generate_dataset(jax.random.key(1),
                               GeneratorConfig(n_samples=args.n_pretrain))
    if args.finetune:
        fine = load_dataset(args.finetune)
        surrogate, hist = pretrain_and_finetune(pre, fine, verbose=args.verbose)
    else:
        fx, fy = dataset_to_xy(pre)
        surrogate, hist = fit(fx, fy, TrainConfig(max_epochs=args.epochs),
                              verbose=args.verbose)
        hist = {"pretrain": hist}
    save_surrogate(args.out, surrogate)
    last = {k: v["val_loss"][-1] for k, v in hist.items()}
    print(f"saved surrogate to {args.out}; final val losses: {last}")
    return 0


def cmd_compare(args):
    """Three-method comparison producing the reference results artifacts."""
    import jax
    from .compare import run_comparison
    from .data.synthetic import generate_dataset, load_dataset
    from .surrogate.train import load_surrogate, dataset_to_xy, fit, TrainConfig
    from .utils.config import GeneratorConfig
    if args.data:
        ds = load_dataset(args.data)
    else:
        ds = generate_dataset(jax.random.key(args.seed),
                              GeneratorConfig(n_samples=max(args.n_eval, 300)))
    if args.surrogate:
        surrogate = load_surrogate(args.surrogate)
    else:
        print("no --surrogate given; quick-training one on the dataset...")
        fx, fy = dataset_to_xy(ds)
        surrogate, _ = fit(fx, fy, TrainConfig(max_epochs=60, patience=20,
                                               batch_size=64))
    payload = run_comparison(ds, surrogate, n_eval=args.n_eval,
                             out_dir=args.out_dir)
    print(json.dumps({
        "ffn_mean_error_pct": payload["ffn"]["mean_error"],
        "lbfgs_mean_error_pct": payload["lbfgs"]["statistics"]["mean_error"],
        "hybrid_mean_error_pct": payload["hybrid"]["statistics"]["mean_error"],
        "ffn_mean_time_s": payload["ffn"]["mean_time"],
        "lbfgs_mean_time_s": payload["lbfgs"]["statistics"]["mean_time"],
        "hybrid_mean_time_s": payload["hybrid"]["statistics"]["mean_time"],
    }, indent=2))
    print(f"artifacts written to {args.out_dir}")
    return 0


def build_parser():
    p = argparse.ArgumentParser(prog="option_pricing_ffn_lbfgs_tpu")
    p.add_argument("--f64", action="store_true",
                   help="use float64 (parity mode; TPU-emulated)")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("demo", help="price the demo option, check parity")

    g = sub.add_parser("generate", help="generate synthetic calibrations")
    g.add_argument("--n-samples", type=int, default=500)
    g.add_argument("--out", default="lbfgs_calibrations_synthetic.pkl")
    g.add_argument("--seed", type=int, default=0)

    c = sub.add_parser("calibrate", help="calibrate one surface from a dataset")
    c.add_argument("--data", required=True)
    c.add_argument("--index", type=int, default=0)
    c.add_argument("--rate", type=float, default=0.03)
    c.add_argument("--maxiter", type=int, default=300)
    c.add_argument("--multi-start", type=int, default=3)
    c.add_argument("--seed", type=int, default=0)

    b = sub.add_parser("benchmark", help="batched calibration benchmark")
    b.add_argument("--n-surfaces", type=int, default=5)
    b.add_argument("--rate", type=float, default=0.03)
    b.add_argument("--multi-start", type=int, default=3)
    b.add_argument("--noiseless", action="store_true", default=True)
    b.add_argument("--noisy", dest="noiseless", action="store_false")
    b.add_argument("--seed", type=int, default=2026)
    b.add_argument("--out", default="benchmark_results.json")

    cp = sub.add_parser("compare", help="FFN vs L-BFGS vs hybrid comparison")
    cp.add_argument("--data", help="dataset (.pkl/.npz); generated if absent")
    cp.add_argument("--surrogate", help="trained surrogate (.pkl)")
    cp.add_argument("--n-eval", type=int, default=5)
    cp.add_argument("--seed", type=int, default=0)
    cp.add_argument("--out-dir", default="results")

    t = sub.add_parser("train", help="train the FFN surrogate")
    t.add_argument("--pretrain", help="pretraining dataset (.pkl/.npz)")
    t.add_argument("--finetune", help="fine-tuning dataset (.pkl/.npz)")
    t.add_argument("--n-pretrain", type=int, default=5000,
                   help="surfaces to generate if --pretrain absent")
    t.add_argument("--epochs", type=int, default=200)
    t.add_argument("--out", default="ffn_surrogate.pkl")
    t.add_argument("--verbose", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.f64:
        import jax
        jax.config.update("jax_enable_x64", True)
    return {"demo": cmd_demo, "generate": cmd_generate,
            "calibrate": cmd_calibrate, "benchmark": cmd_benchmark,
            "train": cmd_train, "compare": cmd_compare}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
