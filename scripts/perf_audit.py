"""Audited performance harness — the single source of timing truth.

VERDICT r3 item 1: round-3's four timing artifacts disagreed by ~100-200x
for near-identical programs. Root cause (measured 2026-08-20, v5e via the
axon tunnel): ``jax.block_until_ready`` returns after the dispatch is
ENQUEUED, not executed — a single 8192^3 bf16 matmul "timed" at 0.056 ms
(implied 19,665 TFLOP/s, 100x the chip's 197 peak), while the same matmul
chained x20 inside one program times at 147 ms = 149 TFLOP/s (real). All
round-3 "fast regime" numbers (bench.py 0.162 ms/surface,
pallas_bench.json 75 us) were launch latency; the "slow regime"
(scaling.json 21-47 ms/surface) was real compute.

Protocol here (utils/timing.py): every measurement chains N back-to-back
dispatches over FRESH pre-staged inputs and ends with a forced
device->host fetch of an output element (data cannot be fetched before it
exists). Per-dispatch time = total/N. Each section also records the
broken single-dispatch block_until_ready number (``unsynced_ms``) so the
discrepancy itself is part of the audit record, plus a rough
work-per-dispatch sanity estimate.

Run sections separately in FRESH processes to keep compile caches and
backend state clean:
    python scripts/perf_audit.py --section sanity
    python scripts/perf_audit.py --section pricer
    python scripts/perf_audit.py --section calibrate
    python scripts/perf_audit.py --section mixed
    python scripts/perf_audit.py --section pallas
    python scripts/perf_audit.py --section ffn
Each section merges its rows into results/perf_audit.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_DEFAULT = "results/perf_audit.json"

RANGES = [(0.025, 0.080), (1.5, 4.5), (0.025, 0.065), (0.20, 0.50),
          (-0.85, -0.40), (0.020, 0.070), (0.30, 1.20), (0.025, 0.070),
          (0.10, 0.35), (-0.70, -0.20), (0.05, 0.25), (-0.08, -0.01),
          (0.03, 0.12)]  # synthetic_generator.py:75-89
STRIKES = np.tile([90.0, 95.0, 100.0, 105.0, 110.0], 3)
MATS = np.repeat([0.25, 0.5, 1.0], 5)


def _unsynced_ms(fn, *args):
    """The BROKEN protocol (single dispatch + block_until_ready), recorded
    deliberately so the audit shows the gap it explains."""
    import jax
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) * 1e3


def _rand_params(seed, b, dtype):
    import jax.numpy as jnp
    r = np.random.default_rng(seed)
    return jnp.asarray(
        np.stack([r.uniform(lo, hi, b) for lo, hi in RANGES], -1), dtype)


def section_sanity():
    """Known-FLOP matmul roofline: proves which timing protocol is honest."""
    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.utils.timing import force_sync
    n = 8192
    flops = 2 * n**3
    a = jax.device_put(jnp.ones((n, n), jnp.bfloat16))
    f = jax.jit(lambda x: x @ x)
    force_sync(f(a))
    unsynced = _unsynced_ms(f, a)
    t0 = time.perf_counter()
    out = a
    for _ in range(20):
        out = f(out)
    force_sync(out)
    per_ms = (time.perf_counter() - t0) / 20 * 1e3
    return [{
        "section": "sanity", "config": f"matmul_bf16_{n}",
        "chained_ms": round(per_ms, 3), "unsynced_ms": round(unsynced, 3),
        "tflops_chained": round(flops / (per_ms / 1e3) / 1e12, 1),
        "tflops_unsynced_implied": round(flops / (unsynced / 1e3) / 1e12, 1),
        "note": "v5e bf16 peak ~197 TFLOP/s; the unsynced implied number "
                "exceeding it proves block_until_ready is not a barrier "
                "on this backend",
    }]


def section_pricer(batches=(8, 1024, 4096, 16384)):
    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
        DHParams, price_options)
    from option_pricing_ffn_lbfgs_tpu.utils.timing import time_dispatches
    f32 = jnp.float32
    rows = []
    for b in batches:
        spots = jnp.full((b,), 100.0, f32)
        ks = jnp.asarray(np.broadcast_to(STRIKES, (b, 15)), f32)
        ms = jnp.asarray(np.broadcast_to(MATS, (b, 15)), f32)
        cal = jnp.ones((b, 15), bool)
        fwd = jax.jit(jax.vmap(lambda p, s, k, m, c: price_options(
            DHParams.from_vector(p), s, 0.03, k, m, c, n_terms=128)))
        inputs = [(jax.device_put(_rand_params(i, b, f32)),) for i in range(6)]
        fn = lambda p: fwd(p, spots, ks, ms, cal)
        t = time_dispatches(fn, inputs)
        rows.append({
            "section": "pricer", "config": f"fwd_f32_b{b}_N128",
            "chained_ms": round(t.steady_s * 1e3, 3),
            "unsynced_ms": round(_unsynced_ms(fn, *inputs[0]), 3),
            "options_per_s": round(b * 15 / t.steady_s, 0),
            "us_per_surface": round(t.steady_s / b * 1e6, 2),
        })
    return rows


def _calib_inputs(seed, b, dtype):
    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.utils.hostpricer import (
        price_truth_subprocess)
    r = np.random.default_rng(seed)
    true = np.stack([r.uniform(lo, hi, b) for lo, hi in RANGES], -1)
    prices = price_truth_subprocess(true, np.full(b, 100.0), STRIKES, MATS)
    return jax.device_put((
        jnp.full((b,), 100.0, dtype),
        jnp.asarray(np.broadcast_to(STRIKES, (b, 15)), dtype),
        jnp.asarray(np.broadcast_to(MATS, (b, 15)), dtype),
        jnp.ones((b, 15), bool), jnp.asarray(prices, dtype),
        jax.random.split(jax.random.key(seed), b))), prices


def section_calibrate(batches=(8, 64, 1024)):
    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.calibration.calibrator import (
        calibrate_batch)
    from option_pricing_ffn_lbfgs_tpu.utils.timing import time_dispatches
    f32 = jnp.float32
    rows = []
    for b in batches:
        packs = [_calib_inputs(100 + i, b, f32) for i in range(4)]
        inputs = [(p[0],) for p in packs]
        fn = lambda a: calibrate_batch(
            a[0], jnp.float32(0.03), a[1], a[2], a[3], a[4], a[5], n_starts=3)
        t = time_dispatches(fn, inputs, repeats=2)
        out = fn(*inputs[-1])
        model = np.asarray(out.model_prices)
        err = np.abs((model - packs[-1][1]) / packs[-1][1]).mean() * 100
        rows.append({
            "section": "calibrate", "config": f"f32_search_b{b}_3starts",
            "chained_ms": round(t.steady_s * 1e3, 1),
            "unsynced_ms": round(_unsynced_ms(fn, *inputs[0]), 3),
            "ms_per_surface": round(t.steady_s / b * 1e3, 3),
            "surfaces_per_s": round(b / t.steady_s, 1),
            "mean_error_pct": round(float(err), 5),
            "max_evals": int(np.asarray(out.n_evals).max()),
        })
    return rows


def section_mixed(batches=(5, 64, 1024)):
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.calibration.calibrator import (
        calibrate_batch_mixed)
    from option_pricing_ffn_lbfgs_tpu.utils.timing import time_dispatches
    f64 = jnp.float64
    rows = []
    for b in batches:
        packs = [_calib_inputs(100 + i, b, f64) for i in range(4)]
        inputs = [(p[0],) for p in packs]
        fn = lambda a: calibrate_batch_mixed(
            a[0], jnp.asarray(0.03, f64), a[1], a[2], a[3], a[4], a[5],
            n_starts=3)
        t = time_dispatches(fn, inputs, repeats=2)
        out = fn(*inputs[-1])
        model = np.asarray(out.model_prices)
        err = np.abs((model - packs[-1][1]) / packs[-1][1]).mean() * 100
        rows.append({
            "section": "mixed", "config": f"mixed_b{b}_3starts",
            "chained_ms": round(t.steady_s * 1e3, 1),
            "unsynced_ms": round(_unsynced_ms(fn, *inputs[0]), 3),
            "ms_per_surface": round(t.steady_s / b * 1e3, 3),
            "surfaces_per_s": round(b / t.steady_s, 1),
            "mean_error_pct": round(float(err), 5),
            "compile_s": round(t.compile_s, 1),
        })
    return rows


def section_pallas(batches=(1024, 4096)):
    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
        DHParams, price_options)
    from option_pricing_ffn_lbfgs_tpu.ops.cos_pallas import (
        price_surfaces_pallas)
    from option_pricing_ffn_lbfgs_tpu.utils.timing import time_dispatches
    f32 = jnp.float32
    rows = []
    for b in batches:
        spots = jnp.full((b,), 100.0, f32)
        ks = jnp.asarray(np.broadcast_to(STRIKES, (b, 15)), f32)
        ms = jnp.asarray(np.broadcast_to(MATS, (b, 15)), f32)
        cal = jnp.ones((b, 15), bool)
        inputs = [(jax.device_put(_rand_params(i, b, f32)),)
                  for i in range(6)]
        xla = jax.jit(jax.vmap(lambda p, s, k, m, c: price_options(
            DHParams.from_vector(p), s, 0.03, k, m, c, n_terms=128)))
        fx = lambda p: xla(p, spots, ks, ms, cal)
        fp = lambda p: price_surfaces_pallas(p, spots, 0.03, ks, ms, cal,
                                             n_terms=128)
        tx = time_dispatches(fx, inputs)
        tp = time_dispatches(fp, inputs)
        rel = np.abs(np.asarray(fp(*inputs[0]))
                     / np.asarray(fx(*inputs[0])) - 1).max()
        rows.append({
            "section": "pallas", "config": f"b{b}_N128",
            "xla_chained_ms": round(tx.steady_s * 1e3, 3),
            "pallas_chained_ms": round(tp.steady_s * 1e3, 3),
            "pallas_vs_xla_speedup": round(tx.steady_s / tp.steady_s, 3),
            "max_rel_disagreement": float(rel),
        })
    rows += _pallas_vg_rows()
    return rows


def _pallas_vg_rows(lanes=6144, n_terms=64, k_chain=64):
    """Fused value-and-grad kernel (ops/loss_pallas.py) vs XLA autodiff."""
    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.calibration.loss import make_loss_fn
    from option_pricing_ffn_lbfgs_tpu.ops.loss_pallas import (
        make_batch_value_and_grad)
    from option_pricing_ffn_lbfgs_tpu.utils.config import (
        CalibrationConfig, PricerConfig)
    from option_pricing_ffn_lbfgs_tpu.utils.timing import time_jitted

    f32 = jnp.float32
    cfg = CalibrationConfig(pricer=PricerConfig(n_terms=n_terms))
    spots = jnp.full((lanes,), 100.0, f32)
    ks = jnp.asarray(np.broadcast_to(STRIKES, (lanes, 15)), f32)
    ms = jnp.asarray(np.broadcast_to(MATS, (lanes, 15)), f32)
    cal = jnp.ones((lanes, 15), bool)
    mkt = jnp.asarray(np.broadcast_to(np.linspace(2.0, 14.0, 15),
                                      (lanes, 15)), f32)
    x = jnp.asarray(np.random.default_rng(0).normal(-1.5, 0.3, (lanes, 13)),
                    f32)

    def one(xv, s, k, m, c, p):
        return jax.value_and_grad(make_loss_fn(s, jnp.float32(0.03), k, m,
                                               c, p, cfg))(xv)

    vg_x = lambda xs: jax.vmap(one)(xs, spots, ks, ms, cal, mkt)
    vg_p = make_batch_value_and_grad(spots, ks, ms, cal, mkt, 0.03, cfg)

    def scan_of(vg):
        @jax.jit
        def scan_eval(x0):
            def step(xc, _):
                f, g = vg(xc)
                return xc - 1e-6 * g, f
            xK, fs = jax.lax.scan(step, x0, None, length=k_chain)
            return xK.sum() + fs[-1].sum()
        return scan_eval

    tx = time_jitted(scan_of(vg_x), x, repeats=3, chain=1)
    tp = time_jitted(scan_of(vg_p), x, repeats=3, chain=1)
    return [{
        "section": "pallas",
        "config": f"value_and_grad_lanes{lanes}_N{n_terms}",
        "xla_ms_per_eval": round(tx.steady_s / k_chain * 1e3, 3),
        "pallas_ms_per_eval": round(tp.steady_s / k_chain * 1e3, 3),
        "pallas_vs_xla_speedup": round(tx.steady_s / tp.steady_s, 3),
    }]


def section_ffn(batches=(1, 64, 1024)):
    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.surrogate.predict import (
        load_default_model, make_predict_fn)
    from option_pricing_ffn_lbfgs_tpu.utils.timing import time_dispatches
    f32 = jnp.float32
    bundle = load_default_model()
    predict = make_predict_fn(bundle)
    rows = []
    for b in batches:
        spots = jnp.full((b,), 100.0, f32)
        ks = jnp.asarray(np.broadcast_to(STRIKES, (b, 15)), f32)
        ms = jnp.asarray(np.broadcast_to(MATS, (b, 15)), f32)
        inputs = []
        for i in range(6):
            r = np.random.default_rng(i)
            inputs.append((jax.device_put(jnp.asarray(
                r.uniform(2.0, 18.0, (b, 15)), f32)),))
        fn = lambda p: predict(spots, ks, ms, p)
        t = time_dispatches(fn, inputs)
        rows.append({
            "section": "ffn", "config": f"predict_b{b}",
            "chained_ms": round(t.steady_s * 1e3, 3),
            "ms_per_surface": round(t.steady_s / b * 1e3, 4),
        })
    return rows


def section_mfu(lanes=6144, n_terms=64, k_chain=64):
    """FLOP-counted utilization of the hot op (VERDICT r4 item 2).

    The search phase's unit of work is one value_and_grad of the surface
    loss over all lanes. FLOPs/transcendentals come from XLA's own cost
    model (compiled.cost_analysis() — no hand estimates), the time from
    the chained-scan protocol, and utilization is reported against two
    ceilings: the v5e bf16 MXU peak (197 TFLOP/s, the marketing number)
    and a ~4 TFLOP/s f32 VPU vector ceiling (8x128 lanes x 4 ALUs x
    ~0.94 GHz) — this workload is transcendental-heavy VPU code with zero
    MXU work, so the VPU number is the honest roofline.
    """
    import jax
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.calibration.loss import make_loss_fn
    from option_pricing_ffn_lbfgs_tpu.utils.config import (
        CalibrationConfig, PricerConfig)
    from option_pricing_ffn_lbfgs_tpu.utils.timing import time_jitted

    f32 = jnp.float32
    cfg = CalibrationConfig(pricer=PricerConfig(n_terms=n_terms))
    spots = jnp.full((lanes,), 100.0, f32)
    ks = jnp.asarray(np.broadcast_to(STRIKES, (lanes, 15)), f32)
    ms = jnp.asarray(np.broadcast_to(MATS, (lanes, 15)), f32)
    cal = jnp.ones((lanes, 15), bool)
    mkt = jnp.asarray(np.broadcast_to(np.linspace(2.0, 14.0, 15),
                                      (lanes, 15)), f32)
    x = jnp.asarray(np.random.default_rng(0).normal(-1.5, 0.3, (lanes, 13)),
                    f32)

    def one(xv, s, k, m, c, p):
        return jax.value_and_grad(make_loss_fn(s, jnp.float32(0.03), k, m,
                                               c, p, cfg))(xv)

    vg = lambda xs: jax.vmap(one)(xs, spots, ks, ms, cal, mkt)

    # FLOP count of ONE evaluation from XLA's cost model.
    compiled = jax.jit(vg).lower(x).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    transc = float(ca.get("transcendentals", 0.0))

    @jax.jit
    def scan_eval(x0):
        def step(xc, _):
            f, g = vg(xc)
            return xc - 1e-6 * g, f
        xK, fs = jax.lax.scan(step, x0, None, length=k_chain)
        return xK.sum() + fs[-1].sum()

    t = time_jitted(scan_eval, x, repeats=3, chain=1)
    per_eval_s = t.steady_s / k_chain
    achieved = flops / per_eval_s
    PEAK_BF16 = 197e12
    PEAK_VPU_F32 = 3.9e12
    return [{
        "section": "mfu", "config": f"search_vg_lanes{lanes}_N{n_terms}",
        "ms_per_eval": round(per_eval_s * 1e3, 3),
        "xla_flops_per_eval": flops,
        "xla_transcendentals_per_eval": transc,
        "achieved_gflops": round(achieved / 1e9, 1),
        "mfu_pct_vs_bf16_mxu_peak": round(achieved / PEAK_BF16 * 100, 3),
        "util_pct_vs_f32_vpu_ceiling": round(
            achieved / PEAK_VPU_F32 * 100, 2),
        "note": "transcendental-heavy VPU workload, zero MXU work; each "
                "transcendental costs multiple VPU ops so flops-based "
                "utilization understates true occupancy",
    }]


SECTIONS = {
    "sanity": section_sanity,
    "pricer": section_pricer,
    "calibrate": section_calibrate,
    "mixed": section_mixed,
    "mfu": section_mfu,
    "pallas": section_pallas,
    "ffn": section_ffn,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", required=True, choices=sorted(SECTIONS))
    ap.add_argument("--out", default=OUT_DEFAULT)
    args = ap.parse_args()

    rows = SECTIONS[args.section]()
    for r in rows:
        print(json.dumps(r), flush=True)

    import jax
    payload = {"device": str(jax.devices()[0]), "protocol":
               "chained fresh-input dispatches + forced result fetch "
               "(utils/timing.py); unsynced_ms = the broken single-dispatch "
               "block_until_ready number, recorded for the audit trail",
               "rows": []}
    if os.path.exists(args.out):
        with open(args.out) as f:
            payload = json.load(f)
    payload["rows"] = [r for r in payload.get("rows", [])
                       if r.get("section") != args.section] + rows
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)


if __name__ == "__main__":
    main()
