"""Results-authenticity tests over the committed results/ artifacts.

Mirrors the reference suite's §1 (tests/test_suite.py:49-142): statistics
stored in the results JSONs must equal statistics recomputed from their own
raw arrays, and the ASCII comparison table must quote those same numbers —
anti-fabrication regression checks on the evidence the repo ships.
"""
import json
import os
import re

import numpy as np
import pytest

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "..", "results")
LBFGS_JSON = os.path.join(RESULTS_DIR, "lbfgs_actual_results.json")
HYBRID_JSON = os.path.join(RESULTS_DIR, "hybrid_actual_results.json")
TABLE = os.path.join(RESULTS_DIR, "COMPARISON_TABLE.txt")

pytestmark = pytest.mark.skipif(
    not os.path.exists(LBFGS_JSON),
    reason="results artifacts not generated yet (TPU compare run)")

# Known fabricated values from the reference's history
# (tests/test_suite.py:56) — must never appear as stored statistics.
FAKE_VALUES = [0.98, 14.5, 0.34, 106.0]


def test_lbfgs_stats_match_raw():
    with open(LBFGS_JSON) as f:
        d = json.load(f)
    stats = d["statistics"]
    np.testing.assert_allclose(stats["mean_error"],
                               np.mean(d["pricing_errors"]), atol=1e-9)
    np.testing.assert_allclose(stats["std_error"],
                               np.std(d["pricing_errors"]), atol=1e-9)
    np.testing.assert_allclose(stats["median_error"],
                               np.median(d["pricing_errors"]), atol=1e-9)
    np.testing.assert_allclose(stats["mean_time"],
                               np.mean(d["total_times"]), atol=1e-9)
    for fake in FAKE_VALUES:
        assert abs(stats["mean_error"] - fake) > 1e-6


def test_hybrid_stats_match_raw():
    with open(HYBRID_JSON) as f:
        d = json.load(f)
    stats = d["statistics"]
    np.testing.assert_allclose(stats["mean_error"],
                               np.mean(d["pricing_errors"]), atol=1e-9)
    # total ~= ffn + lbfgs phase times (reference checks 2% rtol,
    # test_suite.py:98-101)
    total = np.asarray(d["total_times"])
    parts = np.asarray(d["ffn_times"]) + np.asarray(d["lbfgs_times"])
    np.testing.assert_allclose(total, parts, rtol=0.02)


def test_hybrid_full_statistics_schema():
    """Every statistics key of the reference's hybrid schema is present and
    consistent with the raw arrays
    (/root/reference/results/hybrid_actual_results.json)."""
    with open(HYBRID_JSON) as f:
        d = json.load(f)
    stats = d["statistics"]
    errs = np.asarray(d["pricing_errors"])
    required = {"mean_error", "std_error", "median_error", "min_error",
                "max_error", "mean_time", "std_time", "mean_improvement"}
    assert required <= set(stats)
    np.testing.assert_allclose(stats["std_error"], errs.std(), atol=1e-9)
    np.testing.assert_allclose(stats["median_error"], np.median(errs),
                               atol=1e-9)
    np.testing.assert_allclose(stats["min_error"], errs.min(), atol=1e-9)
    np.testing.assert_allclose(stats["max_error"], errs.max(), atol=1e-9)
    np.testing.assert_allclose(stats["mean_time"],
                               np.mean(d["total_times"]), atol=1e-9)
    np.testing.assert_allclose(stats["mean_improvement"],
                               np.mean(d["improvements"]), atol=1e-9)


def test_times_are_genuinely_per_sample():
    """Per-sample time arrays must be real measurements, not one mean
    replicated n times (round-1 VERDICT item 4): n independent wall-clock
    timings of the same program never agree to sub-microsecond."""
    with open(LBFGS_JSON) as f:
        lbfgs = json.load(f)
    with open(HYBRID_JSON) as f:
        hybrid = json.load(f)
    for name, arr in [("lbfgs total_times", lbfgs["total_times"]),
                      ("hybrid total_times", hybrid["total_times"]),
                      ("hybrid ffn_times", hybrid["ffn_times"])]:
        a = np.asarray(arr, dtype=float)
        if a.size > 1:
            assert np.unique(a).size > 1, (
                f"{name} is a constant-replicated array — not per-sample "
                f"measurements: {a.tolist()}")


def test_table_quotes_json_means():
    with open(LBFGS_JSON) as f:
        lbfgs = json.load(f)
    table = open(TABLE).read()
    formatted = f"{lbfgs['statistics']['mean_error']:.4f}%"
    assert formatted in table, (
        f"COMPARISON_TABLE.txt does not quote the L-BFGS mean error "
        f"{formatted} from lbfgs_actual_results.json")
    # the three method rows exist
    for name in ("FFN-Only", "Pure L-BFGS", "Hybrid"):
        assert re.search(rf"\|\s*{re.escape(name)}", table)


def test_errors_meet_target():
    """The shipped evidence meets the north-star accuracy bar
    (BASELINE.json: <=0.03% mean error; reference achieved 0.0236%)."""
    with open(LBFGS_JSON) as f:
        d = json.load(f)
    assert d["statistics"]["mean_error"] <= 0.03


# ---------------------------------------------------------------------------
# Committed model artifacts (the reference suite validates ITS shipped model
# the same way, /root/reference/tests/test_suite.py:150-184)
# ---------------------------------------------------------------------------

MODEL_PKL = os.path.join(RESULTS_DIR, "models", "ffn_surrogate.pkl")
SCALERS_PKL = os.path.join(RESULTS_DIR, "data", "scalers.pkl")
HISTORY_JSON = os.path.join(RESULTS_DIR, "models", "training_history.json")

model_mark = pytest.mark.skipif(
    not os.path.exists(MODEL_PKL),
    reason="trained surrogate not generated yet (TPU training run)")


@model_mark
def test_committed_surrogate_dims_and_finiteness():
    """11 features -> 13 params, >10k parameters, all weights finite."""
    import jax
    from option_pricing_ffn_lbfgs_tpu.surrogate.train import load_surrogate
    s = load_surrogate(MODEL_PKL)
    leaves = jax.tree.leaves(s.variables)
    n_params = sum(int(np.size(l)) for l in leaves)
    assert n_params > 10_000
    for leaf in leaves:
        assert np.isfinite(np.asarray(leaf)).all()
    assert s.feature_scaler.mean_.shape[-1] == 11
    assert s.target_scaler.mean_.shape[-1] == 13


@model_mark
def test_committed_scalers_roundtrip():
    from option_pricing_ffn_lbfgs_tpu.surrogate.scalers import load_scalers
    fs, ts = load_scalers(SCALERS_PKL)
    assert fs.mean_.shape[-1] == 11 and ts.mean_.shape[-1] == 13
    x = np.linspace(0.0, 1.0, 11)[None, :]
    np.testing.assert_allclose(
        np.asarray(fs.inverse_transform(fs.transform(x))), x, atol=1e-5)


@model_mark
def test_committed_surrogate_smoke_prediction():
    """FFN-only prediction on a fresh in-distribution surface must price
    within 10% mean relative error (the reference's shipped FFN measured
    11.25%; ours measured ~1.7-3%)."""
    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
        DHParams, price_options)
    from option_pricing_ffn_lbfgs_tpu.surrogate.train import load_surrogate
    s = load_surrogate(MODEL_PKL)
    rng = np.random.default_rng(123)
    ranges = [(0.025, 0.080), (1.5, 4.5), (0.025, 0.065), (0.20, 0.50),
              (-0.85, -0.40), (0.020, 0.070), (0.30, 1.20), (0.025, 0.070),
              (0.10, 0.35), (-0.70, -0.20), (0.05, 0.25), (-0.08, -0.01),
              (0.03, 0.12)]
    true = jnp.asarray([rng.uniform(lo, hi) for lo, hi in ranges])
    strikes = jnp.asarray(np.tile([90., 95., 100., 105., 110.], 3))
    mats = jnp.asarray(np.repeat([0.25, 0.5, 1.0], 5))
    calls = jnp.ones(15, bool)
    market = price_options(DHParams.from_vector(true), 100.0, 0.03,
                           strikes, mats, calls)
    pred = s.predict_params(np.asarray(market)[None, :],
                            np.asarray([100.0]))
    model = price_options(DHParams.from_vector(jnp.asarray(pred)[0]),
                          100.0, 0.03, strikes, mats, calls)
    rel = np.abs(np.asarray(model) / np.asarray(market) - 1)
    assert np.isfinite(rel).all()
    assert rel.mean() < 0.10


@model_mark
def test_training_history_finite_and_two_stage():
    """Both stages must show finite losses end-to-end — the round-2
    committed history logged NaN for every finetune epoch (the model was
    silently pretrain-only)."""
    with open(HISTORY_JSON) as f:
        h = json.load(f)
    for stage in ("pretrain", "finetune"):
        assert stage in h, f"missing {stage} history"
        tl = np.asarray(h[stage]["train_loss"], dtype=float)
        vl = np.asarray(h[stage]["val_loss"], dtype=float)
        assert tl.size > 0 and vl.size > 0
        assert np.isfinite(tl).all(), f"{stage} train_loss has NaN/Inf"
        assert np.isfinite(vl).all(), f"{stage} val_loss has NaN/Inf"


def test_cited_artifacts_exist():
    """Files the code/docs cite as evidence must actually be committed
    (VERDICT r4 'What's missing' #1: utils/timing.py, bench.py and
    scripts/perf_audit.py all cite results/perf_audit.json as the audit
    record — in round 4 the file did not exist)."""
    cited = [
        "perf_audit.json",        # utils/timing.py:15, bench.py docstring
        "scaling.json",           # VERDICT scaling evidence
        "compile_breakdown.json",  # calibrator.py docstrings
        "pallas_bench.json",      # ops/cos_pallas.py provenance
        "raw_draws_bench.json",   # scripts/bench_raw_draws.py
        "COMPARISON_TABLE.txt",
        "lbfgs_actual_results.json",
        "hybrid_actual_results.json",
    ]
    missing = [f for f in cited
               if not os.path.exists(os.path.join(RESULTS_DIR, f))]
    assert not missing, f"cited results artifacts missing: {missing}"
