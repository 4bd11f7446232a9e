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
