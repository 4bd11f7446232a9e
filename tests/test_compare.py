"""Method-comparison driver test (small scale, CPU)."""
import json
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # training/polish-heavy; run with `pytest -m ""`

from option_pricing_ffn_lbfgs_tpu.compare import run_comparison
from option_pricing_ffn_lbfgs_tpu.data.synthetic import generate_dataset
from option_pricing_ffn_lbfgs_tpu.surrogate.train import (
    TrainConfig, dataset_to_xy, fit)
from option_pricing_ffn_lbfgs_tpu.utils.config import (
    CalibrationConfig, GeneratorConfig, LBFGSConfig, PricerConfig)


@pytest.fixture(scope="module")
def setup():
    ds = generate_dataset(jax.random.key(4), GeneratorConfig(n_samples=150),
                          n_terms=64)
    fx, fy = dataset_to_xy(ds)
    surrogate, _ = fit(fx, fy, TrainConfig(max_epochs=30, patience=30,
                                           batch_size=64))
    return ds, surrogate


def test_comparison_artifacts(setup, tmp_path):
    ds, surrogate = setup
    out_dir = str(tmp_path / "results")
    # Small-but-real config keeps this CPU test fast; the full-size run is
    # the TPU compare CLI (results/ artifacts).
    cfg = CalibrationConfig(pricer=PricerConfig(n_terms=64),
                            lbfgs=LBFGSConfig(maxiter=120))
    payload = run_comparison(ds, surrogate, n_eval=3, config=cfg,
                             out_dir=out_dir)
    # artifacts exist with the reference schemas
    with open(os.path.join(out_dir, "lbfgs_actual_results.json")) as f:
        lbfgs = json.load(f)
    assert set(lbfgs) >= {"pricing_errors", "total_times", "iterations",
                          "statistics"}
    with open(os.path.join(out_dir, "hybrid_actual_results.json")) as f:
        hybrid = json.load(f)
    assert set(hybrid) >= {"pricing_errors", "ffn_times", "lbfgs_times",
                           "total_times", "ffn_errors", "improvements"}
    table = open(os.path.join(out_dir, "COMPARISON_TABLE.txt")).read()
    assert "Pure L-BFGS" in table and "Hybrid" in table
    # sanity ordering: L-BFGS and hybrid are far more accurate than FFN-only
    assert payload["lbfgs"]["statistics"]["mean_error"] < payload["ffn"]["mean_error"]
    assert payload["hybrid"]["statistics"]["mean_error"] < payload["ffn"]["mean_error"]
    # anti-fabrication invariant (reference test_suite.py:92-95)
    np.testing.assert_allclose(
        lbfgs["statistics"]["mean_error"],
        np.mean(lbfgs["pricing_errors"]), atol=1e-9)
