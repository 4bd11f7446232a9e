"""Market-data ingestion tests."""
import numpy as np
import pytest

from option_pricing_ffn_lbfgs_tpu.data.market import (
    fetch_yfinance, load_option_chain_csv, load_option_chain_json,
    save_option_chain_csv)

OPTS = [
    {"strike": 90.0, "maturity": 0.25, "price": 12.1, "option_type": "call"},
    {"strike": 100.0, "maturity": 0.5, "price": 6.3, "option_type": "put"},
]


def test_csv_roundtrip(tmp_path):
    path = str(tmp_path / "chain.csv")
    save_option_chain_csv(path, OPTS, spot=101.5, rate=0.035)
    opts, spot, rate = load_option_chain_csv(path)
    assert spot == 101.5 and rate == 0.035
    assert opts == OPTS


def test_csv_without_metadata(tmp_path):
    path = str(tmp_path / "chain.csv")
    save_option_chain_csv(path, OPTS)
    opts, spot, rate = load_option_chain_csv(path)
    assert spot is None and rate is None
    assert len(opts) == 2


def test_json_load(tmp_path):
    import json
    path = str(tmp_path / "chain.json")
    with open(path, "w") as f:
        json.dump({"spot": 100.0, "rate": 0.03, "options": OPTS}, f)
    opts, spot, rate = load_option_chain_json(path)
    assert spot == 100.0 and opts[1]["option_type"] == "put"


def test_csv_feeds_calibrator(tmp_path):
    from option_pricing_ffn_lbfgs_tpu.calibration.calibrator import (
        options_to_arrays)
    path = str(tmp_path / "chain.csv")
    save_option_chain_csv(path, OPTS, spot=100.0, rate=0.03)
    opts, _, _ = load_option_chain_csv(path)
    k, m, p, c = options_to_arrays(opts)
    np.testing.assert_allclose(k, [90.0, 100.0])
    assert list(c) == [True, False]


def test_yfinance_gated():
    """Without yfinance installed the fetcher raises a clear ImportError."""
    with pytest.raises(ImportError, match="yfinance"):
        fetch_yfinance("SPY")
