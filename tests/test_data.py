"""Synthetic generator tests (mirrors test_suite.py:352-374 data-integrity
section plus semantics checks against synthetic_generator.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from option_pricing_ffn_lbfgs_tpu.data.synthetic import (
    PARAM_RANGES, RANGE_HI, RANGE_LO, generate_dataset, load_dataset,
    save_dataset, to_calibration_results, trading_dates)
from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
    DHParams, PARAM_NAMES, price_options)
from option_pricing_ffn_lbfgs_tpu.utils.config import GeneratorConfig

CFG = GeneratorConfig(n_samples=40)


@pytest.fixture(scope="module")
def ds():
    return generate_dataset(jax.random.key(0), CFG, n_terms=64)


def test_shapes(ds):
    assert ds.params.shape == (40, 13)
    assert ds.market_prices.shape == (40, 15)
    assert ds.n_samples == 40


def test_params_in_ranges(ds):
    p = np.asarray(ds.params)
    assert np.all(p >= RANGE_LO - 1e-12)
    assert np.all(p <= RANGE_HI + 1e-12)


def test_feller_enforced(ds):
    """Default generator produces recoverable (Feller-satisfying) truth."""
    p = np.asarray(ds.params)
    assert np.all(p[:, 3] ** 2 <= 2 * p[:, 1] * p[:, 2] + 1e-10)
    assert np.all(p[:, 8] ** 2 <= 2 * p[:, 6] * p[:, 7] + 1e-10)


def test_feller_raw_mode():
    """enforce_feller=False reproduces the reference's raw draws (which can
    violate Feller — synthetic_generator.py:75-89 has no such constraint)."""
    import dataclasses
    raw_cfg = dataclasses.replace(CFG, n_samples=60, enforce_feller=False)
    raw = generate_dataset(jax.random.key(0), raw_cfg, n_terms=32)
    p = np.asarray(raw.params)
    assert np.any(p[:, 3] ** 2 > 2 * p[:, 1] * p[:, 2])  # violations exist


def test_ar1_persistence(ds):
    """Day-over-day params are AR(1)-blended: successive days correlate."""
    p = np.asarray(ds.params)
    diffs = np.abs(np.diff(p, axis=0))
    widths = RANGE_HI - RANGE_LO
    # With alpha=0.9 the mean daily move is ~0.1 * mean-uniform-gap.
    assert np.mean(diffs / widths) < 0.1


def test_prices_match_pricer(ds):
    """model_prices are genuine COS prices of the stored params/spot."""
    i = 7
    recomputed = price_options(
        DHParams.from_vector(ds.params[i]), ds.spots[i], 0.03,
        ds.strikes[i], ds.maturities[i], jnp.ones(15, bool), n_terms=64)
    np.testing.assert_allclose(np.asarray(recomputed),
                               np.asarray(ds.model_prices[i]), rtol=1e-10)


def test_noise_level(ds):
    rel = np.asarray((ds.market_prices - ds.model_prices) / ds.model_prices)
    assert 0.005 < rel.std() < 0.05     # ~2% multiplicative noise
    assert abs(rel.mean()) < 0.01


def test_moneyness_preserved(ds):
    k = np.asarray(ds.strikes)
    s = np.asarray(ds.spots)
    np.testing.assert_allclose(k[:, 0] / s, 0.9, rtol=1e-12)
    np.testing.assert_allclose(k[:, 4] / s, 1.1, rtol=1e-12)


def test_trading_dates_weekdays():
    dates = trading_dates(40)
    assert dates[0] == "2022-01-03"
    import datetime
    assert all(datetime.date.fromisoformat(d).weekday() < 5 for d in dates)
    assert len(set(dates)) == 40


def test_calibration_records(ds):
    recs = to_calibration_results(ds, CFG)
    assert len(recs) == 40
    r = recs[0]
    assert len(r.market_options) == 15          # test_suite.py:366-370
    assert set(r.parameters) == set(PARAM_NAMES)
    assert r.calibration_time is None and r.iterations is None
    assert {"strike", "maturity", "price", "option_type"} <= set(
        r.market_options[0])


def test_pickle_roundtrip(ds, tmp_path):
    path = str(tmp_path / "synth.pkl")
    save_dataset(ds, path, CFG)
    back = load_dataset(path)
    np.testing.assert_allclose(np.asarray(back.params),
                               np.asarray(ds.params), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(back.market_prices),
                               np.asarray(ds.market_prices), rtol=1e-12)


def test_npz_roundtrip(ds, tmp_path):
    path = str(tmp_path / "synth.npz")
    save_dataset(ds, path, CFG)
    back = load_dataset(path)
    np.testing.assert_allclose(np.asarray(back.losses),
                               np.asarray(ds.losses), rtol=1e-12)


def test_determinism():
    a = generate_dataset(jax.random.key(3), GeneratorConfig(n_samples=5),
                         n_terms=32)
    b = generate_dataset(jax.random.key(3), GeneratorConfig(n_samples=5),
                         n_terms=32)
    np.testing.assert_array_equal(np.asarray(a.market_prices),
                                  np.asarray(b.market_prices))
