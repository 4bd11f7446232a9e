"""Calibration integration tests (mirrors tests/test_suite.py:270-344)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from option_pricing_ffn_lbfgs_tpu.calibration.calibrator import (
    DoubleHestonJumpCalibrator, calibrate_surface, options_to_arrays)
from option_pricing_ffn_lbfgs_tpu.calibration.loss import (
    feller_penalty, make_loss_fn)
from option_pricing_ffn_lbfgs_tpu.calibration.initial_guess import (
    initial_guesses)
from option_pricing_ffn_lbfgs_tpu.models.double_heston import DHParams
from option_pricing_ffn_lbfgs_tpu.utils.config import CalibrationConfig
from tests.conftest import TRUE


def _market(surface15, noiseless_market):
    strikes, mats, _ = surface15
    return [dict(strike=float(k), maturity=float(t), price=float(p),
                 option_type="call")
            for k, t, p in zip(strikes, mats, noiseless_market)]


@pytest.fixture(scope="module")
def calibrated(surface15, noiseless_market):
    opts = _market(surface15, noiseless_market)
    cal = DoubleHestonJumpCalibrator(100.0, 0.03, opts)
    return cal.calibrate(maxiter=300, multi_start=3)


class TestRoundTrip:
    def test_error_below_1pct(self, calibrated):
        """The reference suite's bar (test_suite.py:316-321)."""
        rel = np.abs((calibrated.model_prices - calibrated.market_prices)
                     / calibrated.market_prices)
        assert np.sqrt(np.mean(rel**2)) * 100 < 1.0

    def test_error_beats_baseline(self, calibrated):
        """North star: <= 0.03% mean relative error (BASELINE.md)."""
        assert calibrated.mean_rel_error_pct < 0.03

    def test_success_and_metadata(self, calibrated):
        assert calibrated.success
        assert calibrated.iterations > 1
        assert calibrated.final_loss < 1e-6
        assert calibrated.calibration_time > 0

    def test_recovered_params_sane(self, calibrated):
        """Broad sanity ranges (test_suite.py:327-344)."""
        p = calibrated.parameters
        for name in ["v1_0", "theta1", "v2_0", "theta2"]:
            assert 0.001 < p[name] < 0.5, name
        for name in ["kappa1", "kappa2"]:
            assert 0.01 < p[name] < 20.0, name
        for name in ["sigma1", "sigma2"]:
            assert 0.01 < p[name] < 2.0, name
        for name in ["rho1", "rho2"]:
            assert -1.0 < p[name] < 1.0, name
        assert 0.0 < p["lambda_j"] < 5.0
        assert -0.5 < p["mu_j"] < 0.5
        assert 0.0 < p["sigma_j"] < 1.0


class TestLossFunction:
    def test_zero_at_truth(self, surface15, noiseless_market, true_params):
        strikes, mats, is_call = surface15
        loss_fn = make_loss_fn(100.0, 0.03, strikes, mats, is_call,
                               jnp.asarray(noiseless_market))
        from option_pricing_ffn_lbfgs_tpu.calibration.transforms import (
            inverse_transform)
        x_true = inverse_transform(true_params.to_vector())
        assert float(loss_fn(x_true)) < 1e-16

    def test_feller_penalty(self):
        ok = DHParams.from_dict(TRUE, jnp.float64)
        assert float(feller_penalty(ok)) == 0.0
        bad = DHParams.from_dict(dict(TRUE, sigma1=2.0), jnp.float64)
        expected = 1000.0 * (2.0**2 - 2 * TRUE["kappa1"] * TRUE["theta1"])
        np.testing.assert_allclose(float(feller_penalty(bad)), expected)

    def test_grad_finite_at_all_guess_types(self, surface15, noiseless_market):
        strikes, mats, is_call = surface15
        loss_fn = make_loss_fn(100.0, 0.03, strikes, mats, is_call,
                               jnp.asarray(noiseless_market))
        x0 = initial_guesses(3, jax.random.key(0), 100.0, strikes, mats,
                             jnp.asarray(noiseless_market))
        for i in range(3):
            f, g = jax.value_and_grad(loss_fn)(x0[i])
            assert np.isfinite(float(f))
            assert np.all(np.isfinite(np.asarray(g)))


class TestInitialGuesses:
    def test_shapes_and_determinism(self, surface15, noiseless_market):
        strikes, mats, _ = surface15
        mkt = jnp.asarray(noiseless_market)
        a = initial_guesses(6, jax.random.key(7), 100.0, strikes, mats, mkt)
        b = initial_guesses(6, jax.random.key(7), 100.0, strikes, mats, mkt)
        assert a.shape == (6, 13)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_guess_type_cycle(self, surface15, noiseless_market):
        """Starts 0-2 are the reference's three families; extra starts share
        the family base (idx % 3) but are perturbed so every vmapped start
        probes a distinct basin (start 3 must NOT duplicate start 0)."""
        strikes, mats, _ = surface15
        mkt = jnp.asarray(noiseless_market)
        x = np.asarray(initial_guesses(7, jax.random.key(0), 100.0, strikes,
                                       mats, mkt))
        assert np.max(np.abs(x[3] - x[0])) > 1e-4    # perturbed, not a copy
        assert np.max(np.abs(x[6] - x[3])) > 1e-4    # fresh noise each start
        # but start 3 stays in family 0's neighborhood (+-20%-ish in
        # constrained space -> bounded distance in unconstrained space)
        assert np.max(np.abs(x[3] - x[0])) < 1.0

    def test_type1_rho_clipped(self, surface15, noiseless_market):
        from option_pricing_ffn_lbfgs_tpu.calibration.transforms import transform
        strikes, mats, _ = surface15
        mkt = jnp.asarray(noiseless_market)
        x = initial_guesses(30, jax.random.key(3), 100.0, strikes, mats, mkt)
        p = np.asarray(jax.vmap(transform)(x))
        type1 = p[1::3]
        assert np.all(type1[:, 4] <= -0.3 + 1e-9)
        assert np.all(type1[:, 4] >= -0.95 - 1e-9)


class TestAPI:
    def test_options_to_arrays(self):
        opts = [dict(strike=90.0, maturity=0.5, price=3.0, option_type="put"),
                dict(strike=110.0, maturity=1.0, price=5.0, option_type="Call")]
        k, m, p, c = options_to_arrays(opts)
        np.testing.assert_allclose(k, [90.0, 110.0])
        assert list(c) == [False, True]

    def test_compute_loss_api(self, surface15, noiseless_market):
        opts = _market(surface15, noiseless_market)
        cal = DoubleHestonJumpCalibrator(100.0, 0.03, opts)
        x0 = cal.inverse_transform_params(dict(TRUE))
        assert cal.compute_loss(x0) < 1e-15
        params = cal.transform_params(x0)
        np.testing.assert_allclose(params["v1_0"], TRUE["v1_0"], rtol=1e-9)
