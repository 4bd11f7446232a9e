"""Black-Scholes pricer/implied-vol and autodiff-Greeks tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
    DHParams, price_options)
from option_pricing_ffn_lbfgs_tpu.models.greeks import (
    greeks, param_sensitivities)
from option_pricing_ffn_lbfgs_tpu.ops.black_scholes import (
    bs_price, bs_vega, implied_vol)
from tests.conftest import DEMO


class TestBSPrice:
    def test_known_value(self):
        """Textbook value: S=K=100, T=1, r=5%, sigma=20% -> call 10.4506."""
        c = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, True))
        assert abs(c - 10.450584) < 1e-5
        p = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, False))
        # put-call parity
        assert abs(c - p - (100.0 - 100.0 * np.exp(-0.05))) < 1e-12

    def test_degenerate_limits(self):
        assert float(bs_price(100.0, 90.0, 0.0, 0.05, 0.2, True)) == 10.0
        assert float(bs_price(100.0, 90.0, 1.0, 0.05, 0.0, True)) == \
            pytest.approx(100.0 - 90.0 * np.exp(-0.05), abs=1e-12)

    def test_vega_matches_autodiff(self):
        v_an = float(bs_vega(100.0, 105.0, 0.5, 0.03, 0.25))
        v_ad = float(jax.grad(
            lambda s: bs_price(100.0, 105.0, 0.5, 0.03, s, True))(
            jnp.asarray(0.25)))
        assert abs(v_an - v_ad) < 1e-8


class TestImpliedVol:
    def test_roundtrip_grid(self):
        """IV(BS(sigma)) == sigma across the identifiable region.

        Excludes numerically unidentifiable corners (vega ~ 1e-18: deep
        ITM short-dated tiny-vol, ultra-OTM where the price underflows) —
        there, by construction, wide vol ranges give the same f64 price.
        """
        strikes = jnp.asarray([80.0, 90.0, 100.0, 110.0, 125.0])
        taus = jnp.asarray([0.25, 0.5, 2.0])
        vols = jnp.asarray([0.15, 0.2, 0.8])
        k, t, v = [a.ravel() for a in jnp.meshgrid(strikes, taus, vols)]
        prices = bs_price(100.0, k, t, 0.03, v, True)
        iv = implied_vol(prices, 100.0, k, t, 0.03, True)
        np.testing.assert_allclose(np.asarray(iv), np.asarray(v), atol=1e-7)

    def test_puts(self):
        p = bs_price(100.0, 120.0, 1.0, 0.03, 0.3, False)
        iv = float(implied_vol(p, 100.0, 120.0, 1.0, 0.03, False))
        assert abs(iv - 0.3) < 1e-7

    def test_arbitrage_violation_nan(self):
        # below intrinsic -> no solution
        iv = float(implied_vol(5.0, 100.0, 90.0, 0.5, 0.03, True))
        assert np.isnan(iv)

    def test_jit_vmap(self):
        f = jax.jit(lambda p, k: implied_vol(p, 100.0, k, 1.0, 0.03, True))
        prices = bs_price(100.0, jnp.asarray([95.0, 105.0]), 1.0, 0.03, 0.22)
        out = f(prices, jnp.asarray([95.0, 105.0]))
        np.testing.assert_allclose(np.asarray(out), 0.22, atol=1e-7)

    def test_double_heston_iv_smile(self, surface15):
        """IVs extracted from COS prices are finite and smile-shaped."""
        strikes, mats, is_call = surface15
        params = DHParams.from_dict(DEMO, jnp.float64)
        prices = price_options(params, 100.0, 0.03, strikes, mats, is_call)
        iv = np.asarray(implied_vol(prices, 100.0, strikes, mats, 0.03, True))
        assert np.all(np.isfinite(iv)) and np.all((iv > 0.05) & (iv < 1.5))
        # negative-rho + negative-jump model: downside skew (low strike > ATM)
        for m in range(3):
            row = iv[m * 5:(m + 1) * 5]
            assert row[0] > row[2]


class TestGreeks:
    @pytest.fixture(scope="class")
    def setup(self, surface15):
        strikes, mats, is_call = surface15
        params = DHParams.from_dict(DEMO, jnp.float64)
        return params, strikes, mats, is_call

    def test_shapes_and_ranges(self, setup):
        params, strikes, mats, is_call = setup
        g = greeks(params, 100.0, 0.03, strikes, mats, is_call)
        for field in g:
            assert field.shape == (15,)
            assert np.all(np.isfinite(np.asarray(field)))
        # call deltas in (0,1), gamma > 0, call rho > 0, vegas > 0
        assert np.all((np.asarray(g.delta) > 0) & (np.asarray(g.delta) < 1))
        assert np.all(np.asarray(g.gamma) > 0)
        assert np.all(np.asarray(g.rho) > 0)
        assert np.all(np.asarray(g.vega1) > 0)
        assert np.all(np.asarray(g.vega2) > 0)

    def test_delta_matches_finite_difference(self, setup):
        params, strikes, mats, is_call = setup
        g = greeks(params, 100.0, 0.03, strikes, mats, is_call)
        h = 1e-4
        up = price_options(params, 100.0 + h, 0.03, strikes, mats, is_call)
        dn = price_options(params, 100.0 - h, 0.03, strikes, mats, is_call)
        fd = (np.asarray(up) - np.asarray(dn)) / (2 * h)
        np.testing.assert_allclose(np.asarray(g.delta), fd, rtol=1e-5)

    def test_param_sensitivities(self, setup):
        params, strikes, mats, is_call = setup
        sens = param_sensitivities(params, 100.0, 0.03, strikes, mats,
                                   is_call)
        assert set(sens) == set(DHParams._fields)
        # prices increase in the variance states
        assert np.all(np.asarray(sens["v1_0"]) > 0)
        assert np.all(np.asarray(sens["v2_0"]) > 0)
        # FD cross-check one parameter (sigma1), central difference
        h = 1e-5
        up = price_options(params._replace(sigma1=params.sigma1 + h), 100.0,
                           0.03, strikes, mats, is_call)
        dn = price_options(params._replace(sigma1=params.sigma1 - h), 100.0,
                           0.03, strikes, mats, is_call)
        fd = (np.asarray(up) - np.asarray(dn)) / (2 * h)
        np.testing.assert_allclose(np.asarray(sens["sigma1"]), fd,
                                   rtol=1e-4, atol=1e-8)
