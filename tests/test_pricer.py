"""Pricer validation: golden parity with the reference + COS properties.

Golden values were measured by running the reference implementation
(/root/reference/src/models/double_heston.py) in this environment — see
SURVEY.md §6.1. Property tests mirror the reference suite's pricing section
(tests/test_suite.py:194-262) plus the put-call-parity check from the demo
(double_heston.py:289-299), done properly with assertions.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
    DHParams, price_options, price_single, truncation_range)
from tests.conftest import DEMO, GUESS0

# Golden values measured from the reference (SURVEY.md §6.1).
GOLDEN_DEMO_CALL = 13.872851144174323
GOLDEN_DEMO_PUT = 8.995793594010637
GOLDEN_README_CALL = 6.3260123995316935   # S0=100,K=105,T=0.5,r=0.03, README.md:94-102
GOLDEN_TRUNC = (-2.9427609620399946, 3.0127609620399947)


def _p(d):
    return DHParams.from_dict(d, jnp.float64)


class TestGoldenParity:
    def test_demo_call(self):
        c = price_single(_p(DEMO), 100.0, jnp.float64(100.0), 1.0, 0.05, True)
        assert abs(float(c) - GOLDEN_DEMO_CALL) < 1e-9

    def test_demo_put(self):
        p = price_single(_p(DEMO), 100.0, jnp.float64(100.0), 1.0, 0.05, False)
        assert abs(float(p) - GOLDEN_DEMO_PUT) < 1e-9

    def test_readme_call(self):
        params = dict(GUESS0, kappa2=0.8)   # README example uses kappa2=0.8
        c = price_single(_p(params), 100.0, jnp.float64(105.0), 0.5, 0.03, True)
        assert abs(float(c) - GOLDEN_README_CALL) < 1e-9

    def test_truncation_range(self):
        a, b = truncation_range(_p(DEMO), jnp.float64(1.0), jnp.float64(100.0),
                                100.0, 0.05)
        assert abs(float(a) - GOLDEN_TRUNC[0]) < 1e-9
        assert abs(float(b) - GOLDEN_TRUNC[1]) < 1e-9

    def test_n64_vs_n128(self):
        """COS converges exponentially: N=64 agrees with N=128 to ~1e-9."""
        c64 = price_single(_p(DEMO), 100.0, jnp.float64(100.0), 1.0, 0.05,
                           True, n_terms=64)
        c128 = price_single(_p(DEMO), 100.0, jnp.float64(100.0), 1.0, 0.05,
                            True, n_terms=128)
        assert abs(float(c64) - float(c128)) < 1e-8

    def test_float32_accuracy(self):
        """The f32 fast path prices to ~1e-5 relative accuracy."""
        params = DHParams.from_dict(DEMO, jnp.float32)
        c = price_single(params, 100.0, jnp.float32(100.0), 1.0, 0.05, True)
        assert abs(float(c) - GOLDEN_DEMO_CALL) / GOLDEN_DEMO_CALL < 5e-5


class TestPricingProperties:
    def test_put_call_parity(self):
        """C - P == S - K e^{-rT} (double_heston.py:289-299), to 1e-8."""
        c = price_single(_p(DEMO), 100.0, jnp.float64(100.0), 1.0, 0.05, True)
        p = price_single(_p(DEMO), 100.0, jnp.float64(100.0), 1.0, 0.05, False)
        rhs = 100.0 - 100.0 * np.exp(-0.05 * 1.0)
        assert abs(float(c - p) - rhs) < 1e-8

    def test_atm_price_reasonable(self):
        """ATM 1Y call in (2, 15) (test_suite.py:203-207)."""
        c = price_single(_p(GUESS0), 100.0, jnp.float64(100.0), 1.0, 0.03, True)
        assert 2.0 < float(c) < 15.0

    def test_monotone_in_strike(self, surface15):
        """Calls decrease in strike at fixed maturity (test_suite.py:213-226)."""
        strikes = jnp.asarray(np.linspace(80.0, 120.0, 9))
        mats = jnp.full(9, 0.5)
        prices = np.asarray(price_options(
            _p(GUESS0), 100.0, 0.03, strikes, mats, jnp.ones(9, bool)))
        assert np.all(np.diff(prices) < 0)

    def test_monotone_in_maturity(self):
        """Call prices increase with maturity (test_suite.py:229-240)."""
        mats = jnp.asarray([0.1, 0.25, 0.5, 1.0, 2.0])
        strikes = jnp.full(5, 100.0)
        prices = np.asarray(price_options(
            _p(GUESS0), 100.0, 0.03, strikes, mats, jnp.ones(5, bool)))
        assert np.all(np.diff(prices) > 0)

    def test_extreme_inputs_finite(self):
        """Short/long T, deep ITM/OTM all price finite (test_suite.py:243-262)."""
        strikes = jnp.asarray([50.0, 200.0, 100.0, 100.0])
        mats = jnp.asarray([0.5, 0.5, 0.01, 5.0])
        prices = np.asarray(price_options(
            _p(GUESS0), 100.0, 0.03, strikes, mats, jnp.ones(4, bool)))
        assert np.all(np.isfinite(prices))
        assert np.all(prices > 0)

    def test_no_jump_limit(self):
        """lambda -> 0 reduces to pure Double Heston (METHODOLOGY.md:148-157)."""
        no_jump = dict(DEMO, lambda_j=1e-12)
        zero_jump = dict(DEMO, lambda_j=0.0, mu_j=0.0, sigma_j=0.0)
        c1 = price_single(_p(no_jump), 100.0, jnp.float64(100.0), 1.0, 0.05, True)
        c2 = price_single(_p(zero_jump), 100.0, jnp.float64(100.0), 1.0, 0.05, True)
        assert abs(float(c1) - float(c2)) < 1e-6

    def test_vmap_over_param_batch(self, surface15):
        """vmap over a parameter batch equals per-example pricing."""
        strikes, mats, is_call = surface15
        base = _p(GUESS0).to_vector()
        batch = jnp.stack([base, base * 1.05, base * 0.95])
        f = jax.vmap(lambda v: price_options(
            DHParams.from_vector(v), 100.0, 0.03, strikes, mats, is_call))
        batched = np.asarray(f(batch))
        for i in range(3):
            single = np.asarray(price_options(
                DHParams.from_vector(batch[i]), 100.0, 0.03, strikes, mats,
                is_call))
            np.testing.assert_allclose(batched[i], single, rtol=1e-12)

    def test_grad_finite(self, surface15):
        """Autodiff through the pricer is NaN-free (the csqrt guard)."""
        strikes, mats, is_call = surface15
        def total(v):
            return jnp.sum(price_options(DHParams.from_vector(v), 100.0, 0.03,
                                         strikes, mats, is_call))
        g = jax.grad(total)(_p(GUESS0).to_vector())
        assert np.all(np.isfinite(np.asarray(g)))

    def test_jit_matches_eager(self, surface15):
        strikes, mats, is_call = surface15
        fn = lambda v: price_options(DHParams.from_vector(v), 100.0, 0.03,
                                     strikes, mats, is_call)
        v = _p(DEMO).to_vector()
        np.testing.assert_allclose(np.asarray(jax.jit(fn)(v)),
                                   np.asarray(fn(v)), rtol=1e-12)
