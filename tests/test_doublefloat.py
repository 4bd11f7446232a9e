"""Tests for the double-float (two-float32) numerics core.

This is the file cited by ops/doublefloat.py, ops/complex_dd.py and
models/double_heston_dd.py: it guards

  * the error-free-transformation invariants against compiler regressions —
    XLA's FMA contraction and its algebraic simplifier's constant
    reassociation both silently truncated EFT chains to float32 in earlier
    revisions (see ops/doublefloat.py module docstring);
  * transcendental accuracy over the COS pricer's argument ranges,
    including the exp domain cliffs (the round-2 advisor found
    exp(-400) = 2.6e-20 garbage from exponent-bit wrap);
  * DD-pricer vs float64-pricer parity over the generator's market ranges;
  * lm_minimize on analytic least-squares problems.

The reference has no analogous precision suite (its intended one is
documented but unshipped, /root/reference/docs/METHODOLOGY.md:148-157).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from option_pricing_ffn_lbfgs_tpu.ops import doublefloat as df
from option_pricing_ffn_lbfgs_tpu.ops.levenberg_marquardt import lm_minimize
from option_pricing_ffn_lbfgs_tpu.utils.config import LMConfig


# ---------------------------------------------------------------------------
# Error-free transformation invariants (exactness vs float64)
# ---------------------------------------------------------------------------

class TestEFT:
    def test_two_sum_exact(self):
        rng = np.random.default_rng(0)
        a = np.asarray(rng.normal(size=20000)
                       * 10.0 ** rng.integers(-8, 8, 20000), np.float32)
        b = np.asarray(rng.normal(size=20000)
                       * 10.0 ** rng.integers(-8, 8, 20000), np.float32)
        s, e = jax.jit(df.two_sum)(jnp.asarray(a), jnp.asarray(b))
        got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        assert np.array_equal(got, a.astype(np.float64) + b.astype(np.float64))

    def test_two_prod_exact(self):
        rng = np.random.default_rng(1)
        a = np.asarray(rng.normal(size=20000), np.float32)
        b = np.asarray(rng.normal(size=20000), np.float32)
        p, e = jax.jit(df.two_prod)(jnp.asarray(a), jnp.asarray(b))
        got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        exact = a.astype(np.float64) * b.astype(np.float64)
        # The final correction adds act on <=2^-34-scale terms; allow only
        # sub-2^-52-relative slack.
        assert np.max(np.abs(got - exact) / np.abs(exact)) < 3e-16

    def test_split_halves_are_narrow(self):
        """Each split half must fit 12 significant bits so products of
        halves are exact in float32."""
        rng = np.random.default_rng(2)
        a = np.asarray(rng.normal(size=10000), np.float32)
        hi, lo = jax.jit(df._split)(jnp.asarray(a))
        hi, lo = np.asarray(hi), np.asarray(lo)
        assert np.array_equal(hi + lo, a)  # split is exact
        # 12-significant-bit check: value * 2^k is an integer < 2^12 for
        # some k — equivalently the product of any two halves is exact.
        prod = hi.astype(np.float64) * hi.astype(np.float64)
        assert np.array_equal(np.asarray(hi * hi, np.float64), prod)
        prod = lo.astype(np.float64) * lo.astype(np.float64)
        assert np.array_equal(np.asarray(lo * lo, np.float64), prod)

    def test_jit_constant_does_not_collapse_two_sum(self):
        """Regression: XLA algsimp folds (c + y) - c -> y for literal
        constants, zeroing two_sum's error term. dd_const/add_f pin their
        constants; this asserts the pin still works under jit."""
        x = np.float32(0.0018357)

        @jax.jit
        def sub_from_one(v):
            one = df.dd_const(1.0, like=(v, v))
            return df.sub(one, (v, jnp.zeros_like(v)))

        hi, lo = sub_from_one(jnp.asarray(x))
        got = np.float64(hi) + np.float64(lo)
        assert abs(got - (1.0 - np.float64(x))) < 1e-12
        # the error term must actually be populated
        assert np.float64(lo) != 0.0

    def test_pow2_exact_and_clamped(self):
        k = jnp.asarray(np.arange(-126, 128), jnp.float32)
        got = np.asarray(jax.jit(df._pow2)(k), np.float64)
        assert np.array_equal(got, 2.0 ** np.arange(-126, 128))
        # out-of-range k is clipped, not wrapped into garbage
        wild = jnp.asarray([-4000.0, -200.0, 300.0, 5000.0], jnp.float32)
        got = np.asarray(jax.jit(df._pow2)(wild), np.float64)
        assert np.array_equal(got, [2.0**-126, 2.0**-126, 2.0**127, 2.0**127])


# ---------------------------------------------------------------------------
# Arithmetic accuracy (double-float wordlength ~2^-48)
# ---------------------------------------------------------------------------

class TestArithmetic:
    def _rand_dd(self, n, seed=0, scale=1.0):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=n) * scale
        return x, df.from_f64(jnp.asarray(x))

    def test_mul_sqr_div_accuracy(self):
        x, xd = self._rand_dd(10000, 3)
        y, yd = self._rand_dd(10000, 4)
        rel = np.abs(np.asarray(df.to_f64(jax.jit(df.mul)(xd, yd))) / (x * y) - 1)
        assert rel.max() < 5e-14
        rel = np.abs(np.asarray(df.to_f64(jax.jit(df.sqr)(xd))) / (x * x) - 1)
        assert rel.max() < 5e-14
        rel = np.abs(np.asarray(df.to_f64(jax.jit(df.div)(xd, yd))) / (x / y) - 1)
        assert rel.max() < 5e-14

    def test_add_sub_accuracy(self):
        x, xd = self._rand_dd(10000, 5)
        y, yd = self._rand_dd(10000, 6)
        got = np.asarray(df.to_f64(jax.jit(df.add)(xd, yd)))
        assert np.max(np.abs(got - (x + y))) < 1e-13
        got = np.asarray(df.to_f64(jax.jit(df.sub)(xd, yd)))
        assert np.max(np.abs(got - (x - y))) < 1e-13

    def test_sqrt_accuracy(self):
        x, xd = self._rand_dd(5000, 7)
        x = np.abs(x) * 10
        xd = df.from_f64(jnp.asarray(x))
        rel = np.abs(np.asarray(df.to_f64(jax.jit(df.sqrt)(xd))) / np.sqrt(x) - 1)
        assert rel.max() < 5e-14
        # zero guard
        z = jax.jit(df.sqrt)(df.from_f64(jnp.asarray([0.0])))
        assert float(df.to_f64(z)[0]) == 0.0

    def test_comparisons_and_select(self):
        x, xd = self._rand_dd(1000, 8)
        y, yd = self._rand_dd(1000, 9)
        # compare against the DD-rounded values (from_f64 keeps ~49 bits)
        xr = np.asarray(df.to_f64(xd))
        yr = np.asarray(df.to_f64(yd))
        assert np.array_equal(np.asarray(jax.jit(df.gt)(xd, yd)), xr > yr)
        got = np.asarray(df.to_f64(jax.jit(df.max_)(xd, yd)))
        assert np.array_equal(got, np.maximum(xr, yr))


# ---------------------------------------------------------------------------
# Transcendentals over the pricer's argument ranges
# ---------------------------------------------------------------------------

class TestTranscendentals:
    def test_exp_accuracy_contract(self):
        """rel err <= max(~2^-47, 1.2e-38/exp(x)): full DD accuracy where
        both words are normal, graceful f32-grade taper where the lo word
        underflows (results < ~1e-26; additively negligible in the COS
        series)."""
        x = np.linspace(-86.0, 85.0, 12001)
        got = np.asarray(jax.jit(
            lambda v: df.to_f64(df.exp(df.from_f64(v))))(jnp.asarray(x)))
        rel = np.abs(got / np.exp(x) - 1)
        bound = np.maximum(1e-12, 2e-38 / np.exp(x))
        assert np.all(rel <= bound)
        # the live range of the pricer gets full DD accuracy
        core = np.abs(x) <= 55
        assert rel[core].max() < 5e-13

    def test_exp_domain_cliffs(self):
        """Advisor repro: arguments past the float32 exponent range must
        clamp to exact 0 / +inf, never wrap into garbage."""
        xs = jnp.asarray([-88.0, -200.0, -400.0, -532.0, -1e6])
        got = np.asarray(jax.jit(
            lambda v: df.to_f64(df.exp(df.from_f64(v))))(xs))
        assert np.array_equal(got, np.zeros(5))
        xs = jnp.asarray([89.0, 200.0, 1e6])
        got = np.asarray(jax.jit(
            lambda v: df.to_f64(df.exp(df.from_f64(v))))(xs))
        assert np.all(np.isposinf(got))

    def test_sincos_range(self):
        """|arg| up to 2e4 covers the pricer's u*(x-a) phases; absolute
        error is bounded by the input-representation limit |y|*2^-48."""
        for lim in (3.0, 400.0, 2e4):
            y = np.linspace(-lim, lim, 4001)
            s, c = jax.jit(lambda v: tuple(
                map(df.to_f64, df.sincos(df.from_f64(v)))))(jnp.asarray(y))
            bound = max(1e-13, lim * 2.0 ** -46)
            assert np.max(np.abs(np.asarray(s) - np.sin(y))) < bound
            assert np.max(np.abs(np.asarray(c) - np.cos(y))) < bound

    def test_log_range(self):
        z = np.concatenate([np.linspace(1e-4, 1.0, 2001),
                            np.linspace(1.0, 1e4, 2001)])
        got = np.asarray(jax.jit(
            lambda v: df.to_f64(df.log(df.from_f64(v))))(jnp.asarray(z)))
        assert np.max(np.abs(got - np.log(z))) < 1e-12

    def test_atan2_all_quadrants(self):
        rng = np.random.default_rng(10)
        b = rng.normal(size=4000) * 5
        a = rng.normal(size=4000) * 5
        got = np.asarray(jax.jit(lambda x, y: df.to_f64(
            df.atan2(df.from_f64(x), df.from_f64(y))))(
            jnp.asarray(b), jnp.asarray(a)))
        assert np.max(np.abs(got - np.arctan2(b, a))) < 1e-13

    def test_tanh(self):
        t = np.linspace(-25, 25, 2001)
        got = np.asarray(jax.jit(
            lambda v: df.to_f64(df.tanh(df.from_f64(v))))(jnp.asarray(t)))
        assert np.max(np.abs(got - np.tanh(t))) < 1e-14

    def test_compensated_sum(self):
        rng = np.random.default_rng(11)
        x = rng.normal(size=(7, 128)) * 100
        got = np.asarray(df.to_f64(jax.jit(
            lambda v: df.sum_(df.from_f64(v), axis=-1))(jnp.asarray(x))))
        assert np.max(np.abs(got - x.sum(axis=-1))) < 1e-11


# ---------------------------------------------------------------------------
# DD pricer vs float64 pricer parity
# ---------------------------------------------------------------------------

class TestPricerParity:
    def test_advisor_repro_sigma_j_large_short_tau(self):
        """sigma_j=0.25, tau=0.1 produced all-NaN DD prices before the exp
        domain clamp (jump-CF amplitude exponent ~ -28600)."""
        from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
            DHParams, price_options)
        from option_pricing_ffn_lbfgs_tpu.models.double_heston_dd import (
            price_options_dd)
        pv = jnp.asarray([0.04, 2.5, 0.04, 0.3, -0.7, 0.04, 0.5, 0.04, 0.2,
                          -0.5, 0.15, -0.04, 0.25])
        k1 = jnp.asarray([100.0]); t1 = jnp.asarray([0.1])
        c1 = jnp.ones(1, bool)
        f = jax.jit(lambda v: price_options(
            DHParams.from_vector(v), 100.0, 0.03, k1, t1, c1))
        g = jax.jit(lambda v: price_options_dd(
            DHParams.from_vector(v), 100.0, 0.03, k1, t1, c1))
        a, b = float(f(pv)[0]), float(g(pv)[0])
        assert np.isfinite(b)
        assert abs(b / a - 1) < 1e-9

    def test_parity_over_generator_ranges(self):
        """>=50 random in-distribution parameter draws, worst-case relative
        price agreement. Measured ~1e-12 worst-case (2026-08-19, after the
        FMA/algsimp hardening); asserted at 1e-10 for slack across
        backends."""
        from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
            DHParams, price_options)
        from option_pricing_ffn_lbfgs_tpu.models.double_heston_dd import (
            price_options_dd)
        rng = np.random.default_rng(7)
        ranges = [(0.025, 0.080), (1.5, 4.5), (0.025, 0.065), (0.20, 0.50),
                  (-0.85, -0.40), (0.020, 0.070), (0.30, 1.20),
                  (0.025, 0.070), (0.10, 0.35), (-0.70, -0.20),
                  (0.05, 0.25), (-0.08, -0.01), (0.03, 0.12)]
        V = jnp.asarray(np.stack(
            [rng.uniform(lo, hi, 50) for lo, hi in ranges], axis=-1))
        strikes = jnp.asarray(np.tile([90., 95., 100., 105., 110.], 3))
        mats = jnp.asarray(np.repeat([0.25, 0.5, 1.0], 5))
        calls = jnp.ones(15, bool)
        A = np.asarray(jax.jit(jax.vmap(lambda v: price_options(
            DHParams.from_vector(v), 100.0, 0.03, strikes, mats, calls)))(V))
        B = np.asarray(jax.jit(jax.vmap(lambda v: price_options_dd(
            DHParams.from_vector(v), 100.0, 0.03, strikes, mats, calls)))(V))
        assert np.isfinite(B).all()
        assert np.max(np.abs(B / A - 1)) < 1e-10

    def test_golden_demo_call(self):
        """DD price of the reference demo call matches the measured golden
        value (SURVEY.md §6.1: 13.872851144174323)."""
        from option_pricing_ffn_lbfgs_tpu.models.double_heston import DHParams
        from option_pricing_ffn_lbfgs_tpu.models.double_heston_dd import (
            price_options_dd)
        demo = DHParams.from_dict(dict(
            v1_0=0.04, kappa1=2.0, theta1=0.04, sigma1=0.3, rho1=-0.5,
            v2_0=0.04, kappa2=1.5, theta2=0.04, sigma2=0.2, rho2=-0.3,
            lambda_j=0.5, mu_j=-0.05, sigma_j=0.10), jnp.float64)
        got = float(jax.jit(lambda: price_options_dd(
            demo, 100.0, 0.05, jnp.asarray([100.0]), jnp.asarray([1.0]),
            jnp.ones(1, bool)))()[0])
        assert abs(got - 13.872851144174323) < 1e-9


# ---------------------------------------------------------------------------
# Levenberg–Marquardt engine on analytic problems
# ---------------------------------------------------------------------------

class TestLM:
    def test_linear_least_squares_exact(self):
        """On a full-rank linear problem LM must reach the normal-equation
        solution (quadratic model is exact, one accepted step suffices)."""
        rng = np.random.default_rng(12)
        A = jnp.asarray(rng.normal(size=(17, 4)))
        b = jnp.asarray(rng.normal(size=17))
        res = jax.jit(lambda x0: lm_minimize(
            lambda x: A @ x - b, x0, LMConfig(maxiter=50)))(jnp.zeros(4))
        x_star = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
        assert bool(res.converged)
        assert np.max(np.abs(np.asarray(res.x) - x_star)) < 1e-8

    def test_rosenbrock_residuals(self):
        """Rosenbrock as residuals [10(y - x^2), 1 - x]: global minimum
        (1, 1) with zero residual."""
        def r(x):
            return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])
        res = jax.jit(lambda x0: lm_minimize(
            r, x0, LMConfig(maxiter=200)))(jnp.asarray([-1.2, 1.0]))
        assert bool(res.converged)
        assert np.max(np.abs(np.asarray(res.x) - 1.0)) < 1e-6
        assert float(res.f) < 1e-12

    def test_nan_region_rejected(self):
        """Residuals NaN outside |x| < 2: steps into the bad region must be
        rejected (cost -> inf), not poison the iterate."""
        def r(x):
            bad = jnp.abs(x[0]) >= 2.0
            val = jnp.where(bad, jnp.nan, x[0] - 1.5)
            return jnp.stack([val, 0.1 * x[0]])
        res = jax.jit(lambda x0: lm_minimize(
            r, x0, LMConfig(maxiter=100)))(jnp.asarray([0.0]))
        assert np.isfinite(float(res.f))
        assert np.isfinite(np.asarray(res.x)).all()

    def test_f32_jacobian_path(self):
        """A float32 Jacobian twin must not change the converged solution
        (acceptance is on the exact cost)."""
        rng = np.random.default_rng(13)
        A = jnp.asarray(rng.normal(size=(9, 3)))
        b = jnp.asarray(rng.normal(size=9))

        def r64(x):
            return A @ x - b

        def r32(x):
            return (A.astype(jnp.float32) @ x.astype(jnp.float32)
                    - b.astype(jnp.float32))

        res = jax.jit(lambda x0: lm_minimize(
            r64, x0, LMConfig(maxiter=100), jac_residual_fn=r32))(
            jnp.zeros(3, jnp.float64))
        x_star = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
        assert bool(res.converged)
        assert np.max(np.abs(np.asarray(res.x) - x_star)) < 1e-6

    def test_vmap_batch_of_solves(self):
        """The solver must vmap (the calibrator polishes batches)."""
        A = jnp.asarray(np.random.default_rng(14).normal(size=(5, 11, 3)))
        b = jnp.asarray(np.random.default_rng(15).normal(size=(5, 11)))
        out = jax.jit(jax.vmap(lambda Ai, bi: lm_minimize(
            lambda x: Ai @ x - bi, jnp.zeros(3), LMConfig(maxiter=60))))(A, b)
        assert bool(out.converged.all())
        for i in range(5):
            x_star = np.linalg.lstsq(np.asarray(A[i]), np.asarray(b[i]),
                                     rcond=None)[0]
            assert np.max(np.abs(np.asarray(out.x[i]) - x_star)) < 1e-7
