"""Calibration objective: relative-MSE pricing error + Feller penalty.

Mirrors lbfgs_calibrator.py:111-177 with two TPU-native changes:
  * model prices for the whole surface come from one vectorized COS
    evaluation (no per-option Python loop);
  * the reference's exception/NaN -> ``return 1e10`` sentinel
    (lbfgs_calibrator.py:152-158) becomes a ``where`` mask that keeps the
    computation differentiable: non-finite/non-positive prices are replaced
    by the market price (zero residual) before the MSE and the sentinel is
    added via a non-differentiable bump, so gradients never see NaN.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.double_heston import DHParams, price_options
from ..utils.config import CalibrationConfig
from .transforms import transform_to_params


def feller_penalty(params: DHParams, weight: float = 1000.0) -> jnp.ndarray:
    """``weight * sum_f max(0, sigma_f^2 - 2 kappa_f theta_f)``
    (lbfgs_calibrator.py:111-116)."""
    p1 = jnp.maximum(0.0, params.sigma1**2 - 2.0 * params.kappa1 * params.theta1)
    p2 = jnp.maximum(0.0, params.sigma2**2 - 2.0 * params.kappa2 * params.theta2)
    return weight * (p1 + p2)


def surface_loss(params: DHParams, spot, rate, strikes, maturities, is_call,
                 market_prices, config: CalibrationConfig = CalibrationConfig()):
    """Relative MSE over the surface + Feller penalty, NaN-safe.

    Returns the scalar loss. Differentiable everywhere; invalid pricer output
    contributes the sentinel ``config.bad_loss`` through a stop_gradient
    branch rather than poisoning gradients.
    """
    model = price_options(
        params, spot, rate, strikes, maturities, is_call,
        n_terms=config.pricer.n_terms, L=config.pricer.trunc_L,
        q=config.pricer.dividend_yield)
    valid = jnp.isfinite(model) & (model > 0.0)
    # Zero residual on invalid entries (keeps grad clean), then add sentinel.
    safe_model = jnp.where(valid, model, market_prices)
    rel = (safe_model - market_prices) / market_prices
    mse = jnp.mean(rel * rel)
    penalty = feller_penalty(params, config.feller_weight)
    loss = mse + penalty
    any_bad = jnp.any(~valid)
    bad = jnp.asarray(config.bad_loss, loss.dtype)
    loss = jnp.where(any_bad, jax.lax.stop_gradient(bad), loss)
    # Final belt-and-braces: a non-finite loss (e.g. overflow inside the CF
    # that still produced "finite" garbage upstream) becomes the sentinel.
    return jnp.where(jnp.isfinite(loss), loss, jax.lax.stop_gradient(bad))


def surface_residuals(params: DHParams, spot, rate, strikes, maturities,
                      is_call, market_prices,
                      config: CalibrationConfig = CalibrationConfig()):
    """The loss as a residual VECTOR: ``sum(r**2) == surface_loss`` exactly.

    Exposes the least-squares structure of the reference objective
    (lbfgs_calibrator.py:118-177) for Gauss–Newton/Levenberg–Marquardt:
      * r[0:n]   = relative pricing errors / sqrt(n)   (sum of squares = MSE)
      * r[n:n+2] = sqrt(weight * max(0, sigma_f^2 - 2 kappa_f theta_f)) per
        factor, so their squares reproduce the reference's LINEAR penalty.
        The sqrt kink at zero violation is masked with a double-where so
        forward-mode tangents stay finite on the inactive branch.

    Invalid pricer output (non-finite / non-positive) zeroes the residual
    like surface_loss; LM's accept/reject on total cost then treats such a
    region exactly as surface_loss's sentinel does — as non-improving.
    """
    model = price_options(
        params, spot, rate, strikes, maturities, is_call,
        n_terms=config.pricer.n_terms, L=config.pricer.trunc_L,
        q=config.pricer.dividend_yield)
    valid = jnp.isfinite(model) & (model > 0.0)
    safe_model = jnp.where(valid, model, market_prices)
    n = market_prices.shape[-1]
    rel = (safe_model - market_prices) / market_prices / jnp.sqrt(
        jnp.asarray(n, market_prices.dtype))
    viol = jnp.stack([
        params.sigma1**2 - 2.0 * params.kappa1 * params.theta1,
        params.sigma2**2 - 2.0 * params.kappa2 * params.theta2])
    active = viol > 0.0
    safe_viol = jnp.where(active, viol, 1.0)
    r_feller = jnp.where(
        active, jnp.sqrt(config.feller_weight * safe_viol), 0.0)
    r = jnp.concatenate([rel, r_feller])
    # Any invalid price poisons the whole vector with the sentinel (spread
    # evenly so sum(r^2) == bad_loss), mirroring surface_loss.
    any_bad = jnp.any(~valid)
    bad = jnp.sqrt(jnp.asarray(config.bad_loss, r.dtype) / r.shape[-1])
    return jnp.where(any_bad, jax.lax.stop_gradient(
        jnp.full_like(r, bad)), r)


def make_residual_fn(spot, rate, strikes, maturities, is_call, market_prices,
                     config: CalibrationConfig = CalibrationConfig()):
    """Bind market data -> ``residuals(x)`` on unconstrained R^13 (for LM)."""
    def residual_fn(x):
        params = transform_to_params(x)
        return surface_residuals(params, spot, rate, strikes, maturities,
                                 is_call, market_prices, config)
    return residual_fn


def make_residual_fn_dd(spot, rate, strikes, maturities, is_call,
                        market_prices,
                        config: CalibrationConfig = CalibrationConfig()):
    """Double-float residual function: float64 in/out, float32 ops inside.

    Semantics of surface_residuals at ~1e-12 worst-case pricing parity
    (measured, see models/double_heston_dd.py docstring), but the XLA
    program contains no float64 transcendental — the pricer runs in
    two-float32 compensated arithmetic (models/double_heston_dd.py), so the
    polish program avoids the 170-330 s XLA:TPU x64-emulation compile wall
    (VERDICT r1 item 3; phase-wise numbers in
    results/compile_breakdown.json). The few float64 ops left (residual
    assembly, masking) are compile-trivial.
    """
    from ..models.double_heston_dd import price_options_dd_core
    from .transforms import transform_to_params_dd

    f64 = jnp.float64
    spot64 = jnp.asarray(spot, f64)
    rate64 = jnp.asarray(rate, f64)
    strikes64 = jnp.asarray(strikes, f64)
    mats64 = jnp.asarray(maturities, f64)
    market64 = jnp.asarray(market_prices, f64)

    def residual_fn(x):
        p_dd = transform_to_params_dd(x)
        model = price_options_dd_core(
            p_dd, spot64, rate64, strikes64, mats64, is_call,
            n_terms=config.pricer.n_terms, L=config.pricer.trunc_L,
            q=config.pricer.dividend_yield)
        valid = jnp.isfinite(model) & (model > 0.0)
        safe_model = jnp.where(valid, model, market64)
        n = market64.shape[-1]
        rel = (safe_model - market64) / market64 / jnp.sqrt(
            jnp.asarray(n, f64))
        # Feller residuals from the DD params recombined to f64 (a handful
        # of trivial f64 ops).
        from ..ops.doublefloat import to_f64
        sigma1, kappa1, theta1 = (to_f64(p_dd.sigma1), to_f64(p_dd.kappa1),
                                  to_f64(p_dd.theta1))
        sigma2, kappa2, theta2 = (to_f64(p_dd.sigma2), to_f64(p_dd.kappa2),
                                  to_f64(p_dd.theta2))
        viol = jnp.stack([sigma1**2 - 2.0 * kappa1 * theta1,
                          sigma2**2 - 2.0 * kappa2 * theta2])
        active = viol > 0.0
        safe_viol = jnp.where(active, viol, 1.0)
        r_feller = jnp.where(
            active, jnp.sqrt(config.feller_weight * safe_viol), 0.0)
        r = jnp.concatenate([rel, r_feller])
        any_bad = jnp.any(~valid)
        bad = jnp.sqrt(jnp.asarray(config.bad_loss, f64) / r.shape[-1])
        return jnp.where(any_bad, jax.lax.stop_gradient(
            jnp.full_like(r, bad)), r)

    return residual_fn


def make_loss_fn(spot, rate, strikes, maturities, is_call, market_prices,
                 config: CalibrationConfig = CalibrationConfig()):
    """Bind market data -> ``loss(x)`` on unconstrained R^13 (jit/grad-ready).

    This is the function handed to the L-BFGS engine; its autodiff gradient
    replaces the reference's 14-evaluation finite differences
    (scipy 2-point FD through lbfgs_calibrator.py:259-269).
    """
    def loss_fn(x):
        params = transform_to_params(x)
        return surface_loss(params, spot, rate, strikes, maturities, is_call,
                            market_prices, config)
    return loss_fn
