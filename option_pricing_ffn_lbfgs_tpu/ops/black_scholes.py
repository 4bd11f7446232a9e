"""Black-Scholes pricing and implied volatility, vectorized and jittable.

The reference ships an (unused) tanh-approximation ``norm_cdf`` helper
(double_heston.py:3-5) and documents its FFN features in implied-vol terms
(docs/METHODOLOGY.md:65-75: "ATM vol, skew, butterfly") without shipping an
IV solver. This module provides the real capability, TPU-native:

  * exact normal CDF via ``jax.scipy.special.ndtr`` (not the reference's
    tanh approximation — that helper was dead code and ~1e-3 accurate);
  * a safeguarded Newton implied-vol solver inside ``lax.while_loop``
    (bisection fallback keeps every iterate inside a bracket, so it is
    jit/vmap-safe with no data-dependent Python control flow);
  * everything is elementwise-vectorized: pass arrays of (price, strike,
    tau) and get arrays back, any broadcastable shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtr


def bs_price(spot, strike, tau, rate, vol, is_call=True, q=0.0):
    """Black-Scholes European option price. Elementwise over any shapes.

    Handles tau->0 / vol->0 limits via the discounted-intrinsic value.
    """
    spot, strike, tau, vol = jnp.broadcast_arrays(
        *map(jnp.asarray, (spot, strike, tau, vol)))
    dt = spot.dtype
    sq = jnp.sqrt(jnp.maximum(tau, 0.0))
    sig = jnp.maximum(vol, 1e-12) * jnp.maximum(sq, 1e-12)
    d1 = (jnp.log(spot / strike) + (rate - q + 0.5 * vol * vol) * tau) / sig
    d2 = d1 - sig
    df_r = jnp.exp(-rate * tau)
    df_q = jnp.exp(-q * tau)
    call = spot * df_q * ndtr(d1) - strike * df_r * ndtr(d2)
    put = strike * df_r * ndtr(-d2) - spot * df_q * ndtr(-d1)
    price = jnp.where(jnp.asarray(is_call), call, put)
    # Degenerate tau/vol: discounted intrinsic.
    fwd = spot * df_q
    intrinsic = jnp.where(jnp.asarray(is_call),
                          jnp.maximum(fwd - strike * df_r, 0.0),
                          jnp.maximum(strike * df_r - fwd, 0.0))
    degenerate = (tau <= 0.0) | (vol <= 0.0)
    return jnp.where(degenerate, intrinsic, price).astype(dt)


def bs_vega(spot, strike, tau, rate, vol, q=0.0):
    """dPrice/dVol (same for calls and puts)."""
    spot, strike, tau, vol = jnp.broadcast_arrays(
        *map(jnp.asarray, (spot, strike, tau, vol)))
    sq = jnp.sqrt(jnp.maximum(tau, 1e-12))
    sig = jnp.maximum(vol, 1e-12) * sq
    d1 = (jnp.log(spot / strike) + (rate - q + 0.5 * vol * vol) * tau) / sig
    pdf = jnp.exp(-0.5 * d1 * d1) / jnp.sqrt(2.0 * jnp.pi)
    return spot * jnp.exp(-q * tau) * pdf * sq


def implied_vol(price, spot, strike, tau, rate, is_call=True, q=0.0,
                lo: float = 1e-4, hi: float = 5.0, max_iter: int = 64,
                tol: float = 1e-10):
    """Implied Black-Scholes volatility by safeguarded Newton (+bisection).

    Returns NaN where no vol in [lo, hi] reproduces the price (arbitrage
    violations: price below intrinsic or above the spot/strike bound).
    Elementwise over any broadcastable shapes; jit/vmap-safe. Note
    ``lax.while_loop`` is not reverse-mode differentiable — for d(sigma)/
    d(price) use the implicit-function form 1/vega at the solution.
    """
    price, spot, strike, tau = jnp.broadcast_arrays(
        *map(jnp.asarray, (price, spot, strike, tau)))
    dt = price.dtype
    is_call = jnp.broadcast_to(jnp.asarray(is_call), price.shape)

    f = lambda v: bs_price(spot, strike, tau, rate, v, is_call, q) - price
    lo0 = jnp.full(price.shape, lo, dt)
    hi0 = jnp.full(price.shape, hi, dt)
    f_lo = f(lo0)
    f_hi = f(hi0)
    solvable = (f_lo <= 0.0) & (f_hi >= 0.0) & (tau > 0.0) & (price > 0.0)

    def cond(state):
        it, v, vlo, vhi, done = state
        return (it < max_iter) & ~jnp.all(done)

    def body(state):
        it, v, vlo, vhi, done = state
        fv = f(v)
        vega = bs_vega(spot, strike, tau, rate, v, q)
        newton = v - fv / jnp.maximum(vega, 1e-12)
        # Keep the bracket: fall back to bisection when Newton leaves it.
        inside = (newton > vlo) & (newton < vhi) & jnp.isfinite(newton)
        v_new = jnp.where(inside, newton, 0.5 * (vlo + vhi))
        vlo = jnp.where(fv < 0.0, v, vlo)
        vhi = jnp.where(fv > 0.0, v, vhi)
        # Vol-space convergence: step size, not price residual (price
        # residuals underflow for deep OTM/ITM where vega ~ 0). Sticky
        # per-element freeze: a converged iterate must not keep stepping —
        # at convergence newton equals a bracket endpoint, so the strict
        # ``inside`` test would otherwise fire a spurious bisection jump
        # while the loop keeps running for slower elements.
        done_new = done | (jnp.abs(v_new - v) <= tol)
        v_new = jnp.where(done, v, v_new)
        return it + 1, v_new, vlo, vhi, done_new

    v0 = jnp.full(price.shape, 0.2, dt)
    _, v, _, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), v0, lo0, hi0,
         jnp.zeros(price.shape, bool)))
    return jnp.where(solvable, v, jnp.nan)


def implied_vol_surface(prices, spot, strikes, maturities, rate, is_call=True,
                        q=0.0):
    """Convenience: IV for a whole surface in one fused solve (all entries
    iterate together inside a single while_loop)."""
    return implied_vol(prices, spot, strikes, maturities, rate, is_call, q)
