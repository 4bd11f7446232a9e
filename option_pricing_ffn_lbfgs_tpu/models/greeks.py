"""Greeks for the Double Heston + jump model via JAX autodiff.

The reference cannot produce Greeks (its pricer is a scalar NumPy loop and
its gradients are finite differences). Here every sensitivity is one
``jax.grad``/``jax.jacfwd`` through the COS pricer — exact to the dtype,
fused by XLA, and batched over the whole surface at once. This is the same
differentiability that powers the calibrator's autodiff gradients
(SURVEY.md §2.2 item 2).
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from .double_heston import DHParams, price_options


class Greeks(NamedTuple):
    price: jnp.ndarray    # [n]
    delta: jnp.ndarray    # dV/dS            [n]
    gamma: jnp.ndarray    # d2V/dS2          [n]
    theta: jnp.ndarray    # -dV/dtau         [n]
    rho: jnp.ndarray      # dV/dr            [n]
    vega1: jnp.ndarray    # dV/d sqrt(v1_0)  [n] (factor-1 spot-vol greek)
    vega2: jnp.ndarray    # dV/d sqrt(v2_0)  [n]


def greeks(params: DHParams, spot, rate, strikes, maturities, is_call,
           n_terms: int = 128, L: float = 10.0, q: float = 0.0) -> Greeks:
    """All standard Greeks for a surface in a handful of fused AD passes.

    vega1/vega2 are reported per unit of factor spot-vol (chain rule through
    v0 = vol^2), the market-facing convention.
    """
    dt = jnp.asarray(strikes).dtype
    spot = jnp.asarray(spot, dt)
    rate = jnp.asarray(rate, dt)
    taus = jnp.asarray(maturities, dt)

    def p_of(s, r, tau, v1, v2):
        pp = params._replace(v1_0=v1, v2_0=v2)
        return price_options(pp, s, r, strikes, tau, is_call,
                             n_terms=n_terms, L=L, q=q)

    price = p_of(spot, rate, taus, params.v1_0, params.v2_0)
    # Scalar inputs (spot, rate, v1_0, v2_0) are shared across the surface,
    # so per-option sensitivities need a Jacobian column: jacfwd with a
    # scalar input is ONE JVP returning the full [n] vector.
    delta = jax.jacfwd(p_of, argnums=0)(spot, rate, taus, params.v1_0,
                                        params.v2_0)
    gamma = jax.jacfwd(jax.jacfwd(p_of, argnums=0), argnums=0)(
        spot, rate, taus, params.v1_0, params.v2_0)
    g_r = jax.jacfwd(p_of, argnums=1)(spot, rate, taus, params.v1_0,
                                      params.v2_0)
    g_v1 = jax.jacfwd(p_of, argnums=3)(spot, rate, taus, params.v1_0,
                                       params.v2_0)
    g_v2 = jax.jacfwd(p_of, argnums=4)(spot, rate, taus, params.v1_0,
                                       params.v2_0)
    # taus is per-option and V_i depends only on tau_i, so the grad-of-sum
    # trick does give the per-option dV_i/dtau_i vector here.
    g_tau = jax.grad(
        lambda tau: jnp.sum(p_of(spot, rate, tau, params.v1_0, params.v2_0))
    )(taus)
    # dV/d vol_i = dV/dv_i * 2*sqrt(v_i)
    vega1 = g_v1 * 2.0 * jnp.sqrt(params.v1_0)
    vega2 = g_v2 * 2.0 * jnp.sqrt(params.v2_0)
    return Greeks(price=price, delta=delta, gamma=gamma, theta=-g_tau,
                  rho=g_r, vega1=vega1, vega2=vega2)


def param_sensitivities(params: DHParams, spot, rate, strikes, maturities,
                        is_call, n_terms: int = 128, L: float = 10.0,
                        q: float = 0.0) -> Dict[str, jnp.ndarray]:
    """Jacobian of every option price w.r.t. all 13 model parameters.

    Returns {param_name: [n] array}. One ``jax.jacfwd`` pass (13 tangents);
    useful for calibration diagnostics and hedging against parameter moves.
    """
    vec = params.to_vector()

    def f(v):
        return price_options(DHParams.from_vector(v), spot, rate, strikes,
                             maturities, is_call, n_terms=n_terms, L=L, q=q)

    jac = jax.jacfwd(f)(vec)      # [n, 13]
    from .double_heston import PARAM_NAMES
    return {name: jac[:, i] for i, name in enumerate(PARAM_NAMES)}
