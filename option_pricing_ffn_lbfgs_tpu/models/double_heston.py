"""Double Heston + Merton jump-diffusion model: COS-method pricing, TPU-native.

Re-designed from the reference's per-option, per-k scalar Python loops
(/root/reference/src/models/double_heston.py:48-192) into a fully vectorized,
jit/vmap/grad-compatible functional core:

  * the characteristic function is evaluated over an ``[n_options, N_terms]``
    grid in one shot (reference: Python list comprehension over N scalar
    calls, double_heston.py:168);
  * payoff cosine coefficients chi_k/psi_k are closed-form vectorized over k
    with ``where`` masking for the k=0 special case (reference: per-k Python
    loop with an if, double_heston.py:141-158,176-185);
  * all complex arithmetic is split real/imag (see ops/complex_math.py)
    because XLA:TPU has no complex128 — the module is dtype-polymorphic:
    float64 gives parity with the reference's NumPy complex128 math, float32
    is the TPU fast path.

Numerical semantics intentionally preserved from the reference (so prices
match to the dtype's precision):
  * cumulant truncation range formulas including the reference's quirk of
    counting ``r*tau`` once per variance factor in c1
    (double_heston.py:107,120-128) and the ``log(K/S0) -/+ 0.1`` widening
    (double_heston.py:135-137);
  * k=0 COS term half-weighted (double_heston.py:188-189);
  * jump compensator ``exp(mu_j + sigma_j^2/2) - 1`` in the drift
    (double_heston.py:82-83).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from ..ops import complex_math as cm

PARAM_NAMES = (
    "v1_0", "kappa1", "theta1", "sigma1", "rho1",
    "v2_0", "kappa2", "theta2", "sigma2", "rho2",
    "lambda_j", "mu_j", "sigma_j",
)


class DHParams(NamedTuple):
    """The 13 Double Heston + jump parameters as a pytree.

    Each field is a scalar (or batched array under vmap). Field order matches
    the reference's ``param_names`` (lbfgs_calibrator.py:53-57).
    """
    v1_0: jnp.ndarray
    kappa1: jnp.ndarray
    theta1: jnp.ndarray
    sigma1: jnp.ndarray
    rho1: jnp.ndarray
    v2_0: jnp.ndarray
    kappa2: jnp.ndarray
    theta2: jnp.ndarray
    sigma2: jnp.ndarray
    rho2: jnp.ndarray
    lambda_j: jnp.ndarray
    mu_j: jnp.ndarray
    sigma_j: jnp.ndarray

    @classmethod
    def from_vector(cls, x) -> "DHParams":
        return cls(*(x[..., i] for i in range(13)))

    @classmethod
    def from_dict(cls, d, dtype=None) -> "DHParams":
        vals = [d[k] for k in PARAM_NAMES]
        if dtype is not None:
            vals = [jnp.asarray(v, dtype) for v in vals]
        return cls(*vals)

    def to_vector(self) -> jnp.ndarray:
        return jnp.stack(list(self), axis=-1)

    def to_dict(self):
        return {k: v for k, v in zip(PARAM_NAMES, self)}


def _heston_factor_B_and_Aterm(u, tau, kappa, theta, sigma, rho):
    """One Heston variance factor's contribution to the CF exponent.

    Returns (B, A_term) as split-complex pairs, where the factor contributes
    ``A_term + B * v0`` to the exponent. Closed forms per
    double_heston.py:64-91, evaluated at real frequency u over any broadcast
    shape.
    """
    dt = u.dtype
    sig2 = sigma * sigma
    # xi = kappa - rho*sigma*i*u  (complex: re=kappa, im=-rho*sigma*u)
    xi = (jnp.broadcast_to(jnp.asarray(kappa, dt), u.shape), -rho * sigma * u)
    # d = sqrt(xi^2 + sigma^2 * u * (u + i))
    #   inner = (kappa^2 - rho^2 sig2 u^2 + sig2 u^2) + i(-2 kappa rho sigma u + sig2 u)
    inner_re = kappa * kappa + sig2 * u * u * (1.0 - rho * rho)
    inner_im = sig2 * u - 2.0 * kappa * rho * sigma * u
    d = cm.csqrt((inner_re, inner_im))
    xi_m_d = cm.csub(xi, d)
    xi_p_d = cm.cadd(xi, d)
    g = cm.cdiv(xi_m_d, xi_p_d)
    # e = exp(-d * tau)
    e = cm.cexp((-d[0] * tau, -d[1] * tau))
    one = cm.cconst(jnp.ones_like(u), jnp.zeros_like(u), dt)
    ge = cm.cmul(g, e)
    one_m_ge = cm.csub(one, ge)
    # B = ((xi - d)/sigma^2) * (1 - e)/(1 - g e)
    B = cm.cmul(cm.cscale(xi_m_d, 1.0 / sig2), cm.cdiv(cm.csub(one, e), one_m_ge))
    # A_term = (kappa*theta/sigma^2) * ((xi - d)*tau - 2*log((1 - g e)/(1 - g)))
    log_ratio = cm.clog(cm.cdiv(one_m_ge, cm.csub(one, g)))
    inner = cm.csub(cm.cscale(xi_m_d, tau), cm.cscale(log_ratio, 2.0))
    A_term = cm.cscale(inner, kappa * theta / sig2)
    return B, A_term


def char_fn(u, tau, params: DHParams, r, q=0.0):
    """Characteristic function phi(u; tau) of log(S_T/S_0) under the
    risk-neutral Double Heston + Merton jump dynamics, at real frequencies.

    Mirrors double_heston.py:48-97. ``u`` may have any shape; ``tau`` must
    broadcast against it. Returns a split-complex pair of ``u.shape`` arrays.
    """
    p = params
    B1, A1 = _heston_factor_B_and_Aterm(u, tau, p.kappa1, p.theta1, p.sigma1, p.rho1)
    B2, A2 = _heston_factor_B_and_Aterm(u, tau, p.kappa2, p.theta2, p.sigma2, p.rho2)
    # Drift with jump compensator: (r - q - lambda*(exp(mu+sig^2/2)-1)) * i*u*tau
    compensator = jnp.exp(p.mu_j + 0.5 * p.sigma_j * p.sigma_j) - 1.0
    drift = r - q - p.lambda_j * compensator
    A = (jnp.zeros_like(u), drift * u * tau)
    A = cm.cadd(A, A1)
    A = cm.cadd(A, A2)
    # Heston part: exp(A + B1*v01 + B2*v02)
    expo = cm.cadd(A, cm.cadd(cm.cscale(B1, p.v1_0), cm.cscale(B2, p.v2_0)))
    cf_heston = cm.cexp(expo)
    # Jump part: exp(lambda*tau*(exp(i*u*mu - sig^2 u^2/2) - 1))
    jamp = jnp.exp(-0.5 * p.sigma_j * p.sigma_j * u * u)
    jr = jamp * jnp.cos(u * p.mu_j) - 1.0
    ji = jamp * jnp.sin(u * p.mu_j)
    cf_jump = cm.cexp((p.lambda_j * tau * jr, p.lambda_j * tau * ji))
    return cm.cmul(cf_heston, cf_jump)


def _factor_cumulants(tau, r, v0, kappa, theta, sigma, rho):
    """Fang–Oosterlee c1/c2 cumulants for one Heston factor.

    Reproduces double_heston.py:101-118 exactly — including the quirk that c1
    contains ``r*tau`` (so it is double-counted when the two factors are
    summed; this only widens the truncation range slightly).
    """
    lm, v_bar, volvol = kappa, theta, sigma
    e1 = jnp.exp(-lm * tau)
    c1 = r * tau + (1.0 - e1) * (v_bar - v0) / (2.0 * lm) - v_bar * tau / 2.0
    c2 = (1.0 / (8.0 * lm**3)) * (
        volvol * tau * lm * e1 * (v0 - v_bar) * (8.0 * lm * rho - 4.0 * volvol)
        + lm * rho * volvol * (1.0 - e1) * (16.0 * v_bar - 8.0 * v0)
        + 2.0 * v_bar * lm * tau * (-4.0 * lm * rho * volvol + volvol**2 + 4.0 * lm**2)
        + volvol**2 * ((v_bar - 2.0 * v0) * jnp.exp(-2.0 * lm * tau)
                       + v_bar * (6.0 * e1 - 7.0) + 2.0 * v0)
        + 8.0 * lm**2 * (v0 - v_bar) * (1.0 - e1)
    )
    return c1, c2


def truncation_range(params: DHParams, tau, strike, spot, r, L=10.0):
    """COS truncation interval [a, b] per option (double_heston.py:100-139).

    ``tau``/``strike`` may be arrays (one per option); returns arrays of the
    same shape. The interval depends on the strike through the
    ``log(K/S0) -/+ 0.1`` widening, so it is genuinely per-option.
    """
    p = params
    c1_f1, c2_f1 = _factor_cumulants(tau, r, p.v1_0, p.kappa1, p.theta1, p.sigma1, p.rho1)
    c1_f2, c2_f2 = _factor_cumulants(tau, r, p.v2_0, p.kappa2, p.theta2, p.sigma2, p.rho2)
    c1_j = p.lambda_j * tau * p.mu_j
    c2_j = p.lambda_j * tau * (p.sigma_j**2 + p.mu_j**2)
    c1 = c1_f1 + c1_f2 + c1_j
    c2 = c2_f1 + c2_f2 + c2_j
    spread = L * jnp.sqrt(jnp.abs(c2))
    a = c1 - spread
    b = c1 + spread
    log_k = jnp.log(strike / spot)
    a = jnp.minimum(a, log_k - 0.1)
    b = jnp.maximum(b, log_k + 0.1)
    return a, b


def payoff_coefficients(k, a, b, log_k, spot, strike, is_call):
    """COS payoff-series coefficients V_k, vectorized over k and options.

    chi_k/psi_k closed forms per double_heston.py:141-158; the call
    integrates over [log K, b], the put over [a, log K]
    (double_heston.py:174-185). ``k`` has shape [N]; a/b/log_k/strike are
    per-option arrays broadcast to [n, 1]; result is [n, N].

    The k=0 columns of chi/psi use their limit values via double-where
    masking so no NaN/Inf enters the computation (important for grad).
    """
    dt = a.dtype
    width = b - a
    u = k * (math.pi / width)              # [n, N]; u[., 0] == 0
    c = jnp.where(is_call, log_k, a)
    d = jnp.where(is_call, b, log_k)
    # chi_k over [c, d]
    safe_u = jnp.where(k == 0, jnp.ones_like(u), u)
    cos_d = jnp.cos(safe_u * (d - a))
    cos_c = jnp.cos(safe_u * (c - a))
    sin_d = jnp.sin(safe_u * (d - a))
    sin_c = jnp.sin(safe_u * (c - a))
    ed, ec = jnp.exp(d), jnp.exp(c)
    chi_gen = (cos_d * ed - cos_c * ec + safe_u * (sin_d * ed - sin_c * ec)) / (1.0 + safe_u * safe_u)
    chi = jnp.where(k == 0, ed - ec, chi_gen)
    # psi_k over [c, d]
    psi_gen = (sin_d - sin_c) / safe_u
    psi = jnp.where(k == 0, d - c, psi_gen)
    two_over = jnp.asarray(2.0, dt) / width
    v_call = two_over * (spot * chi - strike * psi)
    v_put = two_over * (strike * psi - spot * chi)
    return jnp.where(is_call, v_call, v_put)


def price_options(params: DHParams, spot, rate, strikes, maturities, is_call,
                  n_terms: int = 128, L: float = 10.0, q: float = 0.0):
    """Price a batch of European options under one parameter set.

    Vectorized re-design of DoubleHeston.pricing (double_heston.py:160-192):
    the whole [n_options, N] characteristic-function/coefficient grid is
    evaluated in one fused XLA computation.

    Args:
      params: DHParams of scalars (vmap for parameter batches).
      spot, rate: scalars.
      strikes, maturities: [n] arrays; is_call: [n] bool array.
      n_terms: COS series length N.
    Returns:
      [n] array of option prices, dtype = strikes.dtype.
    """
    dt = jnp.asarray(strikes).dtype
    strikes = jnp.asarray(strikes, dt)[:, None]          # [n,1]
    taus = jnp.asarray(maturities, dt)[:, None]          # [n,1]
    is_call = jnp.asarray(is_call)[:, None]              # [n,1]
    a, b = truncation_range(params, taus, strikes, spot, rate, L)   # [n,1]
    log_k = jnp.log(strikes / spot)
    k = jnp.arange(n_terms, dtype=dt)[None, :]           # [1,N]
    u = k * (math.pi / (b - a))                          # [n,N]
    phi_re, phi_im = char_fn(u, taus, params, rate, q)   # [n,N]
    v = payoff_coefficients(k, a, b, log_k, spot, strikes, is_call)  # [n,N]
    # Re(phi * exp(-i u a)) = phi_re cos(ua) + phi_im sin(ua)
    ua = u * a
    terms = (phi_re * jnp.cos(ua) + phi_im * jnp.sin(ua)) * v
    w = jnp.where(k == 0, jnp.asarray(0.5, dt), jnp.asarray(1.0, dt))  # k=0 half-weight
    series = jnp.sum(terms * w, axis=-1)
    return jnp.exp(-rate * taus[:, 0]) * series


def price_single(params: DHParams, spot, strike, tau, rate, is_call=True,
                 n_terms: int = 128, L: float = 10.0, q: float = 0.0):
    """Price one option (convenience wrapper over price_options)."""
    dt = jnp.result_type(jnp.asarray(strike).dtype, jnp.float32)
    out = price_options(
        params, spot, rate,
        jnp.asarray([strike], dt), jnp.asarray([tau], dt),
        jnp.asarray([is_call]), n_terms=n_terms, L=L, q=q)
    return out[0]
