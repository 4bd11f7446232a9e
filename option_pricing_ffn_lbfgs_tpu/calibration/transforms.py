"""Unconstrained <-> constrained parameter transforms.

Mirrors lbfgs_calibrator.py:62-109: exp for the 10 positive parameters, tanh
for the two correlations, identity for the jump mean. Implemented on stacked
13-vectors with boolean masks so they vectorize/vmap/grad trivially.

Index layout (== reference x ordering, lbfgs_calibrator.py:67-85):
  0..3  v1_0, kappa1, theta1, sigma1   (exp)
  4     rho1                            (tanh)
  5..8  v2_0, kappa2, theta2, sigma2   (exp)
  9     rho2                            (tanh)
  10    lambda_j                        (exp)
  11    mu_j                            (identity)
  12    sigma_j                         (exp)
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.double_heston import DHParams

_EXP_MASK = np.zeros(13, dtype=bool)
_EXP_MASK[[0, 1, 2, 3, 5, 6, 7, 8, 10, 12]] = True
_TANH_MASK = np.zeros(13, dtype=bool)
_TANH_MASK[[4, 9]] = True


def transform(x: jnp.ndarray) -> jnp.ndarray:
    """Unconstrained R^13 -> model parameter vector (last axis = 13)."""
    exp_m = jnp.asarray(_EXP_MASK)
    tanh_m = jnp.asarray(_TANH_MASK)
    out = jnp.where(exp_m, jnp.exp(x), x)
    return jnp.where(tanh_m, jnp.tanh(x), out)


def inverse_transform(p: jnp.ndarray) -> jnp.ndarray:
    """Model parameter vector -> unconstrained R^13.

    Correlations are clipped to [-0.999, 0.999] before arctanh, as the
    reference does (lbfgs_calibrator.py:97,103).
    """
    exp_m = jnp.asarray(_EXP_MASK)
    tanh_m = jnp.asarray(_TANH_MASK)
    safe_pos = jnp.where(exp_m, p, 1.0)
    safe_rho = jnp.clip(jnp.where(tanh_m, p, 0.0), -0.999, 0.999)
    out = jnp.where(exp_m, jnp.log(safe_pos), p)
    return jnp.where(tanh_m, jnp.arctanh(safe_rho), out)


def transform_to_params(x: jnp.ndarray) -> DHParams:
    """Unconstrained vector -> DHParams pytree."""
    return DHParams.from_vector(transform(x))


def transform_to_params_dd(x: jnp.ndarray) -> DHParams:
    """float64 unconstrained vector -> DHParams of double-float (hi, lo)
    float32 pairs, with the exp/tanh applied in DD arithmetic.

    This keeps the full ~1e-15 parameter precision inside the double-float
    polish program (ops/doublefloat.py) without any float64 transcendental
    (the XLA:TPU compile bomb the DD path exists to avoid).
    """
    from ..ops import doublefloat as df
    x_dd = df.from_f64(jnp.asarray(x, jnp.float64))
    e = df.exp(x_dd)
    t = df.tanh(x_dd)
    exp_m = jnp.asarray(_EXP_MASK)
    tanh_m = jnp.asarray(_TANH_MASK)
    hi = jnp.where(exp_m, e[0], jnp.where(tanh_m, t[0], x_dd[0]))
    lo = jnp.where(exp_m, e[1], jnp.where(tanh_m, t[1], x_dd[1]))
    return DHParams(*((hi[i], lo[i]) for i in range(13)))


def params_to_x(params: DHParams) -> jnp.ndarray:
    """DHParams -> unconstrained vector."""
    return inverse_transform(params.to_vector())
