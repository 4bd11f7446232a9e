"""Multi-start initial guesses (lbfgs_calibrator.py:179-234), on-device.

Three guess families, selected by ``guess_type = start_idx % 3`` like the
reference's multi-start driver (lbfgs_calibrator.py:256):
  0: literature values;
  1: type 0 with +/-20% uniform perturbation (+/-15% for rho/mu_j), rho
     clipped to [-0.95, -0.3] — randomness from jax.random instead of
     np.random;
  2: market-implied — rough ATM variance from near-the-money quotes.
All return unconstrained x0 vectors (inverse-transformed).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .transforms import inverse_transform

# Type-0 literature values (lbfgs_calibrator.py:182-188), reference order.
GUESS0 = np.array([0.04, 2.5, 0.04, 0.3, -0.7,
                   0.04, 0.5, 0.04, 0.2, -0.5,
                   0.15, -0.04, 0.08])
# Type-2 template (lbfgs_calibrator.py:226-232); entries 0/2/5/7 replaced by
# the market-implied variance.
GUESS2_TEMPLATE = np.array([np.nan, 2.0, np.nan, 0.4, -0.6,
                            np.nan, 0.7, np.nan, 0.25, -0.4,
                            0.12, -0.03, 0.07])
_IMPLIED_VAR_SLOTS = np.array([0, 2, 5, 7])
# Narrow-perturbation slots for type 1 (rho1, rho2, mu_j).
_NARROW = np.zeros(13, dtype=bool)
_NARROW[[4, 9, 11]] = True
_RHO = np.zeros(13, dtype=bool)
_RHO[[4, 9]] = True


def implied_variance_estimate(spot, strikes, maturities, market_prices, dtype):
    """Rough ATM variance from options with moneyness in (0.95, 1.05)
    (lbfgs_calibrator.py:212-224). Falls back to 0.04 with no ATM quotes."""
    moneyness = strikes / spot
    atm = (moneyness > 0.95) & (moneyness < 1.05)
    n_atm = jnp.sum(atm)
    avg_price = jnp.sum(jnp.where(atm, market_prices, 0.0)) / jnp.maximum(n_atm, 1)
    avg_tau = jnp.sum(jnp.where(atm, maturities, 0.0)) / jnp.maximum(n_atm, 1)
    implied = (avg_price / spot) / jnp.sqrt(jnp.maximum(avg_tau, 1e-12))
    implied = jnp.clip(implied, 0.01, 0.1)
    return jnp.where(n_atm > 0, implied, jnp.asarray(0.04, dtype))


def initial_guesses(n_starts, key, spot, strikes, maturities, market_prices,
                    dtype=jnp.float64):
    """Build the [n_starts, 13] unconstrained start matrix.

    Start i uses guess family i % 3; each type-1 start draws independent
    perturbations from ``key``.
    """
    g0 = jnp.asarray(GUESS0, dtype)
    narrow = jnp.asarray(_NARROW)
    rho_m = jnp.asarray(_RHO)

    iv = implied_variance_estimate(spot, jnp.asarray(strikes, dtype),
                                   jnp.asarray(maturities, dtype),
                                   jnp.asarray(market_prices, dtype), dtype)
    g2 = jnp.asarray(np.nan_to_num(GUESS2_TEMPLATE), dtype)
    slots = jnp.zeros(13, bool).at[jnp.asarray(_IMPLIED_VAR_SLOTS)].set(True)
    g2 = jnp.where(slots, iv, g2)

    def one_start(i, k):
        scale = jnp.where(narrow, 0.15, 0.20)
        noise = jax.random.uniform(k, (13,), dtype, -1.0, 1.0) * scale
        gt = jnp.mod(i, 3)
        base = jnp.where(gt == 2, g2, g0)
        # Starts 0-2 are exactly the reference's three families (types 0/2
        # deterministic, type 1 perturbed). Starts beyond 3 would otherwise
        # DUPLICATE the deterministic families, so they get the type-1 style
        # perturbation applied to their family's base vector — every extra
        # vmapped start is a genuinely new basin probe.
        noisy = (gt == 1) | (i >= 3)
        perturbed = base * (1.0 + noise)
        perturbed = jnp.where(rho_m, jnp.clip(perturbed, -0.95, -0.3),
                              perturbed)
        params = jnp.where(noisy, perturbed, base)
        return inverse_transform(params)

    keys = jax.random.split(key, n_starts)
    idx = jnp.arange(n_starts)
    return jax.vmap(one_start)(idx, keys)
