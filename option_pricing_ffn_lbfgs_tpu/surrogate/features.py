"""Option-surface feature extraction for the FFN surrogate.

The reference documents (but does not ship) an 11-feature extraction
(docs/THEORY.md:217-231 diagram: "11 Features — ATM Vol (3), Skew (3),
Butterfly (3), Term slope, Total ATM"; docs/METHODOLOGY.md:65-75 gives the
per-maturity formulas; tests/test_suite.py:161-168 asserts input_dim == 11).

For the standard maturity-major 5-strike x 3-maturity call surface
(strikes 90/95/100/105/110 %% moneyness):
  per maturity tau (3 maturities x 3 features):
    atm    = P_ATM / S0                       (normalized ATM price)
    skew   = (P_OTM - P_ITM) / S0             (OTM call K=110, ITM call K=90)
    fly    = (P_ITM + P_OTM - 2 P_ATM) / S0   (convexity / butterfly)
  cross-maturity (2):
    slope  = (P_ATM(1Y) - P_ATM(3M)) / S0     (term-structure slope)
    total  = sum_tau P_ATM(tau) / S0          (total ATM premium)
"""
from __future__ import annotations

import jax.numpy as jnp

N_FEATURES = 11
_N_STRIKES = 5
_N_MATURITIES = 3
_ITM, _ATM, _OTM = 0, 2, 4   # indices of K=90/100/110 within a maturity block


def extract_features(market_prices, spot):
    """[.., 15] maturity-major prices + spot -> [.., 11] features.

    Vectorizes over any leading batch dims.
    """
    p = jnp.asarray(market_prices)
    s = jnp.asarray(spot)[..., None] if jnp.ndim(spot) else jnp.asarray(spot)
    grid = p.reshape(p.shape[:-1] + (_N_MATURITIES, _N_STRIKES))
    atm = grid[..., _ATM] / s                                     # [.., 3]
    skew = (grid[..., _OTM] - grid[..., _ITM]) / s                # [.., 3]
    fly = (grid[..., _ITM] + grid[..., _OTM] - 2.0 * grid[..., _ATM]) / s
    slope = atm[..., -1:] - atm[..., :1]                          # [.., 1]
    total = jnp.sum(atm, axis=-1, keepdims=True)                  # [.., 1]
    return jnp.concatenate([atm, skew, fly, slope, total], axis=-1)
