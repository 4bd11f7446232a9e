"""Shared tiny calibration problem for the multi-process distributed test.

Kept in its own module so both the pytest parent (single-process, 8 virtual
CPU devices) and the ``jax.distributed`` workers (2 processes x 4 devices)
build the bit-identical problem. Mirrors the __graft_entry__ dryrun shapes.
"""
import numpy as np


def build_problem(jnp, b=8):
    """Returns (spots, rate, strikes, mats, is_call, prices, true_vec)."""
    from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
        DHParams, price_options)

    dtype = jnp.float32
    strikes = jnp.asarray(np.tile([95.0, 100.0, 105.0], 2), dtype)
    mats = jnp.asarray(np.repeat([0.5, 1.0], 3), dtype)
    is_call = jnp.ones(6, bool)
    true = jnp.asarray([0.04, 2.0, 0.04, 0.3, -0.6, 0.04, 0.8, 0.04, 0.2,
                        -0.4, 0.1, -0.04, 0.08], dtype)
    prices = price_options(DHParams.from_vector(true), 100.0, 0.03, strikes,
                           mats, is_call, n_terms=32)
    spots = jnp.full((b,), 100.0, dtype)
    bs = jnp.broadcast_to(strikes, (b, 6))
    bm = jnp.broadcast_to(mats, (b, 6))
    bc = jnp.broadcast_to(is_call, (b, 6))
    bp = jnp.broadcast_to(prices, (b, 6))
    return spots, 0.03, bs, bm, bc, bp


def tiny_config():
    from option_pricing_ffn_lbfgs_tpu.utils.config import (
        CalibrationConfig, LBFGSConfig, PricerConfig)
    return CalibrationConfig(pricer=PricerConfig(n_terms=32),
                             lbfgs=LBFGSConfig(maxiter=25))
