"""Hybrid FFN -> L-BFGS calibration (docs/METHODOLOGY.md:112-138).

The documented (unshipped) pipeline: extract features, predict parameters
with the FFN, then refine with a short L-BFGS run (maxiter=10, ftol=1e-9)
from the neural warm start. Also exposes the FFN-only "real-time screening"
mode (README.md:18).

TPU-native twist: because the FFN emits the calibrator's *unconstrained*
coordinates directly (see ffn.py), the warm start feeds the jitted L-BFGS
with no host round trip, and the whole hybrid step (predict + refine +
reprice) is one device program, vmappable over surface batches.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..calibration.loss import make_loss_fn
from ..calibration.transforms import transform
from ..models.double_heston import DHParams, price_options
from ..ops.lbfgs import lbfgs_minimize
from ..utils.config import CalibrationConfig
from .train import TrainedSurrogate


class HybridResult(NamedTuple):
    x: jnp.ndarray              # refined unconstrained params [..., 13]
    params: jnp.ndarray         # refined constrained params [..., 13]
    loss: jnp.ndarray
    model_prices: jnp.ndarray
    ffn_params: jnp.ndarray     # the raw FFN prediction (constrained)
    ffn_loss: jnp.ndarray       # loss at the FFN prediction
    iterations: jnp.ndarray


def ffn_only_predict(surrogate: TrainedSurrogate, market_prices, spot):
    """FFN-only screening mode: surface -> constrained parameter vector."""
    return surrogate.predict_params(market_prices, spot)


def hybrid_calibrate(surrogate: TrainedSurrogate, spot, rate, strikes,
                     maturities, is_call, market_prices,
                     config: CalibrationConfig = CalibrationConfig(),
                     refine_maxiter: int = 10) -> HybridResult:
    """One surface: FFN warm start + maxiter=10 L-BFGS refinement."""
    dtype = jnp.asarray(market_prices).dtype
    x0 = jnp.asarray(surrogate.predict_x(market_prices, spot), dtype)
    loss_fn = make_loss_fn(spot, rate, strikes, maturities, is_call,
                           market_prices, config)
    cfg = dataclasses.replace(config.lbfgs, maxiter=refine_maxiter)
    res = lbfgs_minimize(loss_fn, x0, cfg)
    params = transform(res.x)
    model = price_options(DHParams.from_vector(params), spot, rate, strikes,
                          maturities, is_call, n_terms=config.pricer.n_terms,
                          L=config.pricer.trunc_L)
    return HybridResult(x=res.x, params=params, loss=res.f,
                        model_prices=model, ffn_params=transform(x0),
                        ffn_loss=loss_fn(x0), iterations=res.n_iters)
