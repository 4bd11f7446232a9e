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


def hybrid_calibrate_batch_mixed(surrogate: TrainedSurrogate, spots, rate,
                                 strikes, maturities, is_call, market_prices,
                                 config: CalibrationConfig = CalibrationConfig(),
                                 refine_maxiter: int = 10):
    """Batch hybrid, TPU-native precision split: FFN warm start -> f32
    L-BFGS refinement (maxiter=10, hardware speed) -> f64 polish of the
    refined point (same polish phase as the pure mixed calibrator).

    Running the documented maxiter=10 refinement in emulated f64 costs
    ~0.95 s/surface on TPU; in f32 + polish it is ~ms at equal-or-better
    accuracy. Returns a BatchCalibration (see calibration/calibrator.py).
    """
    import jax
    from ..calibration.calibrator import (
        BatchCalibration, POLISH_LBFGS, _polish_batch)
    from ..ops.lbfgs import LBFGSResult  # noqa: F401 (doc pointer)

    f32 = jnp.float32
    x0 = jnp.asarray(surrogate.predict_x(market_prices, spots), f32)
    cfg32 = dataclasses.replace(config.lbfgs, maxiter=refine_maxiter)

    @jax.jit
    def refine(spots32, strikes32, mats32, calls, prices32, x0):
        def one(s, k, m, c, p, x):
            loss_fn = make_loss_fn(s, jnp.asarray(rate, f32), k, m, c, p,
                                   config)
            return lbfgs_minimize(loss_fn, x, cfg32)
        return jax.vmap(one)(spots32, strikes32, mats32, calls, prices32, x0)

    res32 = refine(jnp.asarray(spots, f32), jnp.asarray(strikes, f32),
                   jnp.asarray(maturities, f32), jnp.asarray(is_call),
                   jnp.asarray(market_prices, f32), x0)
    res, params_vec, model = _polish_batch(
        spots, rate, strikes, maturities, is_call, market_prices, res32.x,
        config, POLISH_LBFGS)
    return BatchCalibration(
        x=res.x, params=params_vec, loss=res.f, model_prices=model,
        iterations=res32.n_iters + res.n_iters,
        n_evals=res32.n_evals + res.n_evals,
        converged=res.converged | res32.converged,
        per_start_loss=res32.f[:, None])
