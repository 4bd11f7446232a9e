"""Hybrid FFN -> L-BFGS calibration (docs/METHODOLOGY.md:112-138).

The documented (unshipped) pipeline: extract features, predict parameters
with the FFN, then refine with a short L-BFGS run (maxiter=10, ftol=1e-9)
from the neural warm start. Also exposes the FFN-only "real-time screening"
mode (README.md:18).

TPU-native twist: because the FFN emits the calibrator's *unconstrained*
coordinates directly (see ffn.py), the warm start feeds the jitted L-BFGS
with no host round trip, and the whole hybrid step (predict + refine +
reprice) is one device program, vmappable over surface batches.

Why the hybrid wins here (it did not in round 1): the refine phase runs in
float32 at hardware speed with a real iteration budget (maxiter=40 — f32
iterations are ~500x cheaper than emulated-f64 ones), a literature-guess
safeguard start rides along in the same vmap (insurance against the FFN
landing in a bad basin), and the winner is polished by the small
Levenberg-Marquardt f64 program instead of the Wolfe L-BFGS state machine.
Versus the pure path's n_starts x maxiter=300 multi-start, the FFN start
cuts the f32 work ~20x at equal polish accuracy.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..calibration.loss import make_loss_fn
from ..calibration.transforms import transform, inverse_transform
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
    """One surface: FFN warm start + maxiter=10 L-BFGS refinement.

    This is the reference-documented pipeline verbatim
    (docs/METHODOLOGY.md:112-138); the batched TPU fast path is
    ``hybrid_calibrate_batch_mixed``.
    """
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


@partial(jax.jit, static_argnames=("config", "cfg32"))
def _refine_batch(spots, rate, strikes, maturities, is_call, market_prices,
                  x0, config: CalibrationConfig, cfg32):
    """f32 L-BFGS refinement, vmapped over [B] surfaces x [S] starts.

    Module-level and jitted ONCE with static (config, cfg32) — the round-1
    version wrapped a fresh closure in jax.jit per call, so every hybrid
    invocation retraced and recompiled the refine program (ADVICE.md r1).
    x0: [B, S, 13]. Returns per-(surface, start) LBFGSResult pytree.
    """
    def one(s, k, m, c, p, xs):
        loss_fn = make_loss_fn(s, rate, k, m, c, p, config)
        return jax.vmap(lambda x: lbfgs_minimize(loss_fn, x, cfg32))(xs)
    return jax.vmap(one)(spots, strikes, maturities, is_call, market_prices,
                         x0)


def hybrid_calibrate_batch_mixed(surrogate: TrainedSurrogate, spots, rate,
                                 strikes, maturities, is_call, market_prices,
                                 config: CalibrationConfig = CalibrationConfig(),
                                 refine_maxiter: int = 40,
                                 safeguard_start: bool = True,
                                 polish=None):
    """Batch hybrid, TPU-native precision split: FFN warm start -> f32
    L-BFGS refinement (hardware speed) -> f64 LM polish of the per-surface
    winner (same polish phase as the pure mixed calibrator).

    ``safeguard_start`` adds the literature type-0 guess
    (lbfgs_calibrator.py:182-188) as a second start in the same vmap —
    near-free on TPU and it rescues surfaces where the FFN prediction lands
    in a bad basin (the round-1 0.26% outlier). Returns a BatchCalibration
    (see calibration/calibrator.py).
    """
    from ..calibration.calibrator import (
        BatchCalibration, POLISH_LM, _polish_batch_lm, _polish_pricer_config)
    from ..calibration.initial_guess import GUESS0

    if polish is None:
        polish = POLISH_LM
    f32 = jnp.float32
    x0 = jnp.asarray(surrogate.predict_x(market_prices, spots), f32)
    b = x0.shape[0]
    if safeguard_start:
        g0 = jnp.broadcast_to(
            inverse_transform(jnp.asarray(GUESS0, f32)), (b, 13))
        x0 = jnp.stack([x0, g0], axis=1)              # [B, 2, 13]
    else:
        x0 = x0[:, None, :]                           # [B, 1, 13]
    cfg32 = dataclasses.replace(config.lbfgs, maxiter=refine_maxiter)

    res32 = _refine_batch(
        jnp.asarray(spots, f32), jnp.asarray(rate, f32),
        jnp.asarray(strikes, f32), jnp.asarray(maturities, f32),
        jnp.asarray(is_call), jnp.asarray(market_prices, f32), x0,
        config, cfg32)

    # Per-surface winner across the [S] starts (masked like the pure path).
    masked = jnp.where(jnp.isfinite(res32.f), res32.f, jnp.inf)
    win = jnp.argmin(masked, axis=1)                  # [B]
    take = lambda a: jnp.take_along_axis(
        a, win.reshape(b, *([1] * (a.ndim - 1))), axis=1).squeeze(1)
    x_win = take(res32.x)

    res, params_vec, model = _polish_batch_lm(
        spots, rate, strikes, maturities, is_call, market_prices, x_win,
        _polish_pricer_config(config), polish)
    # per_start_x mirrors the pure mixed path: the f32 refinement iterates
    # with the winner's row replaced by its polished refinement.
    per_start_x = res32.x.astype(res.x.dtype)
    per_start_x = per_start_x.at[jnp.arange(b), win].set(res.x)
    return BatchCalibration(
        x=res.x, params=params_vec, loss=res.f, model_prices=model,
        iterations=take(res32.n_iters) + res.n_iters,
        n_evals=take(res32.n_evals) + res.n_evals,
        converged=res.converged | take(res32.converged),
        per_start_loss=res32.f.astype(res.f.dtype), per_start_x=per_start_x)
