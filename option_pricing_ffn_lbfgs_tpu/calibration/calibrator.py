"""Multi-start Double Heston + jump calibrator, fully on-device.

TPU-native re-design of DoubleHestonJumpCalibrator
(lbfgs_calibrator.py:44-336):

  * the reference's sequential per-start scipy loop (lbfgs_calibrator.py:252)
    becomes one jitted computation that ``vmap``s the entire L-BFGS solver
    over the start batch and argmin-selects the winner on device;
  * finite-difference gradients (~14 loss evals each) are replaced by one
    ``jax.value_and_grad`` evaluation per line-search probe;
  * per-start failures are not exceptions but non-finite losses that the
    argmin naturally ignores (masked to +inf), mirroring the reference's
    try/except-continue semantics (lbfgs_calibrator.py:316-317) without
    host round trips.

The public class keeps the reference's API shape (spot, risk_free_rate,
market_options list of {'strike','maturity','price','option_type'} dicts;
``.calibrate(maxiter, multi_start)`` returning a CalibrationResult).
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Dict, List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.double_heston import DHParams, PARAM_NAMES, price_options
from ..ops.lbfgs import lbfgs_minimize
from ..ops.levenberg_marquardt import lm_minimize, lm_minimize_batched
from ..utils.config import CalibrationConfig, LBFGSConfig, LMConfig
from ..utils.results import CalibrationResult
from .initial_guess import initial_guesses
from .loss import make_loss_fn, make_residual_fn, make_residual_fn_dd
from .transforms import transform


class BatchCalibration(NamedTuple):
    """Device-side output of one (or a batch of) multi-start calibration(s)."""
    x: jnp.ndarray              # winner unconstrained params [..., 13]
    params: jnp.ndarray         # winner constrained params [..., 13]
    loss: jnp.ndarray           # winner loss [...]
    model_prices: jnp.ndarray   # surface repriced at winner [..., n_opt]
    iterations: jnp.ndarray     # winner's L-BFGS iterations [...]
    n_evals: jnp.ndarray        # winner's objective evaluations [...]
    converged: jnp.ndarray      # winner converged flag [...]
    per_start_loss: jnp.ndarray  # all starts' final losses [..., n_starts]
    # Mandatory (round-5 fix): a sometimes-None NamedTuple field is a pytree
    # landmine — it broke the shard_map out_specs and npz checkpointing in
    # round 4. Every construction site must populate it.
    per_start_x: jnp.ndarray    # all starts' iterates [..., n_starts, 13]


def _calibrate_core(spot, rate, strikes, maturities, is_call, market_prices,
                    key, config: CalibrationConfig, n_starts: int):
    """One surface, ``n_starts`` vmapped L-BFGS solves, winner selection."""
    dtype = market_prices.dtype
    loss_fn = make_loss_fn(spot, rate, strikes, maturities, is_call,
                           market_prices, config)
    x0 = initial_guesses(n_starts, key, spot, strikes, maturities,
                         market_prices, dtype)

    solve = lambda x: lbfgs_minimize(loss_fn, x, config.lbfgs)
    res = jax.vmap(solve)(x0)

    # Failed/non-finite starts are masked to +inf for the argmin — the
    # on-device analog of the reference's try/except-continue.
    finite = jnp.isfinite(res.f)
    masked = jnp.where(finite, res.f, jnp.inf)
    win = jnp.argmin(masked)
    x_best = res.x[win]
    params_vec = transform(x_best)
    model = price_options(
        DHParams.from_vector(params_vec), spot, rate, strikes, maturities,
        is_call, n_terms=config.pricer.n_terms, L=config.pricer.trunc_L,
        q=config.pricer.dividend_yield)
    return BatchCalibration(
        x=x_best, params=params_vec, loss=masked[win], model_prices=model,
        iterations=res.n_iters[win], n_evals=res.n_evals[win],
        converged=res.converged[win] & finite[win], per_start_loss=res.f,
        per_start_x=res.x)


@partial(jax.jit, static_argnames=("config", "n_starts"))
def calibrate_surface(spot, rate, strikes, maturities, is_call, market_prices,
                      key, config: CalibrationConfig = CalibrationConfig(),
                      n_starts: int = 3) -> BatchCalibration:
    """Jitted single-surface multi-start calibration (one device dispatch)."""
    return _calibrate_core(spot, rate, strikes, maturities, is_call,
                           market_prices, key, config, n_starts)


@partial(jax.jit, static_argnames=("config", "n_starts"))
def calibrate_batch(spots, rate, strikes, maturities, is_call, market_prices,
                    keys, config: CalibrationConfig = CalibrationConfig(),
                    n_starts: int = 3) -> BatchCalibration:
    """Calibrate a batch of surfaces in one dispatch.

    Args:
      spots: [B]; strikes/maturities/is_call/market_prices: [B, n_opt];
      keys: [B] PRNG keys. The rate is shared (scalar) for simplicity.
    Returns a BatchCalibration with leading batch axis.

    This is the single-chip building block the mesh layer shards over
    devices (parallel/sharded.py).
    """
    fn = lambda s, k, m, c, p, ky: _calibrate_core(
        s, rate, k, m, c, p, ky, config, n_starts)
    return jax.vmap(fn)(spots, strikes, maturities, is_call, market_prices,
                        keys)


def _polish_core(spot, rate, strikes, maturities, is_call, market_prices,
                 x0, config: CalibrationConfig, polish: LBFGSConfig):
    """High-precision refinement from a warm start, in the widest available
    dtype (float64 when x64 is enabled; TPU executes it software-emulated)."""
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    cast = lambda a: jnp.asarray(a, dtype)
    spot, rate, strikes, maturities, market_prices = map(
        cast, (spot, rate, strikes, maturities, market_prices))
    loss_fn = make_loss_fn(spot, rate, strikes, maturities, is_call,
                           market_prices, config)
    res = lbfgs_minimize(loss_fn, cast(x0), polish)
    params_vec = transform(res.x)
    model = price_options(
        DHParams.from_vector(params_vec), spot, rate, strikes, maturities,
        is_call, n_terms=config.pricer.n_terms, L=config.pricer.trunc_L,
        q=config.pricer.dividend_yield)
    return res, params_vec, model


# Polish stopping: run the f64 phase down to its own precision floor rather
# than scipy's looser defaults — the warm start is already near the optimum,
# so these ~tens of iterations are cheap even under f64 emulation.
POLISH_LBFGS = LBFGSConfig(maxiter=60, ftol=1e-14, gtol=1e-10)

# Default polish: Levenberg–Marquardt on the residual vector. Near the
# optimum the objective is a well-conditioned 13-param least-squares problem,
# so LM converges quadratically in ~5-10 iterations AND its fixed-structure
# loop compiles to a far smaller XLA program than the Wolfe line-search
# state machine (phase-wise compile/runtime measurements:
# results/compile_breakdown.json). maxiter=80: hard surfaces (Feller-
# violating raw draws) need the extra budget — measured (CPU ablation,
# 2026-08-20): 40 -> 80 iters cuts mean error 0.016 % -> 0.008 % on raw
# draws; converged lanes stop early so easy surfaces pay nothing.
POLISH_LM = LMConfig(maxiter=80, ftol=1e-15, gtol=1e-11, cost_target=1e-10)


def _polish_core_lm(spot, rate, strikes, maturities, is_call, market_prices,
                    x0, config: CalibrationConfig, polish: LMConfig,
                    lam0=None):
    """LM refinement from a warm start at high precision.

    Precision engineering for the round-1 compile wall (VERDICT r1 item 3):

      * ``polish.residual_impl == "dd"`` (default): residuals come from the
        double-float (two-float32) pricer — the whole polish program is
        float32-only XLA (the x64-emulated pricer alone costs 170-330 s of
        compile on v5e; DD phase numbers in results/compile_breakdown.json)
        and runs at hardware speed, with ~1e-12 worst-case pricing parity
        (enough for the 1e-15 ftol floor of a relative-MSE loss);
      * ``"native"``: residuals at the enclosing dtype (float64 under x64;
        TPU-emulated) — the parity/fallback mode;
      * ``polish.f32_jacobian`` (default): the 13-tangent Jacobian runs on
        the plain f32 pricer in both modes — it only sets step directions,
        acceptance is on the high-precision cost.
    """
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    use_dd = polish.residual_impl == "dd" and dtype == jnp.float64
    cast = lambda a: jnp.asarray(a, dtype)
    spot, rate, strikes, maturities, market_prices = map(
        cast, (spot, rate, strikes, maturities, market_prices))
    if use_dd:
        residual_fn = make_residual_fn_dd(spot, rate, strikes, maturities,
                                          is_call, market_prices, config)
    else:
        residual_fn = make_residual_fn(spot, rate, strikes, maturities,
                                       is_call, market_prices, config)
    jac_fn = None
    if polish.f32_jacobian and dtype == jnp.float64:
        f32 = jnp.float32
        jac_fn = make_residual_fn(
            spot.astype(f32), rate.astype(f32), strikes.astype(f32),
            maturities.astype(f32), is_call, market_prices.astype(f32),
            config)
    res = lm_minimize(residual_fn, cast(x0), polish, jac_residual_fn=jac_fn,
                      lam0=lam0)
    params_vec = transform(res.x)
    # Reconstruct the final model prices from the final residual vector
    # (r[:n] = (model - market)/market/sqrt(n), exactly — see
    # surface_residuals) instead of re-running the pricer: a third copy of
    # the residual program here was part of the round-2 polish compile wall.
    n_opt = market_prices.shape[-1]
    scale = jnp.sqrt(jnp.asarray(n_opt, market_prices.dtype))
    model = market_prices * (1.0 + res.r[:n_opt] * scale)
    return res, params_vec, model


@partial(jax.jit, static_argnames=("config", "polish"))
def _polish_batch_lm(spots, rate, strikes, maturities, is_call, market_prices,
                     x0, config: CalibrationConfig, polish: LMConfig):
    def one(spot, k, m, c, p, x):
        return _polish_core_lm(spot, rate, k, m, c, p, x, config, polish)
    return jax.vmap(one)(spots, strikes, maturities, is_call, market_prices,
                         x0)


@partial(jax.jit, static_argnames=("config", "polish"))
def _polish_batch_lm_warm(spots, rate, strikes, maturities, is_call,
                          market_prices, x0, lam0,
                          config: CalibrationConfig, polish: LMConfig):
    """Continuation variant: per-lane initial damping (stage-B tail)."""
    def one(spot, k, m, c, p, x, l0):
        return _polish_core_lm(spot, rate, k, m, c, p, x, config, polish,
                               lam0=l0)
    return jax.vmap(one)(spots, strikes, maturities, is_call, market_prices,
                         x0, lam0)


@partial(jax.jit, static_argnames=("config", "polish", "warm"))
def _polish_lanes_fused(lane_spots, rate, lane_strikes, lane_mats, lane_call,
                        lane_mkt, x0, lam0, config: CalibrationConfig,
                        polish: LMConfig, warm: bool = False):
    """Batched-LM polish over flat [L] lanes with the fused Pallas Jacobian.

    Same per-lane semantics as _polish_core_lm under vmap, but the lane
    axis is owned by the batched engine so the f32 Jacobian comes from ONE
    reverse-sweep kernel pass (ops/loss_pallas.py, mode="jac") instead of
    13 forward tangents per lane — the Jacobian was ~half the measured
    polish per-iteration cost. Residuals stay the DD (or native) per-lane
    functions vmapped at batch level.
    """
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    use_dd = polish.residual_impl == "dd" and dtype == jnp.float64
    cast = lambda a: jnp.asarray(a, dtype)
    sp, ks, ms, mk = map(cast, (lane_spots, lane_strikes, lane_mats,
                                lane_mkt))
    rate_c = cast(rate)

    def res_one(x, s, k, m, c, p):
        make = make_residual_fn_dd if use_dd else make_residual_fn
        return make(s, rate_c, k, m, c, p, config)(x)

    residual_fn = lambda x: jax.vmap(res_one)(x, sp, ks, ms, lane_call, mk)

    jac_fn = None
    if polish.f32_jacobian and dtype == jnp.float64:
        from ..ops.loss_pallas import make_batch_residual_jacobian
        f32 = jnp.float32
        jac32 = make_batch_residual_jacobian(
            lane_spots.astype(f32), lane_strikes.astype(f32),
            lane_mats.astype(f32), lane_call, lane_mkt.astype(f32),
            jnp.asarray(rate, f32), config,
            interpret=jax.default_backend() != "tpu")
        jac_fn = lambda x: jac32(jnp.asarray(x, f32))

    res = lm_minimize_batched(residual_fn, cast(x0), polish, jac_fn=jac_fn,
                              lam0=cast(lam0) if warm else None)
    params_vec = transform(res.x)
    n_opt = lane_mkt.shape[-1]
    scale = jnp.sqrt(jnp.asarray(n_opt, mk.dtype))
    model = mk * (1.0 + res.r[:, :n_opt] * scale)
    return res, params_vec, model


def _polish_starts_fused(spots, rate, strikes, maturities, is_call,
                         market_prices, x0, config: CalibrationConfig,
                         polish: LMConfig):
    """Fused-Jacobian variant of _polish_batch_lm_starts: x0 [B, S, 13]."""
    b, s = x0.shape[:2]
    rep = lambda a: jnp.repeat(jnp.asarray(a), s, axis=0)
    res, params_vec, model = _polish_lanes_fused(
        rep(spots), rate, rep(strikes), rep(maturities), rep(is_call),
        rep(market_prices), x0.reshape(b * s, 13),
        jnp.zeros((b * s,)), config, polish, warm=False)
    shape2 = lambda a: a.reshape(b, s, *a.shape[1:])
    return (jax.tree.map(shape2, res), shape2(params_vec), shape2(model))


@partial(jax.jit, static_argnames=("config", "polish"))
def _polish_batch_lm_starts(spots, rate, strikes, maturities, is_call,
                            market_prices, x0, config: CalibrationConfig,
                            polish: LMConfig):
    """LM-polish EVERY start: x0 [B, S, 13] -> per-(surface, start) results.

    Robustness fix (round 4): selecting the multi-start winner on the f32
    SEARCH loss and polishing only that start loses whenever f32 rounding
    reorders two basins — the polished winner can sit in a local minimum
    while a losing start would have polished to the global one (measured:
    occasional 0.7-3.6 % outlier surfaces on raw parameter draws). Polishing
    all S starts and arg-minning on the POLISHED f64 loss removes that
    failure mode; the extra starts ride the same vmap, so on TPU the cost is
    bandwidth-parallel, not serial.
    """
    def one(spot, k, m, c, p, xs):
        return jax.vmap(lambda x: _polish_core_lm(
            spot, rate, k, m, c, p, x, config, polish))(xs)
    return jax.vmap(one)(spots, strikes, maturities, is_call, market_prices,
                         x0)


@partial(jax.jit, static_argnames=("config", "n_starts", "impl"))
def calibrate_batch_fused(spots, rate, strikes, maturities, is_call,
                          market_prices, keys,
                          config: CalibrationConfig = CalibrationConfig(),
                          n_starts: int = 3,
                          impl: str = "pallas") -> BatchCalibration:
    """calibrate_batch with the lane axis owned by the ENGINE, not vmap.

    Runs the natively-batched flat L-BFGS (ops/lbfgs_batched.py) over all
    B x n_starts lanes with a batch-level objective: ``impl="pallas"`` uses
    the fused VMEM value-and-grad kernel (ops/loss_pallas.py),rationale in
    both modules; ``impl="batched"`` uses batch-level XLA autodiff (CPU /
    fallback). Same results as calibrate_batch up to f32 rounding (fp-order
    differs; outcome parity pinned in tests/test_calibrator.py).
    """
    from ..ops.lbfgs_batched import lbfgs_minimize_batched
    from ..ops.loss_pallas import make_batch_value_and_grad
    from .loss import surface_loss

    b = spots.shape[0]
    dtype = market_prices.dtype
    x0 = jax.vmap(lambda s, k, m, c, p, ky: initial_guesses(
        n_starts, ky, s, k, m, p, dtype))(
            spots, strikes, maturities, is_call, market_prices, keys)
    L = b * n_starts
    rep = lambda a: jnp.repeat(a, n_starts, axis=0)
    lane_spots, lane_strikes, lane_mats = rep(spots), rep(strikes), rep(maturities)
    lane_call, lane_mkt = rep(is_call), rep(market_prices)

    if impl == "pallas":
        # Interpret mode off-TPU: the kernel is Mosaic-lowered on TPU and
        # interpreter-emulated elsewhere (CPU tests), same semantics.
        vg = make_batch_value_and_grad(
            lane_spots, lane_strikes, lane_mats, lane_call, lane_mkt,
            rate, config, interpret=jax.default_backend() != "tpu")
    else:
        def one(x, s, k, m, c, p):
            fn = make_loss_fn(s, rate, k, m, c, p, config)
            return jax.value_and_grad(fn)(x)
        vg = lambda x: jax.vmap(one)(x, lane_spots, lane_strikes, lane_mats,
                                     lane_call, lane_mkt)

    res = lbfgs_minimize_batched(vg, x0.reshape(L, 13), config.lbfgs)
    shape2 = lambda a: a.reshape(b, n_starts, *a.shape[1:])
    f = shape2(res.f)
    xs = shape2(res.x)
    finite = jnp.isfinite(f)
    masked = jnp.where(finite, f, jnp.inf)
    win = jnp.argmin(masked, axis=-1)                          # [B]
    take = lambda a: jnp.take_along_axis(
        a, win.reshape(b, *([1] * (a.ndim - 1))), axis=1).squeeze(1)
    x_best = take(xs)
    params_vec = transform(x_best)
    model = jax.vmap(lambda pv, s, k, m, c: price_options(
        DHParams.from_vector(pv), s, rate, k, m, c,
        n_terms=config.pricer.n_terms, L=config.pricer.trunc_L,
        q=config.pricer.dividend_yield))(
            params_vec, spots, strikes, maturities, is_call)
    return BatchCalibration(
        x=x_best, params=params_vec,
        loss=jnp.take_along_axis(masked, win[:, None], 1)[:, 0],
        model_prices=model,
        iterations=take(shape2(res.n_iters)),
        n_evals=take(shape2(res.n_evals)),
        converged=take(shape2(res.converged)) & take(finite),
        per_start_loss=f, per_start_x=xs)


def _polish_pricer_config(config: CalibrationConfig) -> CalibrationConfig:
    """Polish-phase pricer override: N = config.polish_n_terms COS terms
    (rationale and measurements: utils/config.py::CalibrationConfig)."""
    return dataclasses.replace(
        config, pricer=dataclasses.replace(config.pricer,
                                           n_terms=config.polish_n_terms))


def _continue_unconverged(spots, rate, strikes, maturities, is_call,
                          market_prices, res, params_vec, model,
                          polish_config: CalibrationConfig, polish: LMConfig,
                          maxiter: int = None):
    """Stage-B tail completion: gather the (surface, start) lanes stage A
    left unconverged into a COMPACTED batch, run them for (up to)
    ``maxiter`` more LM iterations, and scatter the results back.

    Under vmap a while_loop runs in lockstep, so a full-width polish pays
    max-over-lanes iterations on EVERY lane (measured at batch 2048 x 3
    starts on v5e: mean 23 LM iterations, max 81 -> 47.3 s, 92 % of the
    whole pipeline). Completing only the unconverged tail in a compacted
    re-dispatch preserves the exact polish-all-starts semantics at a
    fraction of the cost. The one host sync (fetching the converged mask)
    costs ~a tunnel round trip; the compacted batch is padded to a
    power-of-two bucket so recompiles are bounded (the XLA executables are
    persistently cached).
    """
    if maxiter is not None:
        polish = dataclasses.replace(polish, maxiter=maxiter)
    b, s = res.x.shape[:2]
    conv = np.asarray(jax.device_get(res.converged))          # [B, S]
    f = np.asarray(jax.device_get(res.f))                     # [B, S]
    # Continue only lanes that can still matter: unconverged, finite, and
    # within polish_continue_margin of their surface's best polished loss
    # (see utils/config.py — far-behind losers crawl at their own local
    # minimum's floor and can never win).
    with np.errstate(invalid="ignore"):
        best = np.nanmin(np.where(np.isfinite(f), f, np.nan), axis=1,
                         keepdims=True)
    matter = np.isfinite(f) & (f <= best * polish_config.polish_continue_margin)
    idx = np.nonzero((~conv & matter).reshape(-1))[0]
    if idx.size == 0:
        return res, params_vec, model
    n_pad = max(32, 1 << int(idx.size - 1).bit_length())
    n_pad = min(n_pad, b * s)
    pad_idx = np.concatenate(
        [idx, np.full(n_pad - idx.size, idx[0], np.int64)])
    surf = jnp.asarray(pad_idx // s)
    lanes = jnp.asarray(pad_idx)

    flat = lambda a: a.reshape(b * s, *a.shape[2:])
    gsurf = lambda a: jnp.asarray(a)[surf]
    # Warm-start the damping from stage A, clipped to a moderate range: a
    # lane that ended stage A mid rejection-cascade would otherwise start
    # stage B damped to death and give up instantly.
    lam0 = jnp.clip(flat(res.lam)[lanes], polish.lambda_init, 1e2)
    if (polish_config.polish_impl == "pallas"
            and n_pad >= polish_config.polish_fused_min_lanes):
        resB, paramsB, modelB = _polish_lanes_fused(
            jnp.asarray(spots)[surf], rate, gsurf(strikes),
            gsurf(maturities), gsurf(is_call), gsurf(market_prices),
            flat(res.x)[lanes], lam0, polish_config, polish, warm=True)
    else:
        resB, paramsB, modelB = _polish_batch_lm_warm(
            jnp.asarray(spots)[surf], rate, gsurf(strikes),
            gsurf(maturities), gsurf(is_call), gsurf(market_prices),
            flat(res.x)[lanes], lam0, polish_config, polish)

    live = idx.size
    put = lambda whole, part: flat(whole).at[jnp.asarray(idx)].set(
        part[:live]).reshape(whole.shape)
    # Additive iteration/eval accounting: stage B continues stage A's solve.
    add = lambda whole, part: flat(whole).at[jnp.asarray(idx)].add(
        part[:live]).reshape(whole.shape)
    res = res._replace(
        x=put(res.x, resB.x), f=put(res.f, resB.f),
        grad=put(res.grad, resB.grad), r=put(res.r, resB.r),
        n_iters=add(res.n_iters, resB.n_iters),
        n_evals=add(res.n_evals, resB.n_evals),
        converged=put(res.converged, resB.converged),
        lam=put(res.lam, resB.lam))
    return (res, put(params_vec, paramsB), put(model, modelB))


@partial(jax.jit, static_argnames=("config", "polish"))
def _polish_batch(spots, rate, strikes, maturities, is_call, market_prices,
                  x0, config: CalibrationConfig, polish: LBFGSConfig):
    def one(spot, k, m, c, p, x):
        res, params_vec, model = _polish_core(
            spot, rate, k, m, c, p, x, config, polish)
        return res, params_vec, model
    return jax.vmap(one)(spots, strikes, maturities, is_call, market_prices,
                         x0)


def calibrate_batch_mixed(spots, rate, strikes, maturities, is_call,
                          market_prices, keys,
                          config: CalibrationConfig = CalibrationConfig(),
                          n_starts: int = 3,
                          polish=POLISH_LM,
                          polish_all_starts: bool = True) -> BatchCalibration:
    """Mixed-precision batch calibration: f32 multi-start + f64 polish.

    TPU rationale: the f32 fast path runs the whole multi-start L-BFGS at
    hardware speed but stalls at the TPU's f32 transcendental accuracy
    (~1e-4 relative pricing error -> ~0.04% calibration error); float64 on
    TPU is software-emulated (~500x slower) but precise. Phase 1 solves the
    hard nonconvex part in f32; phase 2 polishes the single winner in f64
    for a few iterations. Net: f64-grade accuracy at nearly-f32 cost.

    ``polish`` selects the refiner: an LMConfig (default) runs
    Levenberg–Marquardt on the residual vector — quadratic local convergence
    and a small XLA program (the fix for the round-1 262 s compile wall); an
    LBFGSConfig runs the Wolfe L-BFGS polish (round-1 behavior, kept for
    comparison).

    Deliberately TWO device dispatches (f32 program + f64 program): fusing
    both phases into one jit makes the XLA:TPU f64-emulation compile blow
    up from minutes to >35 min, while the extra dispatch costs ~ms.

    Requires jax_enable_x64 for a true f64 polish; without it the polish
    simply reruns in f32 (still a valid refinement).
    """
    f32 = jnp.float32
    # Search-phase economies (results identical to <= the f32 floor, which
    # the polish re-converges past anyway): N=64 COS terms and a per-lane
    # evaluation cap that bounds the vmapped batch's convergence tail.
    # Rationale and measurements: utils/config.py::CalibrationConfig.
    search_config = dataclasses.replace(
        config,
        pricer=dataclasses.replace(config.pricer,
                                   n_terms=config.search_n_terms),
        lbfgs=dataclasses.replace(config.lbfgs,
                                  maxeval=config.search_maxeval))
    search_args = (
        jnp.asarray(spots, f32), jnp.asarray(rate, f32),
        jnp.asarray(strikes, f32), jnp.asarray(maturities, f32), is_call,
        jnp.asarray(market_prices, f32), keys)
    if config.search_impl == "vmap":
        out32 = calibrate_batch(*search_args, search_config, n_starts)
    else:
        out32 = calibrate_batch_fused(*search_args, search_config, n_starts,
                                      impl=config.search_impl)

    if polish_all_starts and isinstance(polish, LMConfig):
        # Polish every start, then argmin on the POLISHED f64 loss (see
        # _polish_batch_lm_starts docstring — kills the f32-winner-in-a-
        # local-minimum outliers). Polish prices at N=polish_n_terms, and
        # with enough lanes the convergence tail is finished in a compacted
        # stage-B re-dispatch (see _continue_unconverged).
        polish_config = _polish_pricer_config(config)
        n_lanes = out32.per_start_x.shape[0] * out32.per_start_x.shape[1]
        compact = n_lanes >= config.polish_compact_min_lanes
        stage_a = (dataclasses.replace(
            polish, maxiter=config.polish_stage_a_maxiter)
            if compact else polish)
        use_fused = (config.polish_impl == "pallas"
                     and n_lanes >= config.polish_fused_min_lanes)
        starts_fn = (_polish_starts_fused if use_fused
                     else _polish_batch_lm_starts)
        res, params_vec, model = starts_fn(
            spots, rate, strikes, maturities, is_call, market_prices,
            out32.per_start_x, polish_config, stage_a)
        if compact:
            # Multi-wave tail completion: each wave re-compacts to the
            # lanes still unconverged AND still able to win (the matter
            # margin re-evaluates as basins separate), so the lockstep
            # width shrinks wave over wave instead of the whole tail
            # paying full-batch iterations. Budgets sum past
            # polish.maxiter so stragglers get at least the single-stage
            # budget.
            for wave_iters in config.polish_wave_budgets:
                res, params_vec, model = _continue_unconverged(
                    spots, rate, strikes, maturities, is_call,
                    market_prices, res, params_vec, model, polish_config,
                    polish, maxiter=wave_iters)
        masked = jnp.where(jnp.isfinite(res.f), res.f, jnp.inf)
        win = jnp.argmin(masked, axis=-1)                       # [B]
        b = win.shape[0]
        take = lambda a: jnp.take_along_axis(
            a, win.reshape(b, *([1] * (a.ndim - 1))), axis=1).squeeze(1)
        # iterations / n_evals report AGGREGATE pipeline cost: the f32
        # search winner's iterations/evals plus the polish cost — polish
        # iterations for the polished winner, polish evals summed over ALL
        # starts (all S lanes ran; that is the true evaluation bill).
        # converged is the POLISHED winner's flag: the f32 flag belongs to a
        # possibly different start and says nothing about the final iterate.
        return BatchCalibration(
            x=take(res.x), params=take(params_vec),
            loss=take(masked), model_prices=take(model),
            iterations=out32.iterations + take(res.n_iters),
            n_evals=out32.n_evals + jnp.sum(res.n_evals, axis=-1),
            converged=take(res.converged),
            per_start_loss=masked, per_start_x=res.x)

    if isinstance(polish, LMConfig):
        polish_fn, cfg_p = _polish_batch_lm, _polish_pricer_config(config)
    else:
        polish_fn, cfg_p = _polish_batch, config
    res, params_vec, model = polish_fn(
        spots, rate, strikes, maturities, is_call, market_prices, out32.x,
        cfg_p, polish)
    # per_start_x: the f32 search iterates, with the winner's row replaced by
    # its polished refinement, so the field is always [B, S, 13] and the
    # winning row equals .x on every code path.
    win32 = jnp.argmin(
        jnp.where(jnp.isfinite(out32.per_start_loss),
                  out32.per_start_loss, jnp.inf), axis=-1)      # [B]
    per_start_x = out32.per_start_x.astype(res.x.dtype)
    b_idx = jnp.arange(per_start_x.shape[0])
    per_start_x = per_start_x.at[b_idx, win32].set(res.x)
    return BatchCalibration(
        x=res.x, params=params_vec, loss=res.f, model_prices=model,
        iterations=out32.iterations + res.n_iters,
        n_evals=out32.n_evals + res.n_evals,
        converged=res.converged,
        per_start_loss=out32.per_start_loss.astype(res.f.dtype),
        per_start_x=per_start_x)


def options_to_arrays(market_options: List[Dict], dtype=np.float64):
    """Convert the reference's list-of-dicts market format to arrays."""
    strikes = np.array([o["strike"] for o in market_options], dtype)
    maturities = np.array([o["maturity"] for o in market_options], dtype)
    prices = np.array([o["price"] for o in market_options], dtype)
    is_call = np.array(
        [str(o.get("option_type", "call")).upper()[0] == "C"
         for o in market_options])
    return strikes, maturities, prices, is_call


class DoubleHestonJumpCalibrator:
    """Drop-in style calibrator mirroring the reference class API
    (lbfgs_calibrator.py:44-336), backed by the on-device engine."""

    def __init__(self, spot: float, risk_free_rate: float,
                 market_options: List[Dict],
                 config: CalibrationConfig = CalibrationConfig(),
                 dtype=None, seed: int = 0):
        self.spot = spot
        self.risk_free_rate = risk_free_rate
        self.market_options = market_options
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype
        self.config = config
        self.seed = seed
        k, m, p, c = options_to_arrays(market_options)
        self.strikes = jnp.asarray(k, dtype)
        self.maturities = jnp.asarray(m, dtype)
        self.market_prices = jnp.asarray(p, dtype)
        self.is_call = jnp.asarray(c)
        self.param_names = list(PARAM_NAMES)

    def compute_loss(self, x) -> float:
        """Loss at an unconstrained 13-vector (reference API parity)."""
        loss_fn = make_loss_fn(self.spot, self.risk_free_rate, self.strikes,
                               self.maturities, self.is_call,
                               self.market_prices, self.config)
        return float(loss_fn(jnp.asarray(x, self.dtype)))

    def transform_params(self, x) -> Dict[str, float]:
        vec = np.asarray(transform(jnp.asarray(x, self.dtype)))
        return {n: float(v) for n, v in zip(PARAM_NAMES, vec)}

    def inverse_transform_params(self, params: Dict[str, float]) -> np.ndarray:
        from .transforms import inverse_transform
        vec = jnp.asarray([params[n] for n in PARAM_NAMES], self.dtype)
        return np.asarray(inverse_transform(vec))

    def calibrate(self, maxiter: int = 300, multi_start: int = 3
                  ) -> CalibrationResult:
        """Run the full multi-start calibration; returns the best result.

        Unlike the reference (sequential scipy loop), this is one jitted
        device program; wall time includes compilation on first call only.
        """
        t0 = time.time()
        cfg = dataclasses.replace(
            self.config,
            lbfgs=dataclasses.replace(self.config.lbfgs, maxiter=maxiter))
        out = calibrate_surface(
            jnp.asarray(self.spot, self.dtype),
            jnp.asarray(self.risk_free_rate, self.dtype),
            self.strikes, self.maturities, self.is_call, self.market_prices,
            jax.random.key(self.seed), cfg, multi_start)
        out = jax.tree.map(np.asarray, jax.block_until_ready(out))
        elapsed = time.time() - t0

        success = bool(np.isfinite(out.loss))
        params = {n: float(v) for n, v in zip(PARAM_NAMES, out.params)}
        return CalibrationResult(
            date="", spot=float(self.spot), risk_free=float(self.risk_free_rate),
            parameters=params,
            market_prices=np.asarray(self.market_prices),
            model_prices=np.asarray(out.model_prices),
            market_options=self.market_options,
            final_loss=float(out.loss),
            calibration_time=elapsed,
            success=success,
            iterations=int(out.iterations),
            message=("converged" if bool(out.converged)
                     else "stopped (maxiter or line search)") if success
                    else "All optimization starts failed")
