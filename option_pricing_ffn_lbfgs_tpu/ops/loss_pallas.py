"""Fused Pallas kernel: calibration loss value AND gradient in one pass.

The search phase's hot op is ``jax.value_and_grad`` of the surface loss
(relative-MSE over a [lanes, options, N] COS grid + Feller penalty),
evaluated once per L-BFGS loop trip. Left to XLA, the forward+backward
graph materializes O(100) [lanes, options, N] intermediates in HBM between
fusion clusters — measured 16.8 ms per evaluation at 6144 lanes on v5e,
~50x above the VPU transcendental roofline (scripts/profile_search.py).

This kernel computes, per flattened (lane, option) row and entirely in
VMEM:

  * the COS price P (same split-complex math as the XLA path — it traces
    ``ops/cos_pallas._price_tile``, one source of truth for the formulas);
  * the row's weighted parameter gradient w * dP/dparams via ``jax.vjp``
    TRACED INSIDE THE KERNEL — reverse-mode AD happens at trace time, so
    the backward sweep is ordinary VPU code in the same kernel body, and
    the only HBM traffic per row is ~30 input + ~56 output bytes.

Two weightings serve the framework's two consumers:
  * mode="loss":  w = 2 (P - mkt) / (mkt^2 n_opt)  — the exact dLoss/dP of
    the relative-MSE loss, so summing the [n_opt] rows of one lane gives
    the lane's full pricing-gradient (the Feller/transform parts are tiny
    [L, 13] host ops, see make_batch_value_and_grad);
  * mode="jac":   w = 1 / (mkt sqrt(n_opt))        — rows are then exactly
    the residual Jacobian d r_j / dparams of calibration/loss.py::
    surface_residuals, giving the LM polish its f32 Jacobian in ONE
    reverse sweep instead of 13 forward tangents.

The host-side assembly (masking of invalid rows, Feller penalty, transform
chain rule, sentinel semantics) mirrors calibration/loss.py exactly;
tests/test_loss_pallas.py pins parity against XLA autodiff in interpret
mode on CPU.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.double_heston import DHParams
from ..calibration.transforms import transform
from ..calibration.loss import feller_penalty
from ..utils.config import CalibrationConfig
from ..ops import complex_math as _cm
from .cos_pallas import SUBLANE, _price_tile, _round_up


def _kernel_vg(rate_ref, params_ref, spots_ref, strikes_ref, mats_ref,
               call_ref, valid_ref, mkt_ref, price_ref, grad_ref,
               *, n_terms, n_opt, mode, remat):
    prev = _cm._ARCTAN2[0]
    _cm._ARCTAN2[0] = _cm.arctan2_poly
    try:
        # Trace the body with x64 DISABLED: under jax_enable_x64 the python
        # float literals in where()/arithmetic become f64[] scalar
        # constants inside the kernel jaxpr, and Mosaic SIGABRTs the TPU
        # compiler on any f64 (measured 2026-08-21). The kernel is
        # f32-only by design.
        with jax.enable_x64(False):
            def price_of(p):
                return _price_tile(
                    p, spots_ref[:, :], rate_ref[0], strikes_ref[:, :],
                    mats_ref[:, :], call_ref[:, :] != 0,
                    valid_ref[:, :] != 0, n_terms)

            if remat:
                # Recompute the forward during the in-kernel backward
                # sweep — NOTE: jax.checkpoint's remat2 primitive has no
                # Mosaic lowering (measured 2026-08-21: "Unimplemented
                # primitive ... remat2"), so this only works in interpret
                # mode; the TPU kernel instead uses small tiles (default
                # 64 rows) to fit the ~16 MB VMEM budget. Kept for
                # interpreter experiments.
                price_of = jax.checkpoint(price_of)
            price, vjp = jax.vjp(price_of, params_ref[:, :])
            mkt = mkt_ref[:, :]
            valid = valid_ref[:, :] != 0
            if mode == "loss":
                w = 2.0 * (price - mkt) / (mkt * mkt * float(n_opt))
            else:
                w = jnp.full_like(mkt, 1.0 / math.sqrt(float(n_opt))) / mkt
            w = jnp.where(valid, w, 0.0)
            gp, = vjp(w)
            price_ref[:, :] = price
            grad_ref[:, :] = gp
    finally:
        _cm._ARCTAN2[0] = prev


@partial(jax.jit, static_argnames=("n_terms", "n_opt", "mode", "tile_f",
                                   "interpret", "remat"))
def _rows_price_and_grad(params_rows, spots_rows, strikes_rows, mats_rows,
                         call_rows, valid_rows, mkt_rows, rate,
                         n_terms: int, n_opt: int, mode: str,
                         tile_f: int, interpret: bool, remat: bool = False):
    """Row-level kernel launch: all inputs pre-flattened [n_flat, 1|13]."""
    f32 = jnp.float32
    n_flat = params_rows.shape[0]
    grid = (n_flat // tile_f,)
    row_spec = lambda width: pl.BlockSpec(
        (tile_f, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # x64 disabled around the WHOLE pallas_call trace: not just the body —
    # the BlockSpec index maps also trace here, and under jax_enable_x64
    # they return i64 grid indices that Mosaic cannot legalize
    # ("failed to legalize operation 'func.return'", measured 2026-08-21).
    with jax.enable_x64(False):
        price, grad = pl.pallas_call(
            partial(_kernel_vg, n_terms=n_terms, n_opt=n_opt, mode=mode,
                    remat=remat),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # rate
                row_spec(13), row_spec(1), row_spec(1), row_spec(1),
                row_spec(1), row_spec(1), row_spec(1),
            ],
            out_specs=(row_spec(1), row_spec(13)),
            out_shape=(jax.ShapeDtypeStruct((n_flat, 1), f32),
                       jax.ShapeDtypeStruct((n_flat, 13), f32)),
            interpret=interpret,
        )(jnp.asarray([rate], f32), params_rows, spots_rows, strikes_rows,
          mats_rows, call_rows, valid_rows, mkt_rows)
    return price, grad


class _SurfaceRows:
    """Pre-flattened per-row surface data, built once per problem set.

    The L-BFGS while_loop re-evaluates only x; everything else is static
    across trips, so the [L*n_opt_pad, 1] row columns are prepared once
    here and closed over by the batched value-and-grad callable.
    """

    def __init__(self, spots, strikes, maturities, is_call, market_prices,
                 rate, tile_f, n_opt_pad=None):
        f32 = jnp.float32
        L, n_opt = strikes.shape
        self.L, self.n_opt = L, n_opt
        self.n_opt_pad = n_opt_pad or _round_up(n_opt, SUBLANE)
        self.rate = jnp.asarray(rate, jnp.float32)   # may be a tracer
        pad = self.n_opt_pad - n_opt
        n_flat = L * self.n_opt_pad
        # Clamp the tile to the problem and pad the row count to a tile
        # multiple (padding rows are valid=0 with benign values).
        self.tile_f = min(tile_f, _round_up(n_flat, SUBLANE))
        self.n_flat_pad = _round_up(n_flat, self.tile_f)
        self.row_pad = self.n_flat_pad - n_flat

        def rows(x, fill):
            xp = jnp.pad(jnp.asarray(x, f32), ((0, 0), (0, pad)),
                         constant_values=fill)
            return jnp.pad(xp.reshape(n_flat, 1), ((0, self.row_pad), (0, 0)),
                           constant_values=fill)

        self.spots = jnp.pad(
            jnp.repeat(jnp.asarray(spots, f32), self.n_opt_pad)[:, None],
            ((0, self.row_pad), (0, 0)), constant_values=1.0)
        self.strikes = rows(strikes, 1.0)
        self.mats = rows(maturities, 1.0)
        self.call = rows(jnp.asarray(is_call, f32), 0.0)
        self.valid = rows(jnp.ones((L, n_opt), f32), 0.0)
        self.mkt = rows(market_prices, 1.0)
        self.market_f32 = jnp.asarray(market_prices, f32)

    def pad_param_rows(self, params):
        """[L, 13] -> [n_flat_pad, 13] per-row replication + tile padding."""
        rows = jnp.repeat(params, self.n_opt_pad, axis=0)
        return jnp.pad(rows, ((0, self.row_pad), (0, 0)),
                       constant_values=0.1)


def make_batch_value_and_grad(spots, strikes, maturities, is_call,
                              market_prices, rate,
                              config: CalibrationConfig,
                              tile_f: int = 64, interpret: bool = False,
                              remat: bool = False):
    """Batch-level ``vg(x: [L, 13]) -> (f: [L], g: [L, 13])`` callable whose
    pricing value+gradient runs in the fused Pallas kernel.

    Semantics match ``jax.value_and_grad`` of calibration/loss.py::
    surface_loss per lane: where-masked invalid prices, sentinel
    ``config.bad_loss`` with zero gradient, Feller penalty, gradients in
    the calibrator's unconstrained coordinates.
    """
    data = _SurfaceRows(spots, strikes, maturities, is_call, market_prices,
                        rate, tile_f)
    L, n_opt, n_opt_pad = data.L, data.n_opt, data.n_opt_pad
    tile_f = data.tile_f
    n_terms = config.pricer.n_terms
    f32 = jnp.float32
    weight = config.feller_weight
    bad_loss = config.bad_loss

    # d(transform)/dx is diagonal (elementwise exp/tanh/identity): the
    # gradient of sum(transform) IS the diagonal — and transform is
    # last-axis masked, so it applies to the whole [L, 13] batch directly.
    tjac = jax.grad(lambda xv: jnp.sum(transform(xv)))
    pen_vg = jax.vmap(jax.value_and_grad(
        lambda pv: feller_penalty(DHParams.from_vector(pv), weight)))

    def vg(x):
        x = jnp.asarray(x, f32)
        params = transform(x)                                 # [L, 13]
        dpdx = tjac(x)                                        # [L, 13]
        params_rows = data.pad_param_rows(params)             # [F, 13]
        price, gp = _rows_price_and_grad(
            params_rows, data.spots, data.strikes, data.mats, data.call,
            data.valid, data.mkt, data.rate, n_terms, n_opt, "loss",
            tile_f, interpret, remat)
        n_flat = L * n_opt_pad
        P = price[:n_flat].reshape(L, n_opt_pad)[:, :n_opt]
        g_rows = gp[:n_flat].reshape(L, n_opt_pad, 13)[:, :n_opt]
        mktp = data.market_f32
        valid = jnp.isfinite(P) & (P > 0.0)
        rel = jnp.where(valid, (P - mktp) / mktp, 0.0)
        mse = jnp.mean(rel * rel, axis=-1)
        pen, pen_g = pen_vg(params)
        loss = mse + pen
        any_bad = jnp.any(~valid, axis=-1)
        bad = jnp.asarray(bad_loss, f32)
        loss = jnp.where(any_bad, bad, loss)
        loss = jnp.where(jnp.isfinite(loss), loss, bad)
        g_price = jnp.sum(jnp.where(valid[..., None], g_rows, 0.0), axis=1)
        gx = (g_price + pen_g) * dpdx
        gx = jnp.where(any_bad[:, None], 0.0, gx)
        gx = jnp.where(jnp.isfinite(gx), gx, 0.0)
        return loss, gx

    return vg


def make_batch_residual_jacobian(spots, strikes, maturities, is_call,
                                 market_prices, rate,
                                 config: CalibrationConfig,
                                 tile_f: int = 64,
                                 interpret: bool = False,
                                 remat: bool = False):
    """Batch-level f32 residual Jacobian for the LM polish.

    Returns ``jac(x: [L, 13]) -> J: [L, n_opt + 2, 13]`` matching
    ``jax.jacfwd`` of calibration/loss.py::surface_residuals (pricing rows
    + 2 Feller-penalty rows) in the unconstrained coordinates — but in ONE
    reverse sweep through the fused kernel instead of 13 forward tangents.
    """
    data = _SurfaceRows(spots, strikes, maturities, is_call, market_prices,
                        rate, tile_f)
    L, n_opt, n_opt_pad = data.L, data.n_opt, data.n_opt_pad
    tile_f = data.tile_f
    n_terms = config.pricer.n_terms
    f32 = jnp.float32
    weight = config.feller_weight

    tjac = jax.grad(lambda xv: jnp.sum(transform(xv)))

    def pen_rows(pv):
        # Exactly calibration/loss.py::surface_residuals' Feller rows
        # (double-where masked sqrt so the inactive branch has finite
        # tangents).
        p = DHParams.from_vector(pv)
        viol = jnp.stack([
            p.sigma1**2 - 2.0 * p.kappa1 * p.theta1,
            p.sigma2**2 - 2.0 * p.kappa2 * p.theta2])
        active = viol > 0.0
        safe_viol = jnp.where(active, viol, 1.0)
        return jnp.where(active, jnp.sqrt(weight * safe_viol), 0.0)

    pen_jac = jax.vmap(jax.jacfwd(pen_rows))

    def jac(x):
        x = jnp.asarray(x, f32)
        params = transform(x)
        dpdx = tjac(x)
        params_rows = data.pad_param_rows(params)
        _, gp = _rows_price_and_grad(
            params_rows, data.spots, data.strikes, data.mats, data.call,
            data.valid, data.mkt, data.rate, n_terms, n_opt, "jac",
            tile_f, interpret, remat)
        J_price = gp[:L * n_opt_pad].reshape(L, n_opt_pad, 13)[:, :n_opt]
        J_pen = pen_jac(params)                               # [L, 2, 13]
        J = jnp.concatenate([J_price, J_pen], axis=1)
        return J * dpdx[:, None, :]

    return jac
