"""Fused Pallas TPU kernel: batched COS surface pricing.

The hot op of the framework (SURVEY.md §3.1-3.2): evaluate the Double
Heston + jump characteristic function over a [surfaces, options, N_terms]
grid, build the payoff cosine coefficients, and reduce the series — all in
one VMEM-resident kernel, one HBM round trip per tile. The reference does
this as ~5,760 scalar Python evaluations per loss call
(double_heston.py:160-192).

Design:
  * grid over surface tiles: each program prices TILE_B surfaces at once as
    [TILE_B * n_opt_pad, N] f32 arrays (n_opt_pad rounds the option count to
    the f32 sublane (8); N is the lane dim, 128 by default) — full VPU
    occupancy;
  * the math body reuses the *same* split-complex jnp functions as the XLA
    path (models/double_heston.py) — Pallas traces them into the kernel, so
    there is one source of truth for the formulas and the jnp path doubles
    as the interpret-mode oracle;
  * forward-only by design: the calibration gradient path stays on the
    XLA-fused jnp pricer (recomputing the forward in a custom-VJP backward
    would cost more than it saves). Pallas serves the forward-only
    consumers: synthetic data generation, FFN screening, surface repricing,
    and pure pricing throughput.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.double_heston import (
    DHParams, char_fn, payoff_coefficients, truncation_range)
from ..ops import complex_math as _cm

LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _price_tile(params, spot, rate, strike, tau, is_call, valid, n_terms):
    """Price one tile of F flattened (surface, option) rows.

    All per-row inputs arrive PRE-FLATTENED by the host as [F, 1] columns
    (params as [F, 13]) — Mosaic cannot lower cross-sublane/lane reshapes
    like [8,16]->[128], so no rank or shape changes happen inside the
    kernel; every op is [F,1] or [F,N] elementwise/broadcast/reduce.
    Returns [F, 1] prices (masked to 0 on padding rows).
    """
    f = spot.shape[0]
    p = DHParams(*(params[:, i:i + 1] for i in range(13)))  # [F,1] fields
    # Guard padding rows: benign values in, mask out.
    safe_t = jnp.where(valid, tau, 1.0)
    safe_k = jnp.where(valid, strike, spot)

    a, b = truncation_range(p, safe_t, safe_k, spot, rate)  # [F,1]
    log_k = jnp.log(safe_k / spot)
    # Mosaic's tpu.iota is integer-only; build int32 and convert.
    k_idx = jax.lax.broadcasted_iota(
        jnp.int32, (f, n_terms), 1).astype(jnp.float32)
    u = k_idx * (math.pi / (b - a))                        # [F,N]
    phi_re, phi_im = char_fn(u, safe_t, p, rate)           # [F,N]
    v = payoff_coefficients(k_idx, a, b, log_k, spot, safe_k, is_call)
    ua = u * a
    terms = (phi_re * jnp.cos(ua) + phi_im * jnp.sin(ua)) * v
    w = jnp.where(k_idx == 0, 0.5, 1.0)
    series = jnp.sum(terms * w, axis=-1, keepdims=True)    # [F,1]
    price = jnp.exp(-rate * safe_t) * series
    return jnp.where(valid, price, 0.0)


def _kernel(rate_ref, params_ref, spots_ref, strikes_ref, mats_ref,
            call_ref, valid_ref, out_ref, *, n_terms):
    # Mosaic has no atan2 lowering; swap the f32-grade polynomial into
    # complex_math.clog for the duration of the kernel trace (trace-time
    # only — the XLA path keeps lax.atan2).
    prev = _cm._ARCTAN2[0]
    _cm._ARCTAN2[0] = _cm.arctan2_poly
    try:
        out_ref[:, :] = _price_tile(
            params_ref[:, :], spots_ref[:, :], rate_ref[0],
            strikes_ref[:, :], mats_ref[:, :],
            call_ref[:, :] != 0, valid_ref[:, :] != 0, n_terms)
    finally:
        _cm._ARCTAN2[0] = prev


@partial(jax.jit,
         static_argnames=("n_terms", "tile_b", "interpret"))
def price_surfaces_pallas(params, spots, rate, strikes, maturities, is_call,
                          n_terms: int = 128, tile_b: int = 32,
                          interpret: bool = False):
    """Price a batch of surfaces with the fused Pallas kernel (float32).

    Args:
      params: [B, 13] constrained parameter vectors.
      spots: [B]; strikes/maturities: [B, n_opt]; is_call: [B, n_opt] bool.
      rate: scalar. tile_b: surfaces per kernel program.
    Returns:
      [B, n_opt] float32 prices.
    """
    f32 = jnp.float32
    b, n_opt = strikes.shape
    n_opt_pad = _round_up(n_opt, SUBLANE)
    b_pad = _round_up(b, tile_b)
    tile_f = tile_b * n_opt_pad      # flattened rows per kernel program
    n_flat = b_pad * n_opt_pad

    # Host-side flatten: the kernel works on [(surface, option), 1] rows
    # because Mosaic cannot reshape across sublane/lane boundaries inside
    # the kernel. XLA handles these cheap layout ops once, outside.
    def flat_col(x, val):
        xp = jnp.pad(jnp.asarray(x, f32),
                     ((0, b_pad - b), (0, n_opt_pad - n_opt)),
                     constant_values=val)
        return xp.reshape(n_flat, 1)

    params_p = jnp.repeat(
        jnp.pad(jnp.asarray(params, f32), ((0, b_pad - b), (0, 0))),
        n_opt_pad, axis=0)                                   # [n_flat, 13]
    spots_p = jnp.repeat(
        jnp.pad(jnp.asarray(spots, f32), (0, b_pad - b),
                constant_values=1.0), n_opt_pad)[:, None]    # [n_flat, 1]
    strikes_p = flat_col(strikes, 1.0)
    mats_p = flat_col(maturities, 1.0)
    call_p = flat_col(jnp.asarray(is_call, f32), 0.0)
    valid = flat_col(jnp.ones((b, n_opt), f32), 0.0)
    rate_arr = jnp.asarray([rate], f32)

    grid = (n_flat // tile_f,)
    row_spec = lambda width: pl.BlockSpec(
        (tile_f, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # x64 disabled around the trace: under jax_enable_x64 python-float
    # literals become f64 kernel constants and the BlockSpec index maps
    # return i64 — both kill the Mosaic compiler (see ops/loss_pallas.py).
    with jax.enable_x64(False):
        out = pl.pallas_call(
            partial(_kernel, n_terms=n_terms),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # rate
                row_spec(13), row_spec(1),
                row_spec(1), row_spec(1),
                row_spec(1), row_spec(1),
            ],
            out_specs=row_spec(1),
            out_shape=jax.ShapeDtypeStruct((n_flat, 1), f32),
            interpret=interpret,
        )(rate_arr, params_p, spots_p, strikes_p, mats_p, call_p, valid)
    return out.reshape(b_pad, n_opt_pad)[:b, :n_opt]
