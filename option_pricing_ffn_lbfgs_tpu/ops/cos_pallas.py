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

LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _price_tile(params_vec, spots, rate, strikes, mats, is_call, valid,
                n_opt_pad, n_terms):
    """Price TILE_B surfaces: pure jnp math on loaded values.

    params_vec: [TILE_B, 13]; strikes/mats/is_call/valid: [TILE_B, n_opt_pad].
    Returns [TILE_B, n_opt_pad] prices (garbage-masked-to-0 on padding).
    """
    tile_b = params_vec.shape[0]
    flat = (tile_b * n_opt_pad,)
    # Broadcast per-surface params onto the flattened option axis.
    p = DHParams(*(jnp.repeat(params_vec[:, i], n_opt_pad, axis=0)
                   for i in range(13)))
    spot = jnp.repeat(spots, n_opt_pad, axis=0)            # [F]
    k_flat = strikes.reshape(flat)[:, None]                # [F,1]
    t_flat = mats.reshape(flat)[:, None]
    c_flat = is_call.reshape(flat)[:, None]
    v_flat = valid.reshape(flat)
    # Guard padding lanes: maturities of 0 etc. produce NaN; use benign
    # values there and mask at the end.
    safe_t = jnp.where(v_flat[:, None], t_flat, 1.0)
    safe_k = jnp.where(v_flat[:, None], k_flat, spot[:, None])

    pp = DHParams(*(f[:, None] for f in p))                # [F,1] fields
    a, b = truncation_range(pp, safe_t, safe_k, spot[:, None], rate)  # [F,1]
    log_k = jnp.log(safe_k / spot[:, None])
    k_idx = jax.lax.broadcasted_iota(jnp.float32, (flat[0], n_terms), 1)
    u = k_idx * (math.pi / (b - a))                        # [F,N]
    phi_re, phi_im = char_fn(u, safe_t, pp, rate)          # [F,N]
    v = payoff_coefficients(k_idx, a, b, log_k, spot[:, None], safe_k,
                            c_flat)
    ua = u * a
    terms = (phi_re * jnp.cos(ua) + phi_im * jnp.sin(ua)) * v
    w = jnp.where(k_idx == 0, 0.5, 1.0)
    series = jnp.sum(terms * w, axis=-1)                   # [F]
    price = jnp.exp(-rate * safe_t[:, 0]) * series
    price = jnp.where(v_flat, price, 0.0)
    return price.reshape(tile_b, n_opt_pad)


def _kernel(rate_ref, params_ref, spots_ref, strikes_ref, mats_ref,
            call_ref, valid_ref, out_ref, *, n_opt_pad, n_terms):
    out_ref[:, :] = _price_tile(
        params_ref[:, :], spots_ref[:, 0], rate_ref[0],
        strikes_ref[:, :], mats_ref[:, :],
        call_ref[:, :] != 0, valid_ref[:, :] != 0,
        n_opt_pad, n_terms)


@partial(jax.jit,
         static_argnames=("n_terms", "tile_b", "interpret"))
def price_surfaces_pallas(params, spots, rate, strikes, maturities, is_call,
                          n_terms: int = 128, tile_b: int = 8,
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

    def pad(x, val=0.0):
        return jnp.pad(jnp.asarray(x, f32),
                       ((0, b_pad - b), (0, n_opt_pad - n_opt)),
                       constant_values=val)

    params_p = jnp.pad(jnp.asarray(params, f32), ((0, b_pad - b), (0, 0)))
    spots_p = jnp.pad(jnp.asarray(spots, f32)[:, None],
                      ((0, b_pad - b), (0, 0)), constant_values=1.0)
    strikes_p = pad(strikes, 1.0)
    mats_p = pad(maturities, 1.0)
    call_p = jnp.pad(jnp.asarray(is_call, jnp.int32),
                     ((0, b_pad - b), (0, n_opt_pad - n_opt)))
    valid = jnp.pad(jnp.ones((b, n_opt), jnp.int32),
                    ((0, b_pad - b), (0, n_opt_pad - n_opt)))
    rate_arr = jnp.asarray([rate], f32)

    grid = (b_pad // tile_b,)
    row_spec = lambda width: pl.BlockSpec(
        (tile_b, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, n_opt_pad=n_opt_pad, n_terms=n_terms),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # rate
            row_spec(13), row_spec(1),
            row_spec(n_opt_pad), row_spec(n_opt_pad),
            row_spec(n_opt_pad), row_spec(n_opt_pad),
        ],
        out_specs=row_spec(n_opt_pad),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_opt_pad), f32),
        interpret=interpret,
    )(rate_arr, params_p, spots_p, strikes_p, mats_p, call_p, valid)
    return out[:b, :n_opt]
