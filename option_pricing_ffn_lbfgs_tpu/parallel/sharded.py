"""Sharded batch calibration across a device mesh.

Scale-out design (vs the reference's sequential single-thread loop,
lbfgs_calibrator.py:252): a batch of B surfaces is sharded over the mesh's
``surfaces`` axis; every device runs the full vmapped multi-start L-BFGS on
its local shard (pure compute, zero communication), and only the summary
statistics cross chips — one ``psum`` over ICI via shard_map. This is the
layout the scaling-book recipe prescribes for embarrassingly parallel work:
collectives only where data genuinely crosses devices.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..calibration.calibrator import BatchCalibration, _calibrate_core
from ..utils.config import CalibrationConfig
from .mesh import SURFACE_AXIS, batch_sharding, make_mesh, pad_to_multiple


class ShardedSummary(NamedTuple):
    """Cross-device aggregate statistics (psum-reduced)."""
    mean_loss: jnp.ndarray
    mean_rel_error: jnp.ndarray   # mean |model-market|/market over all surfaces
    n_converged: jnp.ndarray
    n_total: jnp.ndarray


def _local_calibrate(rate, config, n_starts, spots, strikes, maturities,
                     is_call, market_prices, keys, valid):
    """Per-device shard body: vmapped multi-start calibration + local stats.

    ``valid`` masks padding surfaces (batch padded to a multiple of the mesh
    size) out of the statistics.
    """
    fn = lambda s, k, m, c, p, ky: _calibrate_core(
        s, rate, k, m, c, p, ky, config, n_starts)
    out = jax.vmap(fn)(spots, strikes, maturities, is_call, market_prices,
                       keys)
    w = valid.astype(market_prices.dtype)
    rel = jnp.abs((out.model_prices - market_prices) / market_prices)
    n = jax.lax.psum(jnp.sum(w), SURFACE_AXIS)
    mean_loss = jax.lax.psum(jnp.sum(out.loss * w), SURFACE_AXIS) / n
    mean_rel = jax.lax.psum(jnp.sum(jnp.mean(rel, axis=-1) * w),
                            SURFACE_AXIS) / n
    n_conv = jax.lax.psum(jnp.sum(out.converged * valid), SURFACE_AXIS)
    summary = ShardedSummary(mean_loss=mean_loss, mean_rel_error=mean_rel,
                             n_converged=n_conv, n_total=n.astype(jnp.int32))
    return out, summary


def calibrate_sharded(mesh: Mesh, spots, rate, strikes, maturities, is_call,
                      market_prices, keys,
                      config: CalibrationConfig = CalibrationConfig(),
                      n_starts: int = 3):
    """Calibrate B surfaces sharded over ``mesh`` in one device program.

    Inputs have leading batch dim B (padded internally to a multiple of the
    mesh size). Returns (BatchCalibration with batch axis B, ShardedSummary).
    """
    n_dev = mesh.devices.size
    b = spots.shape[0]
    b_pad = pad_to_multiple(b, n_dev)
    pad = b_pad - b

    def pad0(x):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, mode="edge")

    valid = jnp.arange(b_pad) < b
    args = tuple(pad0(jnp.asarray(a)) for a in
                 (spots, strikes, maturities, is_call, market_prices))
    keys = pad0(keys) if pad else keys

    spec_b = P(SURFACE_AXIS)
    fn = partial(_local_calibrate, jnp.asarray(rate, args[4].dtype), config,
                 n_starts)
    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(spec_b,) * 7,
        out_specs=(
            BatchCalibration(x=spec_b, params=spec_b, loss=spec_b,
                             model_prices=spec_b, iterations=spec_b,
                             n_evals=spec_b, converged=spec_b,
                             per_start_loss=spec_b, per_start_x=spec_b),
            ShardedSummary(mean_loss=P(), mean_rel_error=P(),
                           n_converged=P(), n_total=P()),
        ),
        check_vma=False)
    out, summary = jax.jit(sharded)(args[0], args[1], args[2], args[3],
                                    args[4], keys, valid)
    if pad:
        out = jax.tree.map(lambda a: a[:b], out)
    return out, summary
