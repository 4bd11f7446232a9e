"""Mesh-sharded batch calibration on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from option_pricing_ffn_lbfgs_tpu.calibration.calibrator import calibrate_batch
from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
    DHParams, price_options)
from option_pricing_ffn_lbfgs_tpu.parallel.mesh import make_mesh, pad_to_multiple
from option_pricing_ffn_lbfgs_tpu.parallel.sharded import calibrate_sharded
from option_pricing_ffn_lbfgs_tpu.utils.config import (
    CalibrationConfig, LBFGSConfig)
from tests.conftest import TRUE

# Loose settings: these tests validate sharding mechanics, not accuracy.
FAST = CalibrationConfig(lbfgs=LBFGSConfig(maxiter=25))


def _batch(b, surface15):
    """B surfaces with slightly different true params and spots."""
    strikes, mats, is_call = surface15
    rng = np.random.default_rng(0)
    spots = jnp.asarray(100.0 + rng.uniform(-2, 2, b))
    base = np.array([TRUE[k] for k in
                     DHParams.from_dict(TRUE, jnp.float64)._fields])
    vecs = jnp.asarray(base * (1.0 + rng.uniform(-0.05, 0.05, (b, 13))))
    prices = jax.vmap(
        lambda s, v: price_options(DHParams.from_vector(v), s, 0.03,
                                   strikes, mats, is_call))(spots, vecs)
    bs = jnp.broadcast_to(strikes, (b, 15))
    bm = jnp.broadcast_to(mats, (b, 15))
    bc = jnp.broadcast_to(is_call, (b, 15))
    keys = jax.random.split(jax.random.key(0), b)
    return spots, bs, bm, bc, prices, keys


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_pad_to_multiple():
    assert pad_to_multiple(5, 8) == 8
    assert pad_to_multiple(8, 8) == 8
    assert pad_to_multiple(9, 8) == 16


def test_sharded_matches_single_device(surface15):
    """Mesh-sharded solves match plain vmapped solves in solution QUALITY.

    Not bitwise: vmap width changes reduction order (SIMD/layout), and the
    optimizer's line search amplifies last-ulp differences into different
    (equally valid) trajectories. The contract is equal convergence: every
    surface reaches the same loss floor on both paths.
    """
    spots, bs, bm, bc, prices, keys = _batch(8, surface15)
    mesh = make_mesh(8)
    out_sh, summary = calibrate_sharded(mesh, spots, 0.03, bs, bm, bc,
                                        prices, keys, FAST, n_starts=1)
    out_local = calibrate_batch(spots, 0.03, bs, bm, bc, prices, keys,
                                FAST, n_starts=1)
    sh = np.asarray(out_sh.loss)
    loc = np.asarray(out_local.loss)
    assert np.all(np.isfinite(sh)) and np.all(np.isfinite(loc))
    assert np.all(sh < 1e-4) and np.all(loc < 1e-4)   # both converge
    assert np.all(sh < 10 * loc + 1e-9)               # same loss floor
    assert np.all(loc < 10 * sh + 1e-9)
    # the surfaces' prices are reproduced by both paths
    rel_sh = np.abs((np.asarray(out_sh.model_prices) - np.asarray(prices))
                    / np.asarray(prices))
    assert rel_sh.max() < 0.02
    assert int(summary.n_total) == 8


def test_sharded_uneven_batch(surface15):
    """B=5 on 8 devices: padding surfaces masked out of the stats."""
    spots, bs, bm, bc, prices, keys = _batch(5, surface15)
    mesh = make_mesh(8)
    out, summary = calibrate_sharded(mesh, spots, 0.03, bs, bm, bc,
                                     prices, keys, FAST, n_starts=1)
    assert out.loss.shape == (5,)
    assert int(summary.n_total) == 5
    assert np.isfinite(float(summary.mean_rel_error))


def test_sharded_summary_psum(surface15):
    """The psum'd mean matches a host-side recomputation."""
    spots, bs, bm, bc, prices, keys = _batch(8, surface15)
    mesh = make_mesh(8)
    out, summary = calibrate_sharded(mesh, spots, 0.03, bs, bm, bc,
                                     prices, keys, FAST, n_starts=1)
    rel = np.abs((np.asarray(out.model_prices) - np.asarray(prices))
                 / np.asarray(prices))
    np.testing.assert_allclose(float(summary.mean_rel_error),
                               rel.mean(axis=-1).mean(), rtol=1e-7)


def test_mesh_subset():
    mesh = make_mesh(4)
    assert mesh.devices.size == 4
