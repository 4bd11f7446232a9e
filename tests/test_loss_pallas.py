"""Fused Pallas value-and-grad kernel vs XLA autodiff (interpret mode).

ops/loss_pallas.py computes the calibration loss's value and gradient (and
the LM residual Jacobian) inside one Pallas kernel. These tests pin its
semantics against jax.value_and_grad / jax.jacfwd of the reference jnp
implementations (calibration/loss.py) on CPU via interpret mode — the same
oracle strategy as tests/test_pallas.py for the forward pricer.

Tolerances are f32-level: the kernel runs the f32 math path (with the
polynomial arctan2 the TPU kernel uses), the oracle runs XLA f32.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from option_pricing_ffn_lbfgs_tpu.calibration.loss import (
    make_loss_fn, make_residual_fn)
from option_pricing_ffn_lbfgs_tpu.calibration.initial_guess import (
    initial_guesses)
from option_pricing_ffn_lbfgs_tpu.ops.loss_pallas import (
    make_batch_value_and_grad, make_batch_residual_jacobian)
from option_pricing_ffn_lbfgs_tpu.utils.config import (
    CalibrationConfig, PricerConfig)
from tests.conftest import TRUE


CFG = CalibrationConfig(pricer=PricerConfig(n_terms=64))


@pytest.fixture(scope="module")
def lanes(surface15, noiseless_market):
    strikes, mats, is_call = surface15
    f32 = jnp.float32
    L = 4
    spots = jnp.full((L,), 100.0, f32)
    bs = jnp.broadcast_to(jnp.asarray(strikes, f32), (L, 15))
    bm = jnp.broadcast_to(jnp.asarray(mats, f32), (L, 15))
    bc = jnp.broadcast_to(is_call, (L, 15))
    bp = jnp.broadcast_to(jnp.asarray(noiseless_market, f32), (L, 15))
    xs = jax.vmap(lambda k: initial_guesses(
        1, k, 100.0, bs[0], bm[0], bp[0], f32)[0])(
            jax.random.split(jax.random.key(3), L))
    return spots, bs, bm, bc, bp, xs


def _xla_vg(lanes_data):
    spots, bs, bm, bc, bp, xs = lanes_data

    def one(x, s, k, m, c, p):
        loss_fn = make_loss_fn(s, jnp.float32(0.03), k, m, c, p, CFG)
        return jax.value_and_grad(loss_fn)(x)

    return jax.vmap(one)(xs, spots, bs, bm, bc, bp)


def test_value_and_grad_matches_xla(lanes):
    spots, bs, bm, bc, bp, xs = lanes
    vg = make_batch_value_and_grad(spots, bs, bm, bc, bp, 0.03, CFG,
                                   tile_f=16, interpret=True)
    f_k, g_k = vg(xs)
    f_x, g_x = _xla_vg(lanes)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_x),
                               rtol=2e-4, atol=1e-8)
    scale = np.maximum(np.abs(np.asarray(g_x)).max(axis=-1, keepdims=True),
                       1e-6)
    np.testing.assert_allclose(np.asarray(g_k) / scale,
                               np.asarray(g_x) / scale, atol=5e-3)


def test_value_and_grad_sentinel_on_invalid(lanes):
    """A parameter region that breaks the pricer must produce the sentinel
    loss with a zero gradient, like surface_loss does."""
    spots, bs, bm, bc, bp, xs = lanes
    vg = make_batch_value_and_grad(spots, bs, bm, bc, bp, 0.03, CFG,
                                   tile_f=16, interpret=True)
    xs_bad = xs.at[0].set(jnp.full((13,), 40.0, jnp.float32))  # exp(40) blowup
    f_k, g_k = vg(xs_bad)
    assert float(f_k[0]) == CFG.bad_loss
    np.testing.assert_array_equal(np.asarray(g_k[0]), np.zeros(13))
    # other lanes unaffected
    assert float(f_k[1]) < 1.0


def test_residual_jacobian_matches_jacfwd(lanes):
    spots, bs, bm, bc, bp, xs = lanes
    jac = make_batch_residual_jacobian(spots, bs, bm, bc, bp, 0.03, CFG,
                                       tile_f=16, interpret=True)
    J_k = jac(xs)

    def one(x, s, k, m, c, p):
        rfn = make_residual_fn(s, jnp.float32(0.03), k, m, c, p, CFG)
        return jax.jacfwd(rfn)(x)

    J_x = jax.vmap(one)(xs, spots, bs, bm, bc, bp)
    assert J_k.shape == J_x.shape == (4, 17, 13)
    scale = np.maximum(np.abs(np.asarray(J_x)).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(J_k) / scale,
                               np.asarray(J_x) / scale, atol=5e-3)
