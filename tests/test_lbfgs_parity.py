"""Flat vs nested L-BFGS engine parity (ADVICE r4 medium item).

``lbfgs_minimize_flat`` (the default solver for every calibration) and
``lbfgs_minimize_nested`` (the readable two-while-loop oracle) implement the
identical per-lane algorithm — same strong-Wolfe bracket/zoom, history,
restart and stopping logic — restructured so the flat form costs one
objective evaluation per loop trip. These tests pin that equivalence over
random starts, in both dtypes, on smooth and kinked (Feller-penalty-style)
objectives, so the default engine can never silently drift from the oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from option_pricing_ffn_lbfgs_tpu.ops.lbfgs import (
    lbfgs_minimize_flat, lbfgs_minimize_nested)
from option_pricing_ffn_lbfgs_tpu.utils.config import LBFGSConfig


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


def quadratic(x):
    # Ill-conditioned convex quadratic.
    scales = jnp.asarray([1.0, 10.0, 100.0, 1e3, 1e4][: x.shape[0]], x.dtype)
    return jnp.sum(scales * x ** 2)


def kinked(x):
    # Smooth bowl + a max(0, .)^2 penalty wall — the Feller-penalty shape
    # (calibration/loss.py) that stresses the line search near the kink.
    smooth = jnp.sum((x - 0.3) ** 2) + 0.1 * jnp.sum(jnp.cos(3.0 * x))
    penalty = 1000.0 * jnp.sum(jnp.maximum(0.0, x - 0.5) ** 2)
    return smooth + penalty


FUNS = [rosenbrock, quadratic, kinked]


def _run_both(fun, x0, cfg):
    flat = jax.jit(lambda x: lbfgs_minimize_flat(fun, x, cfg))(x0)
    nested = jax.jit(lambda x: lbfgs_minimize_nested(fun, x, cfg))(x0)
    return jax.block_until_ready(flat), jax.block_until_ready(nested)


@pytest.mark.parametrize("fun", FUNS, ids=[f.__name__ for f in FUNS])
@pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32],
                         ids=["f64", "f32"])
def test_flat_matches_nested_trajectories(fun, dtype):
    cfg = LBFGSConfig(maxiter=120)
    rtol = 1e-12 if dtype == jnp.float64 else 1e-5
    key = jax.random.key(7)
    for i in range(5):
        key, k = jax.random.split(key)
        x0 = jax.random.uniform(k, (5,), dtype, minval=-1.5, maxval=1.5)
        flat, nested = _run_both(fun, x0, cfg)
        # Identical step counts = identical decision sequences (accept /
        # zoom / restart), the strongest cheap trajectory check.
        assert int(flat.n_iters) == int(nested.n_iters), f"start {i}"
        assert int(flat.n_evals) == int(nested.n_evals), f"start {i}"
        assert bool(flat.converged) == bool(nested.converged), f"start {i}"
        np.testing.assert_allclose(flat.x, nested.x, rtol=rtol, atol=rtol,
                                   err_msg=f"start {i}")
        np.testing.assert_allclose(flat.f, nested.f, rtol=rtol, atol=rtol,
                                   err_msg=f"start {i}")


def test_flat_maxeval_cap():
    """maxeval is a flat-engine-only knob (the batch-tail bound): the lane
    stops within one evaluation of the cap and still returns its best point."""
    cfg_cap = LBFGSConfig(maxiter=500, maxeval=25)
    cfg_free = LBFGSConfig(maxiter=500)
    x0 = jnp.asarray([-1.2, 1.0, -0.7, 0.4, 1.3], jnp.float64)
    capped = jax.jit(
        lambda x: lbfgs_minimize_flat(rosenbrock, x, cfg_cap))(x0)
    free = jax.jit(
        lambda x: lbfgs_minimize_flat(rosenbrock, x, cfg_free))(x0)
    assert int(capped.n_evals) <= 25
    assert int(free.n_evals) > 25          # the cap actually bit
    assert float(capped.f) <= float(rosenbrock(x0))  # monotone progress
    # Prefix property: up to the cap both runs walk the same trajectory, so
    # the capped result can never be better than the free one.
    assert float(free.f) <= float(capped.f) + 1e-12


def test_batched_matches_vmapped():
    """The natively-batched engine (ops/lbfgs_batched.py) walks the exact
    same per-lane trajectories as vmap of the per-lane flat engine — the
    restructuring only changes WHO owns the lane axis, not the algorithm."""
    from option_pricing_ffn_lbfgs_tpu.ops.lbfgs_batched import (
        lbfgs_minimize_batched)
    for fun in FUNS:
        # f64: exact decision-sequence parity (identical step counts).
        # f32: XLA fuses the two evaluation graphs differently, so 1-ulp
        # objective differences can flip borderline Wolfe branches —
        # require outcome-level parity (same minima) instead.
        for dtype, tol, exact in [(jnp.float64, 1e-12, True),
                                  (jnp.float32, 1e-4, False)]:
            cfg = LBFGSConfig(maxiter=120, maxeval=150)
            x0 = jax.random.uniform(jax.random.key(11), (7, 5), dtype,
                                    minval=-1.5, maxval=1.5)
            vg = jax.vmap(jax.value_and_grad(fun))
            batched = jax.jit(
                lambda x: lbfgs_minimize_batched(vg, x, cfg))(x0)
            vmapped = jax.jit(jax.vmap(
                lambda x: lbfgs_minimize_flat(fun, x, cfg)))(x0)
            if exact:
                np.testing.assert_array_equal(np.asarray(batched.n_iters),
                                              np.asarray(vmapped.n_iters))
                np.testing.assert_array_equal(np.asarray(batched.n_evals),
                                              np.asarray(vmapped.n_evals))
                np.testing.assert_array_equal(np.asarray(batched.converged),
                                              np.asarray(vmapped.converged))
                np.testing.assert_allclose(batched.x, vmapped.x, rtol=1e-9,
                                           atol=1e-9)
            np.testing.assert_allclose(batched.f, vmapped.f, rtol=tol,
                                       atol=tol)


def test_vmapped_flat_matches_sequential():
    """vmapped flat lanes are independent: each lane's result equals its
    own single-lane run (lanes only share lockstep scheduling, not state)."""
    cfg = LBFGSConfig(maxiter=120)
    x0 = jax.random.uniform(jax.random.key(3), (6, 5), jnp.float64,
                            minval=-1.5, maxval=1.5)
    batched = jax.jit(jax.vmap(
        lambda x: lbfgs_minimize_flat(rosenbrock, x, cfg)))(x0)
    for i in range(x0.shape[0]):
        single = jax.jit(
            lambda x: lbfgs_minimize_flat(rosenbrock, x, cfg))(x0[i])
        np.testing.assert_allclose(batched.x[i], single.x, rtol=1e-10)
        assert int(batched.n_iters[i]) == int(single.n_iters)
        assert int(batched.n_evals[i]) == int(single.n_evals)
