"""On-device L-BFGS engine tests (ops/lbfgs.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from option_pricing_ffn_lbfgs_tpu.ops.lbfgs import lbfgs_minimize
from option_pricing_ffn_lbfgs_tpu.utils.config import LBFGSConfig


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1]**2)**2 + (1.0 - x[:-1])**2)


def test_quadratic():
    A = jnp.diag(jnp.asarray([1.0, 10.0, 100.0, 1000.0]))
    res = lbfgs_minimize(lambda x: 0.5 * x @ A @ x, jnp.ones(4))
    assert bool(res.converged)
    assert float(res.f) < 1e-10
    np.testing.assert_allclose(np.asarray(res.x), 0.0, atol=1e-5)


def test_rosenbrock():
    res = lbfgs_minimize(rosenbrock, jnp.zeros(6), LBFGSConfig(maxiter=500))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-4)


def test_vmap_multistart():
    """vmapping the whole solver over starts matches sequential solves."""
    x0 = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 2.0, 2.0], [-1.0, 1.5, 0.5]])
    solve = lambda x: lbfgs_minimize(rosenbrock, x, LBFGSConfig(maxiter=400))
    batched = jax.vmap(solve)(x0)
    for i in range(3):
        single = solve(x0[i])
        assert abs(float(batched.f[i]) - float(single.f)) < 1e-8


def test_jit_compatible():
    res = jax.jit(lambda x: lbfgs_minimize(rosenbrock, x))(jnp.zeros(4))
    assert float(res.f) < 1e-8


def test_maxiter_respected():
    res = lbfgs_minimize(rosenbrock, jnp.zeros(8), LBFGSConfig(maxiter=3))
    assert int(res.n_iters) <= 3
    assert not bool(res.converged)


def test_nonfinite_region_does_not_poison():
    """Objective with a non-finite region: solver stays in the finite basin
    (replaces the reference's exception -> 1e10 sentinel behavior)."""
    def f(x):
        v = jnp.sum((x - 2.0)**2)
        return jnp.where(x[0] > 10.0, jnp.nan, v)
    res = lbfgs_minimize(f, jnp.zeros(3))
    assert float(res.f) < 1e-8


def test_float32():
    res = lbfgs_minimize(rosenbrock, jnp.zeros(4, jnp.float32),
                         LBFGSConfig(maxiter=400, ftol=1e-7, gtol=1e-4))
    assert res.x.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-2)


def test_penalty_kink_crossed_en_route():
    """Heavily-weighted hinge penalty (the calibrator's Feller term shape,
    lbfgs_calibrator.py:111-116): the start is deep in the penalized region
    and the solver must descend THROUGH the gradient discontinuity to the
    smooth optimum inside the feasible region — the scenario the line-search
    fallback + history-reset restarts exist for."""
    def f(x):
        smooth = jnp.sum((x - 0.2) ** 2)
        return smooth + 1000.0 * jnp.maximum(0.0, x[0] - 0.3)
    res = lbfgs_minimize(f, jnp.full(4, 2.0), LBFGSConfig(maxiter=200))
    np.testing.assert_allclose(np.asarray(res.x), 0.2, atol=1e-4)


def test_restart_counter_resets_on_success():
    """A line-search failure mid-run triggers a history-reset restart and
    optimization continues (n_iters well past the first failure)."""
    def f(x):
        # narrow curved valley + hinge wall: provokes occasional LS stalls
        return (jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                        + (1.0 - x[:-1]) ** 2)
                + 500.0 * jnp.maximum(0.0, x[0] - 0.9))
    res = lbfgs_minimize(f, jnp.zeros(4), LBFGSConfig(maxiter=300))
    assert np.isfinite(float(res.f))
    # x0 pinned at the wall, others follow the valley
    assert float(res.x[0]) <= 0.9 + 1e-6
