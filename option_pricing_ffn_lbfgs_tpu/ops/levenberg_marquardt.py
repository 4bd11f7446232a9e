"""On-device Levenberg–Marquardt for small least-squares problems.

The calibration objective (lbfgs_calibrator.py:118-177 in the reference) is
a sum of squares: 15 relative pricing errors + 2 Feller-penalty terms over
13 parameters. The reference minimizes it with a general quasi-Newton method
(scipy L-BFGS-B + finite differences); near the optimum that discards the
problem's least-squares structure. This module exploits it:

  * the Jacobian of the residual vector comes from ``jax.jacfwd`` (13
    forward tangents — cheaper than reverse mode for m>=d and much cheaper
    than the reference's 14-evaluation finite differences);
  * each iteration solves the 13x13 damped normal equations
    ``(J^T J + lam * diag(J^T J)) dx = -J^T r`` (Marquardt scaling) by
    Cholesky and accepts/rejects on true cost decrease;
  * the whole solver is one ``lax.while_loop`` — jit/vmap-safe, no nested
    line-search state machine, so its XLA program is small. On TPU this is
    what makes a high-precision polish affordable (phase-wise compile
    numbers: results/compile_breakdown.json), and the quadratic local
    convergence needs ~5-10 iterations instead of ~60.

Failure handling is implicit and branch-free: a non-finite trial cost (bad
parameter region, Cholesky breakdown propagating NaN) simply rejects the
step and increases the damping, which bends the step toward steepest
descent until progress resumes.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.config import LMConfig


class LMResult(NamedTuple):
    x: jnp.ndarray          # final iterate [d]
    f: jnp.ndarray          # final cost = sum(r^2)
    grad: jnp.ndarray       # final gradient of the cost, 2 J^T r [d]
    r: jnp.ndarray          # final residual vector [m] (lets callers
    #                         reconstruct model values without re-running
    #                         the residual program — compile-size control)
    n_iters: jnp.ndarray    # outer iterations taken
    n_evals: jnp.ndarray    # residual (+Jacobian) evaluations
    converged: jnp.ndarray  # hit gtol/ftol/xtol (vs maxiter / lambda_max)
    lam: jnp.ndarray        # final Marquardt damping (warm-start handle
    #                         for a continuation solve — see lam0)


class _State(NamedTuple):
    x: jnp.ndarray
    r: jnp.ndarray
    J: jnp.ndarray
    cost: jnp.ndarray
    lam: jnp.ndarray
    n_iters: jnp.ndarray
    n_evals: jnp.ndarray
    done: jnp.ndarray
    converged: jnp.ndarray


def lm_minimize(residual_fn: Callable, x0: jnp.ndarray,
                config: LMConfig = LMConfig(),
                jac_residual_fn: Callable = None,
                lam0: jnp.ndarray = None) -> LMResult:
    """Minimize ``sum(residual_fn(x)**2)`` from ``x0``. Jit/vmap-safe.

    ``residual_fn`` maps R^d -> R^m and must be forward-mode differentiable.
    Deliberately not jitted here — callers jit the enclosing computation so
    batches of solves stay one device dispatch (same convention as
    ops/lbfgs.py::lbfgs_minimize).

    ``jac_residual_fn``: optional lower-precision twin of ``residual_fn``
    used ONLY for the Jacobian (evaluated at ``x`` cast to its input dtype,
    result cast back). Rationale on TPU: float64 is software-emulated, and
    13 forward-mode tangents through the COS pricer dominate both the XLA
    compile time (measured: 352 s for the all-f64 polish program on v5e)
    and the runtime of the polish phase. A float32 Jacobian has ~1e-3
    relative error, which only perturbs the *direction* of the damped
    Gauss-Newton step; acceptance is still decided on the exact f64 cost,
    so the iteration remains a strict descent method and simply takes a few
    extra cheap iterations (linear rate ~||dJ||/||J|| near the optimum)
    while the f64 program shrinks to forward evaluations only.

    ``lam0``: optional initial Marquardt damping (scalar array). Pass the
    ``lam`` of a previous LMResult to CONTINUE that solve — restarting a
    near-converged iterate at config.lambda_init wastes iterations
    re-learning the damping scale (used by the calibrator's compacted
    stage-B tail completion).
    """
    dt = x0.dtype

    if jac_residual_fn is None:
        def r_and_j(x):
            return residual_fn(x), jax.jacfwd(residual_fn)(x)
    else:
        jac_dt = jnp.float32

        def r_and_j(x):
            J = jax.jacfwd(jac_residual_fn)(x.astype(jac_dt))
            return residual_fn(x), J.astype(dt)

    def cost_of(r):
        r = jnp.where(jnp.isfinite(r), r, jnp.asarray(jnp.inf, dt))
        return jnp.sum(r * r)

    # Lazy initialization: the initial (r, J) are placeholders with cost=inf
    # so the FIRST while-loop iteration evaluates r_and_j(x0) (zero J ->
    # zero step -> x_try == x0, always accepted against inf). This keeps
    # exactly ONE copy of the residual program in the XLA graph instead of
    # two (init + body) — the residual is the entire double-float COS pricer
    # (~100k StableHLO lines), so the duplicate copy was a large share of
    # the round-2 polish compile wall (results/compile_breakdown.json).
    r_shape = jax.eval_shape(residual_fn, x0)
    r0 = jnp.full(r_shape.shape, jnp.nan, dt)
    j0 = jnp.zeros(r_shape.shape + x0.shape, dt)
    lam_init = (jnp.asarray(config.lambda_init, dt) if lam0 is None
                else jnp.asarray(lam0, dt))
    init = _State(
        x=x0, r=r0, J=j0, cost=jnp.asarray(jnp.inf, dt),
        lam=lam_init,
        n_iters=jnp.asarray(0, jnp.int32), n_evals=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False), converged=jnp.asarray(False))

    gtol = jnp.asarray(config.gtol, dt)
    ftol = jnp.asarray(config.ftol, dt)
    xtol = jnp.asarray(config.xtol, dt)

    def cond(st: _State):
        return ~st.done

    def body(st: _State):
        jtj = st.J.T @ st.J
        g = st.J.T @ st.r
        # Marquardt scaling: damp by the diagonal so the step is invariant
        # to per-parameter scale; floor the diagonal to keep A positive.
        diag = jnp.diagonal(jtj)
        diag = jnp.maximum(diag, jnp.asarray(1e-32, dt))
        A = jtj + st.lam * jnp.diag(diag)
        dx = -jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(A), g)
        dx = jnp.where(jnp.isfinite(dx), dx, jnp.zeros_like(dx))

        x_try = st.x + dx
        r_try, j_try = r_and_j(x_try)
        cost_try = cost_of(r_try)
        accept = cost_try < st.cost

        x_new = jnp.where(accept, x_try, st.x)
        r_new = jnp.where(accept, r_try, st.r)
        J_new = jnp.where(accept, j_try, st.J)
        cost_new = jnp.where(accept, cost_try, st.cost)
        lam = jnp.where(accept,
                        jnp.maximum(st.lam * config.lambda_down,
                                    config.lambda_min),
                        st.lam * config.lambda_up)

        step_small = jnp.max(jnp.abs(dx)) <= xtol * jnp.maximum(
            jnp.max(jnp.abs(st.x)), 1.0)
        # Numerical-floor detection (round 5): near the achievable floor the
        # trial costs fluctuate at noise level, every step is rejected, and
        # lambda escalates to lambda_max — a ~11-rejection cascade that ends
        # in give_up and mislabels a perfectly converged solve. A REJECTED
        # step that is already below the xtol resolution with elevated
        # damping means no representable step can improve the cost: that is
        # xtol convergence, reached from the rejection side.
        xconv_stall = ((~accept) & step_small
                       & (st.lam > 10.0 * config.lambda_init))
        # scipy-style: floor the scale at 1 so ftol acts as an absolute
        # decrease threshold once the cost is below 1 (it always is here —
        # relative-MSE losses converge to ~1e-13).
        fscale = jnp.maximum(jnp.maximum(st.cost, cost_try),
                             jnp.asarray(1.0, dt))
        fconv_accept = accept & ((st.cost - cost_try) <= ftol * fscale)
        # A REJECTED step whose cost change is below ftol means the iterate
        # is numerically stalled at a minimum (the strict `<` acceptance
        # can reject zero-progress steps forever, escalating lambda to
        # give_up and mislabeling a perfectly converged solve).
        fconv_stall = (~accept) & (jnp.abs(cost_try - st.cost)
                                   <= ftol * fscale)
        fconv = fconv_accept | fconv_stall
        gconv = jnp.max(jnp.abs(g)) <= gtol
        # The bootstrap iteration (st.cost == inf, zero J/g/dx — see the
        # lazy init above) must not trip any stopping test.
        bootstrap = ~jnp.isfinite(st.cost)
        tconv = (cost_new <= config.cost_target) if config.cost_target > 0 \
            else jnp.asarray(False)
        converged = (gconv | fconv | (accept & step_small)
                     | xconv_stall | tconv) & ~bootstrap
        give_up = (lam > config.lambda_max) & ~bootstrap
        n_iters = st.n_iters + 1
        # maxiter + 1 loop trips: the bootstrap trip only evaluates r(x0).
        done = converged | give_up | (n_iters >= config.maxiter + 1)

        return _State(x=x_new, r=r_new, J=J_new, cost=cost_new, lam=lam,
                      n_iters=n_iters, n_evals=st.n_evals + 1,
                      done=done, converged=st.converged | converged)

    final = jax.lax.while_loop(cond, body, init)
    return LMResult(x=final.x, f=final.cost, grad=2.0 * (final.J.T @ final.r),
                    r=final.r, n_iters=final.n_iters, n_evals=final.n_evals,
                    converged=final.converged, lam=final.lam)


def lm_minimize_batched(residual_fn: Callable, x0: jnp.ndarray,
                        config: LMConfig = LMConfig(),
                        jac_fn: Callable = None,
                        lam0: jnp.ndarray = None) -> LMResult:
    """Batched LM: explicit [L] lane axis, batch-level residual/Jacobian.

    Identical per-lane algorithm to ``lm_minimize`` (damped normal
    equations, accept/reject on true cost, the same stopping tests), with
    the lane axis owned by the engine instead of ``vmap`` — so the caller
    can supply a batch-level Jacobian, in particular the fused Pallas
    reverse-sweep kernel (ops/loss_pallas.py::make_batch_residual_jacobian,
    one kernel pass instead of 13 forward tangents per lane).

    Args:
      residual_fn: [L, d] -> [L, m].
      jac_fn: [L, d] -> [L, m, d] (defaults to vmapped jacfwd of
        residual_fn; the result is cast to residual dtype).
      lam0: optional [L] initial damping (continuation warm start).
    Returns an LMResult with leading [L] axes.
    """
    dt = x0.dtype
    L, d = x0.shape

    if jac_fn is None:
        jac_fn = jax.vmap(jax.jacfwd(lambda xv: residual_fn(xv[None])[0]))

    def r_and_j(x):
        r = residual_fn(x)
        J = jnp.asarray(jac_fn(x), dt)
        return r, J

    def cost_of(r):
        r = jnp.where(jnp.isfinite(r), r, jnp.asarray(jnp.inf, dt))
        return jnp.sum(r * r, axis=-1)                        # [L]

    m_res = jax.eval_shape(residual_fn, x0).shape[-1]
    lam_init = (jnp.full((L,), config.lambda_init, dt) if lam0 is None
                else jnp.asarray(lam0, dt))
    init = _State(
        x=x0, r=jnp.full((L, m_res), jnp.nan, dt),
        J=jnp.zeros((L, m_res, d), dt), cost=jnp.full((L,), jnp.inf, dt),
        lam=lam_init,
        n_iters=jnp.zeros((L,), jnp.int32), n_evals=jnp.zeros((L,), jnp.int32),
        done=jnp.zeros((L,), bool), converged=jnp.zeros((L,), bool))

    gtol = jnp.asarray(config.gtol, dt)
    ftol = jnp.asarray(config.ftol, dt)
    xtol = jnp.asarray(config.xtol, dt)

    def cond(st: _State):
        return jnp.any(~st.done)

    def body(st: _State):
        col = lambda v: v[:, None]
        jtj = jnp.einsum("lmd,lme->lde", st.J, st.J)
        g = jnp.einsum("lmd,lm->ld", st.J, st.r)
        diag = jnp.diagonal(jtj, axis1=-2, axis2=-1)
        diag = jnp.maximum(diag, jnp.asarray(1e-32, dt))
        A = jtj + st.lam[:, None, None] * jax.vmap(jnp.diag)(diag)
        # Cholesky, not LU: XLA:TPU implements LuDecomposition only for
        # f32/c64, while Cholesky lowers at f64 (and A is SPD by
        # construction).
        dx = -jax.vmap(lambda Ai, gi: jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Ai), gi))(A, g)
        dx = jnp.where(jnp.isfinite(dx), dx, jnp.zeros_like(dx))

        x_try = st.x + dx
        r_try, j_try = r_and_j(x_try)
        cost_try = cost_of(r_try)
        accept = cost_try < st.cost

        x_new = jnp.where(col(accept), x_try, st.x)
        r_new = jnp.where(col(accept), r_try, st.r)
        J_new = jnp.where(accept[:, None, None], j_try, st.J)
        cost_new = jnp.where(accept, cost_try, st.cost)
        lam = jnp.where(accept,
                        jnp.maximum(st.lam * config.lambda_down,
                                    config.lambda_min),
                        st.lam * config.lambda_up)

        step_small = jnp.max(jnp.abs(dx), axis=-1) <= xtol * jnp.maximum(
            jnp.max(jnp.abs(st.x), axis=-1), 1.0)
        xconv_stall = ((~accept) & step_small
                       & (st.lam > 10.0 * config.lambda_init))
        fscale = jnp.maximum(jnp.maximum(st.cost, cost_try),
                             jnp.asarray(1.0, dt))
        fconv_accept = accept & ((st.cost - cost_try) <= ftol * fscale)
        fconv_stall = (~accept) & (jnp.abs(cost_try - st.cost)
                                   <= ftol * fscale)
        fconv = fconv_accept | fconv_stall
        gconv = jnp.max(jnp.abs(g), axis=-1) <= gtol
        bootstrap = ~jnp.isfinite(st.cost)
        tconv = (cost_new <= config.cost_target) if config.cost_target > 0 \
            else jnp.zeros((L,), bool)
        converged = (gconv | fconv | (accept & step_small)
                     | xconv_stall | tconv) & ~bootstrap
        give_up = (lam > config.lambda_max) & ~bootstrap
        n_iters = st.n_iters + 1
        done = converged | give_up | (n_iters >= config.maxiter + 1)

        new = _State(x=x_new, r=r_new, J=J_new, cost=cost_new, lam=lam,
                     n_iters=n_iters, n_evals=st.n_evals + 1,
                     done=done, converged=st.converged | converged)

        def hold(old, upd):
            mask = st.done
            while mask.ndim < old.ndim:
                mask = mask[..., None]
            return jnp.where(mask, old, upd)
        return jax.tree.map(hold, st, new)

    final = jax.lax.while_loop(cond, body, init)
    grad = 2.0 * jnp.einsum("lmd,lm->ld", final.J, final.r)
    return LMResult(x=final.x, f=final.cost, grad=grad, r=final.r,
                    n_iters=final.n_iters, n_evals=final.n_evals,
                    converged=final.converged, lam=final.lam)
