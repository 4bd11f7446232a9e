"""On-device L-BFGS with strong-Wolfe line search, fully jittable.

TPU-native replacement for the reference's scipy L-BFGS-B + finite-difference
gradients (lbfgs_calibrator.py:259-269, which costs ~14 loss evaluations per
gradient through scipy's 2-point FD). Here:

  * gradients come from ``jax.value_and_grad`` through the vectorized COS
    pricer — one fused evaluation per line-search probe;
  * the entire optimization (two-loop recursion over an m-pair circular
    history, bracket+zoom strong-Wolfe line search, ftol/gtol stopping) runs
    inside a single ``lax.while_loop`` under ``jit`` — one device dispatch
    per calibration instead of one host<->device round trip per probe;
  * everything is ``vmap``-compatible, so multi-start and batch-of-surfaces
    axes vectorize over the whole solver (the reference runs starts
    sequentially, lbfgs_calibrator.py:252).

Stopping criteria mirror scipy L-BFGS-B semantics: ``max|g| <= gtol`` and
``(f_k - f_{k+1}) <= ftol * max(|f_k|, |f_{k+1}|, 1)``.

The problem dimension is static (13 for the calibrator) and the two-loop
recursion over m<=10 pairs is unrolled as lax.fori_loops over gathered
circular-buffer rows — negligible next to the pricer evaluations.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.config import LBFGSConfig


class LBFGSResult(NamedTuple):
    x: jnp.ndarray          # final iterate [d]
    f: jnp.ndarray          # final objective value
    grad: jnp.ndarray       # final gradient [d]
    n_iters: jnp.ndarray    # outer iterations taken
    n_evals: jnp.ndarray    # value_and_grad evaluations
    converged: jnp.ndarray  # hit gtol/ftol (vs maxiter / line-search failure)


class _State(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    s_hist: jnp.ndarray     # [m, d]
    y_hist: jnp.ndarray     # [m, d]
    rho_hist: jnp.ndarray   # [m]
    hist_len: jnp.ndarray   # int32, pairs currently stored
    head: jnp.ndarray       # int32, next write slot
    gamma: jnp.ndarray      # H0 scaling
    n_iters: jnp.ndarray
    n_evals: jnp.ndarray
    n_fail: jnp.ndarray     # int32, consecutive line-search failures
    done: jnp.ndarray       # bool
    converged: jnp.ndarray  # bool


def _two_loop_direction(g, s_hist, y_hist, rho_hist, hist_len, head, gamma):
    """Two-loop recursion: d = -H_k g via the circular (s, y) history."""
    m = s_hist.shape[0]

    def bwd(j, carry):
        q, alphas = carry
        idx = jnp.mod(head - 1 - j, m)
        valid = j < hist_len
        s = s_hist[idx]
        y = y_hist[idx]
        alpha = rho_hist[idx] * jnp.dot(s, q)
        q = jnp.where(valid, q - alpha * y, q)
        alphas = alphas.at[idx].set(jnp.where(valid, alpha, 0.0))
        return q, alphas

    q, alphas = jax.lax.fori_loop(
        0, m, bwd, (g, jnp.zeros((m,), g.dtype)))
    r = gamma * q

    def fwd(j, r):
        idx = jnp.mod(head - hist_len + j, m)
        valid = j < hist_len
        s = s_hist[idx]
        y = y_hist[idx]
        beta = rho_hist[idx] * jnp.dot(y, r)
        return jnp.where(valid, r + (alphas[idx] - beta) * s, r)

    r = jax.lax.fori_loop(0, m, fwd, r)
    return -r


class _LSState(NamedTuple):
    stage: jnp.ndarray      # 0 = bracketing, 1 = zoom, 2 = done
    alpha: jnp.ndarray      # current trial step
    a_lo: jnp.ndarray
    a_hi: jnp.ndarray
    f_lo: jnp.ndarray
    a_prev: jnp.ndarray
    f_prev: jnp.ndarray
    dg_prev: jnp.ndarray
    a_star: jnp.ndarray     # accepted step (when stage == 2)
    f_star: jnp.ndarray
    g_star: jnp.ndarray     # gradient at accepted point [d]
    x_star: jnp.ndarray
    n_evals: jnp.ndarray
    ok: jnp.ndarray         # found a Wolfe (or at least Armijo) point


def _wolfe_line_search(vg_fn, x0, f0, g0, direction, cfg: LBFGSConfig,
                       init_step):
    """Strong-Wolfe line search: expansion bracketing then bisection zoom.

    One state machine inside a single while_loop (Nocedal & Wright Alg.
    3.5/3.6 folded together), bounded by cfg.max_linesearch evaluations.
    Returns an _LSState whose a_star/f_star/g_star/x_star hold the accepted
    point; ok=False means not even an Armijo point was found.
    """
    dt = x0.dtype
    dg0 = jnp.dot(g0, direction)
    c1, c2 = jnp.asarray(cfg.wolfe_c1, dt), jnp.asarray(cfg.wolfe_c2, dt)

    def eval_at(alpha):
        x = x0 + alpha * direction
        f, g = vg_fn(x)
        dg = jnp.dot(g, direction)
        return x, f, g, dg

    def cond(st: _LSState):
        return (st.stage < 2) & (st.n_evals < cfg.max_linesearch)

    def body(st: _LSState):
        x, f, g, dg = eval_at(st.alpha)
        f = jnp.where(jnp.isfinite(f), f, jnp.asarray(jnp.inf, dt))
        n_evals = st.n_evals + 1

        armijo_fail = (f > f0 + c1 * st.alpha * dg0)
        wolfe_ok = (~armijo_fail) & (jnp.abs(dg) <= -c2 * dg0)

        def bracketing(st):
            # Alg 3.5: decide accept / enter zoom / expand.
            hi_from_fail = armijo_fail | ((f >= st.f_prev) & (n_evals > 1))
            enter_zoom_lo_prev = hi_from_fail
            enter_zoom_dg = (~hi_from_fail) & (~wolfe_ok) & (dg >= 0)
            accept = wolfe_ok & ~hi_from_fail
            new_stage = jnp.where(
                accept, jnp.int32(2),
                jnp.where(enter_zoom_lo_prev | enter_zoom_dg,
                          jnp.int32(1), jnp.int32(0)))
            a_lo = jnp.where(enter_zoom_lo_prev, st.a_prev, st.alpha)
            f_lo = jnp.where(enter_zoom_lo_prev, st.f_prev, f)
            a_hi = jnp.where(enter_zoom_lo_prev, st.alpha, st.a_prev)
            next_alpha = jnp.where(
                new_stage == 1, 0.5 * (a_lo + a_hi),
                jnp.where(new_stage == 0, st.alpha * 2.0, st.alpha))
            return st._replace(
                stage=new_stage, alpha=next_alpha,
                a_lo=a_lo, a_hi=a_hi, f_lo=f_lo,
                a_prev=st.alpha, f_prev=f, dg_prev=dg,
                a_star=jnp.where(accept, st.alpha, st.a_star),
                f_star=jnp.where(accept, f, st.f_star),
                g_star=jnp.where(accept, g, st.g_star),
                x_star=jnp.where(accept, x, st.x_star),
                n_evals=n_evals, ok=st.ok | accept)

        def zooming(st):
            # Alg 3.6; trial points by safeguarded quadratic interpolation
            # (parabola through (alpha, f, dg) and (a_lo, f_lo)), falling
            # back to bisection — cuts probe counts vs pure bisection when
            # the acceptable window is narrow (e.g. near the Feller-penalty
            # kink).
            accept = wolfe_ok
            shrink_hi = armijo_fail | (f >= st.f_lo)
            # not shrink_hi: alpha becomes new lo; maybe flip hi to old lo
            flip = (~shrink_hi) & (dg * (st.a_hi - st.a_lo) >= 0)
            a_hi = jnp.where(shrink_hi, st.alpha, jnp.where(flip, st.a_lo, st.a_hi))
            a_lo = jnp.where(shrink_hi, st.a_lo, st.alpha)
            f_lo = jnp.where(shrink_hi, st.f_lo, f)
            interval_dead = jnp.abs(a_hi - a_lo) * jnp.maximum(jnp.abs(dg0), 1.0) < 1e-14
            new_stage = jnp.where(accept | interval_dead, jnp.int32(2),
                                  jnp.int32(1))
            span = a_lo - st.alpha
            denom = jnp.where(jnp.abs(span) > 1e-30, span, 1.0)
            curv = (f_lo - f - dg * span) / (denom * denom)
            t_interp = st.alpha - dg / (2.0 * jnp.maximum(curv, 1e-30))
            lo_b = jnp.minimum(a_lo, a_hi)
            hi_b = jnp.maximum(a_lo, a_hi)
            width = hi_b - lo_b
            interp_ok = ((curv > 0) & jnp.isfinite(t_interp)
                         & (t_interp > lo_b + 0.1 * width)
                         & (t_interp < hi_b - 0.1 * width))
            next_alpha = jnp.where(interp_ok, t_interp,
                                   0.5 * (a_lo + a_hi))
            return st._replace(
                stage=new_stage, alpha=next_alpha,
                a_lo=a_lo, a_hi=a_hi, f_lo=f_lo,
                a_star=jnp.where(accept, st.alpha, st.a_star),
                f_star=jnp.where(accept, f, st.f_star),
                g_star=jnp.where(accept, g, st.g_star),
                x_star=jnp.where(accept, x, st.x_star),
                n_evals=n_evals, ok=st.ok | accept)

        st2 = jax.lax.cond(st.stage == 0, bracketing, zooming, st)
        # Track the best improving point seen as a fallback accept. Armijo
        # is NOT required here: near the Feller-penalty kink the acceptable
        # Armijo window can be narrower than the probe resolution, and
        # monotone progress beats terminating the whole solve (a bad
        # curvature pair is rejected later by the sy > 0 history check).
        better_fallback = (f < st2.f_star) & (st2.stage != 2)
        return st2._replace(
            a_star=jnp.where(better_fallback, st.alpha, st2.a_star),
            f_star=jnp.where(better_fallback, f, st2.f_star),
            g_star=jnp.where(better_fallback, g, st2.g_star),
            x_star=jnp.where(better_fallback, x, st2.x_star),
            ok=st2.ok | better_fallback)

    init = _LSState(
        stage=jnp.asarray(0, jnp.int32), alpha=jnp.asarray(init_step, dt),
        a_lo=jnp.asarray(0.0, dt), a_hi=jnp.asarray(0.0, dt), f_lo=f0,
        a_prev=jnp.asarray(0.0, dt), f_prev=f0, dg_prev=dg0,
        a_star=jnp.asarray(0.0, dt), f_star=f0, g_star=g0, x_star=x0,
        n_evals=jnp.asarray(0, jnp.int32), ok=jnp.asarray(False))
    return jax.lax.while_loop(cond, body, init)


def lbfgs_minimize(fun: Callable, x0: jnp.ndarray,
                   config: LBFGSConfig = LBFGSConfig()) -> LBFGSResult:
    """Minimize ``fun`` (R^d -> R) from ``x0`` with L-BFGS. Jit/vmap-safe.

    Deliberately not jitted here — callers jit the enclosing computation
    (e.g. the whole multi-start calibration) so the entire solve is one
    device dispatch.

    ``fun`` must be differentiable (jax.value_and_grad is applied once and
    traced into the loop). Non-finite gradients are zeroed defensively so a
    bad region cannot poison the search direction.
    """
    vg_raw = jax.value_and_grad(fun)

    def vg_fn(x):
        f, g = vg_raw(x)
        g = jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g))
        return f, g

    dt = x0.dtype
    d = x0.shape[-1]
    m = config.history
    f0, g0 = vg_fn(x0)

    init = _State(
        x=x0, f=f0, g=g0,
        s_hist=jnp.zeros((m, d), dt), y_hist=jnp.zeros((m, d), dt),
        rho_hist=jnp.zeros((m,), dt),
        hist_len=jnp.asarray(0, jnp.int32), head=jnp.asarray(0, jnp.int32),
        gamma=jnp.asarray(1.0, dt),
        n_iters=jnp.asarray(0, jnp.int32), n_evals=jnp.asarray(1, jnp.int32),
        n_fail=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False), converged=jnp.asarray(False))

    gtol = jnp.asarray(config.gtol, dt)
    ftol = jnp.asarray(config.ftol, dt)

    def cond(st: _State):
        return ~st.done

    def body(st: _State):
        direction = _two_loop_direction(
            st.g, st.s_hist, st.y_hist, st.rho_hist, st.hist_len, st.head,
            st.gamma)
        dg = jnp.dot(direction, st.g)
        # Fall back to steepest descent if the two-loop direction is not a
        # descent direction (numerical breakdown).
        bad_dir = (dg >= 0) | ~jnp.isfinite(dg)
        direction = jnp.where(bad_dir, -st.g, direction)
        # First iteration: scale the step like scipy (|g|-normalized).
        gmax = jnp.max(jnp.abs(st.g))
        first = st.hist_len == 0
        init_step = jnp.where(first, jnp.minimum(1.0 / jnp.maximum(gmax, 1e-8), 1.0), 1.0)

        ls = _wolfe_line_search(vg_fn, st.x, st.f, st.g, direction, config,
                                init_step)

        x_new = ls.x_star
        f_new = ls.f_star
        g_new = ls.g_star
        s = x_new - st.x
        y = g_new - st.g
        sy = jnp.dot(s, y)
        yy = jnp.dot(y, y)
        # Curvature-safe history update.
        good_pair = ls.ok & (sy > 1e-10 * jnp.sqrt(jnp.dot(s, s) * yy + 1e-300))
        slot = st.head
        s_hist = jnp.where(good_pair, st.s_hist.at[slot].set(s), st.s_hist)
        y_hist = jnp.where(good_pair, st.y_hist.at[slot].set(y), st.y_hist)
        rho_hist = jnp.where(good_pair,
                             st.rho_hist.at[slot].set(1.0 / jnp.maximum(sy, 1e-300)),
                             st.rho_hist)
        head = jnp.where(good_pair, jnp.mod(st.head + 1, m), st.head)
        hist_len = jnp.where(good_pair, jnp.minimum(st.hist_len + 1, m), st.hist_len)
        gamma = jnp.where(good_pair, sy / jnp.maximum(yy, 1e-300), st.gamma)

        n_iters = st.n_iters + 1
        n_evals = st.n_evals + ls.n_evals

        gconv = jnp.max(jnp.abs(g_new)) <= gtol
        fconv = (st.f - f_new) <= ftol * jnp.maximum(
            jnp.maximum(jnp.abs(st.f), jnp.abs(f_new)), 1.0)
        ls_failed = ~ls.ok
        converged = gconv | (fconv & ls.ok)
        # On line-search failure, reset the (s, y) memory and retry from
        # steepest descent with the |g|-scaled first step (scipy L-BFGS-B
        # similarly discards its memory on breakdown); terminate only after
        # max_restarts consecutive failures. This rescues f32 solves whose
        # Wolfe search stalls mid-run on a stale curvature model.
        n_fail = jnp.where(ls.ok, jnp.asarray(0, jnp.int32), st.n_fail + 1)
        give_up = n_fail > config.max_restarts
        reset = ls_failed & ~give_up
        hist_len = jnp.where(reset, 0, hist_len)
        head = jnp.where(reset, 0, head)
        gamma = jnp.where(reset, jnp.asarray(1.0, dt), gamma)
        done = converged | give_up | (n_iters >= config.maxiter)

        # On line-search failure keep the previous point.
        keep = ls.ok
        return _State(
            x=jnp.where(keep, x_new, st.x),
            f=jnp.where(keep, f_new, st.f),
            g=jnp.where(keep, g_new, st.g),
            s_hist=s_hist, y_hist=y_hist, rho_hist=rho_hist,
            hist_len=hist_len, head=head, gamma=gamma,
            n_iters=n_iters, n_evals=n_evals, n_fail=n_fail,
            done=done, converged=converged)

    final = jax.lax.while_loop(cond, body, init)
    return LBFGSResult(x=final.x, f=final.f, grad=final.g,
                       n_iters=final.n_iters, n_evals=final.n_evals,
                       converged=final.converged)
