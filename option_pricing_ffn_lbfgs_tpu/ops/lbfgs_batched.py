"""Natively-batched flat L-BFGS: explicit lane axis, batch-level objective.

``ops/lbfgs.py::lbfgs_minimize_flat`` is a per-lane state machine that the
calibrator runs under ``vmap``. That is algorithmically right (max-of-sums
serial depth) but forces the objective to be traced per lane, so the
evaluation inside the while_loop is whatever XLA makes of the vmapped
pricer graph — measured 16.8 ms per trip at 6144 lanes on v5e, ~50x above
the VPU transcendental roofline, because the [lanes, options, terms]
intermediates round-trip through HBM between unfused op clusters.

This twin keeps the lane axis EXPLICIT: state tensors carry a leading
``[L]`` dimension and the objective is a batch-level callable
``vg_fn(x: [L, d]) -> (f: [L], g: [L, d])``. That lets the caller plug in
a fused Pallas kernel (ops/loss_pallas.py) that computes every lane's
value and gradient in one VMEM-resident pass — the whole point of the
restructuring. With ``vg_fn = vmap-style XLA autodiff`` the trajectories
are bit-identical to ``vmap(lbfgs_minimize_flat)`` (pinned by
tests/test_lbfgs_parity.py::test_batched_matches_vmapped).

The per-lane algorithm is IDENTICAL to lbfgs_minimize_flat (strong-Wolfe
bracket/zoom line search folded into one eval-per-trip state machine,
curvature-safe circular history, restart-on-failure, ftol/gtol/maxeval
stopping) — see that module for the algorithmic commentary; comments here
only cover the batching mechanics.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.config import LBFGSConfig
from .lbfgs import LBFGSResult


class _BState(NamedTuple):
    x: jnp.ndarray          # [L, d]
    f: jnp.ndarray          # [L]
    g: jnp.ndarray          # [L, d]
    s_hist: jnp.ndarray     # [L, m, d]
    y_hist: jnp.ndarray     # [L, m, d]
    rho_hist: jnp.ndarray   # [L, m]
    hist_len: jnp.ndarray   # [L] int32
    head: jnp.ndarray       # [L] int32
    gamma: jnp.ndarray      # [L]
    n_iters: jnp.ndarray    # [L] int32
    n_evals: jnp.ndarray    # [L] int32
    n_fail: jnp.ndarray     # [L] int32
    done: jnp.ndarray       # [L] bool
    converged: jnp.ndarray  # [L] bool
    bootstrap: jnp.ndarray  # [L] bool
    starting: jnp.ndarray   # [L] bool
    direction: jnp.ndarray  # [L, d]
    dg0: jnp.ndarray        # [L]
    stage: jnp.ndarray      # [L] int32
    alpha: jnp.ndarray      # [L]
    a_lo: jnp.ndarray       # [L]
    a_hi: jnp.ndarray       # [L]
    f_lo: jnp.ndarray       # [L]
    a_prev: jnp.ndarray     # [L]
    f_prev: jnp.ndarray     # [L]
    ls_evals: jnp.ndarray   # [L] int32
    a_star: jnp.ndarray     # [L]
    f_star: jnp.ndarray     # [L]
    g_star: jnp.ndarray     # [L, d]
    x_star: jnp.ndarray     # [L, d]
    ok: jnp.ndarray         # [L] bool


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)            # [L, d] . [L, d] -> [L]


def _take_pair(hist, idx):
    """hist [L, m, d], idx [L] -> [L, d] (per-lane circular-buffer row)."""
    return jnp.take_along_axis(hist, idx[:, None, None], axis=1)[:, 0]


def _two_loop_direction_batched(g, s_hist, y_hist, rho_hist, hist_len, head,
                                gamma):
    """Batched two-loop recursion: d = -H_k g per lane."""
    L, m, d = s_hist.shape
    lanes = jnp.arange(L)

    def bwd(j, carry):
        q, alphas = carry
        idx = jnp.mod(head - 1 - j, m)                       # [L]
        valid = (j < hist_len)[:, None]                      # [L, 1]
        s = _take_pair(s_hist, idx)
        y = _take_pair(y_hist, idx)
        rho = jnp.take_along_axis(rho_hist, idx[:, None], 1)[:, 0]
        alpha = rho * _dot(s, q)                             # [L]
        q = jnp.where(valid, q - alpha[:, None] * y, q)
        alphas = alphas.at[lanes, idx].set(
            jnp.where(valid[:, 0], alpha, 0.0))
        return q, alphas

    q, alphas = jax.lax.fori_loop(
        0, m, bwd, (g, jnp.zeros((L, m), g.dtype)))
    r = gamma[:, None] * q

    def fwd(j, r):
        idx = jnp.mod(head - hist_len + j, m)
        valid = (j < hist_len)[:, None]
        s = _take_pair(s_hist, idx)
        y = _take_pair(y_hist, idx)
        rho = jnp.take_along_axis(rho_hist, idx[:, None], 1)[:, 0]
        beta = rho * _dot(y, r)
        al = jnp.take_along_axis(alphas, idx[:, None], 1)[:, 0]
        return jnp.where(valid, r + (al - beta)[:, None] * s, r)

    r = jax.lax.fori_loop(0, m, fwd, r)
    return -r


def lbfgs_minimize_batched(vg_fn: Callable, x0: jnp.ndarray,
                           config: LBFGSConfig = LBFGSConfig()
                           ) -> LBFGSResult:
    """Minimize per-lane with the flat state machine over a [L, d] batch.

    ``vg_fn(x: [L, d]) -> (f: [L], g: [L, d])`` is the BATCH-level
    value-and-gradient callable (non-finite gradient entries are zeroed
    here, like the per-lane engines do). Returns an LBFGSResult whose
    fields carry the leading [L] axis.
    """
    dt = x0.dtype
    L, d = x0.shape
    m = config.history
    gtol = jnp.asarray(config.gtol, dt)
    ftol = jnp.asarray(config.ftol, dt)
    c1 = jnp.asarray(config.wolfe_c1, dt)
    c2 = jnp.asarray(config.wolfe_c2, dt)
    zeros = jnp.zeros((L,), dt)
    ones = jnp.ones((L,), dt)
    infs = jnp.full((L,), jnp.inf, dt)
    i0 = jnp.zeros((L,), jnp.int32)
    false = jnp.zeros((L,), bool)

    def safe_vg(x):
        f, g = vg_fn(x)
        g = jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g))
        return f, g

    init = _BState(
        x=x0, f=infs, g=jnp.zeros((L, d), dt),
        s_hist=jnp.zeros((L, m, d), dt), y_hist=jnp.zeros((L, m, d), dt),
        rho_hist=jnp.zeros((L, m), dt), hist_len=i0, head=i0, gamma=ones,
        n_iters=i0, n_evals=i0, n_fail=i0, done=false, converged=false,
        bootstrap=jnp.ones((L,), bool), starting=false,
        direction=jnp.zeros((L, d), dt), dg0=zeros,
        stage=i0, alpha=zeros, a_lo=zeros, a_hi=zeros, f_lo=infs,
        a_prev=zeros, f_prev=infs, ls_evals=i0,
        a_star=zeros, f_star=infs, g_star=jnp.zeros((L, d), dt), x_star=x0,
        ok=false)

    def cond(st: _BState):
        return jnp.any(~st.done)

    def body(st: _BState):
        col = lambda v: v[:, None]           # [L] -> [L, 1] broadcast helper

        direction = _two_loop_direction_batched(
            st.g, st.s_hist, st.y_hist, st.rho_hist, st.hist_len, st.head,
            st.gamma)
        dgn = _dot(direction, st.g)
        bad_dir = (dgn >= 0) | ~jnp.isfinite(dgn)
        direction = jnp.where(col(bad_dir), -st.g, direction)
        gmax = jnp.max(jnp.abs(st.g), axis=-1)
        first = st.hist_len == 0
        init_step = jnp.where(
            first, jnp.minimum(1.0 / jnp.maximum(gmax, 1e-8), 1.0), ones)

        opening = st.starting
        direction = jnp.where(col(opening), direction, st.direction)
        dg0 = jnp.where(opening, _dot(direction, st.g), st.dg0)
        alpha = jnp.where(opening, init_step, st.alpha)
        stage = jnp.where(opening, 0, st.stage)
        a_lo = jnp.where(opening, zeros, st.a_lo)
        a_hi = jnp.where(opening, zeros, st.a_hi)
        f_lo = jnp.where(opening, st.f, st.f_lo)
        a_prev = jnp.where(opening, zeros, st.a_prev)
        f_prev = jnp.where(opening, st.f, st.f_prev)
        ls_evals = jnp.where(opening, 0, st.ls_evals)
        a_star = jnp.where(opening, zeros, st.a_star)
        f_star = jnp.where(opening, st.f, st.f_star)
        g_star = jnp.where(col(opening), st.g, st.g_star)
        x_star = jnp.where(col(opening), st.x, st.x_star)
        ok = jnp.where(opening, False, st.ok)

        # ---- THE evaluation: one batch-level vg_fn per loop trip ----
        x_try = jnp.where(col(st.bootstrap), st.x,
                          st.x + col(alpha) * direction)
        f_try, g_try = safe_vg(x_try)
        f_try = jnp.where(jnp.isfinite(f_try), f_try, infs)
        dg_try = _dot(g_try, direction)
        n_evals = st.n_evals + 1
        ls_evals = ls_evals + 1

        f0 = st.f
        armijo_fail = f_try > f0 + c1 * alpha * dg0
        wolfe_ok = (~armijo_fail) & (jnp.abs(dg_try) <= -c2 * dg0)

        br_hi_from_fail = armijo_fail | ((f_try >= f_prev) & (ls_evals > 1))
        br_enter_zoom = br_hi_from_fail | (
            (~br_hi_from_fail) & (~wolfe_ok) & (dg_try >= 0))
        br_accept = wolfe_ok & ~br_hi_from_fail
        br_stage = jnp.where(br_accept, 2, jnp.where(br_enter_zoom, 1, 0))
        br_a_lo = jnp.where(br_hi_from_fail, a_prev, alpha)
        br_f_lo = jnp.where(br_hi_from_fail, f_prev, f_try)
        br_a_hi = jnp.where(br_hi_from_fail, alpha, a_prev)
        br_alpha = jnp.where(
            br_stage == 1, 0.5 * (br_a_lo + br_a_hi),
            jnp.where(br_stage == 0, alpha * 2.0, alpha))

        zm_accept = wolfe_ok
        zm_shrink_hi = armijo_fail | (f_try >= f_lo)
        zm_flip = (~zm_shrink_hi) & (dg_try * (a_hi - a_lo) >= 0)
        zm_a_hi = jnp.where(zm_shrink_hi, alpha,
                            jnp.where(zm_flip, a_lo, a_hi))
        zm_a_lo = jnp.where(zm_shrink_hi, a_lo, alpha)
        zm_f_lo = jnp.where(zm_shrink_hi, f_lo, f_try)
        interval_dead = (jnp.abs(zm_a_hi - zm_a_lo)
                         * jnp.maximum(jnp.abs(dg0), 1.0) < 1e-14)
        zm_stage = jnp.where(zm_accept | interval_dead, 2, 1)
        span = zm_a_lo - alpha
        denom = jnp.where(jnp.abs(span) > 1e-30, span, ones)
        curv = (zm_f_lo - f_try - dg_try * span) / (denom * denom)
        t_interp = alpha - dg_try / (2.0 * jnp.maximum(curv, 1e-30))
        lo_b = jnp.minimum(zm_a_lo, zm_a_hi)
        hi_b = jnp.maximum(zm_a_lo, zm_a_hi)
        width = hi_b - lo_b
        interp_ok = ((curv > 0) & jnp.isfinite(t_interp)
                     & (t_interp > lo_b + 0.1 * width)
                     & (t_interp < hi_b - 0.1 * width))
        zm_alpha = jnp.where(interp_ok, t_interp, 0.5 * (zm_a_lo + zm_a_hi))

        in_zoom = stage == 1
        accept = jnp.where(in_zoom, zm_accept, br_accept)
        new_stage = jnp.where(in_zoom, zm_stage, br_stage)
        new_a_lo = jnp.where(in_zoom, zm_a_lo, br_a_lo)
        new_a_hi = jnp.where(in_zoom, zm_a_hi, br_a_hi)
        new_f_lo = jnp.where(in_zoom, zm_f_lo, br_f_lo)
        next_alpha = jnp.where(in_zoom, zm_alpha, br_alpha)

        take_star = accept | ((f_try < f_star) & (new_stage != 2))
        a_star = jnp.where(take_star, alpha, a_star)
        f_star = jnp.where(take_star, f_try, f_star)
        g_star = jnp.where(col(take_star), g_try, g_star)
        x_star = jnp.where(col(take_star), x_try, x_star)
        ok = ok | take_star

        ls_exhausted = ls_evals >= config.max_linesearch
        end_iter = (new_stage == 2) | ls_exhausted

        x_new = x_star
        f_new = f_star
        g_new = g_star
        s = x_new - st.x
        y = g_new - st.g
        sy = _dot(s, y)
        yy = _dot(y, y)
        good_pair = end_iter & ok & (
            sy > 1e-10 * jnp.sqrt(_dot(s, s) * yy + 1e-300))
        lanes = jnp.arange(L)
        gp = col(good_pair)
        s_hist = st.s_hist.at[lanes, st.head].set(
            jnp.where(gp, s, _take_pair(st.s_hist, st.head)))
        y_hist = st.y_hist.at[lanes, st.head].set(
            jnp.where(gp, y, _take_pair(st.y_hist, st.head)))
        rho_old = jnp.take_along_axis(st.rho_hist, st.head[:, None], 1)[:, 0]
        rho_hist = st.rho_hist.at[lanes, st.head].set(
            jnp.where(good_pair, 1.0 / jnp.maximum(sy, 1e-300), rho_old))
        head = jnp.where(good_pair, jnp.mod(st.head + 1, m), st.head)
        hist_len = jnp.where(good_pair, jnp.minimum(st.hist_len + 1, m),
                             st.hist_len)
        gamma = jnp.where(good_pair, sy / jnp.maximum(yy, 1e-300), st.gamma)

        n_iters = st.n_iters + jnp.where(end_iter, 1, 0)
        gconv = jnp.max(jnp.abs(g_new), axis=-1) <= gtol
        fconv = (st.f - f_new) <= ftol * jnp.maximum(
            jnp.maximum(jnp.abs(st.f), jnp.abs(f_new)), 1.0)
        ls_failed = end_iter & ~ok
        converged = end_iter & (gconv | (fconv & ok))
        n_fail = jnp.where(end_iter,
                           jnp.where(ok, 0, st.n_fail + 1), st.n_fail)
        give_up = end_iter & (n_fail > config.max_restarts)
        reset = ls_failed & ~give_up
        hist_len = jnp.where(reset, 0, hist_len)
        head = jnp.where(reset, 0, head)
        gamma = jnp.where(reset, ones, gamma)
        eval_cap = (config.maxeval > 0) & (n_evals >= config.maxeval)
        done = converged | give_up | (n_iters >= config.maxiter) | eval_cap

        commit = end_iter & ok
        x_c = jnp.where(col(commit), x_new, st.x)
        f_c = jnp.where(commit, f_new, st.f)
        g_c = jnp.where(col(commit), g_new, st.g)

        boot = st.bootstrap
        x_c = jnp.where(col(boot), x_try, x_c)
        f_c = jnp.where(boot, f_try, f_c)
        g_c = jnp.where(col(boot), g_try, g_c)
        n_iters = jnp.where(boot, 0, n_iters)
        n_fail = jnp.where(boot, 0, n_fail)
        done = jnp.where(boot, False, done)
        converged_new = jnp.where(boot, False, st.converged | converged)
        end_or_boot = end_iter | boot

        bcol = lambda v: v[:, None]
        new = _BState(
            x=x_c, f=f_c, g=g_c,
            s_hist=jnp.where(bcol(boot)[..., None], st.s_hist, s_hist),
            y_hist=jnp.where(bcol(boot)[..., None], st.y_hist, y_hist),
            rho_hist=jnp.where(bcol(boot), st.rho_hist, rho_hist),
            hist_len=jnp.where(boot, st.hist_len, hist_len),
            head=jnp.where(boot, st.head, head),
            gamma=jnp.where(boot, st.gamma, gamma),
            n_iters=n_iters, n_evals=n_evals, n_fail=n_fail,
            done=done, converged=converged_new,
            bootstrap=false, starting=end_or_boot,
            direction=direction, dg0=dg0,
            stage=new_stage, alpha=next_alpha,
            a_lo=new_a_lo, a_hi=new_a_hi, f_lo=new_f_lo,
            a_prev=alpha, f_prev=f_try, ls_evals=ls_evals,
            a_star=a_star, f_star=f_star, g_star=g_star, x_star=x_star,
            ok=ok)
        # Done lanes hold their state.
        def hold(old, upd):
            mask = st.done
            while mask.ndim < old.ndim:
                mask = mask[..., None]
            return jnp.where(mask, old, upd)
        return jax.tree.map(hold, st, new)

    final = jax.lax.while_loop(cond, body, init)
    return LBFGSResult(x=final.x, f=final.f, grad=final.g,
                       n_iters=final.n_iters, n_evals=final.n_evals,
                       converged=final.converged)
