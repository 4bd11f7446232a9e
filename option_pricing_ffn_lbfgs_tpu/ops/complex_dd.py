"""Split-complex arithmetic over double-float (two-float32) reals.

The DD twin of ops/complex_math.py: complex numbers are (re, im) pairs where
re and im are themselves (hi, lo) double-float pairs (ops/doublefloat.py).
Together these give ~1e-15-relative complex math built entirely from native
float32 TPU ops — the polish-precision replacement for the reference's
NumPy complex128 (/root/reference/src/models/double_heston.py:48-97) that
avoids XLA's slow-to-compile float64 emulation.

Branch conventions (principal sqrt/log) match complex_math.py exactly so the
DD pricer agrees with the f64 parity pricer to ~1e-13.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from . import doublefloat as df

CDD = Tuple[df.DD, df.DD]  # (re, im), each a (hi, lo) float32 pair


def cconst(re: float, im: float, like) -> CDD:
    return df.dd_const(re, like=like), df.dd_const(im, like=like)


def from_f32(re, im=None) -> CDD:
    re = jnp.asarray(re, jnp.float32)
    if im is None:
        im = jnp.zeros_like(re)
    return df.dd(re), df.dd(jnp.asarray(im, jnp.float32))


def cadd(a: CDD, b: CDD) -> CDD:
    return df.add(a[0], b[0]), df.add(a[1], b[1])


def csub(a: CDD, b: CDD) -> CDD:
    return df.sub(a[0], b[0]), df.sub(a[1], b[1])


def cneg(a: CDD) -> CDD:
    return df.neg(a[0]), df.neg(a[1])


def cmul(a: CDD, b: CDD) -> CDD:
    ar, ai = a
    br, bi = b
    return (df.sub(df.mul(ar, br), df.mul(ai, bi)),
            df.add(df.mul(ar, bi), df.mul(ai, br)))


def cscale(a: CDD, s: df.DD) -> CDD:
    """Multiply by a real DD."""
    return df.mul(a[0], s), df.mul(a[1], s)


def cscale_f(a: CDD, s) -> CDD:
    """Multiply by a real float32."""
    return df.mul_f(a[0], s), df.mul_f(a[1], s)


def cdiv(a: CDD, b: CDD) -> CDD:
    """Smith's algorithm on DD reals (same structure as complex_math.cdiv)."""
    ar, ai = a
    br, bi = b
    swap = jnp.abs(br[0]) < jnp.abs(bi[0])
    br_s = df.where(swap, bi, br)
    bi_s = df.where(swap, br, bi)
    t = df.div(bi_s, br_s)
    den = df.add(br_s, df.mul(bi_s, t))
    re1 = df.div(df.add(ar, df.mul(ai, t)), den)
    im1 = df.div(df.sub(ai, df.mul(ar, t)), den)
    re2 = df.div(df.add(ai, df.mul(ar, t)), den)
    im2 = df.div(df.sub(df.mul(ai, t), ar), den)
    return df.where(swap, re2, re1), df.where(swap, im2, im1)


def cexp(a: CDD) -> CDD:
    e = df.exp(a[0])
    s, c = df.sincos(a[1])
    return df.mul(e, c), df.mul(e, s)


def cabs(a: CDD) -> df.DD:
    return df.hypot(a[0], a[1])


def clog(a: CDD) -> CDD:
    """Principal branch: (log|a|, atan2(im, re))."""
    return df.log(cabs(a)), df.atan2(a[1], a[0])


def csqrt(a: CDD) -> CDD:
    """Principal-branch sqrt, same branch-stable form as complex_math.csqrt."""
    ar, ai = a
    m = cabs(a)
    pos = ar[0] >= 0.0
    one = df.dd_const(1.0, like=ar)
    half = jnp.float32(0.5)
    x1 = df.where(pos, df.mul_f(df.add(m, ar), half), one)
    x2 = df.where(pos, one, df.mul_f(df.sub(m, ar), half))
    t1 = df.sqrt(x1)
    t2 = df.sqrt(x2)
    sgn = jnp.where(ai[0] < 0.0, jnp.float32(-1.0), jnp.float32(1.0))
    abs_ai = df.abs_(ai)
    re = df.where(pos, t1, df.div(abs_ai, df.mul_f(t2, jnp.float32(2.0))))
    im = df.where(pos, df.div(ai, df.mul_f(t1, jnp.float32(2.0))),
                  df.mul_f(t2, sgn))
    return re, im
