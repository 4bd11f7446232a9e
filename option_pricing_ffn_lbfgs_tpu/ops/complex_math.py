"""Split-complex arithmetic: complex math on (real, imag) float pairs.

TPU-native rationale: XLA:TPU does not support complex128 at all and complex64
support is limited/fragile, while float64 is available (software-emulated) and
float32 is fast. Implementing complex arithmetic on pairs of real arrays makes
the whole pricing stack dtype-polymorphic (f32 fast path / f64 parity path),
keeps everything on the VPU, and maps 1:1 onto Pallas kernels (which have no
complex dtype either).

All functions take/return ``(re, im)`` tuples of equal-shape real arrays and
follow NumPy's principal-branch conventions for sqrt/log so that results match
the reference implementation's complex128 NumPy math
(/root/reference/src/models/double_heston.py:48-97) bit-for-bit-ish under f64.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Cplx = Tuple[jnp.ndarray, jnp.ndarray]


def cadd(a: Cplx, b: Cplx) -> Cplx:
    return a[0] + b[0], a[1] + b[1]


def csub(a: Cplx, b: Cplx) -> Cplx:
    return a[0] - b[0], a[1] - b[1]


def cmul(a: Cplx, b: Cplx) -> Cplx:
    ar, ai = a
    br, bi = b
    return ar * br - ai * bi, ar * bi + ai * br


def cscale(a: Cplx, s) -> Cplx:
    """Multiply complex pair by a real scalar/array."""
    return a[0] * s, a[1] * s


def cneg(a: Cplx) -> Cplx:
    return -a[0], -a[1]


def cabs2(a: Cplx) -> jnp.ndarray:
    return a[0] * a[0] + a[1] * a[1]


def cabs(a: Cplx) -> jnp.ndarray:
    return jnp.hypot(a[0], a[1])


def cdiv(a: Cplx, b: Cplx) -> Cplx:
    """a / b via Smith's algorithm (scale-robust against over/underflow)."""
    ar, ai = a
    br, bi = b
    # |br| >= |bi| branch: t = bi/br, den = br + bi*t
    swap = jnp.abs(br) < jnp.abs(bi)
    # Compute both branches with safe denominators and select.
    br_s = jnp.where(swap, bi, br)
    bi_s = jnp.where(swap, br, bi)
    t = bi_s / br_s
    den = br_s + bi_s * t
    re1 = (ar + ai * t) / den
    im1 = (ai - ar * t) / den
    re2 = (ai + ar * t) / den
    im2 = (-ar + ai * t) / den
    return jnp.where(swap, re2, re1), jnp.where(swap, im2, im1)


def cexp(a: Cplx) -> Cplx:
    ar, ai = a
    e = jnp.exp(ar)
    return e * jnp.cos(ai), e * jnp.sin(ai)


def arctan2_poly(y, x):
    """Branchless polynomial atan2 (float32-grade, ~1e-7 abs error).

    For contexts where ``lax.atan2`` is unavailable — Pallas TPU (Mosaic)
    has no atan2 lowering. Classic single-precision scheme: reduce to
    t = min/max in [0, 1], Cephes atanf odd polynomial on [0, 0.414] with
    the pi/4 fold for (0.414, 1], then quadrant fix-ups via where.
    """
    dt = jnp.result_type(y, x)
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.where(hi == 0, jnp.asarray(1.0, dt), hi)  # [0, 1]
    # fold (0.4142, 1] -> [-0.17, 0.414] via atan(t) = pi/4 + atan((t-1)/(t+1))
    fold = t > 0.4142135623730951
    z_arg = jnp.where(fold, (t - 1.0) / (t + 1.0), t)
    z2 = z_arg * z_arg
    p = (((8.05374449538e-2 * z2 - 1.38776856032e-1) * z2
          + 1.99777106478e-1) * z2 - 3.33329491539e-1) * z2 * z_arg + z_arg
    r = jnp.where(fold, jnp.asarray(0.7853981633974483, dt) + p, p)
    # undo min/max swap: atan(ay/ax) when ay > ax is pi/2 - r
    r = jnp.where(ay > ax, jnp.asarray(1.5707963267948966, dt) - r, r)
    # quadrant by sign of x, then sign of y
    r = jnp.where(x < 0, jnp.asarray(3.141592653589793, dt) - r, r)
    return jnp.where(y < 0, -r, r)


# atan2 implementation hook: jnp.arctan2 by default; the Pallas kernel
# (ops/cos_pallas.py) swaps in arctan2_poly at trace time because Mosaic
# has no atan2 lowering.
_ARCTAN2 = [jnp.arctan2]


def clog(a: Cplx) -> Cplx:
    """Principal branch: log|a| + i*atan2(im, re) — matches np.log(complex)."""
    return jnp.log(cabs(a)), _ARCTAN2[0](a[1], a[0])


def csqrt(a: Cplx) -> Cplx:
    """Principal branch sqrt; matches np.sqrt(complex), grad-safe.

    Branch-stable formulation: for ar >= 0, t = sqrt((|a|+ar)/2) and
    sqrt(a) = t + i*ai/(2t); for ar < 0, t = sqrt((|a|-ar)/2) and
    sqrt(a) = |ai|/(2t) + i*sign(ai)*t. This keeps every sqrt argument
    strictly positive away from a == 0, so autodiff never sees the
    d/dx sqrt(x)|_{x=0} = inf that the naive
    ``im = sqrt(max((|a|-ar)/2, 0))`` form hits on the positive real axis
    (e.g. at the u=0 COS term) — that inf turns into NaN via 0*inf in the
    chain rule. Inputs are guarded with double-where so the *untaken*
    branch also differentiates cleanly.
    """
    ar, ai = a
    m = jnp.hypot(ar, ai)
    pos = ar >= 0.0
    x1 = jnp.where(pos, (m + ar) * 0.5, 1.0)
    x2 = jnp.where(pos, 1.0, (m - ar) * 0.5)
    t1 = jnp.sqrt(x1)
    t2 = jnp.sqrt(x2)
    # ai >= 0 maps to the upper half-plane result (NumPy's convention for
    # the negative real axis is +i*sqrt(|x|), i.e. the sign of +0.0).
    sgn = jnp.where(ai < 0.0, -1.0, 1.0)
    re = jnp.where(pos, t1, jnp.abs(ai) / (2.0 * t2))
    im = jnp.where(pos, ai / (2.0 * t1), sgn * t2)
    return re, im


def creal(a: Cplx) -> jnp.ndarray:
    return a[0]


def cimag(a: Cplx) -> jnp.ndarray:
    return a[1]


def cconst(re, im, dtype) -> Cplx:
    return jnp.asarray(re, dtype), jnp.asarray(im, dtype)
