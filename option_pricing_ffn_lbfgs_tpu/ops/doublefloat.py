"""Double-float (two-float32 compensated) arithmetic for TPU.

Why this exists: XLA:TPU executes float64 by software emulation, and the
x64-emulation pass expands every transcendental into enormous HLO — the
f64-emulated COS pricer costs 170-330 s of XLA compile on a v5e (measured
2026-08-19) even though it RUNS in milliseconds. A number represented as an
unevaluated sum ``hi + lo`` of two float32s carries ~49 mantissa bits
(~1.5e-15 relative) — enough for the calibration polish's ftol=1e-15 loss
floor — while every op stays native float32. Measured compile/runtime for
the resulting polish program: results/compile_breakdown.json.

This replaces the reference's implicit NumPy float64
(/root/reference/src/models/double_heston.py — all math in complex128) with
an explicit, TPU-native precision design: f32 for the nonconvex search,
double-float for the polish (SURVEY.md §5 numerical-precision row).

Representation: a DD is a tuple ``(hi, lo)`` of same-shape float32 arrays
with ``|lo| <= ulp(hi)/2`` (a normalized double-float). All algorithms are
the classical error-free transformations (Dekker 1971, Knuth TAOCP §4.2.2,
Hida-Li-Bailey QD library) specialized to float32 WITHOUT relying on FMA
(TPU's VPU has no user-visible scalar FMA through XLA; Dekker splitting is
used instead, split constant 2^12+1 for the 24-bit float32 mantissa).

CRITICAL compiler caveat: these algorithms are EXACT floating-point
identities. XLA backends contract a rounded product into a following
add/sub as an FMA whenever they like (measured bitwise on XLA:CPU:
``jit(a*a + e)`` == fma semantics on 100k samples; neither
``--xla_allow_excess_precision=false``, ``optimization_barrier``,
``reduce_precision``, nor bitcast round-trips prevent it — all are folded
before codegen). The classic Dekker two_prod, whose correctness needs the
ROUNDED ``p = a*b`` inside ``ahi*bhi - p``, silently degrades to float32
accuracy under that contraction (~6e-8, the root cause of round 2's
in-distribution DD parity violations). Every algorithm here is therefore
written to be FMA-contraction-IMMUNE by construction:

  * the Dekker split uses integer mantissa masking (no multiply at all);
  * two_prod forms four EXACT <=24-bit partial products and combines them
    with two_sum chains — contracting an exact product into an add changes
    nothing (round(exact + y) either way);
  * inexact products appear ONLY in correction terms whose rounding is
    below the 2^-48 wordlength (mul/sqr cross terms);
  * two_sum / quick_two_sum are pure add/sub chains — XLA does not
    reassociate float adds BETWEEN RUNTIME VALUES, but its algebraic
    simplifier DOES fold ``(c + y) - c -> y`` when ``c`` is a literal
    constant (measured: ``jit(two_sum(1.0, -x))`` returned error term 0),
    which silently truncates any EFT chain touching a constant to f32. All
    constants entering DD arithmetic are therefore pinned opaque with
    ``optimization_barrier`` (``_pin``) — algsimp runs before barrier
    expansion, so the barrier blocks the fold at exactly the right stage.

tests/test_doublefloat.py guards the invariants against regressions.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

DD = Tuple[jnp.ndarray, jnp.ndarray]

# Integer mask clearing the low 12 stored-mantissa bits of a float32:
# keeps sign + exponent + 11 stored (12 significant) mantissa bits.
# MUST be host numpy, not jnp: this module is sometimes first imported
# inside an active jit trace (lazy import in the DD residual closure), and
# a module-level jnp op would capture that trace's tracer and leak it into
# every later trace.
import numpy as _np  # noqa: E402

_SPLIT_MASK = _np.uint32(0xFFFFF000)


def _pin(x):
    """Make a literal constant opaque to XLA's algebraic simplifier.

    Without this, a constant operand of two_sum lets algsimp fold
    ``(c + y) - c -> y`` and the error term vanishes (see module
    docstring). Barriers cost a fusion boundary at most; they are expanded
    to nothing after the simplification passes.
    """
    return jax.lax.optimization_barrier(x)


# ---------------------------------------------------------------------------
# Error-free transformations
# ---------------------------------------------------------------------------

def two_sum(a, b) -> DD:
    """a + b = s + e exactly (Knuth). a, b: float32 arrays."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b) -> DD:
    """a + b = s + e exactly, REQUIRES |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a) -> DD:
    """a = hi + lo, each with <=12 significant mantissa bits.

    Truncation split by integer mantissa masking instead of Dekker's
    4097-multiply trick: no multiply means nothing for the backend to
    contract into an FMA (the 4097 form measurably collapsed to an exact
    4096*a under XLA:CPU contraction). ``a - hi`` is exact (Sterbenz).
    """
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & _SPLIT_MASK, jnp.float32)
    lo = a - hi
    return hi, lo


def two_prod(a, b) -> DD:
    """a * b = p + e exactly, FMA-contraction-immune.

    All four partial products are exact (<=24-bit results in a 24-bit
    mantissa), so an FMA contraction of any of them into the following
    adds is bitwise neutral; the partials are combined with error-free
    add chains. Residual error is <= ~2^-58 |ab| (the two plain adds at
    the end act on <=2^-34-scale terms).
    """
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    h1 = ahi * bhi
    h2 = ahi * blo
    h3 = alo * bhi
    h4 = alo * blo
    s23, e23 = two_sum(h2, h3)
    p1, e1 = two_sum(h1, s23)
    t1, t2 = two_sum(e23, h4)
    u1, u2 = two_sum(e1, t1)
    p, e = quick_two_sum(p1, u1)
    e = e + (u2 + t2)
    return quick_two_sum(p, e)


# ---------------------------------------------------------------------------
# Constructors / converters
# ---------------------------------------------------------------------------

def dd(hi, lo=None) -> DD:
    """Make a DD from float32 value(s)."""
    hi = jnp.asarray(hi, jnp.float32)
    if lo is None:
        lo = jnp.zeros_like(hi)
    return hi, jnp.asarray(lo, jnp.float32)


def dd_const(x: float, shape=(), like=None) -> DD:
    """DD constant from a Python float (split exactly at trace time).

    NOTE: the split must happen in host numpy — jnp.float32(x) builds a
    device array (a tracer under jit), so float() on it would fail.
    Outputs are pinned (`_pin`) so downstream EFT chains survive algsimp.
    """
    import numpy as _np
    hi = _np.float32(x)
    lo = _np.float32(x - float(hi))
    if like is not None:
        shape = jnp.shape(like[0] if isinstance(like, tuple) else like)
    # Pin the SCALARS, broadcast after: the barrier blocks the algsimp
    # fold while the broadcast stays fusible (a pinned full-shape array
    # would be materialized to HBM at every call site).
    return (jnp.broadcast_to(_pin(jnp.asarray(hi)), shape),
            jnp.broadcast_to(_pin(jnp.asarray(lo)), shape))


def from_f64(x) -> DD:
    """Split a float64 array into a DD (for program boundaries only).

    Outputs are pinned: when ``x`` is a trace-time constant (a Python
    float argument like spot/rate/q baked into the jit), the unpinned
    halves are HLO constants and algsimp folds them out of downstream
    two_sums (measured: the drift term of the DD characteristic function
    silently lost its lo word this way). Pinning a runtime array costs
    nothing.
    """
    x = jnp.asarray(x)
    hi = jnp.asarray(x, jnp.float32)
    lo = jnp.asarray(x - hi.astype(x.dtype), jnp.float32)
    return _pin(hi), _pin(lo)


def to_f64(a: DD):
    """Recombine to float64 (for program boundaries only)."""
    return a[0].astype(jnp.float64) + a[1].astype(jnp.float64)


# ---------------------------------------------------------------------------
# Ring ops
# ---------------------------------------------------------------------------

def neg(a: DD) -> DD:
    return -a[0], -a[1]


def add(a: DD, b: DD) -> DD:
    """Full (IEEE-style) DD addition — robust for any sign combination."""
    s, e = two_sum(a[0], b[0])
    t, f = two_sum(a[1], b[1])
    e = e + t
    s, e = quick_two_sum(s, e)
    e = e + f
    return quick_two_sum(s, e)


def add_f(a: DD, b) -> DD:
    """DD + float32. ``b`` is pinned: call sites pass literal constants
    (e.g. the +1 of the exp Taylor), and an unpinned constant lets algsimp
    collapse the two_sum (see module docstring)."""
    s, e = two_sum(a[0], _pin(jnp.asarray(b, jnp.float32)))
    e = e + a[1]
    return quick_two_sum(s, e)


def sub(a: DD, b: DD) -> DD:
    return add(a, neg(b))


def mul(a: DD, b: DD) -> DD:
    p, e = two_prod(a[0], b[0])
    e = e + (a[0] * b[1] + a[1] * b[0])
    return quick_two_sum(p, e)


def mul_f(a: DD, b) -> DD:
    """DD * float32 (exact-product path)."""
    p, e = two_prod(a[0], b)
    e = e + a[1] * b
    return quick_two_sum(p, e)


def sqr(a: DD) -> DD:
    p, e = two_prod(a[0], a[0])
    e = e + 2.0 * (a[0] * a[1])
    return quick_two_sum(p, e)


def div(a: DD, b: DD) -> DD:
    """DD / DD via one Newton-corrected long division."""
    q1 = a[0] / b[0]
    r = sub(a, mul_f(b, q1))
    q2 = r[0] / b[0]
    r = sub(r, mul_f(b, q2))
    q3 = r[0] / b[0]
    s, e = quick_two_sum(q1, q2)
    return add_f((s, e), q3)


def recip(b: DD) -> DD:
    return div(dd_const(1.0, like=b), b)


def sqrt(a: DD) -> DD:
    """sqrt via Karp-Markstein style correction; a must be >= 0.

    Guarded at a == 0 (returns 0) so it is safe under vmap/where.
    """
    x = jnp.where(a[0] > 0, a[0], jnp.float32(1.0))
    r0 = jnp.sqrt(x)                       # ~f32 accurate
    # One Newton step in DD: r = r0 + (a - r0^2) / (2 r0)
    r0_dd = (r0, jnp.zeros_like(r0))
    diff = sub((x, jnp.where(a[0] > 0, a[1], 0.0)), sqr(r0_dd))
    corr = diff[0] / (2.0 * r0)
    r = add_f(r0_dd, corr)
    zero = jnp.zeros_like(r0)
    return (jnp.where(a[0] > 0, r[0], zero),
            jnp.where(a[0] > 0, r[1], zero))


def abs_(a: DD) -> DD:
    flip = a[0] < 0
    return jnp.where(flip, -a[0], a[0]), jnp.where(flip, -a[1], a[1])


def max_(a: DD, b: DD) -> DD:
    take_a = gt(a, b)
    return (jnp.where(take_a, a[0], b[0]), jnp.where(take_a, a[1], b[1]))


def min_(a: DD, b: DD) -> DD:
    take_a = lt(a, b)
    return (jnp.where(take_a, a[0], b[0]), jnp.where(take_a, a[1], b[1]))


def tanh(a: DD) -> DD:
    """tanh(a) = (e^{2a} - 1)/(e^{2a} + 1), clamped for |a| > 20 (where
    tanh is +/-1 to 2^-57 anyway, beyond DD resolution)."""
    big = jnp.abs(a[0]) > 20.0
    safe = where(big, dd_const(0.0, like=a), a)
    e2 = exp(mul_f(safe, jnp.float32(2.0)))
    t = div(add_f(e2, jnp.float32(-1.0)), add_f(e2, jnp.float32(1.0)))
    sign = jnp.where(a[0] < 0, jnp.float32(-1.0), jnp.float32(1.0))
    return where(big, (sign, jnp.zeros_like(sign)), t)


def where(c, a: DD, b: DD) -> DD:
    return jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1])


def gt(a: DD, b: DD):
    return (a[0] > b[0]) | ((a[0] == b[0]) & (a[1] > b[1]))


def lt(a: DD, b: DD):
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def sum_(a: DD, axis=None) -> DD:
    """Compensated sum of a DD array along ``axis`` (pairwise via sort-free
    sequential two_sum accumulation in one associative-scan-free reduction).

    Implementation: sum his and los with Neumaier compensation in f32 pairs.
    For the ~128-term COS series this keeps the full ~1e-15 relative error.
    """
    # Accumulate sequentially via jnp.cumsum-free loop is slow; instead use
    # the standard trick: error-free pairwise reduction is not expressible
    # as a plain jnp.sum, so do a two-pass Neumaier: first sum all his with
    # two_sum error tracking via sorted... Simplest robust approach on a
    # short axis: promote the reduction tree manually by splitting the axis.
    hi, lo = a
    if axis is None:
        hi = hi.reshape(-1)
        lo = lo.reshape(-1)
        axis = 0
    # Sequential fold over the reduction axis, vectorized over the rest.
    import jax as _jax
    hi_m = jnp.moveaxis(hi, axis, 0)
    lo_m = jnp.moveaxis(lo, axis, 0)

    def body(carry, x):
        return add(carry, (x[0], x[1])), None

    init = (jnp.zeros_like(hi_m[0]), jnp.zeros_like(lo_m[0]))
    (s_hi, s_lo), _ = _jax.lax.scan(body, init, (hi_m, lo_m))
    return s_hi, s_lo


# ---------------------------------------------------------------------------
# Transcendentals (~1e-14-1e-15 relative over the pricer's argument ranges)
# ---------------------------------------------------------------------------

_LN2 = math.log(2.0)
_EXP_MAX_TERMS = 14


def _dd_coef_table(values):
    """Split Python floats into a [terms, 2] float32 DD table (hi, lo).

    Taylor evaluations run as ``lax.scan``s over these tables. Why scan at
    all: the coefficient slices stay runtime values so algsimp cannot fold
    them out of the EFT chains. The unroll choice is per-backend
    (``_taylor_unroll``).
    """
    import numpy as _np
    v64 = _np.asarray(values, _np.float64)
    hi = _np.asarray(v64, _np.float32)
    lo = _np.asarray(v64 - hi, _np.float32)
    return _np.stack([hi, lo], axis=-1)


def _taylor_unroll() -> bool:
    """Unroll the Taylor scans on accelerators, keep them rolled on CPU.

    On TPU a rolled loop costs ~10 us per step; with ~25 transcendental
    call sites x 8-14 steps per pricer evaluation that measured ~35 ms per
    LM polish — 65x the entire round-2 mixed calibration — so unrolling is
    mandatory there (the compile-size cost is absorbed once by the
    persistent XLA compilation cache, see bench.py). On CPU the tradeoff
    inverts: loop steps cost nanoseconds while compiling the fully
    unrolled DD pricer takes tens of minutes (measured: the default pytest
    suite went from ~9 min to 44+ min), so the scans stay rolled.
    """
    return jax.default_backend() != "cpu"


def _pow2(k):
    """Exact 2^k for integer-valued float32 k, clamped to [-126, 127].

    jnp.exp2 on TPU/CPU is a polynomial APPROXIMATION with ~2e-6 relative
    error even at exact integer inputs (measured: exp2(52) is off by 1e10),
    which silently destroys double-float accuracy — build the float from
    its exponent bits instead. Out-of-range k would make the exponent-bit
    arithmetic WRAP into garbage, so k is clipped; exp() handles the true
    under/overflow semantics before calling this.
    """
    import jax as _jax
    ki = jnp.clip(k.astype(jnp.int32), -126, 127)
    return _jax.lax.bitcast_convert_type(
        (ki + jnp.int32(127)) << jnp.int32(23), jnp.float32)


# float32 exp domain: exp(-87.3) ~ 2^-126 (smallest normal), exp(88.7) ~
# 2^128 (overflow). Outside these, exp() returns exact 0 / +inf instead of
# letting _pow2's exponent bits wrap (which previously produced silent
# garbage, e.g. exp(-400) -> 2.6e-20; see tests/test_doublefloat.py).
_EXP_UNDERFLOW = -87.0
_EXP_OVERFLOW = 88.0


def exp(a: DD) -> DD:
    """exp(a) with full-domain clamping: exact 0 below the float32
    underflow cliff, +inf above overflow; k=round(a/ln2) reduction + DD
    Taylor in between.

    Accuracy contract (measured, tests/test_doublefloat.py): relative
    error <= max(~2^-47, 1.2e-38 / exp(a)). The second term is the
    output-representation limit of a two-float32 value: once the lo word
    falls below the float32 normal range it is flushed (TPU and XLA:CPU
    are FTZ), so results below ~1e-26 carry fewer than 48 bits, tapering
    to plain f32 precision near the underflow cliff. Harmless for the COS
    pricer — values that small only ever enter additively against O(1)
    series terms.
    """
    under = a[0] < jnp.float32(_EXP_UNDERFLOW)
    over = a[0] > jnp.float32(_EXP_OVERFLOW)
    bad = under | over
    # Compute the reduced path on a safe argument so no intermediate wraps.
    a_hi = jnp.where(bad, jnp.float32(0.0), a[0])
    a_lo = jnp.where(bad, jnp.float32(0.0), a[1])
    k = jnp.round(a_hi / jnp.float32(_LN2))
    # r = a - k*ln2 in DD (ln2 as a DD constant keeps the reduction exact
    # to ~1e-15; |r| <= ln2/2)
    ln2 = dd_const(_LN2, like=a)
    r = sub((a_hi, a_lo), mul_f(ln2, k))
    acc = _exp_taylor(r)
    # scale by 2^k exactly (split in two in case acc*2^k spans the range)
    k1 = jnp.trunc(k * 0.5)
    s1 = _pow2(k1)
    s2 = _pow2(k - k1)
    hi = (acc[0] * s1) * s2
    lo = (acc[1] * s1) * s2
    zero = jnp.zeros_like(hi)
    hi = jnp.where(under, zero, jnp.where(over, jnp.inf, hi))
    lo = jnp.where(bad, zero, lo)
    return hi, lo


_EXP_COEFS = _dd_coef_table(
    [1.0 / n for n in range(_EXP_MAX_TERMS, 0, -1)])


def _exp_taylor(r: DD) -> DD:
    """exp(r) for |r| <= ln2/2 by Horner-evaluated DD Taylor series.

    Reciprocal coefficients are DD constants — rounding them to single
    float32s costs ~1e-9 relative in the sum (measured), 5 orders above the
    double-float wordlength. Evaluated as a lax.scan over the coefficient
    table so the body is emitted once per call site (compile-size control).
    """
    import jax as _jax

    # Horner: 1 + r(1 + r/2(1 + r/3(...)))
    def body(acc, c):
        acc = mul(acc, mul(r, (c[0], c[1])))
        acc = add_f(acc, jnp.float32(1.0))
        return acc, None

    init = (jnp.ones_like(r[0]), jnp.zeros_like(r[0]))
    acc, _ = _jax.lax.scan(body, init, jnp.asarray(_EXP_COEFS),
                           unroll=_taylor_unroll())
    return acc


def log(a: DD) -> DD:
    """log(a) for a > 0 via f32 seed + one exact Newton step.

    y0 = log_f32(a) has ~1e-7 error; y1 = y0 + (a*exp(-y0) - 1) has error
    ~(1e-7)^2/2 ~ 5e-15 relative — one step suffices for DD.
    """
    y0 = jnp.log(a[0])
    e = exp((-y0, jnp.zeros_like(y0)))
    corr = add_f(mul(a, e), jnp.float32(-1.0))
    # y1 = y0 + corr - corr^2/2 (second-order term buys another ~1e-21)
    c2 = mul_f(sqr(corr), jnp.float32(-0.5))
    return add(add((y0, jnp.zeros_like(y0)), corr), c2)


_PI = math.pi
_PIO2 = math.pi / 2.0


_SIN_COEFS = _dd_coef_table(
    list(reversed([1.0 / ((2 * n) * (2 * n + 1)) for n in range(1, 9)])))
_COS_COEFS = _dd_coef_table(
    list(reversed([1.0 / ((2 * n - 1) * (2 * n)) for n in range(2, 10)])))


def _sin_taylor(r: DD) -> DD:
    """sin(r), |r| <= pi/4, DD Taylor (8 odd terms -> <1e-17).

    Coefficients as DD constants evaluated via lax.scan (see _exp_taylor).
    """
    import jax as _jax
    r2 = sqr(r)
    one = dd_const(1.0, like=r)  # pinned — a bare constant 1 collapses the
    #                              sub()'s two_sum under algsimp
    init = (jnp.ones_like(r[0]), jnp.zeros_like(r[0]))

    # Horner over odd terms: r(1 - r2/6(1 - r2/20(1 - ...)))
    def body(acc, c):
        return sub(one, mul(mul(r2, (c[0], c[1])), acc)), None

    acc, _ = _jax.lax.scan(body, init, jnp.asarray(_SIN_COEFS),
                           unroll=_taylor_unroll())
    return mul(r, acc)


def _cos_taylor(r: DD) -> DD:
    """cos(r), |r| <= pi/4, DD Taylor."""
    import jax as _jax
    r2 = sqr(r)
    one = dd_const(1.0, like=r)  # pinned, see _sin_taylor
    init = (jnp.ones_like(r[0]), jnp.zeros_like(r[0]))

    def body(acc, c):
        return sub(one, mul(mul(r2, (c[0], c[1])), acc)), None

    acc, _ = _jax.lax.scan(body, init, jnp.asarray(_COS_COEFS),
                           unroll=_taylor_unroll())
    return sub(one, mul(mul_f(r2, jnp.float32(0.5)), acc))


def sincos(a: DD) -> Tuple[DD, DD]:
    """(sin a, cos a) with DD range reduction mod pi/2.

    Valid for |a| up to ~2e4 (the COS pricer's u*(x-a) arguments stay well
    inside this: u ~ k*pi/(b-a) <= 128*pi/4, times |x-a| <= ~6).
    """
    # k = round(a / (pi/2)); r = a - k*pi/2 computed in DD
    k = jnp.round(a[0] * jnp.float32(1.0 / _PIO2))
    pio2 = dd_const(_PIO2, like=a)
    r = sub(a, mul_f(pio2, k))
    quad = jnp.asarray(jnp.mod(k, 4.0), jnp.int32)  # 0..3
    s, c = _sin_taylor(r), _cos_taylor(r)
    # sin(a) = [s, c, -s, -c][quad]; cos(a) = [c, -s, -c, s][quad]
    sin_out = where(quad == 0, s,
                    where(quad == 1, c,
                          where(quad == 2, neg(s), neg(c))))
    cos_out = where(quad == 0, c,
                    where(quad == 1, neg(s),
                          where(quad == 2, neg(c), s)))
    return sin_out, cos_out


def sin(a: DD) -> DD:
    return sincos(a)[0]


def cos(a: DD) -> DD:
    return sincos(a)[1]


def atan2(b: DD, a: DD) -> DD:
    """atan2(b, a) via f32 seed + one trigonometric Newton correction.

    y0 = atan2_f32; the correction e = (b cos y0 - a sin y0) /
    (a cos y0 + b sin y0) equals tan(theta - y0) ~ 1e-7, so theta =
    y0 + e - e^3/3 + ... ~ y0 + e to ~1e-21. Handles all quadrants since
    y0 already lands in the right one.
    """
    y0 = jnp.arctan2(b[0], a[0])
    s, c = sincos((y0, jnp.zeros_like(y0)))
    num = sub(mul(b, c), mul(a, s))
    den = add(mul(a, c), mul(b, s))
    e = div(num, den)
    return add((y0, jnp.zeros_like(y0)), e)


def hypot(a: DD, b: DD) -> DD:
    """sqrt(a^2 + b^2); the pricer's ranges don't approach f32 overflow."""
    return sqrt(add(sqr(a), sqr(b)))
