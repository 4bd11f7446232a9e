"""Split-complex arithmetic vs NumPy complex128 reference."""
import numpy as np
import jax
import jax.numpy as jnp

from option_pricing_ffn_lbfgs_tpu.ops import complex_math as cm

RNG = np.random.default_rng(0)
Z = RNG.standard_normal(256) + 1j * RNG.standard_normal(256)
W = RNG.standard_normal(256) + 1j * RNG.standard_normal(256)


def _pair(z):
    return jnp.asarray(z.real), jnp.asarray(z.imag)


def _np(pair):
    return np.asarray(pair[0]) + 1j * np.asarray(pair[1])


def test_mul():
    np.testing.assert_allclose(_np(cm.cmul(_pair(Z), _pair(W))), Z * W, rtol=1e-12)


def test_div():
    np.testing.assert_allclose(_np(cm.cdiv(_pair(Z), _pair(W))), Z / W, rtol=1e-12)


def test_div_extreme_scales():
    """Smith's algorithm survives magnitudes that overflow naive division."""
    big = np.array([1e300 + 1e300j, 1e-300 + 1e-300j, 1e200 + 1j])
    out = _np(cm.cdiv(_pair(big), _pair(big)))
    np.testing.assert_allclose(out, np.ones(3), rtol=1e-12)


def test_exp():
    np.testing.assert_allclose(_np(cm.cexp(_pair(Z))), np.exp(Z), rtol=1e-12)


def test_log():
    np.testing.assert_allclose(_np(cm.clog(_pair(Z))), np.log(Z), rtol=1e-12)


def test_sqrt_all_quadrants():
    for z in [Z, -Z, np.conj(Z), 1e-8 * Z, 1e8 * Z]:
        np.testing.assert_allclose(_np(cm.csqrt(_pair(z))), np.sqrt(z),
                                   rtol=1e-10, atol=1e-12)


def test_sqrt_positive_real_axis():
    """Exact positive-real inputs (the u=0 COS term case)."""
    x = np.array([1e-10, 1.0, 4.0, 1e10])
    re, im = cm.csqrt((jnp.asarray(x), jnp.zeros(4)))
    np.testing.assert_allclose(np.asarray(re), np.sqrt(x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(im), 0.0, atol=0.0)


def test_sqrt_grad_finite_on_real_axis():
    """The motivating bug: grad through csqrt at exactly-real inputs must be
    finite (the naive form yields 0 * inf = NaN)."""
    def f(ar):
        re, im = cm.csqrt((ar, jnp.zeros_like(ar)))
        return jnp.sum(re) + jnp.sum(im)
    g = jax.grad(f)(jnp.asarray([0.5, 2.0, 9.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g), 0.5 / np.sqrt([0.5, 2.0, 9.0]),
                               rtol=1e-12)
