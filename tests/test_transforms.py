"""Parameter transform tests (lbfgs_calibrator.py:62-109 semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from option_pricing_ffn_lbfgs_tpu.calibration.transforms import (
    inverse_transform, transform, transform_to_params)
from tests.conftest import GUESS0
from option_pricing_ffn_lbfgs_tpu.models.double_heston import PARAM_NAMES


def test_roundtrip():
    p = jnp.asarray([GUESS0[n] for n in PARAM_NAMES])
    np.testing.assert_allclose(np.asarray(transform(inverse_transform(p))),
                               np.asarray(p), rtol=1e-12)


def test_positivity_and_rho_range():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((100, 13)) * 3.0)
    p = np.asarray(transform(x))
    pos_idx = [0, 1, 2, 3, 5, 6, 7, 8, 10, 12]
    assert np.all(p[:, pos_idx] > 0)
    assert np.all(np.abs(p[:, [4, 9]]) < 1.0)
    # mu_j is identity
    np.testing.assert_allclose(p[:, 11], np.asarray(x)[:, 11])


def test_rho_clip_in_inverse():
    """|rho| > 0.999 is clipped before arctanh (lbfgs_calibrator.py:97)."""
    p = jnp.asarray([GUESS0[n] for n in PARAM_NAMES]).at[4].set(-0.99999)
    x = inverse_transform(p)
    assert np.all(np.isfinite(np.asarray(x)))
    assert abs(float(jnp.tanh(x[4])) + 0.999) < 1e-9


def test_matches_reference_formulas():
    """Spot-check against the reference's per-field formulas."""
    x = jnp.asarray(np.linspace(-1.0, 1.0, 13))
    p = np.asarray(transform(x))
    xn = np.asarray(x)
    np.testing.assert_allclose(p[0], np.exp(xn[0]))
    np.testing.assert_allclose(p[4], np.tanh(xn[4]))
    np.testing.assert_allclose(p[11], xn[11])


def test_transform_grad_finite():
    g = jax.grad(lambda x: jnp.sum(transform(x)))(jnp.zeros(13))
    assert np.all(np.isfinite(np.asarray(g)))


def test_to_params_pytree():
    params = transform_to_params(jnp.zeros(13))
    assert float(params.v1_0) == 1.0       # exp(0)
    assert float(params.rho1) == 0.0       # tanh(0)
    assert float(params.mu_j) == 0.0       # identity
