"""Test configuration: CPU backend with a virtual 8-device mesh and x64.

The reference's test suite is a print-based script (tests/test_suite.py in
/root/reference — no assertions, no exit codes). This suite is proper pytest.
Tests run on the CPU backend so they are hermetic and fast; float64 parity
with the reference's NumPy math is validated here, while TPU behavior is
covered by bench.py and __graft_entry__.py on real hardware.
"""
import os

# Must be set before jax import. The axon TPU plugin ignores JAX_PLATFORMS,
# so set JAX_PLATFORM_NAME too and force 8 virtual CPU devices for mesh tests.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

from option_pricing_ffn_lbfgs_tpu.models.double_heston import (  # noqa: E402
    DHParams, price_options)


# Reference "guess type 0" literature parameters (lbfgs_calibrator.py:182-188).
GUESS0 = dict(v1_0=0.04, kappa1=2.5, theta1=0.04, sigma1=0.3, rho1=-0.7,
              v2_0=0.04, kappa2=0.5, theta2=0.04, sigma2=0.2, rho2=-0.5,
              lambda_j=0.15, mu_j=-0.04, sigma_j=0.08)

# Demo parameters (double_heston.py:202-234).
DEMO = dict(v1_0=0.04, kappa1=2.0, theta1=0.04, sigma1=0.3, rho1=-0.5,
            v2_0=0.04, kappa2=1.5, theta2=0.04, sigma2=0.2, rho2=-0.3,
            lambda_j=0.5, mu_j=-0.05, sigma_j=0.10)

# Ground-truth parameters used by the calibration round-trip tests
# (mirrors tests/test_suite.py:273-302 style).
TRUE = dict(v1_0=0.05, kappa1=2.0, theta1=0.045, sigma1=0.35, rho1=-0.65,
            v2_0=0.04, kappa2=0.8, theta2=0.05, sigma2=0.25, rho2=-0.45,
            lambda_j=0.12, mu_j=-0.05, sigma_j=0.09)


@pytest.fixture(scope="session")
def surface15():
    """The standard 5-strike x 3-maturity all-call benchmark surface."""
    strikes = jnp.asarray(np.tile([90.0, 95.0, 100.0, 105.0, 110.0], 3))
    mats = jnp.asarray(np.repeat([0.25, 0.5, 1.0], 5))
    is_call = jnp.ones(15, bool)
    return strikes, mats, is_call


@pytest.fixture(scope="session")
def true_params():
    return DHParams.from_dict(TRUE, jnp.float64)


@pytest.fixture(scope="session")
def noiseless_market(surface15, true_params):
    """Noiseless market prices generated from TRUE params."""
    strikes, mats, is_call = surface15
    prices = price_options(true_params, 100.0, 0.03, strikes, mats, is_call)
    return np.asarray(prices)
