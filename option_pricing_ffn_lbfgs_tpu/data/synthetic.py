"""On-device synthetic calibration-data generator.

Re-design of src/data/synthetic_generator.py:25-250: the reference prices
7,500 options in a sequential Python loop (~52 s for 500 samples); here the
whole time series is one ``lax.scan`` over days (the AR(1) parameter
persistence and spot random walk are genuine sequential dependencies) with
each day's 15-option surface priced by the vectorized COS kernel — one jit,
entirely on device.

Semantics preserved from the reference:
  * parameter ranges (synthetic_generator.py:75-89);
  * AR(1) day-over-day persistence alpha=0.9 (:104-109);
  * spot geometric walk, per-day return ~ N(0.0003, 0.01) (:112-116);
  * 3 maturities x 5 moneyness-preserved strikes, K = K_rel * spot / 100,
    maturity-major ordering (:123-125);
  * 2% multiplicative Gaussian market noise (:140-142);
  * weekday date labels from 2022-01-03 (:59-69), attached host-side;
  * results exported as reference-compatible CalibrationResult records with
    calibration_time=None / iterations=None (:160-173), pickleable.
"""
from __future__ import annotations

import datetime
import pickle
from typing import List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.double_heston import DHParams, PARAM_NAMES, price_options
from ..utils.config import GeneratorConfig
from ..utils.results import CalibrationResult

# Empirical market parameter ranges (synthetic_generator.py:75-89).
PARAM_RANGES = {
    "v1_0": (0.025, 0.080), "kappa1": (1.5, 4.5), "theta1": (0.025, 0.065),
    "sigma1": (0.20, 0.50), "rho1": (-0.85, -0.40),
    "v2_0": (0.020, 0.070), "kappa2": (0.30, 1.20), "theta2": (0.025, 0.070),
    "sigma2": (0.10, 0.35), "rho2": (-0.70, -0.20),
    "lambda_j": (0.05, 0.25), "mu_j": (-0.08, -0.01), "sigma_j": (0.03, 0.12),
}
RANGE_LO = np.array([PARAM_RANGES[n][0] for n in PARAM_NAMES])
RANGE_HI = np.array([PARAM_RANGES[n][1] for n in PARAM_NAMES])


def enforce_feller(params, margin: float = 0.90):
    """Cap sigma_i at margin*sqrt(2*kappa_i*theta_i) (vector form, idx
    order = PARAM_NAMES).

    The reference's ranges (synthetic_generator.py:75-89) allow draws that
    violate the Feller condition; its calibrator then penalizes the true
    parameters with weight 1000 (lbfgs_calibrator.py:111-116), making them
    unrecoverable — measured: such surfaces stall at ~1% pricing error no
    matter the optimizer. Capping keeps ground truth inside the model class
    the loss actually admits; margin 0.90 keeps it clear of the penalty's
    gradient kink. Given the ranges, the cap never pushes sigma below its
    own lower bound (worst case 0.25 > 0.20 and 0.110 > 0.10).
    """
    sig1_max = margin * jnp.sqrt(2.0 * params[..., 1] * params[..., 2])
    sig2_max = margin * jnp.sqrt(2.0 * params[..., 6] * params[..., 7])
    params = params.at[..., 3].set(jnp.minimum(params[..., 3], sig1_max))
    params = params.at[..., 8].set(jnp.minimum(params[..., 8], sig2_max))
    return params


class SyntheticDataset(NamedTuple):
    """Structure-of-arrays synthetic calibration history (device arrays)."""
    params: jnp.ndarray         # [n, 13] ground-truth parameters
    spots: jnp.ndarray          # [n]
    strikes: jnp.ndarray        # [n, 15] absolute strikes
    maturities: jnp.ndarray     # [n, 15]
    model_prices: jnp.ndarray   # [n, 15] noiseless COS prices
    market_prices: jnp.ndarray  # [n, 15] noisy "market" prices
    losses: jnp.ndarray         # [n] rel-MSE of model vs market

    @property
    def n_samples(self) -> int:
        return self.params.shape[0]


def trading_dates(n: int, start: str = "2022-01-03") -> List[str]:
    """Weekday date labels (synthetic_generator.py:59-69)."""
    cur = datetime.date.fromisoformat(start)
    out = []
    for _ in range(n):
        while cur.weekday() >= 5:
            cur += datetime.timedelta(days=1)
        out.append(cur.isoformat())
        cur += datetime.timedelta(days=1)
    return out


def _surface_grid(config: GeneratorConfig, dtype):
    mats = np.repeat(config.surface.maturities,
                     len(config.surface.rel_strikes))
    rel = np.tile(config.surface.rel_strikes, len(config.surface.maturities))
    return jnp.asarray(rel, dtype), jnp.asarray(mats, dtype)


def sample_paths(key, config: GeneratorConfig, dtype):
    """The genuinely sequential part: AR(1) parameter paths + spot walk.

    One lax.scan over days; pricing is deliberately kept out so the whole
    price grid can be computed as one batched kernel afterwards.
    """
    lo = jnp.asarray(RANGE_LO, dtype)
    hi = jnp.asarray(RANGE_HI, dtype)
    alpha = jnp.asarray(config.ar_alpha, dtype)

    def step(carry, k):
        prev_params, prev_spot, is_first = carry
        k_param, k_spot = jax.random.split(k)
        raw = jax.random.uniform(k_param, (13,), dtype, lo, hi)
        params = jnp.where(is_first, raw,
                           alpha * prev_params + (1.0 - alpha) * raw)
        if config.enforce_feller:
            params = enforce_feller(params, config.feller_margin)
        ret = (jax.random.normal(k_spot, (), dtype) * config.spot_vol
               + config.spot_drift)
        spot = jnp.where(is_first, jnp.asarray(config.surface.spot, dtype),
                         prev_spot * (1.0 + ret))
        return (params, spot, jnp.asarray(False)), (params, spot)

    keys = jax.random.split(key, config.n_samples)
    init = (jnp.zeros(13, dtype), jnp.asarray(config.surface.spot, dtype),
            jnp.asarray(True))
    _, (params, spots) = jax.lax.scan(step, init, keys)
    return params, spots


def generate_dataset(key, config: GeneratorConfig = GeneratorConfig(),
                     dtype=jnp.float64, n_terms: int = 128,
                     use_pallas: bool = False) -> SyntheticDataset:
    """Generate the full synthetic history on device.

    Phase 1: lax.scan for the AR(1)/spot time series (sequential).
    Phase 2: one batched COS pricing of all n_samples x 15 options — the
    fused Pallas kernel when ``use_pallas`` (float32 fast path), else the
    vmapped XLA pricer at ``dtype`` precision.
    """
    rel, mats = _surface_grid(config, dtype)
    rate = jnp.asarray(config.surface.rate, dtype)
    n_opt = rel.shape[0]
    key_path, key_noise = jax.random.split(key)
    params, spots = sample_paths(key_path, config, dtype)
    strikes = spots[:, None] * rel[None, :] / 100.0
    b_mats = jnp.broadcast_to(mats, strikes.shape)
    is_call = jnp.ones(strikes.shape, bool)
    if use_pallas:
        from ..ops.cos_pallas import price_surfaces_pallas
        model = price_surfaces_pallas(params, spots, config.surface.rate,
                                      strikes, b_mats, is_call,
                                      n_terms=n_terms).astype(dtype)
    else:
        model = jax.vmap(
            lambda p, s, k, m: price_options(
                DHParams.from_vector(p), s, rate, k, m,
                jnp.ones(n_opt, bool), n_terms=n_terms))(
            params, spots, strikes, b_mats)
    noise = (jax.random.normal(key_noise, model.shape, dtype)
             * config.market_noise)
    market = model * (1.0 + noise)
    rel_err = (model - market) / market
    losses = jnp.mean(rel_err * rel_err, axis=-1)
    return SyntheticDataset(params=params, spots=spots, strikes=strikes,
                            maturities=b_mats, model_prices=model,
                            market_prices=market, losses=losses)


def to_calibration_results(ds: SyntheticDataset,
                           config: GeneratorConfig = GeneratorConfig()
                           ) -> List[CalibrationResult]:
    """Convert to reference-compatible CalibrationResult records
    (synthetic_generator.py:160-173 field semantics)."""
    dates = trading_dates(ds.n_samples, config.start_date)
    params = np.asarray(ds.params)
    spots = np.asarray(ds.spots)
    strikes = np.asarray(ds.strikes)
    mats = np.asarray(ds.maturities)
    model = np.asarray(ds.model_prices)
    market = np.asarray(ds.market_prices)
    losses = np.asarray(ds.losses)
    out = []
    for i in range(ds.n_samples):
        opts = [dict(strike=float(k), maturity=float(t), price=float(p),
                     option_type="call")
                for k, t, p in zip(strikes[i], mats[i], market[i])]
        out.append(CalibrationResult(
            date=dates[i], spot=float(spots[i]),
            risk_free=config.surface.rate,
            parameters={n: float(v) for n, v in zip(PARAM_NAMES, params[i])},
            market_prices=market[i], model_prices=model[i],
            market_options=opts, final_loss=float(losses[i]),
            calibration_time=None, success=True, iterations=None,
            message="Synthetic data (not from real calibration)"))
    return out


def save_dataset(ds: SyntheticDataset, path: str,
                 config: GeneratorConfig = GeneratorConfig()) -> None:
    """Persist the dataset.

    ``.pkl`` -> reference-compatible pickled list[CalibrationResult]
    (synthetic_generator.py:181-183); anything else -> compact npz of the
    structure-of-arrays form.
    """
    if str(path).endswith(".pkl"):
        with open(path, "wb") as f:
            pickle.dump(to_calibration_results(ds, config), f)
    else:
        np.savez_compressed(path, **{k: np.asarray(v)
                                     for k, v in ds._asdict().items()})


def load_dataset(path: str) -> SyntheticDataset:
    """Load a dataset saved by save_dataset (either format)."""
    if str(path).endswith(".pkl"):
        with open(path, "rb") as f:
            recs = pickle.load(f)
        params = jnp.asarray([[r.parameters[n] for n in PARAM_NAMES]
                              for r in recs])
        spots = jnp.asarray([r.spot for r in recs])
        strikes = jnp.asarray([[o["strike"] for o in r.market_options]
                               for r in recs])
        mats = jnp.asarray([[o["maturity"] for o in r.market_options]
                            for r in recs])
        market = jnp.asarray([np.asarray(r.market_prices) for r in recs])
        model = jnp.asarray([np.asarray(r.model_prices) for r in recs])
        losses = jnp.asarray([r.final_loss for r in recs])
        return SyntheticDataset(params, spots, strikes, mats, model, market,
                                losses)
    with np.load(str(path) if str(path).endswith(".npz") else str(path) + ".npz") as z:
        return SyntheticDataset(**{k: jnp.asarray(z[k]) for k in
                                   SyntheticDataset._fields})
