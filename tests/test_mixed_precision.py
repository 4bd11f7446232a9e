"""Mixed-precision (f32 solve + f64 polish) batch calibration tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # training/polish-heavy; run with `pytest -m ""`

from option_pricing_ffn_lbfgs_tpu.calibration.calibrator import (
    POLISH_LBFGS, calibrate_batch, calibrate_batch_mixed)
from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
    DHParams, price_options)
from option_pricing_ffn_lbfgs_tpu.utils.config import (
    CalibrationConfig, LBFGSConfig)
from tests.conftest import TRUE

# maxiter=150 suffices for convergence on these surfaces (observed ~60-100
# iterations) and roughly halves this file's CPU compile+run time vs 300.
CFG = CalibrationConfig(lbfgs=LBFGSConfig(maxiter=150))


@pytest.fixture(scope="module")
def batch3(surface15):
    strikes, mats, is_call = surface15
    rng = np.random.default_rng(5)
    base = np.array([TRUE[k] for k in DHParams._fields])
    vecs = jnp.asarray(base * (1.0 + rng.uniform(-0.05, 0.05, (3, 13))))
    spots = jnp.full(3, 100.0)
    prices = jax.vmap(lambda s, v: price_options(
        DHParams.from_vector(v), s, 0.03, strikes, mats, is_call))(spots, vecs)
    return (spots, jnp.broadcast_to(strikes, (3, 15)),
            jnp.broadcast_to(mats, (3, 15)),
            jnp.broadcast_to(is_call, (3, 15)), prices,
            jax.random.split(jax.random.key(1), 3))


@pytest.fixture(scope="module")
def mixed_out(batch3):
    spots, bs, bm, bc, prices, keys = batch3
    return calibrate_batch_mixed(spots, 0.03, bs, bm, bc, prices, keys,
                                 config=CFG)


def test_mixed_beats_f32(batch3, mixed_out):
    spots, bs, bm, bc, prices, keys = batch3
    mixed = mixed_out
    f32 = calibrate_batch(
        jnp.asarray(spots, jnp.float32), jnp.float32(0.03),
        jnp.asarray(bs, jnp.float32), jnp.asarray(bm, jnp.float32), bc,
        jnp.asarray(prices, jnp.float32), keys, config=CFG)
    assert mixed.x.dtype == jnp.float64       # x64 enabled in tests
    rel_mixed = np.abs((np.asarray(mixed.model_prices) - np.asarray(prices))
                       / np.asarray(prices)).mean()
    rel_f32 = np.abs((np.asarray(f32.model_prices, np.float64)
                      - np.asarray(prices))
                     / np.asarray(prices)).mean()
    assert rel_mixed < rel_f32
    assert rel_mixed * 100 < 0.03             # north-star accuracy bar


def test_polish_monotone(mixed_out):
    """The f64 polish never worsens the (f64-evaluated) objective."""
    mixed = mixed_out
    # mixed.per_start_loss are the f32 finals; the polished f64 loss should
    # be no worse than the best f32 start's loss (up to f32->f64 re-eval).
    best32 = np.asarray(mixed.per_start_loss).min(axis=-1)
    assert np.all(np.asarray(mixed.loss) <= best32 + 1e-6)


def test_iterations_accumulate(mixed_out):
    mixed = mixed_out
    assert np.all(np.asarray(mixed.iterations) >= 1)
    assert np.all(np.asarray(mixed.n_evals) > np.asarray(mixed.iterations))


def test_pallas_polish_impl_matches_vmap(batch3, mixed_out):
    """polish_impl='pallas' (batched LM + fused reverse-sweep Jacobian)
    reaches the same optima as the vmap path (round-5 engines)."""
    import dataclasses
    spots, bs, bm, bc, prices, keys = batch3
    cfg = dataclasses.replace(CFG, polish_impl="pallas")
    out = calibrate_batch_mixed(spots, 0.03, bs, bm, bc, prices, keys,
                                config=cfg)
    rel = np.abs((np.asarray(out.model_prices) - np.asarray(prices))
                 / np.asarray(prices)).mean()
    rel_vmap = np.abs((np.asarray(mixed_out.model_prices)
                       - np.asarray(prices)) / np.asarray(prices)).mean()
    assert rel * 100 < 0.03
    assert rel < 10 * rel_vmap + 1e-6


def test_compacted_two_stage_polish(batch3):
    """Forcing compaction (min_lanes=1) preserves accuracy: the stage-B
    tail completion must land at the same optima as the single-stage
    polish within the f32-Jacobian floor."""
    import dataclasses
    spots, bs, bm, bc, prices, keys = batch3
    cfg = dataclasses.replace(CFG, polish_compact_min_lanes=1)
    out = calibrate_batch_mixed(spots, 0.03, bs, bm, bc, prices, keys,
                                config=cfg)
    rel = np.abs((np.asarray(out.model_prices) - np.asarray(prices))
                 / np.asarray(prices)).mean()
    assert rel * 100 < 0.03
    # winner rows of per_start_x must equal .x on every path (round-5
    # contract for the mandatory per_start_x field)
    win = np.argmin(np.asarray(out.per_start_loss), axis=-1)
    for i, w in enumerate(win):
        np.testing.assert_allclose(np.asarray(out.per_start_x)[i, w],
                                   np.asarray(out.x)[i], rtol=1e-12)


def test_fused_search_impl(batch3):
    """search_impl='batched' (natively-batched engine) matches the vmap
    search at outcome level through the full mixed pipeline."""
    import dataclasses
    spots, bs, bm, bc, prices, keys = batch3
    cfg = dataclasses.replace(CFG, search_impl="batched")
    out = calibrate_batch_mixed(spots, 0.03, bs, bm, bc, prices, keys,
                                config=cfg)
    rel = np.abs((np.asarray(out.model_prices) - np.asarray(prices))
                 / np.asarray(prices)).mean()
    assert rel * 100 < 0.03
