"""FFN surrogate tests: architecture (test_suite.py:150-184 semantics),
features, training, hybrid pipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # training/polish-heavy; run with `pytest -m ""`

from option_pricing_ffn_lbfgs_tpu.data.synthetic import generate_dataset
from option_pricing_ffn_lbfgs_tpu.surrogate.features import (
    N_FEATURES, extract_features)
from option_pricing_ffn_lbfgs_tpu.surrogate.ffn import (
    N_PARAMS, SurrogateFFN, count_params, init_ffn)
from option_pricing_ffn_lbfgs_tpu.surrogate.hybrid import (
    ffn_only_predict, hybrid_calibrate, hybrid_calibrate_batch_mixed)
from option_pricing_ffn_lbfgs_tpu.surrogate.scalers import (
    StandardScaler, load_scalers, save_scalers)
from option_pricing_ffn_lbfgs_tpu.surrogate.train import (
    TrainConfig, dataset_to_xy, fit, load_surrogate, save_surrogate)
from option_pricing_ffn_lbfgs_tpu.utils.config import (
    CalibrationConfig, GeneratorConfig, LBFGSConfig)


@pytest.fixture(scope="module")
def small_ds():
    return generate_dataset(jax.random.key(1),
                            GeneratorConfig(n_samples=1000), n_terms=64)


@pytest.fixture(scope="module")
def trained(small_ds):
    fx, fy = dataset_to_xy(small_ds)
    surrogate, hist = fit(fx, fy, TrainConfig(max_epochs=120, patience=30,
                                              batch_size=128, seed=0))
    return surrogate, hist


class TestArchitecture:
    def test_dims(self):
        """input_dim 11 / output_dim 13 (test_suite.py:161-168)."""
        model, variables = init_ffn(jax.random.key(0))
        out = model.apply(variables, jnp.zeros((4, N_FEATURES)), train=False)
        assert out.shape == (4, N_PARAMS)

    def test_param_count(self):
        """>10k params (test_suite.py:166)."""
        _, variables = init_ffn(jax.random.key(0))
        assert count_params(variables) > 10_000

    def test_dropout_only_in_train(self):
        model, variables = init_ffn(jax.random.key(0))
        x = jnp.ones((8, N_FEATURES))
        a = model.apply(variables, x, train=False)
        b = model.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFeatures:
    def test_shape_and_batch(self, small_ds):
        f1 = extract_features(small_ds.market_prices[0], small_ds.spots[0])
        assert f1.shape == (N_FEATURES,)
        fb = extract_features(small_ds.market_prices, small_ds.spots)
        assert fb.shape == (small_ds.n_samples, N_FEATURES)
        np.testing.assert_allclose(np.asarray(fb[0]), np.asarray(f1),
                                   rtol=1e-12)

    def test_scale_invariance(self, small_ds):
        """Features are homogeneous of degree 0 in (prices, spot)."""
        f1 = extract_features(small_ds.market_prices[0], small_ds.spots[0])
        f2 = extract_features(small_ds.market_prices[0] * 2.0,
                              small_ds.spots[0] * 2.0)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-12)

    def test_atm_feature_value(self, small_ds):
        p = np.asarray(small_ds.market_prices[0])
        s = float(small_ds.spots[0])
        f = np.asarray(extract_features(small_ds.market_prices[0],
                                        small_ds.spots[0]))
        assert abs(f[0] - p[2] / s) < 1e-12       # ATM of first maturity
        assert abs(f[3] - (p[4] - p[0]) / s) < 1e-12   # skew of first maturity


class TestScalers:
    def test_roundtrip(self, tmp_path):
        x = np.random.default_rng(0).normal(3.0, 2.0, (100, 11))
        sc = StandardScaler.fit(x)
        z = np.asarray(sc.transform(x))
        assert abs(z.mean()) < 1e-10 and abs(z.std() - 1.0) < 1e-2
        np.testing.assert_allclose(np.asarray(sc.inverse_transform(z)), x,
                                   rtol=1e-10)
        tsc = StandardScaler.fit(np.random.default_rng(1).normal(size=(50, 13)))
        path = str(tmp_path / "scalers.pkl")
        save_scalers(path, sc, tsc)
        fs, ts = load_scalers(path)
        assert fs.n_features_in_ == 11 and ts.n_features_in_ == 13


class TestTraining:
    def test_loss_decreases(self, trained, small_ds):
        """The surface->params inverse problem is only partially identifiable
        from the 11 summary features (measured: a linear probe leaves ~0.95+
        residual variance on kappa/sigma/rho/jump params, but ~0.45-0.75 on
        v1_0/theta1/v2_0 — matching the reference FFN-only mode's ~11%
        pricing error). So the sound contract is: beat predict-the-mean
        overall, and clearly learn the identifiable variance params."""
        surrogate, hist = trained
        assert hist["val_loss"][-1] < hist["val_loss"][0]
        assert min(hist["val_loss"]) < 1.0    # beats predicting the mean
        fx, fy = dataset_to_xy(small_ds)
        fs = surrogate.feature_scaler.transform(fx).astype(np.float32)
        ys = np.asarray(surrogate.target_scaler.transform(fy))
        pred = np.asarray(SurrogateFFN().apply(
            surrogate.variables, jnp.asarray(fs), train=False))
        per_param_mse = ((pred - ys) ** 2).mean(0)
        assert per_param_mse[0] < 0.8    # v1_0 learned
        assert per_param_mse[5] < 0.7    # v2_0 learned

    def test_prediction_quality(self, trained, small_ds):
        """FFN-only predictions land in the right region (the reference's
        FFN-only mode has ~11% pricing error; here we check parameters are
        plausible, not tight)."""
        surrogate, _ = trained
        pred = np.asarray(surrogate.predict_params(
            small_ds.market_prices[:20], small_ds.spots[:20]))
        truth = np.asarray(small_ds.params[:20])
        assert pred.shape == (20, 13)
        assert np.all(np.isfinite(pred))
        # positive params positive, correlations in (-1, 1)
        assert np.all(pred[:, [0, 1, 2, 3, 5, 6, 7, 8, 10, 12]] > 0)
        assert np.all(np.abs(pred[:, [4, 9]]) < 1.0)
        # v1_0 predictions correlate with truth across the batch
        cc = np.corrcoef(pred[:, 0], truth[:, 0])[0, 1]
        assert cc > 0.2

    def test_save_load(self, trained, tmp_path):
        surrogate, _ = trained
        path = str(tmp_path / "ffn.pkl")
        save_surrogate(path, surrogate)
        back = load_surrogate(path)
        x = jnp.ones((2, N_FEATURES))
        np.testing.assert_allclose(
            np.asarray(SurrogateFFN().apply(back.variables, x, train=False)),
            np.asarray(SurrogateFFN().apply(surrogate.variables, x,
                                            train=False)), rtol=1e-6)

    def test_finetune_from_init(self, trained, small_ds):
        surrogate, _ = trained
        fx, fy = dataset_to_xy(small_ds)
        tuned, hist = fit(fx, fy, TrainConfig(learning_rate=1e-5,
                                              batch_size=32, max_epochs=3,
                                              patience=10), init=surrogate)
        assert tuned.feature_scaler is surrogate.feature_scaler
        assert len(hist["val_loss"]) <= 3


class TestHybrid:
    def test_hybrid_improves_on_ffn(self, trained, small_ds):
        surrogate, _ = trained
        i = 5
        cfg = CalibrationConfig(lbfgs=LBFGSConfig())
        res = hybrid_calibrate(
            surrogate, small_ds.spots[i], 0.03, small_ds.strikes[i],
            small_ds.maturities[i], jnp.ones(15, bool),
            small_ds.model_prices[i], cfg, refine_maxiter=10)
        assert float(res.loss) <= float(res.ffn_loss)
        assert int(res.iterations) <= 10
        # The refinement minimizes rel-MSE *plus* the Feller penalty; an FFN
        # start can violate Feller, in which case the optimizer correctly
        # trades a little pricing error for a large penalty reduction. So
        # the contract to test is strict objective improvement.
        assert float(res.loss) < float(res.ffn_loss)
        assert np.all(np.isfinite(np.asarray(res.model_prices)))

    def test_ffn_only_mode(self, trained, small_ds):
        surrogate, _ = trained
        p = ffn_only_predict(surrogate, small_ds.market_prices[3],
                             small_ds.spots[3])
        assert p.shape == (13,)

    def test_hybrid_batch_mixed(self, trained, small_ds):
        """f32 refine + f64 polish beats the raw FFN prediction on pricing
        error for every surface in the batch."""
        from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
            DHParams, price_options)
        from option_pricing_ffn_lbfgs_tpu.utils.config import PricerConfig
        surrogate, _ = trained
        cfg = CalibrationConfig(pricer=PricerConfig(n_terms=64))
        n = 3
        spots = small_ds.spots[:n]
        strikes = small_ds.strikes[:n]
        mats = small_ds.maturities[:n]
        market = small_ds.model_prices[:n]
        is_call = jnp.ones((n, 15), bool)
        out = hybrid_calibrate_batch_mixed(
            surrogate, spots, 0.03, strikes, mats, is_call, market, cfg)
        assert out.x.dtype == jnp.float64          # x64 on in tests
        rel = np.abs((np.asarray(out.model_prices) - np.asarray(market))
                     / np.asarray(market)).mean(-1)
        ffn_params = surrogate.predict_params(market, spots)
        ffn_prices = jax.vmap(lambda p, s, k, m: price_options(
            DHParams.from_vector(jnp.asarray(p, jnp.float64)), s, 0.03, k,
            m, jnp.ones(15, bool), n_terms=64))(ffn_params, spots, strikes,
                                                mats)
        rel_ffn = np.abs((np.asarray(ffn_prices) - np.asarray(market))
                         / np.asarray(market)).mean(-1)
        assert np.all(rel < rel_ffn)
        assert rel.mean() < 0.01                   # <1% after refine+polish


def price_rel(surrogate, ds, i):
    from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
        DHParams, price_options)
    pred = surrogate.predict_params(ds.market_prices[i], ds.spots[i])
    return price_options(DHParams.from_vector(jnp.asarray(pred)), ds.spots[i],
                         0.03, ds.strikes[i], ds.maturities[i],
                         jnp.ones(15, bool))
