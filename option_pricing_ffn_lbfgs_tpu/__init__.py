"""TPU-native Double Heston + jump-diffusion calibration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
zenthepen/Option-Pricing-FFN-LBFGS: COS-method option pricing, multi-start
L-BFGS calibration with autodiff gradients, synthetic data generation, an
FFN surrogate + hybrid pipeline, and mesh-sharded batch calibration.

Quick start::

    import jax.numpy as jnp
    from option_pricing_ffn_lbfgs_tpu import (
        DHParams, price_options, DoubleHestonJumpCalibrator)

    params = DHParams.from_dict({...})
    prices = price_options(params, spot, rate, strikes, maturities, is_call)

    cal = DoubleHestonJumpCalibrator(spot, rate, market_options)
    result = cal.calibrate(maxiter=300, multi_start=3)
"""

from .models.double_heston import (
    DHParams, PARAM_NAMES, char_fn, payoff_coefficients, price_options,
    price_single, truncation_range)
from .calibration.calibrator import (
    BatchCalibration, DoubleHestonJumpCalibrator, calibrate_batch,
    calibrate_batch_fused, calibrate_batch_mixed, calibrate_surface,
    options_to_arrays)
from .calibration.loss import feller_penalty, make_loss_fn, surface_loss
from .calibration.transforms import (
    inverse_transform, params_to_x, transform, transform_to_params)
from .calibration.initial_guess import initial_guesses
from .models.greeks import Greeks, greeks, param_sensitivities
from .ops.black_scholes import bs_price, bs_vega, implied_vol
from .ops.lbfgs import LBFGSResult, lbfgs_minimize
from .parallel.mesh import make_mesh, distributed_init
from .parallel.sharded import calibrate_sharded
from .utils.config import (
    CalibrationConfig, GeneratorConfig, LBFGSConfig, PricerConfig,
    SurfaceSpec)
from .utils.results import CalibrationResult, write_benchmark_json
from .data.synthetic import (
    SyntheticDataset, generate_dataset, load_dataset, save_dataset,
    to_calibration_results)
from .surrogate.features import extract_features
from .surrogate.ffn import SurrogateFFN, init_ffn
from .surrogate.hybrid import (
    HybridResult, ffn_only_predict, hybrid_calibrate,
    hybrid_calibrate_batch_mixed)
from .surrogate.train import (
    TrainedSurrogate, fit, load_surrogate, pretrain_and_finetune,
    save_surrogate)

__version__ = "0.1.0"

__all__ = [
    "DHParams", "PARAM_NAMES", "char_fn", "payoff_coefficients",
    "price_options", "price_single", "truncation_range",
    "BatchCalibration", "DoubleHestonJumpCalibrator", "calibrate_batch",
    "calibrate_batch_fused", "calibrate_batch_mixed", "calibrate_surface",
    "options_to_arrays",
    "feller_penalty", "make_loss_fn", "surface_loss",
    "inverse_transform", "params_to_x", "transform", "transform_to_params",
    "initial_guesses",
    "Greeks", "greeks", "param_sensitivities",
    "bs_price", "bs_vega", "implied_vol",
    "LBFGSResult", "lbfgs_minimize",
    "make_mesh", "distributed_init", "calibrate_sharded",
    "CalibrationConfig", "GeneratorConfig", "LBFGSConfig", "PricerConfig",
    "SurfaceSpec",
    "CalibrationResult", "write_benchmark_json",
    "SyntheticDataset", "generate_dataset", "load_dataset", "save_dataset",
    "to_calibration_results",
    "extract_features", "SurrogateFFN", "init_ffn",
    "HybridResult", "ffn_only_predict", "hybrid_calibrate",
    "hybrid_calibrate_batch_mixed",
    "TrainedSurrogate", "fit", "load_surrogate", "pretrain_and_finetune",
    "save_surrogate",
    "__version__",
]
