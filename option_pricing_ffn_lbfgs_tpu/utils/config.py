"""Frozen, hashable configuration dataclasses (pytree-static).

The reference hard-codes every hyperparameter as a literal (N=128 at
double_heston.py:160, L=10 at :100, maxiter/ftol/gtol at
lbfgs_calibrator.py:263-268, penalty weight 1000 at :116, sentinel 1e10 at
:153, multi_start=3 at :236, generator ranges at synthetic_generator.py:75-93).
Here they are first-class, jit-static config objects.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class PricerConfig:
    """COS pricer settings (defaults mirror the reference)."""
    n_terms: int = 128         # COS series length N (double_heston.py:160)
    trunc_L: float = 10.0      # truncation width multiplier (double_heston.py:100)
    dividend_yield: float = 0.0


@dataclasses.dataclass(frozen=True)
class LBFGSConfig:
    """On-device L-BFGS settings.

    maxiter/ftol/gtol mirror scipy L-BFGS-B options used by the reference
    (lbfgs_calibrator.py:263-268). ``history`` is the two-loop-recursion
    memory (scipy's default m=10). The line-search constants are standard
    strong-Wolfe values.
    """
    maxiter: int = 300
    history: int = 10
    ftol: float = 1e-9
    gtol: float = 1e-6
    wolfe_c1: float = 1e-4
    wolfe_c2: float = 0.9
    max_linesearch: int = 20
    # Consecutive line-search failures tolerated before terminating; each
    # failure resets the (s, y) history and retries from steepest descent
    # (scipy L-BFGS-B similarly discards memory on breakdown).
    max_restarts: int = 2
    # Engine selection: the flat one-evaluation-per-step state machine
    # (ops/lbfgs.py::lbfgs_minimize_flat) is the default — under vmap its
    # batch serial depth is max-of-sums instead of the nested loop's
    # sum-of-maxes (~13x fewer chained evaluations at batch 1024, measured).
    # False selects the nested two-while-loop oracle implementation.
    flat: bool = True
    # Total objective-evaluation cap per solve (0 = unlimited). Bounds the
    # convergence tail a large vmapped batch inherits from its slowest lane.
    maxeval: int = 0


@dataclasses.dataclass(frozen=True)
class LMConfig:
    """On-device Levenberg–Marquardt settings (ops/levenberg_marquardt.py).

    Used for the high-precision polish phase: the calibration objective is a
    least-squares problem (15 relative pricing residuals + 2 Feller-penalty
    residuals over 13 parameters), so near the optimum Gauss–Newton steps
    converge quadratically — a handful of high-precision iterations replace
    ~60 Wolfe L-BFGS iterations, and the fixed-structure loop compiles to a
    far smaller XLA program than the bracketing/zoom line-search state
    machine (phase-wise measurements: results/compile_breakdown.json).
    """
    maxiter: int = 40
    ftol: float = 1e-14        # relative cost-reduction stop
    gtol: float = 1e-10        # max |J^T r| stop
    xtol: float = 1e-12        # relative step-size stop
    lambda_init: float = 1e-3  # initial Marquardt damping
    lambda_up: float = 10.0    # damping multiplier on rejected step
    lambda_down: float = 0.2   # damping multiplier on accepted step
    lambda_min: float = 1e-12
    lambda_max: float = 1e8    # give up when damping exceeds this
    # Absolute cost convergence target (0 = off). The calibration cost is
    # the MEAN SQUARED RELATIVE pricing error (+ Feller penalty), so an
    # absolute target is dimensionless and domain-meaningful: cost <= 1e-10
    # is rel-RMSE <= 1e-5 = 0.001 % — ~20x below the reference's 0.0236 %
    # headline. Without it, the f32-Jacobian LM tail CRAWLS: near the floor
    # it keeps accepting ~%-sized relative reductions of a ~1e-11 cost and
    # burns the whole maxiter budget harvesting digits that cannot move the
    # reported error (measured: most polish lanes ended at n_iters ==
    # maxiter with lambda low and cost ~1e-11).
    cost_target: float = 0.0
    # Compute the Jacobian with a float32 twin of the residual function
    # (ops/levenberg_marquardt.py::lm_minimize jac_residual_fn): a f32
    # Jacobian only perturbs the step *direction*; accept/reject on the
    # exact high-precision cost keeps the iteration a strict descent
    # method (a few extra cheap iterations, same final accuracy).
    f32_jacobian: bool = True
    # Residual implementation for the high-precision phase:
    #   "dd"     — double-float (two-float32) pricer
    #              (models/double_heston_dd.py): float32-only XLA program,
    #              ~1e-12 worst-case pricing parity; compile/runtime in
    #              results/compile_breakdown.json;
    #   "native" — residuals at the enclosing dtype (float64 when x64 is
    #              on; XLA:TPU emulates it — 170-330 s compile, kept as the
    #              parity/fallback mode).
    residual_impl: str = "dd"


@dataclasses.dataclass(frozen=True)
class CalibrationConfig:
    """Full calibration problem settings."""
    pricer: PricerConfig = PricerConfig()
    lbfgs: LBFGSConfig = LBFGSConfig()
    multi_start: int = 3                 # lbfgs_calibrator.py:236
    feller_weight: float = 1000.0        # lbfgs_calibrator.py:116
    bad_loss: float = 1e10               # non-finite sentinel, lbfgs_calibrator.py:153
    # Mixed-pipeline SEARCH-phase overrides (calibrate_batch_mixed phase 1
    # only; the polish phase always prices at pricer.n_terms):
    #  * search_n_terms=64: the COS series converges exponentially — N=64
    #    matches N=128 to ~1e-9 (SURVEY §6.1, measured), far below the f32
    #    hardware floor the search phase stalls at anyway. Halves the cost
    #    of every search evaluation.
    #  * search_maxeval=160: caps each lane's objective evaluations so a
    #    large vmapped batch is not held hostage by its slowest lane's
    #    convergence tail (median lane converges in ~60-90 evals; capped
    #    stragglers are finished by the high-precision polish).
    search_n_terms: int = 64
    search_maxeval: int = 160
    # POLISH-phase economies (round 5; measured at batch 2048 on v5e the
    # polish was 47.3 s of a 51 s pipeline — 92 % — because every lockstep
    # lane pays the slowest lane's LM iteration count, mean 23 / max 81):
    #  * polish_n_terms=64: polish residuals+Jacobian at N=64 (same
    #    exponential-convergence argument as search_n_terms: N=64 vs 128
    #    prices agree to ~1e-9 absolute — SURVEY §6.1 — i.e. ~1e-10
    #    relative, far below the ~5e-5 calibration error floor). Halves
    #    per-iteration polish cost.
    #  * polish_stage_a_maxiter: with >= polish_compact_min_lanes lanes the
    #    polish runs in two dispatches — stage A gives every (surface,
    #    start) lane this many LM iterations; lanes still unconverged are
    #    then gathered into a COMPACTED batch (padded to a power-of-two
    #    bucket) and continued to the full budget. Identical final
    #    semantics (every start fully polished, winner chosen on the fully
    #    polished loss); the convergence tail just stops costing
    #    full-batch-width iterations.
    polish_n_terms: int = 64
    polish_stage_a_maxiter: int = 10
    polish_compact_min_lanes: int = 64
    # Stage-B wave budgets: each wave continues the still-unconverged,
    # still-able-to-win lanes (re-compacted between waves as basins
    # separate) for this many more LM iterations. Sums to > the
    # single-stage maxiter so stragglers lose nothing.
    polish_wave_budgets: Tuple[int, ...] = (16, 24, 48)
    # Stage B only continues lanes that can still MATTER: unconverged AND
    # within this factor of their surface's current-best polished loss.
    # After stage A's high-precision LM iterations the loss ordering is
    # trustworthy (unlike the f32 search losses that motivated
    # polish-all-starts), so a losing start orders of magnitude behind its
    # surface's winner is frozen instead of crawling at its own local
    # minimum's floor for the rest of the budget.
    polish_continue_margin: float = 30.0
    # SEARCH-phase engine (calibrate_batch_mixed phase 1):
    #   "vmap"    — per-lane flat L-BFGS under vmap, XLA autodiff loss
    #               (the round-4 path; also what the sharded/multichip
    #               layer uses per shard);
    #   "batched" — natively-batched engine (ops/lbfgs_batched.py), XLA
    #               autodiff loss at the batch level;
    #   "pallas"  — batched engine + the fused Pallas value-and-grad
    #               kernel (ops/loss_pallas.py): one VMEM-resident pass
    #               per L-BFGS trip. The TPU fast path.
    search_impl: str = "vmap"
    # POLISH-phase engine: "vmap" = per-lane LM under vmap with 13-tangent
    # jacfwd f32 Jacobians (round-4 path); "pallas" = batched LM
    # (ops/levenberg_marquardt.py::lm_minimize_batched) with the fused
    # reverse-sweep Jacobian kernel — one kernel pass instead of 13
    # forward tangents (the Jacobian was ~half the polish per-iteration
    # cost). The "pallas" engine only engages above
    # polish_fused_min_lanes (measured: kernel-call overheads make it
    # SLOWER than vmap below a few hundred lanes — batch 8 regressed
    # 48 -> 18 surfaces/s before this guard).
    polish_impl: str = "vmap"
    polish_fused_min_lanes: int = 512


@dataclasses.dataclass(frozen=True)
class SurfaceSpec:
    """Standard benchmark surface: 5 strikes x 3 maturities, all calls
    (synthetic_generator.py:91-93)."""
    rel_strikes: Tuple[float, ...] = (90.0, 95.0, 100.0, 105.0, 110.0)
    maturities: Tuple[float, ...] = (0.25, 0.5, 1.0)
    spot: float = 100.0
    rate: float = 0.03

    @property
    def n_options(self) -> int:
        return len(self.rel_strikes) * len(self.maturities)


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """Synthetic data generator settings (synthetic_generator.py:59-116)."""
    n_samples: int = 500
    ar_alpha: float = 0.9                # day-over-day persistence
    spot_drift: float = 0.0003
    spot_vol: float = 0.01
    market_noise: float = 0.02           # multiplicative price noise
    start_date: str = "2022-01-03"
    surface: SurfaceSpec = SurfaceSpec()
    # Cap sigma_i at feller_margin*sqrt(2 kappa_i theta_i) so ground-truth
    # params are recoverable under the Feller-penalized loss (the
    # reference's raw ranges admit violating draws the calibrator then
    # cannot reach; see data/synthetic.py::enforce_feller).
    # False = raw reference semantics (synthetic_generator.py:75-89).
    enforce_feller: bool = True
    feller_margin: float = 0.90
