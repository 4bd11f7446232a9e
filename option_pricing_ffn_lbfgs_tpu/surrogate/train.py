"""Two-stage FFN training (docs/METHODOLOGY.md:91-110, unshipped upstream).

Stage 1 pretrains on synthetic data (Adam lr=1e-3, batch 256, early stop
patience 15, 85/15 split); stage 2 fine-tunes on L-BFGS calibration results
(lr=1e-5, batch 32, <=50 epochs, patience 10). Loss is MSE in scaled
unconstrained-parameter space (log for positive params, arctanh for rho —
see ffn.py docstring).

Each epoch runs as one jitted ``lax.scan`` over shuffled minibatches; the
early-stopping control loop stays in Python (host-side, cheap).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..calibration.transforms import inverse_transform
from ..data.synthetic import SyntheticDataset
from .features import extract_features
from .ffn import SurrogateFFN, init_ffn
from .scalers import StandardScaler


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    batch_size: int = 256
    max_epochs: int = 200
    patience: int = 15
    val_fraction: float = 0.15
    seed: int = 0


FINETUNE = TrainConfig(learning_rate=1e-5, batch_size=32, max_epochs=50,
                       patience=10)


class TrainedSurrogate(NamedTuple):
    """Everything needed for inference: variables + fitted scalers."""
    variables: dict
    feature_scaler: StandardScaler
    target_scaler: StandardScaler

    def predict_x(self, market_prices, spot):
        """Surface -> unconstrained 13-vector(s) (the L-BFGS warm start)."""
        model = SurrogateFFN()
        feats = extract_features(market_prices, spot)
        fs = self.feature_scaler.transform(feats).astype(jnp.float32)
        scaled = model.apply(self.variables, fs, train=False)
        return self.target_scaler.inverse_transform(scaled)

    def predict_params(self, market_prices, spot):
        """Surface -> constrained parameter vector(s)."""
        from ..calibration.transforms import transform
        return transform(self.predict_x(market_prices, spot))


def dataset_to_xy(ds: SyntheticDataset) -> Tuple[np.ndarray, np.ndarray]:
    """Features from noisy market prices; targets in unconstrained space."""
    feats = np.asarray(extract_features(ds.market_prices, ds.spots))
    targets = np.asarray(jax.vmap(inverse_transform)(ds.params))
    return feats, targets


def _epoch_fns(model, tx):
    @jax.jit
    def train_epoch(variables, opt_state, xb, yb, key):
        """One scan over the epoch's minibatches. xb/yb: [n_batches, B, d]."""
        def step(carry, batch):
            variables, opt_state, key = carry
            x, y = batch
            key, dkey = jax.random.split(key)

            def loss_fn(params):
                out, updates = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": dkey})
                return jnp.mean((out - y) ** 2), updates["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(variables["params"])
            updates, opt_state = tx.update(grads, opt_state,
                                           variables["params"])
            params = optax.apply_updates(variables["params"], updates)
            return ({"params": params, "batch_stats": new_bs}, opt_state,
                    key), loss

        (variables, opt_state, _), losses = jax.lax.scan(
            step, (variables, opt_state, key), (xb, yb))
        return variables, opt_state, jnp.mean(losses)

    @jax.jit
    def eval_loss(variables, x, y):
        out = model.apply(variables, x, train=False)
        return jnp.mean((out - y) ** 2)

    return train_epoch, eval_loss


def fit(features: np.ndarray, targets: np.ndarray,
        config: TrainConfig = TrainConfig(),
        init: Optional[TrainedSurrogate] = None,
        verbose: bool = False) -> Tuple[TrainedSurrogate, dict]:
    """Train (or fine-tune, via ``init``) the surrogate.

    Returns (TrainedSurrogate, history dict). Scalers are refit on this
    call's data only when training from scratch; fine-tuning keeps the
    pretrained scalers so the feature/target spaces stay consistent.
    """
    # Guard against NaN/Inf rows (e.g. failed calibrations fed as finetune
    # targets — inverse_transform of non-finite params is NaN and a single
    # such row poisons every minibatch it lands in; this silently zeroed out
    # the round-2 finetune stage, see results/models/training_history.json
    # history). Drop them loudly rather than train on garbage.
    finite = (np.isfinite(features).all(axis=1)
              & np.isfinite(targets).all(axis=1))
    n_bad = int((~finite).sum())
    if n_bad:
        import logging
        logging.getLogger(__name__).warning(
            "fit(): dropping %d/%d non-finite training rows", n_bad,
            features.shape[0])
        features, targets = features[finite], targets[finite]
    if features.shape[0] < 2:
        raise ValueError("fit(): fewer than 2 finite training rows")

    rng = np.random.default_rng(config.seed)
    n = features.shape[0]
    perm = rng.permutation(n)
    n_val = max(1, int(n * config.val_fraction))
    val_idx, tr_idx = perm[:n_val], perm[n_val:]

    if init is None:
        fscaler = StandardScaler.fit(features[tr_idx])
        tscaler = StandardScaler.fit(targets[tr_idx])
    else:
        fscaler, tscaler = init.feature_scaler, init.target_scaler

    fx = np.asarray(fscaler.transform(features), np.float32)
    ty = np.asarray(tscaler.transform(targets), np.float32)
    x_tr, y_tr = fx[tr_idx], ty[tr_idx]
    x_val, y_val = fx[val_idx], ty[val_idx]

    model = SurrogateFFN()
    if init is None:
        _, variables = init_ffn(jax.random.key(config.seed))
    else:
        variables = init.variables
    tx = optax.adam(config.learning_rate)
    opt_state = tx.init(variables["params"])
    train_epoch, eval_loss = _epoch_fns(model, tx)

    bsz = min(config.batch_size, x_tr.shape[0])
    n_batches = x_tr.shape[0] // bsz
    best_val, best_vars, since_best = np.inf, variables, 0
    hist = {"train_loss": [], "val_loss": []}
    key = jax.random.key(config.seed + 1)

    for epoch in range(config.max_epochs):
        order = rng.permutation(x_tr.shape[0])[: n_batches * bsz]
        xb = jnp.asarray(x_tr[order].reshape(n_batches, bsz, -1))
        yb = jnp.asarray(y_tr[order].reshape(n_batches, bsz, -1))
        key, ekey = jax.random.split(key)
        variables, opt_state, tr_loss = train_epoch(variables, opt_state,
                                                    xb, yb, ekey)
        val = float(eval_loss(variables, jnp.asarray(x_val),
                              jnp.asarray(y_val)))
        if not (np.isfinite(float(tr_loss)) and np.isfinite(val)):
            # A NaN epoch means diverged optimization or bad data that the
            # row filter above missed — failing loudly beats the round-2
            # failure mode (10 silently-logged NaN epochs returning the
            # init weights as "trained").
            raise FloatingPointError(
                f"fit(): non-finite loss at epoch {epoch} "
                f"(train={float(tr_loss)}, val={val})")
        hist["train_loss"].append(float(tr_loss))
        hist["val_loss"].append(val)
        if verbose:
            print(f"epoch {epoch}: train {float(tr_loss):.5f} val {val:.5f}")
        if val < best_val - 1e-7:
            best_val, best_vars, since_best = val, variables, 0
        else:
            since_best += 1
            if since_best >= config.patience:
                break

    return TrainedSurrogate(variables=jax.tree.map(np.asarray, best_vars),
                            feature_scaler=fscaler,
                            target_scaler=tscaler), hist


def pretrain_and_finetune(pretrain_ds: SyntheticDataset,
                          finetune_ds: SyntheticDataset,
                          pre_config: TrainConfig = TrainConfig(),
                          fine_config: TrainConfig = FINETUNE,
                          verbose: bool = False):
    """The documented two-stage pipeline in one call."""
    fx, fy = dataset_to_xy(pretrain_ds)
    stage1, h1 = fit(fx, fy, pre_config, verbose=verbose)
    gx, gy = dataset_to_xy(finetune_ds)
    stage2, h2 = fit(gx, gy, fine_config, init=stage1, verbose=verbose)
    return stage2, {"pretrain": h1, "finetune": h2}


def save_surrogate(path, s: TrainedSurrogate) -> None:
    import pickle
    with open(path, "wb") as f:
        pickle.dump({"variables": s.variables,
                     "feature_scaler": s.feature_scaler,
                     "target_scaler": s.target_scaler}, f)


def load_surrogate(path) -> TrainedSurrogate:
    import pickle
    with open(path, "rb") as f:
        d = pickle.load(f)
    return TrainedSurrogate(d["variables"], d["feature_scaler"],
                            d["target_scaler"])
