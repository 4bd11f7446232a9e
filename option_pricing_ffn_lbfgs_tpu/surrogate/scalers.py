"""Standard (z-score) scalers for FFN inputs/targets.

The reference pipeline pickles sklearn scalers to results/data/scalers.pkl
(expected by tests/test_suite.py:172-184 as a dict with 'feature_scaler'
(11-dim) and 'target_scaler' (13-dim)). This is a dependency-free jnp
implementation with the same mean/scale semantics and a compatible pickle
layout.
"""
from __future__ import annotations

import pickle
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class StandardScaler(NamedTuple):
    mean_: np.ndarray
    scale_: np.ndarray

    @classmethod
    def fit(cls, x) -> "StandardScaler":
        x = np.asarray(x)
        scale = x.std(axis=0)
        return cls(mean_=x.mean(axis=0),
                   scale_=np.where(scale > 0, scale, 1.0))

    def transform(self, x):
        return (jnp.asarray(x) - self.mean_) / self.scale_

    def inverse_transform(self, x):
        return jnp.asarray(x) * self.scale_ + self.mean_

    @property
    def n_features_in_(self) -> int:
        return int(self.mean_.shape[-1])


def save_scalers(path, feature_scaler: StandardScaler,
                 target_scaler: StandardScaler) -> None:
    """Pickle layout matching the reference's scalers.pkl expectations."""
    with open(path, "wb") as f:
        pickle.dump({"feature_scaler": feature_scaler,
                     "target_scaler": target_scaler}, f)


def load_scalers(path):
    with open(path, "rb") as f:
        d = pickle.load(f)
    return d["feature_scaler"], d["target_scaler"]
