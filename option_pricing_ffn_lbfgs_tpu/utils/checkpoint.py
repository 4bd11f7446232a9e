"""Checkpoint / persistence for calibration outputs and surrogate state.

The reference's only persistence is a pickled list of CalibrationResult
(synthetic_generator.py:181-183). Here: npz-based save/load for batch
calibration outputs keyed by surface id (L-BFGS state itself is tiny and
lives in the while_loop carry — no mid-run checkpointing is ever needed for
13-parameter problems), plus orbax-backed checkpointing for the surrogate
when available.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def save_batch_calibration(path: str, out, surface_ids=None,
                           metadata: Optional[dict] = None) -> None:
    """Persist a BatchCalibration (or any NamedTuple of arrays) to npz."""
    arrays = {k: np.asarray(v) for k, v in out._asdict().items()}
    if surface_ids is not None:
        arrays["surface_ids"] = np.asarray(surface_ids)
    np.savez_compressed(path, **arrays)
    if metadata:
        with open(str(path) + ".meta.json", "w") as f:
            json.dump(metadata, f, indent=2)


def load_batch_calibration(path: str):
    """Load a saved batch calibration as a dict of arrays."""
    p = str(path) if str(path).endswith(".npz") else str(path) + ".npz"
    with np.load(p) as z:
        return {k: z[k] for k in z.files}


def save_surrogate_orbax(ckpt_dir: str, surrogate) -> bool:
    """Orbax checkpoint of the surrogate variables; returns False if orbax
    is unavailable (the pickle path in surrogate/train.py always works)."""
    try:
        import orbax.checkpoint as ocp
    except Exception:
        return False
    path = os.path.abspath(ckpt_dir)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "variables"), surrogate.variables,
               force=True)
    ckptr.wait_until_finished()
    np.savez(os.path.join(path, "scalers.npz"),
             f_mean=surrogate.feature_scaler.mean_,
             f_scale=surrogate.feature_scaler.scale_,
             t_mean=surrogate.target_scaler.mean_,
             t_scale=surrogate.target_scaler.scale_)
    return True


def load_surrogate_orbax(ckpt_dir: str, like_variables):
    """Restore surrogate state saved by save_surrogate_orbax."""
    import orbax.checkpoint as ocp
    from ..surrogate.scalers import StandardScaler
    from ..surrogate.train import TrainedSurrogate
    path = os.path.abspath(ckpt_dir)
    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(os.path.join(path, "variables"),
                              like_variables)
    with np.load(os.path.join(path, "scalers.npz")) as z:
        fs = StandardScaler(z["f_mean"], z["f_scale"])
        ts = StandardScaler(z["t_mean"], z["t_scale"])
    return TrainedSurrogate(variables=variables, feature_scaler=fs,
                            target_scaler=ts)
