"""Ground-truth pricing at native float64 in a CPU-only subprocess.

Benchmark/scaling drivers need noiseless float64 reference prices as SETUP,
but (a) the same pricer x64-EMULATED on TPU costs minutes of XLA compile,
and (b) merely touching the CPU backend inside a TPU process degrades every
subsequent TPU dispatch ~50-90x on the axon tunnel (measured 2026-08-19:
identical search program 2.8 ms vs 106 ms steady with/without prior
``jax.devices("cpu")`` use). The only clean option is a fresh CPU-only
python subprocess; this module is that boundary.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

_CHILD = r"""
import sys, json, os
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np, jax.numpy as jnp
from option_pricing_ffn_lbfgs_tpu.models.double_heston import (
    DHParams, price_options)
d = json.loads(sys.stdin.read())
true = jnp.asarray(d['true'])
spots = jnp.asarray(d['spots'])
strikes = jnp.asarray(d['strikes'])
mats = jnp.asarray(d['mats'])
rate = float(d['rate'])
n_opt = strikes.shape[-1]
out = jax.jit(jax.vmap(lambda v, s, k, m: price_options(
    DHParams.from_vector(v), s, rate, k, m,
    jnp.ones(n_opt, bool))))(true, spots, strikes, mats)
print(json.dumps(np.asarray(out).tolist()))
"""


def price_truth_subprocess(true, spots, strikes, mats,
                           rate: float = 0.03) -> np.ndarray:
    """Price [B, n_opt] all-call surfaces at float64 on the host CPU.

    Args:
      true: [B, 13] ground-truth parameter vectors.
      spots: [B] spot prices.
      strikes, mats: [B, n_opt] per-surface grids (or broadcastable).
    Returns a [B, n_opt] float64 numpy array of noiseless prices.
    """
    true = np.asarray(true, np.float64)
    spots = np.asarray(spots, np.float64)
    strikes = np.broadcast_to(np.asarray(strikes, np.float64),
                              (true.shape[0], np.shape(strikes)[-1]))
    mats = np.broadcast_to(np.asarray(mats, np.float64), strikes.shape)
    payload = json.dumps({
        "true": true.tolist(), "spots": spots.tolist(),
        "strikes": strikes.tolist(), "mats": mats.tolist(), "rate": rate,
    })
    repo_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH=repo_root + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    out = subprocess.run([sys.executable, "-c", _CHILD], input=payload,
                         capture_output=True, text=True, env=env,
                         check=True)
    return np.asarray(json.loads(out.stdout.strip().splitlines()[-1]))
