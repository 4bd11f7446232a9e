"""FFN surrogate: option-surface features -> 13 model parameters.

Architecture per the reference docs (docs/THEORY.md:217-231): Dense
512/256/128/64 with BatchNorm + Dropout(0.3/0.3/0.2/0.2) + ReLU, linear
13-unit output; input is the 11-feature surface summary. The reference
ships no training code or weights (SURVEY.md §2.4) — this is the shipped
implementation, in Flax.

Targets are trained in "log space" for the positive parameters and raw for
rho1/rho2/mu_j (docs/METHODOLOGY.md:99-101), i.e. exactly the calibrator's
unconstrained coordinates minus the tanh: here we reuse the calibrator's
full unconstrained transform (arctanh for rho) so FFN outputs feed the
L-BFGS warm start directly and are guaranteed to invert to valid parameters.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .features import N_FEATURES

N_PARAMS = 13
HIDDEN = (512, 256, 128, 64)
DROPOUT = (0.3, 0.3, 0.2, 0.2)


class SurrogateFFN(nn.Module):
    """Dense 512/256/128/64 -> 13, BatchNorm + Dropout + ReLU per block."""
    hidden: Sequence[int] = HIDDEN
    dropout: Sequence[float] = DROPOUT

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for width, rate in zip(self.hidden, self.dropout):
            x = nn.Dense(width)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.Dropout(rate, deterministic=not train)(x)
            x = nn.relu(x)
        return nn.Dense(N_PARAMS)(x)


def init_ffn(key, dtype=jnp.float32):
    """Initialize model variables; returns (module, variables)."""
    model = SurrogateFFN()
    variables = model.init(key, jnp.zeros((1, N_FEATURES), dtype), train=False)
    return model, variables


def count_params(variables) -> int:
    import jax
    return sum(x.size for x in jax.tree.leaves(variables["params"]))
