"""Adaptable parameter containers, reparameterizations, and the projected momentum
update of Algorithm 2.

Covers both reference parameterizations:
- the paper path adapts (Q, R, q_b) directly with projection clamps
  (reference ``tube_mpc.py:978-984``);
- the generic path adapts unconstrained raw parameters mapped through
  softplus/tanh (reference ``core/params.py:14-59``) with the projection table of
  ``tube_mpc.py:187-224``.

All updates are pure pytree functions so they live inside the jitted closed-loop scan.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array


# ---------------------------------------------------------------------------
# Paper-path adaptable parameters: direct weights with projection.
# ---------------------------------------------------------------------------

class AuxAdapt(NamedTuple):
    """Ancillary weights adapted online in the paper path (Qf is tied to Q)."""

    Q: Array   # [nx]
    R: Array   # [nu]
    qb: Array  # []


def project_aux_adapt(p: AuxAdapt) -> AuxAdapt:
    """Projection of the paper path: Q>=0, R>=1e-4, q_b in [0,1]
    (reference ``tube_mpc.py:982-984``)."""
    return AuxAdapt(
        Q=jnp.maximum(p.Q, 0.0),
        R=jnp.maximum(p.R, 1e-4),
        qb=jnp.clip(p.qb, 0.0, 1.0),
    )


# ---------------------------------------------------------------------------
# Generic-path raw parameters: softplus/tanh reparameterization.
# ---------------------------------------------------------------------------

def softplus(x: Array) -> Array:
    return jax.nn.softplus(x)


def inv_softplus(y: Array) -> Array:
    """Inverse of softplus for initializing raw params from target values."""
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


class RawNominalTheta(NamedTuple):
    """Unconstrained raw nominal parameters (reference ``params.py:14-38``)."""

    Q_raw: Array
    R_raw: Array
    Qf_raw: Array
    qb_raw: Array
    alpha_raw: Array
    gamma_raw: Array
    tight_raw: Array

    def Q(self): return softplus(self.Q_raw)
    def R(self): return softplus(self.R_raw)
    def Qf(self): return softplus(self.Qf_raw)
    def qb(self): return softplus(self.qb_raw)
    def alpha(self): return softplus(self.alpha_raw) + 1e-6
    def gamma(self): return jnp.tanh(self.gamma_raw)
    def tight(self): return softplus(self.tight_raw)


class RawAuxTheta(NamedTuple):
    """Unconstrained raw ancillary parameters (reference ``params.py:41-59``)."""

    Q_raw: Array
    R_raw: Array
    Qf_raw: Array
    qb_raw: Array
    alpha_raw: Array
    gamma_raw: Array

    def Q(self): return softplus(self.Q_raw)
    def R(self): return softplus(self.R_raw)
    def Qf(self): return softplus(self.Qf_raw)
    def qb(self): return softplus(self.qb_raw)
    def alpha(self): return softplus(self.alpha_raw) + 1e-6
    def gamma(self): return jnp.tanh(self.gamma_raw)


# Projection bounds on RAW parameters (reference ``tube_mpc.py:187-224`` projects the
# raw tensors directly). Field name -> (min, max); None = unbounded on that side.
_RAW_PROJECTION: dict = {
    "Q_raw": (0.0, None),
    "Qf_raw": (0.0, None),
    "R_raw": (1e-4, 1e4),
    "qb_raw": (0.0, 1.0),
    "gamma_raw": (-1.0, 1.0),
    "alpha_raw": (0.0, 1.0),
    "tight_raw": (0.0, 2.0),
}


def project_raw(p):
    """Project a Raw*Theta by field name."""
    vals = {}
    for name in p._fields:
        lo, hi = _RAW_PROJECTION.get(name, (None, None))
        v = getattr(p, name)
        if lo is not None or hi is not None:
            v = jnp.clip(v, lo, hi)
        vals[name] = v
    return type(p)(**vals)


# ---------------------------------------------------------------------------
# Projected momentum SGD (Algorithm 2 update rule).
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AdaptConfig:
    """Update hyperparameters (reference ``tube_mpc.py:177-181, 747-752``)."""

    lr: float = 1e-2
    momentum: float = 0.9
    steps: int = 1
    grad_clip_norm: float = 0.0  # 0 disables
    project: bool = True


def momentum_update(params, grads, vel, cfg: AdaptConfig, project_fn=None):
    """One projected momentum step over arbitrary matching pytrees.

        v <- momentum * v + g ;  p <- proj(p - lr * v)

    (reference ``tube_mpc.py:232-249`` and the paper-path inline update ``978-984``).
    Global-norm gradient clipping is applied first when configured.
    """
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        leaves = jax.tree_util.tree_leaves(grads)
        gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in leaves))
        scale = jnp.minimum(1.0, cfg.grad_clip_norm / (gnorm + 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)

    if cfg.momentum and cfg.momentum > 0:
        vel = jax.tree.map(lambda v, g: cfg.momentum * v + g, vel, grads)
        step = vel
    else:
        step = grads

    params = jax.tree.map(lambda p, s: p - cfg.lr * s, params, step)
    if cfg.project and project_fn is not None:
        params = project_fn(params)
    return params, vel
