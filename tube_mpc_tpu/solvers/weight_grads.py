"""Closed-form Algorithm-2 weight gradients from sensitivity directions.

Library form of the fast analytic DOC gradients (reference ``core/gradients.py:27-107``
and the inline paper-path formulas ``tube_mpc.py:963-976``): given the solved
trajectory and δz = (δX, δU) of the ancillary problem, the gradients of the upper loss
w.r.t. the diagonal tracking weights are

    ∇_Q L  = Σ_{k=0..N} 2 (x_k − x̄_k) ⊙ δx_k        (terminal included; Qf tied to Q)
    ∇_R L  = Σ_{k<N}    2 (u_k − ū_k) ⊙ δu_k
    ∇_qb L = Σ_{k=0..N} 2 b_k δb_k

All functions broadcast over leading batch dims. Parity with jax.grad through the
differentiable solver is pinned in tests/test_gradients.py (TestClosedFormWeightGrads).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import Array

from .sensitivity import SensitivityResult


def grads_aux_from_deltas(
    X_aux: Array,    # [..., N+1, nx+1] augmented ancillary trajectory
    U_aux: Array,    # [..., N, nu]
    X_ref: Array,    # [..., N+1, nx] nominal references (physical part)
    U_ref: Array,    # [..., N, nu]
    sens: SensitivityResult,
):
    from ..tube.params import AuxAdapt  # deferred: tube imports solvers at load time

    nx = X_ref.shape[-1]
    dx = X_aux[..., :nx] - X_ref
    du = U_aux - U_ref
    b = X_aux[..., nx]
    gQ = jnp.sum(2.0 * dx * sens.delta_X[..., :nx], axis=-2)
    gR = jnp.sum(2.0 * du * sens.delta_U, axis=-2)
    gqb = jnp.sum(2.0 * b * sens.delta_X[..., nx], axis=-1)
    return AuxAdapt(Q=gQ, R=gR, qb=gqb)


def grads_nominal_from_deltas(
    X_nom: Array,    # [..., N+1, nx+1]
    U_nom: Array,    # [..., N, nu]
    target: Array,   # [..., nx]
    sens: SensitivityResult,
) -> Tuple[Array, Array, Array]:
    """(gQ, gR, gqb) for goal-tracking nominal weights (ref ``gradients.py:27-58``)."""
    nx = target.shape[-1]
    dx = X_nom[..., :nx] - target[..., None, :]
    b = X_nom[..., nx]
    gQ = jnp.sum(2.0 * dx * sens.delta_X[..., :nx], axis=-2)
    gR = jnp.sum(2.0 * U_nom * sens.delta_U, axis=-2)
    gqb = jnp.sum(2.0 * b * sens.delta_X[..., nx], axis=-1)
    return gQ, gR, gqb


def apply_sgd(params, grads, lr: float):
    """Plain SGD appliers (reference ``gradients.py:90-107``); projected momentum
    lives in tube/params.momentum_update."""
    import jax

    return jax.tree.map(lambda p, g: p - lr * g, params, grads)
