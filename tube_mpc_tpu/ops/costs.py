"""Diagonal-quadratic tube-MPC costs with exact derivatives, batched.

Parity with the reference's analytic cost derivatives
(``core/cost_derivs.py:58-146``, ``core/utils.py:55-91``), re-designed so a single
parameterized builder covers both MPC layers:

  nominal  stage:  (Q ⊙ (x-x*))·(x-x*) + (R ⊙ u)·u + q_b b²     (x* = goal, u* = 0)
  auxiliary stage: (Q ⊙ (x-x̄_k))·(x-x̄_k) + (R ⊙ (u-ū_k))·(u-ū_k) + q_b b²
  terminal:        (Qf ⊙ (x_N-ref))·(x_N-ref) + q_b b_N²

Weights are runtime pytrees (adapted online / differentiated by IFT). References are
runtime arrays too (the nominal plan feeds the auxiliary tracker and gradients flow
through it in the coupled bilevel mode). Everything broadcasts over batch dims.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from .linalg import _diag_embed


class CostWeights(NamedTuple):
    """Diagonal quadratic weights for one MPC layer (a differentiable pytree)."""

    Q: Array   # [nx]  stage state weights
    R: Array   # [nu]  stage control weights
    Qf: Array  # [nx]  terminal state weights
    qb: Array  # []    barrier-state weight (stage and terminal)

    @staticmethod
    def create(Q, R, Qf, qb, dtype=jnp.float32) -> "CostWeights":
        return CostWeights(
            Q=jnp.asarray(Q, dtype=dtype),
            R=jnp.asarray(R, dtype=dtype),
            Qf=jnp.asarray(Qf, dtype=dtype),
            qb=jnp.asarray(qb, dtype=dtype),
        )


def stage_cost(x_hat: Array, u: Array, w: CostWeights, x_ref: Array, u_ref: Array) -> Array:
    """Scalar stage cost; x_hat [..., nx+1] = [x, b]. (``cost_derivs.py:110-130``.)"""
    x, b = x_hat[..., :-1], x_hat[..., -1]
    dx = x - x_ref
    du = u - u_ref
    return (
        jnp.sum(w.Q * dx * dx, axis=-1)
        + jnp.sum(w.R * du * du, axis=-1)
        + w.qb * b * b
    )


def terminal_cost(x_hat_N: Array, w: CostWeights, x_ref_N: Array) -> Array:
    """Terminal cost incl. the paper's q_b·b_N² term (``tube_mpc.py:829-832``)."""
    x, b = x_hat_N[..., :-1], x_hat_N[..., -1]
    dx = x - x_ref_N
    return jnp.sum(w.Qf * dx * dx, axis=-1) + w.qb * b * b


def stage_derivs(x_hat: Array, u: Array, w: CostWeights, x_ref: Array, u_ref: Array):
    """(l_x, l_u, l_xx, l_uu, l_ux) exactly (``cost_derivs.py:110-130``), batched."""
    x, b = x_hat[..., :-1], x_hat[..., -1]
    dx = x - x_ref
    du = u - u_ref
    l_x = jnp.concatenate([2.0 * w.Q * dx, (2.0 * w.qb * b)[..., None]], axis=-1)
    l_u = 2.0 * w.R * du
    qb_col = jnp.broadcast_to(2.0 * w.qb, b.shape)[..., None]
    l_xx = _diag_embed(jnp.concatenate([jnp.broadcast_to(2.0 * w.Q, dx.shape), qb_col], axis=-1))
    l_uu = _diag_embed(jnp.broadcast_to(2.0 * w.R, du.shape))
    l_ux = jnp.zeros(du.shape[:-1] + (u.shape[-1], x_hat.shape[-1]), dtype=x_hat.dtype)
    return l_x, l_u, l_xx, l_uu, l_ux


def terminal_derivs(x_hat_N: Array, w: CostWeights, x_ref_N: Array):
    """(phi_x, phi_xx) incl. barrier terminal terms (``tube_mpc.py:837-842``), batched."""
    x, b = x_hat_N[..., :-1], x_hat_N[..., -1]
    dx = x - x_ref_N
    phi_x = jnp.concatenate([2.0 * w.Qf * dx, (2.0 * w.qb * b)[..., None]], axis=-1)
    qb_col = jnp.broadcast_to(2.0 * w.qb, b.shape)[..., None]
    phi_xx = _diag_embed(jnp.concatenate([jnp.broadcast_to(2.0 * w.Qf, dx.shape), qb_col], axis=-1))
    return phi_x, phi_xx


def wrap_angle(err: Array) -> Array:
    """Map angle error to (-pi, pi] (reference ``run_nominal.py:32-34``)."""
    return jnp.arctan2(jnp.sin(err), jnp.cos(err))
