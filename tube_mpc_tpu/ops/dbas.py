"""Generic DBaS augmentation: lift any System to its barrier-augmented form.

Where the reference hand-writes the augmented Jacobian for Dubins only
(``core/systems/dubins_aug_jac.py:61-139``), the chain rule is system-agnostic, so it is
written once here and reused by every system:

    x̂ = [x, b],   x̂⁺ = [ f(x,u),  B(h(f(x,u))) - γ (B(h(x)) - b) ]

    ∂b⁺/∂x = B'(h⁺) ∇h(x⁺)ᵀ A  -  γ B'(h) ∇h(x)ᵀ        (A = ∂f/∂x)
    ∂b⁺/∂u = B'(h⁺) ∇h(x⁺)ᵀ B                            (B = ∂f/∂u)
    ∂b⁺/∂b = γ

Barrier parameters (alpha, gamma, tight) are a runtime pytree so they can be adapted
online and differentiated through via IFT. Constraint tightening enters as
h̄(x) = h(x) - tight (reference ``tube_mpc.py:151-153``); unlike the reference — whose
Jacobian path ignores tightening (``tube_mpc.py:315-318`` passes untightened h) — the
augmented value and Jacobian here use the same h̄ consistently. All functions broadcast
over leading batch dims.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax.numpy as jnp
from jax import Array

from ..systems.base import System
from .barrier import barrier_deriv, barrier_value


class BarrierParams(NamedTuple):
    """Runtime (adaptable, differentiable) DBaS parameters."""

    alpha: Array  # [] relaxation width, >= 0
    gamma: Array  # [] feedback gain in [-1, 1]
    tight: Array  # [] nominal constraint tightening s >= 0 (0 disables)

    @staticmethod
    def create(alpha=0.0, gamma=0.0, tight=0.0, dtype=jnp.float32) -> "BarrierParams":
        return BarrierParams(
            alpha=jnp.asarray(alpha, dtype=dtype),
            gamma=jnp.asarray(gamma, dtype=dtype),
            tight=jnp.asarray(tight, dtype=dtype),
        )


class AugmentedDynamics(NamedTuple):
    """Static bundle of the augmented step and its analytic Jacobian.

    f_hat:     (x_hat [..., nx+1], u [..., nu], bp) -> x_hat_next [..., nx+1]
    f_hat_jac: (x_hat, u, bp) -> (A [..., nx+1, nx+1], B [..., nx+1, nu])
    h_eff:     (x [..., nx], bp) -> [...]  (tightened safety value)
    init_b0:   (x0 [..., nx], bp) -> [...]
    """

    f_hat: Callable
    f_hat_jac: Callable
    h_eff: Callable
    init_b0: Callable
    nx_hat: int
    nu: int


def make_augmented(
    system: System,
    *,
    barrier_type: str = "inverse",
    eps: float = 1e-6,
) -> AugmentedDynamics:
    """Build the DBaS-augmented dynamics + analytic Jacobians for `system`."""
    if system.h is None:
        raise ValueError(f"System {system.name} needs a safety function h for DBaS")
    f = system.f
    f_jac = system.jacobians()
    h = system.h
    h_grad = system.safety_grad()
    nx = system.nx

    def h_eff(x: Array, bp: BarrierParams) -> Array:
        return h(x) - bp.tight

    def f_hat(x_hat: Array, u: Array, bp: BarrierParams) -> Array:
        x, b = x_hat[..., :nx], x_hat[..., nx]
        x_next = f(x, u)
        b_next_barrier = barrier_value(h_eff(x_next, bp), bp.alpha, barrier_type=barrier_type, eps=eps)
        b_curr_barrier = barrier_value(h_eff(x, bp), bp.alpha, barrier_type=barrier_type, eps=eps)
        b_next = b_next_barrier - bp.gamma * (b_curr_barrier - b)
        return jnp.concatenate([x_next, b_next[..., None]], axis=-1)

    def f_hat_jac(x_hat: Array, u: Array, bp: BarrierParams) -> Tuple[Array, Array]:
        x = x_hat[..., :nx]
        A3, B3 = f_jac(x, u)                       # [..., nx, nx], [..., nx, nu]
        x_next = f(x, u)

        h_curr = h_eff(x, bp)
        h_next = h_eff(x_next, bp)
        dh_curr = h_grad(x)                        # [..., nx]
        dh_next = h_grad(x_next)                   # [..., nx]
        dB_curr = barrier_deriv(h_curr, bp.alpha, barrier_type=barrier_type, eps=eps)
        dB_next = barrier_deriv(h_next, bp.alpha, barrier_type=barrier_type, eps=eps)

        # row_x = dBn * dhnᵀ A3 - γ dBc * dhcᵀ ; row_u = dBn * dhnᵀ B3
        dhnA = jnp.einsum("...i,...ij->...j", dh_next, A3)
        dhnB = jnp.einsum("...i,...ij->...j", dh_next, B3)
        row_x = dB_next[..., None] * dhnA - bp.gamma * dB_curr[..., None] * dh_curr
        row_u = dB_next[..., None] * dhnB

        batch = row_x.shape[:-1]
        gamma_col = jnp.broadcast_to(bp.gamma.astype(row_x.dtype), batch + (1,))
        zeros_col = jnp.zeros(batch + (nx, 1), dtype=row_x.dtype)

        A_top = jnp.concatenate([A3, zeros_col], axis=-1)                    # [..., nx, nx+1]
        A_bot = jnp.concatenate([row_x, gamma_col], axis=-1)[..., None, :]   # [..., 1, nx+1]
        A = jnp.concatenate([A_top, A_bot], axis=-2)                         # [..., nx+1, nx+1]
        B = jnp.concatenate([B3, row_u[..., None, :]], axis=-2)              # [..., nx+1, nu]
        return A, B

    def init_b0(x0: Array, bp: BarrierParams) -> Array:
        return barrier_value(h_eff(x0, bp), bp.alpha, barrier_type=barrier_type, eps=eps)

    return AugmentedDynamics(
        f_hat=f_hat,
        f_hat_jac=f_hat_jac,
        h_eff=h_eff,
        init_b0=init_b0,
        nx_hat=nx + 1,
        nu=system.nu,
    )
