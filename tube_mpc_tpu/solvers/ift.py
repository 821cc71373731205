"""Implicit-function-theorem gradient accumulation (Theorem-5 style).

Turns the sensitivity directions δz = (δX, δU, δλ) into ∇_θ L via

    ∇_θ L = ξ_θᵀ δλ_0
          + Σ_k ( ℒ_{θx}^{(k)} δx_k + ℒ_{θu}^{(k)} δu_k + f_θᵀ δλ_{k+1} )
          + φ_{θx} δx_N

(reference ``core/ift.py:35-92``). The reference loops per-step torch.autograd.grad
VJPs; here the whole accumulation is a single scalar function of the parameter pytree —
per-step terms horizon-parallel under vmap — and ONE ``jax.grad`` produces the full
structured gradient, for any theta pytree (weights, barrier params, references, ...).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import Array

from .ocp import OCP
from .sensitivity import SensitivityResult


def ift_accumulate(ocp: OCP, theta, X: Array, U: Array, sens: SensitivityResult,
                   x0_fn: Optional[Callable] = None) -> Array:
    """The scalar IFT accumulation as a function of theta (differentiable in theta).

    x0_fn(theta) supplies ξ(θ) when the initial state depends on parameters; when None
    the δλ_0ᵀξ term is a constant and contributes nothing to ∇_θ.
    """
    dX, dU, dlam = sens.delta_X, sens.delta_U, sens.delta_lambda
    N = U.shape[0]
    ks = jnp.arange(N)

    xi = x0_fn(theta) if x0_fn is not None else jax.lax.stop_gradient(X[0])
    total = jnp.vdot(dlam[0], xi)

    def per_step(x, u, k, dx, du, dlam_next):
        l_x = jax.grad(ocp.stage_cost, argnums=0)(x, u, k, theta)
        l_u = jax.grad(ocp.stage_cost, argnums=1)(x, u, k, theta)
        return (
            jnp.vdot(l_x, dx)
            + jnp.vdot(l_u, du)
            + jnp.vdot(dlam_next, ocp.f(x, u, theta))
        )

    steps = jax.vmap(per_step)(X[:-1], U, ks, dX[:-1], dU, dlam[1:])
    total = total + jnp.sum(steps)

    phi_x = jax.grad(ocp.terminal_cost, argnums=0)(X[-1], theta)
    total = total + jnp.vdot(phi_x, dX[-1])
    return total


def ift_gradient(ocp: OCP, theta, X: Array, U: Array, sens: SensitivityResult,
                 x0_fn: Optional[Callable] = None):
    """∇_θ L as a pytree matching theta (reference ``ift.py:35-92`` in one jax.grad)."""
    return jax.grad(lambda th: ift_accumulate(ocp, th, X, U, sens, x0_fn))(theta)
