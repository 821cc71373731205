"""Differentiable iLQR: the solver as an implicit function, via jax.custom_vjp.

This is the piece that makes the TPU design qualitatively different from the reference.
The reference wires its bilevel gradients by hand per experiment: explicit
``ddp_sensitivity`` calls with hand-written upper-gradient callbacks, followed by either
closed-form weight formulas (``tube_mpc.py:963-976``) or an ``ift_gradient`` call, and —
for the coupled nominal adaptation — a second manually-chained sensitivity pass through
the reference trajectories (``tube_mpc.py:505-599``).

Here the solve itself carries a custom VJP whose backward pass IS the O(T)
DDP-sensitivity sweep + IFT accumulation:

    X, U = diff_ilqr(theta, x0, U_init)          # forward: compiled iLQR
    dL/d(theta, x0) via jax.grad(any upper loss) # backward: sensitivity + IFT

Consequences:
- Algorithm-2 adaptation is literally `jax.grad(upper_loss)(theta)`.
- The coupled bilevel path (nominal references feeding the auxiliary problem) needs no
  special code: cotangents flow through the aux solve's VJP into (X_ref, U_ref), then
  through the nominal solve's VJP into theta_bar — exactly the chain the reference
  builds manually, but composed by the chain rule.
- The gradient of the initial state comes for free as δλ_0 (the ξ_θᵀδλ_0 term).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from .ift import ift_accumulate
from .ilqr import ILQRConfig, ilqr_solve
from .ocp import OCP
from .sensitivity import ddp_sensitivity


def make_diff_ilqr(ocp: OCP, cfg: ILQRConfig, *, sens_reg: float = 1e-9,
                   active_tol: float = 1e-8):
    """Return solve(theta, x0, U_init) -> (X, U), differentiable w.r.t. theta and x0.

    U_init is treated as a warm start only (zero cotangent), matching the implicit-
    function view: the solution is a function of (theta, x0), not of the initial guess.
    """

    @jax.custom_vjp
    def solve(theta, x0: Array, U_init: Array) -> Tuple[Array, Array]:
        return ilqr_solve(ocp, cfg, theta, x0, U_init)

    def solve_fwd(theta, x0, U_init):
        X, U = ilqr_solve(ocp, cfg, theta, x0, U_init)
        return (X, U), (theta, x0, X, U, U_init)

    def solve_bwd(res, cotangents):
        theta, x0, X, U, U_init = res
        g_X, g_U = cotangents
        sens = ddp_sensitivity(
            ocp, theta, X, U, g_X, g_U, reg=sens_reg, active_tol=active_tol
        )
        # ∇_θ L: one jax.grad of the IFT accumulation over the theta pytree.
        g_theta = jax.grad(
            lambda th: ift_accumulate(ocp, th, X, U, sens, x0_fn=None)
        )(theta)
        # ∇_{x0} L = δλ_0 (the ξ_θᵀ δλ_0 term with ξ = x0).
        g_x0 = sens.delta_lambda[0]
        g_U_init = jnp.zeros_like(U_init)
        return g_theta, g_x0, g_U_init

    solve.defvjp(solve_fwd, solve_bwd)
    return solve
