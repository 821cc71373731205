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


def _implicit_bwd(ocp: OCP, sens_reg: float, active_tol: float,
                  theta, x0, X, U, g_X, g_U, exact_hessians: bool = False):
    """Shared backward pass: DDP sensitivity + IFT accumulation at a KKT point (X, U).

    Returns (g_theta, g_x0). Used both by the solver VJP and by the fixed-trajectory
    re-gradient (the reference's inner adaptation loop, ``tube_mpc.py:407-604``)."""
    sens = ddp_sensitivity(
        ocp, theta, X, U, g_X, g_U, reg=sens_reg, active_tol=active_tol,
        exact_hessians=exact_hessians,
    )
    # ∇_θ L: one jax.grad of the IFT accumulation over the theta pytree.
    g_theta = jax.grad(
        lambda th: ift_accumulate(ocp, th, X, U, sens, x0_fn=None)
    )(theta)
    # ∇_{x0} L = δλ_0 (the ξ_θᵀ δλ_0 term with ξ = x0).
    g_x0 = sens.delta_lambda[0]
    return g_theta, g_x0


def make_diff_ilqr(ocp: OCP, cfg: ILQRConfig, *, sens_reg: float = 1e-9,
                   active_tol: float = 1e-8, exact_hessians: bool = False):
    """Return solve(theta, x0, U_init) -> (X, U), differentiable w.r.t. theta and x0.

    U_init is treated as a warm start only (zero cotangent), matching the implicit-
    function view: the solution is a function of (theta, x0), not of the initial guess.

    exact_hessians=True uses the true Lagrangian curvature in the backward pass
    (exact solution-map derivatives); False keeps the reference's Gauss-Newton
    semantics — see ddp_sensitivity.
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
        g_theta, g_x0 = _implicit_bwd(ocp, sens_reg, active_tol,
                                      theta, x0, X, U, g_X, g_U, exact_hessians)
        return g_theta, g_x0, jnp.zeros_like(U_init)

    solve.defvjp(solve_fwd, solve_bwd)
    return solve


def make_ift_regrad(ocp: OCP, *, sens_reg: float = 1e-9, active_tol: float = 1e-8,
                    exact_hessians: bool = False):
    """Gradient-at-a-fixed-solution: regrad(theta, x0, X, U) -> (X, U) (identity
    forward) whose VJP runs the DDP-sensitivity + IFT backward at the GIVEN (X, U)
    using the GIVEN theta's Hessians.

    TPU-native form of the reference's inner adaptation loop
    (``tube_mpc.py:407``: ``for _ in range(adapt_steps)``), which repeats
    (δz solve → IFT gradient → θ update) on the trajectories from the ORIGINAL
    solves while θ moves between inner iterations. Composing the upper loss on
    regrad's outputs and calling jax.grad reproduces that semantics — including the
    coupled nominal chain, since cotangents flow through the fixed aux trajectories
    into (X_ref, U_ref) and on through the fixed nominal trajectories into θ̄
    (``tube_mpc.py:505-599``)."""

    @jax.custom_vjp
    def regrad(theta, x0: Array, X: Array, U: Array) -> Tuple[Array, Array]:
        return X, U

    def regrad_fwd(theta, x0, X, U):
        return (X, U), (theta, x0, X, U)

    def regrad_bwd(res, cotangents):
        theta, x0, X, U = res
        g_X, g_U = cotangents
        g_theta, g_x0 = _implicit_bwd(ocp, sens_reg, active_tol,
                                      theta, x0, X, U, g_X, g_U, exact_hessians)
        return g_theta, g_x0, jnp.zeros_like(X), jnp.zeros_like(U)

    regrad.defvjp(regrad_fwd, regrad_bwd)
    return regrad
