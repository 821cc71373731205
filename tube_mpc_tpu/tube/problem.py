"""Assemble the two tube-MPC OCP layers from (system, DBaS augmentation, weights).

This is where system/barrier specificity is injected into the generic solver — the role
of the reference's closure-building code in ``core/tube_mpc.py:268-319`` (nominal) and
``tube_mpc.py:348-399`` (auxiliary), re-designed with an explicit theta pytree:

  Nominal (Problem 5):   theta = NominalTheta(w, bp)
      stage: (Q⊙(x-x*))·(x-x*) + (R⊙u)·u + q_b b²,  terminal with Qf and q_b b_N²
  Auxiliary (Problem 6): theta = AuxTheta(w, bp, X_ref, U_ref)
      stage: tracking of (X_ref, U_ref) with the same structure.

The references live INSIDE the aux theta, so gradients flow to them through the
diff-iLQR custom_vjp — that is the entire coupled-bilevel mechanism.

Optional angle wrapping (for receding-horizon runs with heading targets, reference
``run_nominal.py:32-34, 130-158``) is applied by locally re-anchoring the reference
angle so both the cost and its analytic derivatives see the wrapped error.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
from jax import Array

from ..ops import costs as C
from ..ops.dbas import AugmentedDynamics, BarrierParams
from ..solvers.ocp import OCP
from ..systems.base import System


class NominalTheta(NamedTuple):
    w: C.CostWeights
    bp: BarrierParams


class AuxTheta(NamedTuple):
    w: C.CostWeights
    bp: BarrierParams
    X_ref: Array  # [N+1, nx]  physical part of the nominal plan
    U_ref: Array  # [N, nu]


def _wrap_ref(x: Array, ref: Array, angle_dims: Tuple[int, ...]) -> Array:
    """Re-anchor reference angles so (x - ref') is the wrapped error.

    ref'[i] = x[i] - wrap(x[i] - ref[i]) for angle dims i; identical to feeding a
    locally wrapped target into the quadratic cost (reference ``run_nominal.py:140-158``).
    """
    if not angle_dims:
        return ref
    ref_out = ref
    for i in angle_dims:
        wrapped = x[..., i] - C.wrap_angle(x[..., i] - ref[..., i])
        ref_out = ref_out.at[..., i].set(wrapped)
    return ref_out


def make_nominal_ocp(
    system: System,
    aug: AugmentedDynamics,
    target: Array,
    *,
    angle_dims: Tuple[int, ...] = (),
    feasible_h: bool = False,
) -> OCP:
    """Goal-reaching OCP on the augmented state (reference Problem 5 closures)."""
    nx = system.nx
    u_ref0 = jnp.zeros((system.nu,), dtype=target.dtype)

    def f(x_hat, u, th: NominalTheta):
        return aug.f_hat(x_hat, u, th.bp)

    def f_jac(x_hat, u, th: NominalTheta):
        return aug.f_hat_jac(x_hat, u, th.bp)

    def _target(x_hat):
        return _wrap_ref(x_hat[..., :nx], target, angle_dims)

    def stage_cost(x_hat, u, k, th: NominalTheta):
        return C.stage_cost(x_hat, u, th.w, _target(x_hat), u_ref0)

    def terminal_cost(x_hat_N, th: NominalTheta):
        return C.terminal_cost(x_hat_N, th.w, _target(x_hat_N))

    def stage_derivs(x_hat, u, k, th: NominalTheta):
        return C.stage_derivs(x_hat, u, th.w, _target(x_hat), u_ref0)

    def terminal_derivs(x_hat_N, th: NominalTheta):
        return C.terminal_derivs(x_hat_N, th.w, _target(x_hat_N))

    feasible = None
    if feasible_h:
        def feasible(x_hat, k, th: NominalTheta):  # noqa: F811
            return aug.h_eff(x_hat[..., :nx], th.bp) > 0.0

    return OCP(
        f=f,
        f_jac=f_jac,
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        stage_derivs=stage_derivs,
        terminal_derivs=terminal_derivs,
        u_min=system.u_min,
        u_max=system.u_max,
        feasible=feasible,
    )


def make_aux_ocp(
    system: System,
    aug: AugmentedDynamics,
    *,
    angle_dims: Tuple[int, ...] = (),
) -> OCP:
    """Tracking OCP on the augmented state (reference Problem 6 closures).

    Stage k tracks (X_ref[k], U_ref[k]); terminal tracks X_ref[N] with Qf.
    """
    nx = system.nx

    def f(x_hat, u, th: AuxTheta):
        return aug.f_hat(x_hat, u, th.bp)

    def f_jac(x_hat, u, th: AuxTheta):
        return aug.f_hat_jac(x_hat, u, th.bp)

    def stage_cost(x_hat, u, k, th: AuxTheta):
        x_ref = _wrap_ref(x_hat[..., :nx], th.X_ref[k], angle_dims)
        return C.stage_cost(x_hat, u, th.w, x_ref, th.U_ref[k])

    def terminal_cost(x_hat_N, th: AuxTheta):
        x_ref = _wrap_ref(x_hat_N[..., :nx], th.X_ref[-1], angle_dims)
        return C.terminal_cost(x_hat_N, th.w, x_ref)

    def stage_derivs(x_hat, u, k, th: AuxTheta):
        x_ref = _wrap_ref(x_hat[..., :nx], th.X_ref[k], angle_dims)
        return C.stage_derivs(x_hat, u, th.w, x_ref, th.U_ref[k])

    def terminal_derivs(x_hat_N, th: AuxTheta):
        x_ref = _wrap_ref(x_hat_N[..., :nx], th.X_ref[-1], angle_dims)
        return C.terminal_derivs(x_hat_N, th.w, x_ref)

    return OCP(
        f=f,
        f_jac=f_jac,
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        stage_derivs=stage_derivs,
        terminal_derivs=terminal_derivs,
        u_min=system.u_min,
        u_max=system.u_max,
    )
