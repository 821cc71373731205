"""OCP problem definition for the TPU-native solvers.

Generalizes the reference's callback protocol (``core/ddp.py:102-117`` keyword
callbacks, ``core/ocp.py:10-25`` protocols) into a single static bundle of pure JAX
callables over an explicit runtime parameter pytree ``theta``:

    f(x, u, theta)             -> x_next
    f_jac(x, u, theta)         -> (A, B)
    stage_cost(x, u, k, theta) -> scalar          (k is a traced int32)
    terminal_cost(xN, theta)   -> scalar
    stage_derivs / terminal_derivs: exact derivatives (autodiff-filled if omitted)

Making ``theta`` explicit (instead of the reference's Python closures over detached
tensors, ``core/tube_mpc.py:268-319``) is what lets the whole solver be jitted once and
differentiated via custom_vjp: the IFT backward pass is just ``jax.grad`` of the
accumulation w.r.t. this pytree.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array


@dataclasses.dataclass(frozen=True)
class OCP:
    """Static bundle of problem callables (hashable; safe to close over under jit)."""

    f: Callable[[Array, Array, Any], Array]
    stage_cost: Callable[[Array, Array, Array, Any], Array]
    terminal_cost: Callable[[Array, Any], Array]
    f_jac: Optional[Callable[[Array, Array, Any], Tuple[Array, Array]]] = None
    stage_derivs: Optional[Callable] = None      # (x,u,k,theta) -> (lx,lu,lxx,luu,lux)
    terminal_derivs: Optional[Callable] = None   # (xN,theta) -> (phi_x, phi_xx)
    u_min: Optional[Array] = None
    u_max: Optional[Array] = None
    feasible: Optional[Callable[[Array, Array, Any], Array]] = None  # (x,k,theta)->bool

    # ---- derivative fallbacks (JAX analogue of reference core/autodiff.py:9-80) ----

    def jac_fn(self):
        if self.f_jac is not None:
            return self.f_jac

        def jac(x, u, theta):
            A = jax.jacfwd(self.f, argnums=0)(x, u, theta)
            B = jax.jacfwd(self.f, argnums=1)(x, u, theta)
            return A, B

        return jac

    def stage_derivs_fn(self):
        if self.stage_derivs is not None:
            return self.stage_derivs
        c = self.stage_cost

        def sd(x, u, k, theta):
            lx = jax.grad(c, argnums=0)(x, u, k, theta)
            lu = jax.grad(c, argnums=1)(x, u, k, theta)
            lxx = jax.hessian(c, argnums=0)(x, u, k, theta)
            luu = jax.hessian(c, argnums=1)(x, u, k, theta)
            lux = jax.jacfwd(jax.grad(c, argnums=1), argnums=0)(x, u, k, theta)
            return lx, lu, lxx, luu, lux

        return sd

    def terminal_derivs_fn(self):
        if self.terminal_derivs is not None:
            return self.terminal_derivs
        c = self.terminal_cost

        def td(xN, theta):
            return jax.grad(c, argnums=0)(xN, theta), jax.hessian(c, argnums=0)(xN, theta)

        return td

    # ---- control bounds ----

    def clamp(self, u: Array) -> Array:
        if self.u_min is None:
            return u
        return jnp.clip(u, self.u_min, self.u_max)

    def active_mask(self, u: Array, tol: float = 1e-8) -> Array:
        """Dims at their bounds (reference ``control.py:66-70``); all-False if unbounded."""
        if self.u_min is None:
            return jnp.zeros(u.shape, dtype=bool)
        return (u <= self.u_min + tol) | (u >= self.u_max - tol)


def rollout(ocp: OCP, theta, x0: Array, U: Array) -> Array:
    """Open-loop rollout X [N+1, nx] (reference ``ddp.py:89-99``) as lax.scan."""

    def step(x, u):
        xn = ocp.f(x, u, theta)
        return xn, xn

    _, X_tail = jax.lax.scan(step, x0, U)
    return jnp.concatenate([x0[None], X_tail], axis=0)


def total_cost(ocp: OCP, theta, X: Array, U: Array) -> Array:
    """Sum of stage costs + terminal cost, horizon-parallel via vmap."""
    ks = jnp.arange(U.shape[0])
    cs = jax.vmap(lambda x, u, k: ocp.stage_cost(x, u, k, theta))(X[:-1], U, ks)
    return jnp.sum(cs) + ocp.terminal_cost(X[-1], theta)
