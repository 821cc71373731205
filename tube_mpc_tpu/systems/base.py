"""Generic system abstraction for TPU-native Tube MPC.

Generalization of the reference's unused ``core/system_spec.py:10-32`` protocol into the
design actually used here: a ``System`` is a *static* bundle of pure, batched JAX
callables plus box bounds. Numeric experiment constants (dt, targets, obstacle geometry)
are baked into the closures at build time (they are per-experiment constants, so they
belong in the trace); anything adapted online (cost weights, barrier alpha/gamma,
tightening) flows through runtime pytrees instead.

Every callable broadcasts over leading batch dims so the same System works for a single
trajectory, a vmapped scenario batch, and a sharded multi-host sweep without change.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array


@dataclasses.dataclass(frozen=True)
class System:
    """Discrete-time controlled system with box control bounds and a safety function.

    Attributes:
      name: identifier (used by config dispatch and run artifacts).
      nx, nu: state / control dims.
      f: dynamics x_{k+1} = f(x, u); x [..., nx], u [..., nu] -> [..., nx].
      f_jac: analytic Jacobians (A [..., nx, nx], B [..., nx, nu]); None -> autodiff.
      h: safety function, h(x) > 0 safe; x [..., nx] -> [...]. None -> no safety set.
      h_grad: analytic dh/dx [..., nx]; None -> autodiff of h.
      u_min, u_max: box control bounds, shape [nu].
      x_target: goal state [nx] (task-level; used by default cost builders).
      w_low, w_high: uniform disturbance bounds [nx] (additive on the true step).
      angle_dims: state dims that are angles (errors wrapped to [-pi, pi] by the
        receding-horizon cost builders, reference ``run_nominal.py:32-34``).
    """

    name: str
    nx: int
    nu: int
    f: Callable[[Array, Array], Array]
    u_min: Array
    u_max: Array
    f_jac: Optional[Callable[[Array, Array], Tuple[Array, Array]]] = None
    h: Optional[Callable[[Array], Array]] = None
    h_grad: Optional[Callable[[Array], Array]] = None
    x_target: Optional[Array] = None
    w_low: Optional[Array] = None
    w_high: Optional[Array] = None
    angle_dims: Tuple[int, ...] = ()

    def jacobians(self) -> Callable[[Array, Array], Tuple[Array, Array]]:
        """Return f_jac, falling back to forward-mode autodiff (compiled, batched).

        The JAX analogue of the reference's autograd fallback
        (``core/autodiff.py:65-80`` / ``core/ddp.py:63-86``) — but since jacfwd is
        traced & compiled it costs a few extra fused ops rather than a 30x slowdown.
        """
        if self.f_jac is not None:
            return self.f_jac

        def jac(x: Array, u: Array) -> Tuple[Array, Array]:
            A = jax.jacfwd(self.f, argnums=0)(x, u)
            B = jax.jacfwd(self.f, argnums=1)(x, u)
            return A, B

        return jac

    def safety_grad(self) -> Callable[[Array], Array]:
        if self.h is None:
            raise ValueError(f"System {self.name} has no safety function h")
        if self.h_grad is not None:
            return self.h_grad
        return jax.grad(lambda x: jnp.sum(self.h(x)))

    def clamp(self, u: Array) -> Array:
        """Hard box projection (reference ``control.py:61-64``)."""
        return jnp.clip(u, self.u_min, self.u_max)

    def active_mask(self, u: Array, tol: float = 1e-8) -> Array:
        """Boolean mask of control dims at their bounds (reference ``control.py:66-70``)."""
        return (u <= self.u_min + tol) | (u >= self.u_max - tol)

    def sample_disturbance(self, key: Array, shape=(), dtype=None) -> Array:
        """Uniform w ~ U[w_low, w_high], batched (reference ``dubins.py:57-65``)."""
        if self.w_low is None or self.w_high is None:
            raise ValueError(f"System {self.name} has no disturbance bounds")
        dtype = dtype or self.w_low.dtype
        low = jnp.asarray(self.w_low, dtype=dtype)
        high = jnp.asarray(self.w_high, dtype=dtype)
        u01 = jax.random.uniform(key, tuple(shape) + (self.nx,), dtype=dtype)
        return low + (high - low) * u01


def tanh_box(u_min: Array, u_max: Array):
    """Smooth tanh box parameterization u(v) and du/dv (reference ``control.py:10-35``).

    Provided for parity with the reference's BoxTanhControl; the main solver path uses
    hard clamping with active sets, like the reference's paper path.
    """

    def u_of_v(v: Array) -> Array:
        return u_min + (u_max - u_min) * (jnp.tanh(v) + 1.0) * 0.5

    def du_dv(v: Array) -> Array:
        return (u_max - u_min) * 0.5 * (1.0 - jnp.tanh(v) ** 2)

    return u_of_v, du_dv
