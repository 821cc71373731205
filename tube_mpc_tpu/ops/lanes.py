"""Component ("structure-of-arrays") forms for lane-major TPU execution.

Why: XLA lays a [B, 4] state batch out as (8, 128) tiles with 4 of 128 lanes used —
a 32–64x density loss on every elementwise op in the solver's hot loops. The Pallas
lane-major solver (ops/pallas/) instead keeps each state/control COMPONENT as a dense
[B]-lane row. This module defines the component-form contracts and derives everything
the kernels need from them:

- a component step  f_c(xs: tuple[row...], us: tuple[row...]) -> tuple[row...]
  where each row is an arbitrary-shape array and all math is elementwise;
- exact Jacobian ROWS via jax.jvp with basis tangents (n+m elementwise JVP sweeps —
  no autodiff matrices, no padding, works inside Pallas kernels);
- the DBaS augmentation in component form, generically for any component system
  (the same chain as ops/dbas.py but producing rows).

The feature-last public API (systems/*.py) and these component forms share the same
underlying formulas; tests pin them against each other.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from .barrier import barrier_deriv, barrier_value
from .dbas import BarrierParams

Rows = Tuple[Array, ...]


class ComponentSystem(NamedTuple):
    """Elementwise component form of a controlled system.

    f: (xs [n rows], us [m rows]) -> n rows — every row any shape, math elementwise.
    h: (xs) -> one row (safety value), or None.
    n, m: dims. u_min/u_max: python tuples of floats (clamping constants).
    """

    n: int
    m: int
    f: Callable[[Rows, Rows], Rows]
    h: Callable[[Rows], Array] | None
    u_min: Tuple[float, ...]
    u_max: Tuple[float, ...]


def jac_rows(f: Callable[[Rows, Rows], Rows], xs: Rows, us: Rows):
    """Exact Jacobians as nested row tuples via basis-tangent JVPs.

    Returns (A, B) with A[i][j] = ∂f_i/∂x_j and B[i][a] = ∂f_i/∂u_a, each a row
    shaped like xs[0]. Cost: (n+m) elementwise JVP sweeps of f — fully fused, dense.
    """
    n, m = len(xs), len(us)
    one = jnp.ones_like(xs[0])
    zero = jnp.zeros_like(xs[0])

    cols_x = []
    for j in range(n):
        tx = tuple(one if i == j else zero for i in range(n))
        tu = tuple(zero for _ in range(m))
        _, col = jax.jvp(lambda xx, uu: f(xx, uu), (xs, us), (tx, tu))
        cols_x.append(col)  # tuple of n rows = column j of A
    cols_u = []
    for a in range(m):
        tx = tuple(zero for _ in range(n))
        tu = tuple(one if b == a else zero for b in range(m))
        _, col = jax.jvp(lambda xx, uu: f(xx, uu), (xs, us), (tx, tu))
        cols_u.append(col)

    A = tuple(tuple(cols_x[j][i] for j in range(n)) for i in range(n))
    B = tuple(tuple(cols_u[a][i] for a in range(m)) for i in range(n))
    return A, B


def grad_rows(h: Callable[[Rows], Array], xs: Rows) -> Rows:
    """Exact ∇h rows via basis-tangent JVPs (n elementwise sweeps)."""
    n = len(xs)
    one = jnp.ones_like(xs[0])
    zero = jnp.zeros_like(xs[0])
    out = []
    for j in range(n):
        tx = tuple(one if i == j else zero for i in range(n))
        _, d = jax.jvp(h, (xs,), (tx,))
        out.append(d)
    return tuple(out)


def augmented_step_fn(
    sys_c: ComponentSystem,
    *,
    barrier_type: str = "inverse",
    eps: float = 1e-6,
):
    """Return f̂_c(x̂_rows, u_rows, bp) — the augmented component step.

    Differentiable w.r.t. rows, so jac_rows applies to it directly (with bp closed
    over), yielding the augmented Jacobian WITHOUT the hand-derived chain rule.
    """
    if sys_c.h is None:
        raise ValueError("component system needs h for DBaS augmentation")
    f, h, n = sys_c.f, sys_c.h, sys_c.n

    def f_hat(x_hat: Rows, us: Rows, bp: BarrierParams) -> Rows:
        xs, b = x_hat[:n], x_hat[n]
        xn = f(xs, us)
        h_next = h(xn) - bp.tight
        h_curr = h(xs) - bp.tight
        b_next = barrier_value(h_next, bp.alpha, barrier_type=barrier_type, eps=eps) - bp.gamma * (
            barrier_value(h_curr, bp.alpha, barrier_type=barrier_type, eps=eps) - b
        )
        return tuple(xn) + (b_next,)

    return f_hat


def init_b0_fn(sys_c: ComponentSystem, *, barrier_type: str = "inverse", eps: float = 1e-6):
    h = sys_c.h

    def init_b0(xs: Rows, bp: BarrierParams) -> Array:
        return barrier_value(h(xs) - bp.tight, bp.alpha, barrier_type=barrier_type, eps=eps)

    return init_b0


# ---------------------------------------------------------------------------
# Component forms of the shipped systems.
# ---------------------------------------------------------------------------

def dubins_components(*, dt: float, v_min: float, v_max: float, omega_max: float,
                      centers: Sequence[Tuple[float, float]] = (),
                      radii: Sequence[float] = (),
                      aggregation: str = "smoothmin", beta: float = 20.0) -> ComponentSystem:
    """Dubins in component form (same math as systems/dubins.py + obstacles.py)."""

    def f(xs: Rows, us: Rows) -> Rows:
        px, py, th = xs
        v, om = us
        return (px + dt * v * jnp.cos(th), py + dt * v * jnp.sin(th), th + dt * om)

    h = None
    if len(centers):
        cs = [(float(cx), float(cy)) for cx, cy in centers]
        rs = [float(r) for r in radii]

        def h(xs: Rows) -> Array:  # noqa: F811
            px, py = xs[0], xs[1]
            hs = [
                (px - cx) ** 2 + (py - cy) ** 2 - r * r for (cx, cy), r in zip(cs, rs)
            ]
            if aggregation == "smoothmin":
                zmax = hs[0]
                for v_ in hs[1:]:
                    zmax = jnp.minimum(zmax, v_)  # max of -beta*h == -beta*min h
                acc = sum(jnp.exp(-beta * (v_ - zmax)) for v_ in hs)
                return zmax - (1.0 / beta) * jnp.log(acc)
            if aggregation == "min":
                out = hs[0]
                for v_ in hs[1:]:
                    out = jnp.minimum(out, v_)
                return out
            raise ValueError(f"unsupported aggregation for component form: {aggregation}")

    return ComponentSystem(
        n=3, m=2, f=f, h=h,
        u_min=(v_min, -omega_max), u_max=(v_max, omega_max),
    )


def double_integrator_components(*, dt: float, a_max: float,
                                 centers=(), radii=(), aggregation="smoothmin",
                                 beta: float = 20.0) -> ComponentSystem:
    def f(xs: Rows, us: Rows) -> Rows:
        px, py, vx, vy = xs
        ax, ay = us
        return (px + dt * vx, py + dt * vy, vx + dt * ax, vy + dt * ay)

    h = None
    if len(centers):
        base = dubins_components(dt=dt, v_min=0, v_max=0, omega_max=0,
                                 centers=centers, radii=radii,
                                 aggregation=aggregation, beta=beta)
        h = base.h  # position-only; works for any system with (px, py) leading

    return ComponentSystem(n=4, m=2, f=f, h=h, u_min=(-a_max, -a_max), u_max=(a_max, a_max))


def cartpole_components(*, dt: float, m_cart: float = 1.0, m_pole: float = 0.1,
                        length: float = 0.5, gravity: float = 9.81,
                        f_max: float = 20.0, x_lim: float = 2.4) -> ComponentSystem:
    """Cart-pole in component form (same math as systems/cartpole.py:36-48);
    safety h(x) = x_lim^2 - x^2 keeps the cart on the track."""

    def f(xs: Rows, us: Rows) -> Rows:
        pos, vel, th, om = xs
        (force,) = us
        s, c = jnp.sin(th), jnp.cos(th)
        total_m = m_cart + m_pole
        temp = (force + m_pole * length * om * om * s) / total_m
        th_acc = (gravity * s - c * temp) / (length * (4.0 / 3.0 - m_pole * c * c / total_m))
        x_acc = temp - m_pole * length * th_acc * c / total_m
        return (pos + dt * vel, vel + dt * x_acc, th + dt * om, om + dt * th_acc)

    def h(xs: Rows) -> Array:
        return x_lim * x_lim - xs[0] * xs[0]

    return ComponentSystem(n=4, m=1, f=f, h=h, u_min=(-f_max,), u_max=(f_max,))


def quadrotor2d_components(*, dt: float, mass: float = 0.8, inertia: float = 0.02,
                           arm: float = 0.2, gravity: float = 9.81,
                           t_min: float = 0.0, t_max: float = 8.0,
                           centers=(), radii=(), aggregation="smoothmin",
                           beta: float = 20.0) -> ComponentSystem:
    """Planar quadrotor in component form (same math as systems/quadrotor2d.py:38-51);
    circle obstacles act on the leading (px, pz) position rows."""

    def f(xs: Rows, us: Rows) -> Rows:
        px, pz, th, vx, vz, om = xs
        t1, t2 = us
        thrust = t1 + t2
        s, c = jnp.sin(th), jnp.cos(th)
        ax = -thrust * s / mass
        az = thrust * c / mass - gravity
        al = (t2 - t1) * arm / inertia
        return (px + dt * vx, pz + dt * vz, th + dt * om,
                vx + dt * ax, vz + dt * az, om + dt * al)

    h = None
    if len(centers):
        base = dubins_components(dt=dt, v_min=0, v_max=0, omega_max=0,
                                 centers=centers, radii=radii,
                                 aggregation=aggregation, beta=beta)
        h = base.h  # position-only on (px, pz)

    return ComponentSystem(n=6, m=2, f=f, h=h,
                           u_min=(t_min, t_min), u_max=(t_max, t_max))
