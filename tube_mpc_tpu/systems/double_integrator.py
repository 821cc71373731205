"""2-D double integrator: the simplest new system family (BASELINE.json configs).

State [px, py, vx, vy], control [ax, ay]; exact (linear) discrete dynamics with
constant analytic Jacobians. Position occupies the first two state dims, so the shared
circle-obstacle safety functions (systems/obstacles.py) apply unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from jax import Array

from .base import System
from .obstacles import CircleField, make_h


@dataclasses.dataclass(frozen=True)
class DoubleIntegratorConfig:
    dt: float = 0.05
    a_max: float = 5.0
    w_low: Tuple[float, ...] = (-0.02, -0.02, -0.02, -0.02)
    w_high: Tuple[float, ...] = (0.02, 0.02, 0.02, 0.02)
    x_target: Tuple[float, ...] = (10.0, 10.0, 0.0, 0.0)


def di_step(x: Array, u: Array, *, dt: float) -> Array:
    p = x[..., :2] + dt * x[..., 2:4]
    v = x[..., 2:4] + dt * u
    return jnp.concatenate([p, v], axis=-1)


def di_jac(x: Array, u: Array, *, dt: float):
    batch = x.shape[:-1]
    dtype = x.dtype
    A = jnp.eye(4, dtype=dtype)
    A = A.at[0, 2].set(dt).at[1, 3].set(dt)
    B = jnp.zeros((4, 2), dtype=dtype).at[2, 0].set(dt).at[3, 1].set(dt)
    A = jnp.broadcast_to(A, batch + (4, 4))
    B = jnp.broadcast_to(B, batch + (4, 2))
    return A, B


def make_double_integrator(
    cfg: DoubleIntegratorConfig = DoubleIntegratorConfig(),
    *,
    obstacles: Optional[CircleField] = None,
    aggregation: str = "smoothmin",
    beta: float = 20.0,
    dtype=jnp.float32,
) -> System:
    dt = float(cfg.dt)
    h = h_grad = None
    if obstacles is not None:
        h, h_grad = make_h(obstacles, aggregation=aggregation, beta=beta)
    return System(
        name="double_integrator",
        nx=4,
        nu=2,
        f=lambda x, u: di_step(x, u, dt=dt),
        f_jac=lambda x, u: di_jac(x, u, dt=dt),
        h=h,
        h_grad=h_grad,
        u_min=jnp.asarray([-cfg.a_max, -cfg.a_max], dtype=dtype),
        u_max=jnp.asarray([cfg.a_max, cfg.a_max], dtype=dtype),
        x_target=jnp.asarray(cfg.x_target, dtype=dtype),
        w_low=jnp.asarray(cfg.w_low, dtype=dtype),
        w_high=jnp.asarray(cfg.w_high, dtype=dtype),
    )
