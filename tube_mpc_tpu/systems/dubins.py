"""Dubins (unicycle) vehicle, batched-first, with analytic Jacobians.

Functional parity with the reference's ``core/systems/dubins.py:24-65`` (dynamics,
disturbance sampling) and ``core/systems/dubins_aug_jac.py:42-58`` (analytic base
Jacobians). The DBaS augmentation is NOT system-specific here — the generic chain rule
lives in ``tube_mpc_tpu.ops.dbas`` and works for any System.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp
from jax import Array

from .base import System
from .obstacles import CircleField, make_h


@dataclasses.dataclass(frozen=True)
class DubinsConfig:
    dt: float = 0.01
    v_min: float = -10.0
    v_max: float = 10.0
    omega_max: float = math.pi
    w_low: Tuple[float, float, float] = (-0.05, -0.05, -0.05)
    w_high: Tuple[float, float, float] = (0.05, 0.05, 0.05)
    x_target: Tuple[float, float, float] = (10.0, 10.0, math.pi / 4)


def dubins_step(x: Array, u: Array, *, dt: float) -> Array:
    """x=[px,py,theta], u=[v,omega]; Euler step. Batched over leading dims."""
    px, py, th = x[..., 0], x[..., 1], x[..., 2]
    v, om = u[..., 0], u[..., 1]
    return jnp.stack(
        [px + dt * v * jnp.cos(th), py + dt * v * jnp.sin(th), th + dt * om],
        axis=-1,
    )


def dubins_jac(x: Array, u: Array, *, dt: float) -> Tuple[Array, Array]:
    """Analytic A=df/dx [...,3,3], B=df/du [...,3,2], built by stacking (vmap-safe)."""
    th = x[..., 2]
    v = u[..., 0]
    c, s = jnp.cos(th), jnp.sin(th)
    o = jnp.ones_like(th)
    z = jnp.zeros_like(th)
    A = jnp.stack(
        [
            jnp.stack([o, z, -dt * v * s], axis=-1),
            jnp.stack([z, o, dt * v * c], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
    B = jnp.stack(
        [
            jnp.stack([dt * c, z], axis=-1),
            jnp.stack([dt * s, z], axis=-1),
            jnp.stack([z, dt * o], axis=-1),
        ],
        axis=-2,
    )
    return A, B


def make_dubins(
    cfg: DubinsConfig = DubinsConfig(),
    *,
    obstacles: Optional[CircleField] = None,
    aggregation: str = "smoothmin",
    beta: float = 20.0,
    dtype=jnp.float32,
) -> System:
    """Build the Dubins System with obstacle safety function baked in."""
    dt = float(cfg.dt)
    h = h_grad = None
    if obstacles is not None:
        h, h_grad = make_h(obstacles, aggregation=aggregation, beta=beta)
    return System(
        name="dubins",
        angle_dims=(2,),
        nx=3,
        nu=2,
        f=lambda x, u: dubins_step(x, u, dt=dt),
        f_jac=lambda x, u: dubins_jac(x, u, dt=dt),
        h=h,
        h_grad=h_grad,
        u_min=jnp.asarray([cfg.v_min, -cfg.omega_max], dtype=dtype),
        u_max=jnp.asarray([cfg.v_max, cfg.omega_max], dtype=dtype),
        x_target=jnp.asarray(cfg.x_target, dtype=dtype),
        w_low=jnp.asarray(cfg.w_low, dtype=dtype),
        w_high=jnp.asarray(cfg.w_high, dtype=dtype),
    )
