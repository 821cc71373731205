"""Planar quadrotor (6-state) — the long-horizon multi-obstacle family from
BASELINE.json ("multi-host planar quadrotor with multi-obstacle DBaS, T=200").

State [px, pz, th, vx, vz, om], control [T1, T2] (rotor thrusts). Euler step of

    ax = -(T1+T2) sin(th) / m,  az = (T1+T2) cos(th) / m - g,  al = (T2-T1) L / I

Position occupies the first two dims, so the shared circle-obstacle field applies.
Analytic Jacobians are hand-written (simple trig rows).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from jax import Array

from .base import System
from .obstacles import CircleField, make_h


@dataclasses.dataclass(frozen=True)
class Quadrotor2DConfig:
    dt: float = 0.02
    mass: float = 0.8
    inertia: float = 0.02
    arm: float = 0.2
    gravity: float = 9.81
    t_min: float = 0.0
    t_max: float = 8.0
    w_low: Tuple[float, ...] = (-0.02,) * 6
    w_high: Tuple[float, ...] = (0.02,) * 6
    x_target: Tuple[float, ...] = (8.0, 8.0, 0.0, 0.0, 0.0, 0.0)


def quad2d_step(x: Array, u: Array, *, cfg: Quadrotor2DConfig) -> Array:
    px, pz, th, vx, vz, om = (x[..., i] for i in range(6))
    t1, t2 = u[..., 0], u[..., 1]
    m, inertia, arm, g, dt = cfg.mass, cfg.inertia, cfg.arm, cfg.gravity, cfg.dt
    thrust = t1 + t2
    s, c = jnp.sin(th), jnp.cos(th)
    ax = -thrust * s / m
    az = thrust * c / m - g
    al = (t2 - t1) * arm / inertia
    return jnp.stack(
        [px + dt * vx, pz + dt * vz, th + dt * om, vx + dt * ax, vz + dt * az, om + dt * al],
        axis=-1,
    )


def quad2d_jac(x: Array, u: Array, *, cfg: Quadrotor2DConfig):
    th = x[..., 2]
    t1, t2 = u[..., 0], u[..., 1]
    m, inertia, arm, dt = cfg.mass, cfg.inertia, cfg.arm, cfg.dt
    s, c = jnp.sin(th), jnp.cos(th)
    thrust = t1 + t2
    o = jnp.ones_like(th)
    z = jnp.zeros_like(th)

    # rows of A = d f / d x
    A = jnp.stack(
        [
            jnp.stack([o, z, z, dt * o, z, z], axis=-1),
            jnp.stack([z, o, z, z, dt * o, z], axis=-1),
            jnp.stack([z, z, o, z, z, dt * o], axis=-1),
            jnp.stack([z, z, -dt * thrust * c / m, o, z, z], axis=-1),
            jnp.stack([z, z, -dt * thrust * s / m, z, o, z], axis=-1),
            jnp.stack([z, z, z, z, z, o], axis=-1),
        ],
        axis=-2,
    )
    B = jnp.stack(
        [
            jnp.stack([z, z], axis=-1),
            jnp.stack([z, z], axis=-1),
            jnp.stack([z, z], axis=-1),
            jnp.stack([-dt * s / m, -dt * s / m], axis=-1),
            jnp.stack([dt * c / m, dt * c / m], axis=-1),
            jnp.stack([-dt * arm / inertia * o, dt * arm / inertia * o], axis=-1),
        ],
        axis=-2,
    )
    return A, B


def make_quadrotor2d(
    cfg: Quadrotor2DConfig = Quadrotor2DConfig(),
    *,
    obstacles: Optional[CircleField] = None,
    aggregation: str = "smoothmin",
    beta: float = 20.0,
    dtype=jnp.float32,
) -> System:
    h = h_grad = None
    if obstacles is not None:
        h, h_grad = make_h(obstacles, aggregation=aggregation, beta=beta)
    return System(
        name="quadrotor2d",
        angle_dims=(2,),
        nx=6,
        nu=2,
        f=lambda x, u: quad2d_step(x, u, cfg=cfg),
        f_jac=lambda x, u: quad2d_jac(x, u, cfg=cfg),
        h=h,
        h_grad=h_grad,
        u_min=jnp.asarray([cfg.t_min, cfg.t_min], dtype=dtype),
        u_max=jnp.asarray([cfg.t_max, cfg.t_max], dtype=dtype),
        x_target=jnp.asarray(cfg.x_target, dtype=dtype),
        w_low=jnp.asarray(cfg.w_low, dtype=dtype),
        w_high=jnp.asarray(cfg.w_high, dtype=dtype),
    )
