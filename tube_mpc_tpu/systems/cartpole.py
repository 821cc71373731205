"""Cart-pole swing-up system (new family, BASELINE.json configs).

State [x, xdot, th, thdot] (th = 0 upright), control [F]. Euler discretization of the
standard underactuated cart-pole dynamics. Safety set: cart stays inside the track,
h(x) = x_lim^2 - x^2 > 0 (a smooth polynomial, so the DBaS barrier and its analytic
derivative chain apply exactly as for obstacles). Jacobians via the System autodiff
fallback (jacfwd is compiled and exact; the trig/coupled terms make hand-written forms
error-prone with no TPU win at nx=4).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from jax import Array

from .base import System


@dataclasses.dataclass(frozen=True)
class CartPoleConfig:
    dt: float = 0.02
    m_cart: float = 1.0
    m_pole: float = 0.1
    length: float = 0.5     # half pole length
    gravity: float = 9.81
    f_max: float = 20.0
    x_lim: float = 2.4
    w_low: Tuple[float, ...] = (-0.01, -0.01, -0.01, -0.01)
    w_high: Tuple[float, ...] = (0.01, 0.01, 0.01, 0.01)
    x_target: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)


def cartpole_step(x: Array, u: Array, *, cfg: CartPoleConfig) -> Array:
    pos, vel, th, om = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    force = u[..., 0]
    mc, mp, l, g = cfg.m_cart, cfg.m_pole, cfg.length, cfg.gravity
    s, c = jnp.sin(th), jnp.cos(th)
    total_m = mc + mp
    temp = (force + mp * l * om**2 * s) / total_m
    th_acc = (g * s - c * temp) / (l * (4.0 / 3.0 - mp * c**2 / total_m))
    x_acc = temp - mp * l * th_acc * c / total_m
    dt = cfg.dt
    return jnp.stack(
        [pos + dt * vel, vel + dt * x_acc, th + dt * om, om + dt * th_acc], axis=-1
    )


def make_cartpole(cfg: CartPoleConfig = CartPoleConfig(), *, dtype=jnp.float32) -> System:
    x_lim = float(cfg.x_lim)

    def h(x: Array) -> Array:
        return x_lim**2 - x[..., 0] ** 2

    def h_grad(x: Array) -> Array:
        g = jnp.zeros_like(x)
        return g.at[..., 0].set(-2.0 * x[..., 0])

    return System(
        name="cartpole",
        angle_dims=(2,),
        nx=4,
        nu=1,
        f=lambda x, u: cartpole_step(x, u, cfg=cfg),
        f_jac=None,  # autodiff fallback (System.jacobians)
        h=h,
        h_grad=h_grad,
        u_min=jnp.asarray([-cfg.f_max], dtype=dtype),
        u_max=jnp.asarray([cfg.f_max], dtype=dtype),
        x_target=jnp.asarray(cfg.x_target, dtype=dtype),
        w_low=jnp.asarray(cfg.w_low, dtype=dtype),
        w_high=jnp.asarray(cfg.w_high, dtype=dtype),
    )
