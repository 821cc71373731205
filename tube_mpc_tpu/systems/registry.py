"""System registry: config-name -> System builder dispatch.

The pluggable-system story the reference sketched but never wired
(``core/system_spec.py:10-32`` is unused; ``tube_mpc.py:42-43`` raises for anything but
dubins). Here every family is constructible from the same YAML surface.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp

from .base import System
from .cartpole import CartPoleConfig, make_cartpole
from .double_integrator import DoubleIntegratorConfig, make_double_integrator
from .dubins import DubinsConfig, make_dubins
from .obstacles import CircleField
from .quadrotor2d import Quadrotor2DConfig, make_quadrotor2d


def build(
    name: str,
    *,
    dt: float,
    control_bounds: Dict[str, Any],
    disturbance: Dict[str, Any],
    target,
    obstacles: Optional[CircleField],
    aggregation: str,
    beta: float,
    dtype,
    extra: Optional[Dict[str, Any]] = None,
) -> System:
    extra = extra or {}
    w_low = tuple(disturbance.get("w_low", ()))
    w_high = tuple(disturbance.get("w_high", ()))

    if name == "dubins":
        cfg = DubinsConfig(
            dt=dt,
            v_min=float(control_bounds.get("v_min", -control_bounds.get("v_max", 10.0))),
            v_max=float(control_bounds.get("v_max", 10.0)),
            omega_max=float(control_bounds.get("omega_max", math.pi)),
            w_low=w_low or DubinsConfig.w_low,
            w_high=w_high or DubinsConfig.w_high,
            x_target=tuple(target),
        )
        return make_dubins(cfg, obstacles=obstacles, aggregation=aggregation, beta=beta, dtype=dtype)

    if name == "double_integrator":
        cfg = DoubleIntegratorConfig(
            dt=dt,
            a_max=float(control_bounds.get("a_max", 5.0)),
            w_low=w_low or DoubleIntegratorConfig.w_low,
            w_high=w_high or DoubleIntegratorConfig.w_high,
            x_target=tuple(target),
        )
        return make_double_integrator(cfg, obstacles=obstacles, aggregation=aggregation, beta=beta, dtype=dtype)

    if name == "cartpole":
        cfg = CartPoleConfig(
            dt=dt,
            f_max=float(control_bounds.get("f_max", 20.0)),
            x_lim=float(extra.get("x_lim", 2.4)),
            w_low=w_low or CartPoleConfig.w_low,
            w_high=w_high or CartPoleConfig.w_high,
            x_target=tuple(target),
        )
        return make_cartpole(cfg, dtype=dtype)

    if name == "quadrotor2d":
        cfg = Quadrotor2DConfig(
            dt=dt,
            t_min=float(control_bounds.get("t_min", 0.0)),
            t_max=float(control_bounds.get("t_max", 8.0)),
            w_low=w_low or Quadrotor2DConfig.w_low,
            w_high=w_high or Quadrotor2DConfig.w_high,
            x_target=tuple(target),
        )
        return make_quadrotor2d(cfg, obstacles=obstacles, aggregation=aggregation, beta=beta, dtype=dtype)

    raise ValueError(f"Unknown system: {name!r} (have: dubins, double_integrator, cartpole, quadrotor2d)")


def default_x0(name: str, nx: int, dtype):
    if name == "dubins":
        return jnp.asarray([0.0, 0.0, math.pi / 4], dtype=dtype)
    if name == "cartpole":
        return jnp.asarray([0.0, 0.0, math.pi, 0.0], dtype=dtype)  # hanging down
    return jnp.zeros((nx,), dtype=dtype)


def build_components(
    name: str,
    *,
    dt: float,
    control_bounds: Dict[str, Any],
    obstacles,                      # list of {"center": [..], "radius": r} dicts or None
    aggregation: str,
    beta: float,
    extra: Optional[Dict[str, Any]] = None,
):
    """ComponentSystem (ops/lanes.py) for the lane-major fused Pallas fast path —
    same math as `build` for the corresponding feature-last System."""
    import math as _math

    from ..ops import lanes as L

    extra = extra or {}
    centers = [tuple(o["center"]) for o in (obstacles or [])]
    radii = [float(o["radius"]) for o in (obstacles or [])]

    if name == "dubins":
        v_max = float(control_bounds.get("v_max", 10.0))
        return L.dubins_components(
            dt=dt, v_min=float(control_bounds.get("v_min", -v_max)), v_max=v_max,
            omega_max=float(control_bounds.get("omega_max", _math.pi)),
            centers=centers, radii=radii, aggregation=aggregation, beta=beta,
        )
    if name == "double_integrator":
        return L.double_integrator_components(
            dt=dt, a_max=float(control_bounds.get("a_max", 5.0)),
            centers=centers, radii=radii, aggregation=aggregation, beta=beta,
        )
    if name == "cartpole":
        return L.cartpole_components(
            dt=dt, f_max=float(control_bounds.get("f_max", 20.0)),
            x_lim=float(extra.get("x_lim", 2.4)),
        )
    if name == "quadrotor2d":
        return L.quadrotor2d_components(
            dt=dt, t_min=float(control_bounds.get("t_min", 0.0)),
            t_max=float(control_bounds.get("t_max", 8.0)),
            centers=centers, radii=radii, aggregation=aggregation, beta=beta,
        )
    raise ValueError(f"No component form for system {name!r}")
