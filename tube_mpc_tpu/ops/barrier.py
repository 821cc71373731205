"""Discrete Barrier State (DBaS) machinery — relaxed inverse barrier and barrier-state
propagation as pure, batched JAX functions.

Functional parity with the reference's ``core/barrier.py`` (reference
``barrier.py:36-59`` relaxed inverse barrier, ``barrier.py:75-108`` dbas_step,
``barrier.py:111-120`` dbas_init_b0), re-designed TPU-first:

- every function broadcasts over arbitrary leading batch dims (scenarios, line-search
  candidates, horizon steps) so the whole DBaS pipeline vmaps/shards cleanly;
- ``alpha``/``gamma`` are runtime arrays (differentiable / adaptable online), while
  ``eps`` and ``barrier_type`` are static Python values baked into the trace;
- analytic derivatives are provided explicitly (``d_relaxed_inverse_barrier``) so the
  augmented-dynamics Jacobian (ops/dbas.py) never needs nested autodiff.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
from jax import Array


def relaxed_inverse_barrier(zeta: Array, alpha, *, eps: float = 1e-12) -> Array:
    """Relaxed inverse barrier B_alpha(zeta).

    B_alpha(zeta) = 1/zeta                                            if zeta >= alpha_eff
                  = 1/a - (zeta-a)/a^2 + (zeta-a)^2/a^3, a=alpha_eff  otherwise

    with alpha_eff = max(alpha, eps): the quadratic extension keeps gradients alive for
    zeta <= 0 even when alpha == 0 (reference ``barrier.py:43-58``).
    """
    zeta = jnp.asarray(zeta)
    alpha_eff = jnp.maximum(jnp.asarray(alpha, dtype=zeta.dtype), eps)
    safe = zeta >= alpha_eff
    b_safe = 1.0 / jnp.maximum(zeta, eps)
    diff = zeta - alpha_eff
    b_unsafe = 1.0 / alpha_eff - diff / (alpha_eff**2) + (diff**2) / (alpha_eff**3)
    return jnp.where(safe, b_safe, b_unsafe)


def d_relaxed_inverse_barrier(zeta: Array, alpha, *, eps: float = 1e-12) -> Array:
    """Analytic dB_alpha/dzeta (reference ``dubins_aug_jac.py:31-40``)."""
    zeta = jnp.asarray(zeta)
    alpha_eff = jnp.maximum(jnp.asarray(alpha, dtype=zeta.dtype), eps)
    safe = zeta >= alpha_eff
    zc = jnp.maximum(zeta, eps)
    d_safe = -1.0 / (zc * zc)
    diff = zeta - alpha_eff
    d_unsafe = -1.0 / (alpha_eff**2) + 2.0 * diff / (alpha_eff**3)
    return jnp.where(safe, d_safe, d_unsafe)


def log_barrier(zeta: Array, *, eps: float = 1e-12) -> Array:
    """Exact log barrier B(zeta) = -log(zeta) (reference ``barrier.py:62-72``)."""
    return -jnp.log(jnp.maximum(zeta, eps))


def d_log_barrier(zeta: Array, *, eps: float = 1e-12) -> Array:
    zc = jnp.maximum(zeta, eps)
    return -1.0 / zc


def barrier_value(zeta: Array, alpha, *, barrier_type: str = "inverse", eps: float = 1e-12) -> Array:
    """B(zeta) for the configured barrier type (static dispatch)."""
    if barrier_type == "inverse":
        return relaxed_inverse_barrier(zeta, alpha, eps=eps)
    if barrier_type == "log":
        return log_barrier(zeta, eps=eps)
    raise ValueError(f"Unknown barrier_type: {barrier_type}")


def barrier_deriv(zeta: Array, alpha, *, barrier_type: str = "inverse", eps: float = 1e-12) -> Array:
    """dB/dzeta for the configured barrier type (static dispatch)."""
    if barrier_type == "inverse":
        return d_relaxed_inverse_barrier(zeta, alpha, eps=eps)
    if barrier_type == "log":
        return d_log_barrier(zeta, eps=eps)
    raise ValueError(f"Unknown barrier_type: {barrier_type}")


def dbas_step(
    x: Array,
    u: Array,
    b: Array,
    *,
    f: Callable[[Array, Array], Array],
    h: Callable[[Array], Array],
    alpha,
    gamma,
    barrier_type: str = "inverse",
    eps: float = 1e-12,
) -> Tuple[Array, Array]:
    """One DBaS-augmented step (reference ``barrier.py:75-108``):

        x_{k+1} = f(x_k, u_k)
        b_{k+1} = B(h(x_{k+1})) - gamma * (B(h(x_k)) - b_k)

    Batched: x [..., nx], u [..., nu], b [...] -> (x_next [..., nx], b_next [...]).
    """
    x_next = f(x, u)
    b_next_barrier = barrier_value(h(x_next), alpha, barrier_type=barrier_type, eps=eps)
    b_curr_barrier = barrier_value(h(x), alpha, barrier_type=barrier_type, eps=eps)
    gamma = jnp.asarray(gamma, dtype=b_next_barrier.dtype)
    b_next = b_next_barrier - gamma * (b_curr_barrier - b)
    return x_next, b_next


def dbas_init_b0(
    x0: Array,
    *,
    h: Callable[[Array], Array],
    alpha,
    barrier_type: str = "inverse",
    eps: float = 1e-12,
) -> Array:
    """Initialize b_0 = B(h(x_0)) (reference ``barrier.py:111-120``)."""
    return barrier_value(h(x0), alpha, barrier_type=barrier_type, eps=eps)
