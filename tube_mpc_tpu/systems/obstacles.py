"""Circular-obstacle safety functions h(x) > 0, array-native and batched.

Functional parity with the reference's ``core/systems/dubins_obstacles.py``
(``dubins_obstacles.py:16-117``), re-designed TPU-first: instead of a Python list of
obstacle objects iterated per call, the obstacle field is a pair of arrays
(centers [M,2], radii [M]) so every aggregation is a single vectorized reduction that
broadcasts over arbitrary batch dims and fuses into the rollout.

Aggregations (selected statically):
- "single"    : one obstacle, h(x) = ||p - c||^2 - r^2
- "min"       : exact min_i h_i (argmin subgradient)
- "smoothmin" : -(1/beta) * logsumexp(-beta * h_i)  (smooth, merges nearby obstacles)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array
from jax.scipy.special import logsumexp


class CircleField(NamedTuple):
    """Obstacle field as arrays — a pytree, so it can be traced/sharded/vmapped."""

    centers: Array  # [M, 2]
    radii: Array    # [M]

    @staticmethod
    def from_list(obstacles, dtype=jnp.float32) -> "CircleField":
        """Build from [{'center': [cx, cy], 'radius': r}, ...] config entries."""
        for i, o in enumerate(obstacles):
            if "center" not in o or "radius" not in o:
                raise ValueError(
                    f"environment obstacle #{i} needs 'center' and 'radius', got {sorted(o)}"
                )
        centers = jnp.asarray([list(o["center"]) for o in obstacles], dtype=dtype)
        radii = jnp.asarray([float(o["radius"]) for o in obstacles], dtype=dtype)
        return CircleField(centers=centers, radii=radii)


def h_circles_each(x: Array, field: CircleField) -> Array:
    """Per-obstacle safety values h_i(x) = ||p - c_i||^2 - r_i^2.

    x [..., nx] (position in first two dims) -> [..., M].
    Reference semantics: ``dubins_obstacles.py:16-30``.
    """
    p = x[..., None, :2]                       # [..., 1, 2]
    d = p - field.centers                      # [..., M, 2]
    return jnp.sum(d * d, axis=-1) - field.radii**2


def grad_h_circles_each(x: Array, field: CircleField) -> Array:
    """Per-obstacle gradient dh_i/dx, zero-padded beyond the position dims.

    x [..., nx] -> [..., M, nx]. (``dubins_obstacles.py:33-38``.)
    """
    nx = x.shape[-1]
    p = x[..., None, :2]
    d = 2.0 * (p - field.centers)              # [..., M, 2]
    pad = jnp.zeros(d.shape[:-1] + (nx - 2,), dtype=d.dtype)
    return jnp.concatenate([d, pad], axis=-1)


def h_min(x: Array, field: CircleField) -> Array:
    """Exact aggregation h(x) = min_i h_i(x) (``dubins_obstacles.py:95-106``)."""
    return jnp.min(h_circles_each(x, field), axis=-1)


def grad_h_min(x: Array, field: CircleField) -> Array:
    """Argmin subgradient of h_min (``dubins_obstacles.py:109-117``).

    Static-shape version: one-hot weight on the argmin obstacle (ties resolved to the
    first minimal index, matching jnp.argmin / the reference's torch.argmin).
    """
    hs = h_circles_each(x, field)                       # [..., M]
    grads = grad_h_circles_each(x, field)               # [..., M, nx]
    idx = jnp.argmin(hs, axis=-1)                       # [...]
    onehot = _one_hot(idx, hs.shape[-1], grads.dtype)
    return jnp.sum(onehot[..., None] * grads, axis=-2)


def _one_hot(idx: Array, m: int, dtype) -> Array:
    return (idx[..., None] == jnp.arange(m)).astype(dtype)


def h_smoothmin(x: Array, field: CircleField, *, beta: float = 20.0) -> Array:
    """Smooth-min aggregation -(1/beta) logsumexp(-beta h_i) (``dubins_obstacles.py:41-69``)."""
    hs = h_circles_each(x, field)
    return -(1.0 / beta) * logsumexp(-beta * hs, axis=-1)


def grad_h_smoothmin(x: Array, field: CircleField, *, beta: float = 20.0) -> Array:
    """Softmax-weighted gradient of the smooth-min (``dubins_obstacles.py:72-92``)."""
    hs = h_circles_each(x, field)                       # [..., M]
    grads = grad_h_circles_each(x, field)               # [..., M, nx]
    z = -beta * hs
    z = z - jnp.max(z, axis=-1, keepdims=True)
    w = jnp.exp(z)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.sum(w[..., None] * grads, axis=-2)


def make_h(field: CircleField, *, aggregation: str = "smoothmin", beta: float = 20.0):
    """Return (h, grad_h) callables for the chosen static aggregation mode.

    Mirrors the reference's dispatch at ``tube_mpc.py:690-704`` but as one factory.
    """
    if field.centers.shape[0] == 0:
        def h_free(x: Array) -> Array:
            return jnp.ones(x.shape[:-1], dtype=x.dtype)

        def grad_h_free(x: Array) -> Array:
            return jnp.zeros_like(x)

        return h_free, grad_h_free

    if aggregation == "smoothmin":
        return (
            lambda x: h_smoothmin(x, field, beta=beta),
            lambda x: grad_h_smoothmin(x, field, beta=beta),
        )
    if aggregation == "min":
        return (lambda x: h_min(x, field), lambda x: grad_h_min(x, field))
    if aggregation == "single":
        if field.centers.shape[0] != 1:
            raise ValueError("aggregation='single' requires exactly one obstacle")
        return (
            lambda x: h_circles_each(x, field)[..., 0],
            lambda x: grad_h_circles_each(x, field)[..., 0, :],
        )
    raise ValueError(f"Unknown obstacle aggregation: {aggregation}")
