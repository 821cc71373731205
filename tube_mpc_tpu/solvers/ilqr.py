"""Box-constrained iLQR/DDP, compiled end-to-end for TPU.

Semantics match the reference solver (``core/ddp.py:102-307``): decision variable is u
itself, forward passes hard-clamp to the box, the backward pass uses full (unreduced)
regularized gains, the line search picks the best candidate over a fixed alpha ladder
(first-minimum tie-break, optional feasibility filter), and iteration stops when the
accepted cost changes by less than ``tol``.

The *implementation* is TPU-native rather than a translation of the reference's
per-step Python loops (``ddp.py:161-305``):

- trajectory linearization + cost derivatives are horizon-PARALLEL (`vmap` over k);
- the Riccati recursion is one `lax.scan` (sequential-but-compiled; N <= ~200);
- the line search evaluates the whole alpha ladder as a BATCH (`vmap` of the rollout
  scan over alphas) instead of the reference's sequential early-exit loop;
- Q_uu solves use closed-form 2x2 inverses (ops/linalg.py) — no LAPACK calls;
- the outer improvement loop is a `lax.while_loop`, so a converged solve stops paying
  for remaining iterations at runtime while staying fully jittable and vmappable.

Everything is shape-static: vmap over scenario batches and shard_map over device meshes
compose with this function unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.linalg import range_guard_default, solve_spd
from .ocp import OCP, rollout, total_cost

# Renormalization threshold for the scaled Riccati carry (see _backward_pass).
# Chosen so thresh * ||A||^2 stays below the f32 exponent range (~3.4e38) that
# TPU-emulated float64 shares, with barrier-inflated ||A|| up to ~1e12.
_V_SCALE_THRESH = 1e12
# Real-f64 backends (the reference-agreement oracle mode) have exponent range 1e308:
# never rescale there, so the recursion is op-for-op the reference's unscaled one.
_V_SCALE_THRESH_F64 = 1e250


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
    """Solver hyperparameters (reference ``ddp.py:12-20``). Static under jit.

    horizon_parallel switches the Riccati sweep to the O(log N)-depth
    associative-scan formulation (solvers/pscan.py) — worthwhile for long horizons
    or small scenario batches; value propagation differs from the sequential split
    update by O(reg)."""

    max_iter: int = 30
    tol: float = 1e-6
    reg: float = 1e-6
    alphas: Tuple[float, ...] = (1.0, 0.5, 0.25, 0.1)
    horizon_parallel: bool = False


def _linearize(ocp: OCP, theta, X: Array, U: Array):
    """All per-step Jacobians and cost derivatives, horizon-parallel."""
    ks = jnp.arange(U.shape[0])
    f_jac = ocp.jac_fn()
    sd = ocp.stage_derivs_fn()
    A, B = jax.vmap(lambda x, u: f_jac(x, u, theta))(X[:-1], U)
    lx, lu, lxx, luu, lux = jax.vmap(lambda x, u, k: sd(x, u, k, theta))(X[:-1], U, ks)
    phi_x, phi_xx = ocp.terminal_derivs_fn()(X[-1], theta)
    return A, B, lx, lu, lxx, luu, lux, phi_x, phi_xx


def _backward_pass(A, B, lx, lu, lxx, luu, lux, phi_x, phi_xx, reg: float):
    """Riccati recursion -> feedback gains K [N,nu,nx] and feedforward kff [N,nu].

    One lax.scan step implements the reference recursion at ``ddp.py:213-254``.

    The carry holds V in a SCALED representation: true V = exp(log_s) * (V_x, V_xx).
    TPU float64 is emulated with f32 EXPONENT range (~3.4e38); when a plan penetrates
    the barrier's steep region, augmented Jacobian rows reach ~1e12 and the true V_xx
    compounds past 1e38 within a few steps — representable on CPU f64, inf -> NaN on
    TPU. Gains are scale-invariant ratios, so we renormalize the carry whenever it
    exceeds _V_SCALE_THRESH. Below the threshold log_s stays exactly 0.0 and every op
    is bitwise identical to the unscaled recursion (scale==1.0 branches are exact
    identities), preserving reference agreement in the normal regime.
    """
    nu = B.shape[-1]
    eye = jnp.eye(nu, dtype=B.dtype)
    thresh = jnp.asarray(
        _V_SCALE_THRESH if range_guard_default(B.dtype) else _V_SCALE_THRESH_F64,
        dtype=B.dtype,
    )

    def step(carry, inp):
        V_x, V_xx, log_s = carry
        A_k, B_k, lx_k, lu_k, lxx_k, luu_k, lux_k = inp
        inv_s = jnp.exp(-log_s)  # == 1.0 exactly while log_s == 0.0
        # Q blocks in V's scaled units (true Q = exp(log_s) * Q).
        Q_x = lx_k * inv_s + A_k.T @ V_x
        Q_u = lu_k * inv_s + B_k.T @ V_x
        Q_xx = lxx_k * inv_s + A_k.T @ V_xx @ A_k
        Q_ux = lux_k * inv_s + B_k.T @ V_xx @ A_k
        Q_uu = luu_k * inv_s + B_k.T @ V_xx @ B_k
        Q_uu_reg = Q_uu + (reg * inv_s) * eye

        K = -solve_spd(Q_uu_reg, Q_ux)
        kff = -solve_spd(Q_uu_reg, Q_u)

        V_x_new = Q_x + K.T @ Q_uu @ kff + K.T @ Q_u + Q_ux.T @ kff
        V_xx_new = Q_xx + K.T @ Q_uu @ K + K.T @ Q_ux + Q_ux.T @ K
        m = jnp.maximum(jnp.max(jnp.abs(V_xx_new)), jnp.max(jnp.abs(V_x_new)))
        scale = jnp.where(m > thresh, m / thresh, jnp.ones_like(m))
        return (V_x_new / scale, V_xx_new / scale, log_s + jnp.log(scale)), (K, kff)

    init = (phi_x, phi_xx, jnp.zeros((), dtype=B.dtype))
    _, (K, kff) = jax.lax.scan(
        step, init, (A, B, lx, lu, lxx, luu, lux), reverse=True
    )
    return K, kff


def _forward_pass(ocp: OCP, theta, x0, X_old, U_old, K, kff, alpha):
    """Closed-loop rollout at step size alpha with hard clamping (``ddp.py:261-296``)."""
    N = U_old.shape[0]

    def step(x, inp):
        x_o, u_o, K_k, k_k = inp
        du = k_k + K_k @ (x - x_o)
        u = ocp.clamp(u_o + alpha * du)
        xn = ocp.f(x, u, theta)
        return xn, (xn, u)

    _, (X_tail, U_new) = jax.lax.scan(step, x0, (X_old[:-1], U_old, K, kff))
    X_new = jnp.concatenate([x0[None], X_tail], axis=0)
    cost = total_cost(ocp, theta, X_new, U_new)

    if ocp.feasible is not None:
        ks = jnp.arange(N + 1)
        feas = jax.vmap(lambda x, k: ocp.feasible(x, k, theta))(X_new, ks)
        cost = jnp.where(jnp.all(feas), cost, jnp.asarray(jnp.inf, dtype=cost.dtype))
    return X_new, U_new, cost


def ilqr_solve(
    ocp: OCP,
    cfg: ILQRConfig,
    theta,
    x0: Array,
    U_init: Array,
) -> Tuple[Array, Array]:
    """Solve the box-constrained OCP; returns (X [N+1,nx], U [N,nu]).

    vmap over (theta, x0, U_init) for scenario batches; jit/shard_map compose freely.
    """
    with jax.default_matmul_precision("highest"):
        return _ilqr_solve_impl(ocp, cfg, theta, x0, U_init)


def _ilqr_solve_impl(ocp, cfg, theta, x0, U_init):
    # NOTE on precision: TPU MXU matmuls default to bf16 multiplies; on the 4x4/2x4
    # Riccati algebra that injects ~1e-2 absolute error per sweep (measured vs f64 —
    # see BASELINE.md). The solver always traces under matmul precision "highest".
    dtype = x0.dtype
    U0 = ocp.clamp(U_init)
    X0 = rollout(ocp, theta, x0, U0)
    alphas = jnp.asarray(cfg.alphas, dtype=dtype)

    def body(carry):
        it, X, U, prev_cost, _ = carry
        A, B, lx, lu, lxx, luu, lux, phi_x, phi_xx = _linearize(ocp, theta, X, U)
        if cfg.horizon_parallel:
            from .pscan import parallel_backward_pass
            K, kff = parallel_backward_pass(A, B, lx, lu, lxx, luu, lux, phi_x, phi_xx, cfg.reg)
        else:
            K, kff = _backward_pass(A, B, lx, lu, lxx, luu, lux, phi_x, phi_xx, cfg.reg)

        X_c, U_c, costs = jax.vmap(
            lambda a: _forward_pass(ocp, theta, x0, X, U, K, kff, a)
        )(alphas)
        # NaN candidates must never win: the reference's sequential `cost < best`
        # comparison skips them (NaN < x is False, ddp.py:293-296); argmin would
        # pick them. Map NaN -> +inf so the best FINITE candidate is selected.
        costs = jnp.where(jnp.isnan(costs), jnp.inf, costs)
        best = jnp.argmin(costs)  # first minimum wins ties, like the reference's strict <
        best_cost = costs[best]
        # If NO candidate is finite (all rollouts overflowed — possible with exact
        # LU gains on a singular-barrier trajectory), keep the incumbent and stop:
        # the reference would accept the garbage first candidate and NaN out
        # (ddp.py:293 with best_cost None); freezing is the graceful equivalent.
        any_finite = jnp.isfinite(best_cost)
        X_new = jnp.where(any_finite, X_c[best], X)
        U_new = jnp.where(any_finite, U_c[best], U)
        best_cost = jnp.where(any_finite, best_cost, prev_cost)
        done = (jnp.abs(prev_cost - best_cost) < cfg.tol) | ~any_finite
        return it + 1, X_new, U_new, best_cost, done

    def cond(carry):
        it, _, _, _, done = carry
        return (it < cfg.max_iter) & (~done)

    init = (jnp.asarray(0), X0, U0, jnp.asarray(jnp.inf, dtype=dtype), jnp.asarray(False))
    _, X, U, _, _ = jax.lax.while_loop(cond, body, init)
    return X, U
