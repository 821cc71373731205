"""Public interface to the lane-major fused Pallas solver for tube-MPC problems.

Bridges the feature-last [B, ...] API to the [.., B] lane layout: builds the
LaneProblem from a ComponentSystem (ops/lanes.py), packs weights/barrier params into
const rows, transposes operands once at entry and back once at exit.

`tube_ilqr_solve_lanes` is semantically equivalent to
`vmap(ilqr_solve)` on `make_nominal_ocp`/`make_aux_ocp` problems (tested), at a
fraction of the on-chip cost (dense lanes instead of 64x-padded tiles).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.costs import CostWeights
from ..ops.dbas import BarrierParams
from ..ops.lanes import ComponentSystem, augmented_step_fn, init_b0_fn
from ..ops.pallas.lane_solver import LaneProblem, lane_ilqr_solve
from ..solvers.ilqr import ILQRConfig


def make_lane_problem(
    sys_c: ComponentSystem, *, barrier_type: str = "inverse", eps: float = 1e-6
) -> LaneProblem:
    f_hat = augmented_step_fn(sys_c, barrier_type=barrier_type, eps=eps)
    return LaneProblem(
        n=sys_c.n, m=sys_c.m, f_hat=f_hat, u_min=sys_c.u_min, u_max=sys_c.u_max
    )


def _rows(x: Array) -> Array:
    """[B, ..., d] feature-last -> [..., d, B] lane-major."""
    return jnp.moveaxis(x, 0, -1)


def _unrows(x: Array) -> Array:
    return jnp.moveaxis(x, -1, 0)


def tube_ilqr_solve_lanes(
    pb: LaneProblem,
    cfg: ILQRConfig,
    *,
    w: CostWeights,
    bp: BarrierParams,
    x_hat0: Array,            # [B, n̂]
    U_init: Array,            # [B, N, m]
    X_ref: Array,             # [B, N+1, n]  (or [N+1, n] broadcast: goal tracking)
    U_ref: Array,             # [B, N, m]    (or [N, m] broadcast)
    block_b: int = 4096,
    interpret: bool = False,
    with_iters: bool = False,
    with_lane_iters: bool = False,
    compact_caps: Tuple[int, ...] = (),
) -> Tuple[Array, ...]:
    """Solve B tube OCPs at once with the fused lane kernels.

    Returns (X_hat [B, N+1, n̂], U [B, N, m]) — plus the executed while_loop
    iteration count when with_iters=True and the per-lane iteration counts [B]
    when with_lane_iters=True (see lane_ilqr_solve). Clamping, alpha-ladder
    selection and per-lane convergence reproduce solvers/ilqr.ilqr_solve.
    compact_caps enables bitwise-identical straggler compaction (halve the
    working width at each cap when the unconverged lanes fit; see
    lane_ilqr_solve).
    """
    B, N, m = U_init.shape
    nh = pb.n_hat
    dtype = x_hat0.dtype

    if X_ref.ndim == 2:
        X_ref = jnp.broadcast_to(X_ref[None], (B,) + X_ref.shape)
    if U_ref.ndim == 2:
        U_ref = jnp.broadcast_to(U_ref[None], (B,) + U_ref.shape)

    # augment refs with a zero barrier row so ref indexing matches x̂
    Xr_hat = jnp.concatenate([X_ref, jnp.zeros(X_ref.shape[:-1] + (1,), dtype=dtype)], axis=-1)

    # clamp warm start + initial rollout (lane-major scan; once per solve)
    u_min = jnp.asarray(pb.u_min, dtype=dtype)
    u_max = jnp.asarray(pb.u_max, dtype=dtype)
    U0 = jnp.clip(U_init, u_min, u_max)

    U0_r = _rows(U0)          # [N, m, B]
    x0_r = _rows(x_hat0)      # [n̂, B]

    def roll_step(x_rows, u_rows):
        xs = tuple(x_rows[i] for i in range(nh))
        us = tuple(u_rows[a] for a in range(m))
        xn = pb.f_hat(xs, us, bp)
        xn = jnp.stack(xn, axis=0)
        return xn, xn

    _, X_tail = jax.lax.scan(roll_step, x0_r, U0_r)
    X0_r = jnp.concatenate([x0_r[None], X_tail], axis=0)   # [N+1, n̂, B]

    # pack weights / barrier params into const rows (per-lane values supported)
    C = _build_C(pb, w, bp, B, dtype)

    out = lane_ilqr_solve(
        pb,
        x_hat0=x0_r,
        U0=U0_r,
        X0=X0_r,
        X_ref=_rows(Xr_hat),
        U_ref=_rows(U_ref),
        C=C,
        max_iter=cfg.max_iter,
        tol=cfg.tol,
        reg=cfg.reg,
        alphas=cfg.alphas,
        block_b=block_b,
        interpret=interpret,
        with_iters=with_iters,
        with_lane_iters=with_lane_iters,
        compact_caps=compact_caps,
    )
    X_r, U_r = out[0], out[1]
    return (_unrows(X_r), _unrows(U_r)) + tuple(out[2:])


def _build_C(pb: LaneProblem, w: CostWeights, bp: BarrierParams, B: int, dtype) -> Array:
    """Const rows [nc, B]; vector weights may be shared [d] or per-lane [B, d];
    scalar params (qb, alpha, gamma, tight) may be scalar or per-lane [B]."""

    def comp(v, i) -> Array:
        v = jnp.asarray(v, dtype=dtype)
        if v.ndim == 2:      # [B, d] per-lane
            return v[:, i]
        return jnp.broadcast_to(v[i], (B,))  # [d] shared

    def scal(v) -> Array:
        v = jnp.asarray(v, dtype=dtype)
        return jnp.broadcast_to(v, (B,))     # scalar or per-lane [B]

    rows = (
        [2.0 * comp(w.Q, i) for i in range(pb.n)] + [2.0 * scal(w.qb)]
        + [2.0 * comp(w.R, a) for a in range(pb.m)]
        + [2.0 * comp(w.Qf, i) for i in range(pb.n)] + [2.0 * scal(w.qb)]
        + [scal(bp.alpha), scal(bp.gamma), scal(bp.tight)]
    )
    return jnp.stack(rows, axis=0)


def tube_sensitivity_grads_lanes(
    pb: LaneProblem,
    *,
    w: CostWeights,
    bp: BarrierParams,
    X_hat: Array,    # [B, N+1, n̂]  solved aux trajectory
    U: Array,        # [B, N, m]
    X_ref: Array,    # [B, N+1, n]  physical reference (nominal plan)
    U_ref: Array,    # [B, N, m]
    reg: float = 1e-9,
    active_tol: float = 1e-8,
    block_b: int = 4096,
    interpret: bool = False,
):
    """Fused lane-major δz sweep + closed-form Algorithm-2 weight gradients.

    Returns an AuxAdapt of per-lane gradients (Q [B, n], R [B, m], qb [B]) equal to
    grads_aux_from_deltas(ddp_sensitivity(...)) on the feature-last path
    (tests/test_lane_sensitivity.py)."""
    from ..ops.pallas.lane_sensitivity import lane_sensitivity_grads
    from .params import AuxAdapt

    B = U.shape[0]
    dtype = U.dtype
    Xr_hat = jnp.concatenate(
        [X_ref, jnp.zeros(X_ref.shape[:-1] + (1,), dtype=dtype)], axis=-1
    )
    C = _build_C(pb, w, bp, B, dtype)
    gx, gr = lane_sensitivity_grads(
        pb, X=_rows(X_hat), U=_rows(U), X_ref=_rows(Xr_hat), U_ref=_rows(U_ref),
        C=C, reg=reg, active_tol=active_tol, block_b=block_b, interpret=interpret,
    )
    return AuxAdapt(Q=_unrows(gx[: pb.n]), R=_unrows(gr), qb=gx[pb.n])


class GenericAuxGrads(NamedTuple):
    """Per-lane gradients of the upper loss w.r.t. the MAPPED generic ancillary
    parameters θ = (Q, R, Qf, qb, α, γ) (chain-rule to raws happens at the caller)."""

    Q: Array      # [B, n]
    R: Array      # [B, m]
    Qf: Array     # [B, n]
    qb: Array     # [B]
    alpha: Array  # [B]
    gamma: Array  # [B]


class GenericNominalGrads(NamedTuple):
    """Per-lane coupled-bilevel gradients w.r.t. the MAPPED nominal parameters
    θ̄ = (Q, R, Qf, qb, α, γ, tight)."""

    Q: Array
    R: Array
    Qf: Array
    qb: Array
    alpha: Array
    gamma: Array
    tight: Array


def tube_sensitivity_grads_lanes_generic(
    pb: LaneProblem,
    *,
    w: CostWeights,
    bp: BarrierParams,
    X_hat: Array,    # [B, N+1, n̂]
    U: Array,        # [B, N, m]
    X_ref: Array,    # [B, N+1, n]
    U_ref: Array,    # [B, N, m]
    reg: float = 1e-9,
    active_tol: float = 1e-8,
    block_b: int = 4096,
    interpret: bool = False,
    emit_ref_grads: bool = False,
):
    """Generic-path IFT gradients on the fused lane kernels: full θ including the
    separate terminal Qf and the barrier DYNAMICS parameters (α, γ) via the
    Σ_k δλ_{k+1}ᵀ ∂f̂/∂θ term. Parity vs the XLA custom_vjp path is pinned in
    tests/test_lane_generic.py.

    emit_ref_grads=True additionally returns (g_Xref [B, N+1, n̂], g_Uref [B, N, m])
    — ∂L/∂(X_ref, U_ref) with the barrier row zeroed — the upper gradients the
    coupled-bilevel chain feeds to the nominal sweep (g_Xref[N] already includes the
    terminal Qf cotangent)."""
    from ..ops.pallas.lane_sensitivity import lane_sensitivity_grads

    B = U.shape[0]
    dtype = U.dtype
    Xr_hat = jnp.concatenate(
        [X_ref, jnp.zeros(X_ref.shape[:-1] + (1,), dtype=dtype)], axis=-1
    )
    C = _build_C(pb, w, bp, B, dtype)
    out = lane_sensitivity_grads(
        pb, X=_rows(X_hat), U=_rows(U), X_ref=_rows(Xr_hat), U_ref=_rows(U_ref),
        C=C, reg=reg, active_tol=active_tol, block_b=block_b, interpret=interpret,
        generic=True, emit_ref_grads=emit_ref_grads,
    )
    if emit_ref_grads:
        gx, gr, gxt, gdyn, gxr, gur, gxrN = out
    else:
        gx, gr, gxt, gdyn = out
    grads = GenericAuxGrads(
        Q=_unrows(gx[: pb.n]),
        R=_unrows(gr),
        Qf=_unrows(gxt[: pb.n]),
        qb=gx[pb.n] + gxt[pb.n],
        alpha=gdyn[0],
        gamma=gdyn[1],
    )
    if not emit_ref_grads:
        return grads
    nh = pb.n_hat
    # zero the barrier row (X_ref's barrier component is a structural 0, not a
    # parameter the aux cost depends on) and assemble [B, N+1, n̂] incl. terminal
    mask = jnp.asarray([1.0] * pb.n + [0.0], dtype=dtype)
    g_Xref = jnp.concatenate(
        [jnp.moveaxis(gxr, -1, 0),                 # [B, N, n̂]
         jnp.moveaxis(gxrN, -1, 0)[:, None]],      # [B, 1, n̂]
        axis=1,
    ) * mask
    g_Uref = jnp.moveaxis(gur, -1, 0)
    return grads, g_Xref, g_Uref


def tube_sensitivity_grads_lanes_nominal_coupled(
    pb: LaneProblem,
    *,
    w: CostWeights,
    bp: BarrierParams,
    X_hat: Array,    # [B, N+1, n̂]  solved NOMINAL trajectory
    U: Array,        # [B, N, m]
    target: Array,   # [n] goal (the nominal stage tracks the fixed target)
    upper_gX: Array,  # [B, N+1, n̂]  upper grads from the aux reference-cotangents
    upper_gU: Array,  # [B, N, m]
    reg: float = 1e-9,
    active_tol: float = 1e-8,
    block_b: int = 4096,
    interpret: bool = False,
) -> GenericNominalGrads:
    """Coupled-bilevel nominal gradients: the δz sweep runs with CALLER-SUPPLIED
    upper gradients (the aux solve's ∂L/∂(X_ref, U_ref)) instead of the tube upper
    loss, then accumulates the full θ̄ gradient incl. the barrier dynamics
    parameters AND the nominal tightening (reference ``tube_mpc.py:505-599``)."""
    from ..ops.pallas.lane_sensitivity import lane_sensitivity_grads

    B, N, m_ = U.shape
    dtype = U.dtype
    Xr = jnp.broadcast_to(target[None, None], (B, N + 1, pb.n))
    Xr_hat = jnp.concatenate([Xr, jnp.zeros((B, N + 1, 1), dtype=dtype)], axis=-1)
    Ur = jnp.zeros((B, N, m_), dtype=dtype)
    C = _build_C(pb, w, bp, B, dtype)
    gx, gr, gxt, gdyn = lane_sensitivity_grads(
        pb, X=_rows(X_hat), U=_rows(U), X_ref=_rows(Xr_hat), U_ref=_rows(Ur),
        C=C, reg=reg, active_tol=active_tol, block_b=block_b, interpret=interpret,
        generic=True,
        upper_gx=_rows(upper_gX), upper_gu=_rows(upper_gU),
    )
    return GenericNominalGrads(
        Q=_unrows(gx[: pb.n]),
        R=_unrows(gr),
        Qf=_unrows(gxt[: pb.n]),
        qb=gx[pb.n] + gxt[pb.n],
        alpha=gdyn[0],
        gamma=gdyn[1],
        tight=gdyn[2],
    )
