"""Batched closed-loop Algorithm 2 on the lane-major fused Pallas solver.

The throughput flagship: B adaptive tube-MPC closed loops advance together inside one
jitted lax.scan over H, with BOTH iLQR solves per step executed by the fused lane
kernels (ops/pallas/lane_solver.py) over the whole scenario batch at once, and the
Algorithm-2 gradient computed from the O(T) DDP sensitivity + the closed-form weight
formulas (reference ``tube_mpc.py:963-976``, parity-tested in tests/test_gradients.py).

Modes:
- independent (default): every scenario adapts its own (Q, R, q_b) — the batched
  equivalent of B reference runs;
- population=True: one shared θ updated with the batch-mean gradient (optionally
  pmean'd across a mesh by the caller wrapping this in shard_map).

Semantics per step match tube/closed_loop.run_paper_closed_loop.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.costs import CostWeights
from ..ops.dbas import AugmentedDynamics, BarrierParams
from ..ops.lanes import ComponentSystem
from ..systems.base import System
from .closed_loop import ClosedLoopLog, TubeMPCConfig
from .lane_interface import (
    make_lane_problem,
    tube_ilqr_solve_lanes,
    tube_sensitivity_grads_lanes,
)
from .params import AuxAdapt, momentum_update, project_aux_adapt


class LaneLoopState(NamedTuple):
    x: Array        # [B, nx]
    b: Array        # [B]
    x_bar: Array    # [B, nx]
    b_bar: Array    # [B]
    U_nom_ws: Array  # [B, N, nu]
    U_aux_ws: Array  # [B, N, nu]
    adapt: AuxAdapt  # per-lane ([B, ...]) or shared in population mode
    vel: AuxAdapt


def run_paper_closed_loop_lanes(
    system: System,
    aug: AugmentedDynamics,
    sys_c: ComponentSystem,
    cfg: TubeMPCConfig,
    *,
    w_nominal: CostWeights,
    aux_init: AuxAdapt,
    bp: BarrierParams,
    x0: Array,           # [nx] shared or [B, nx]
    target: Array,
    w_seqs: Optional[Array] = None,   # [B, H, nx]
    key: Optional[Array] = None,
    batch: Optional[int] = None,
    eps: float = 1e-4,
    barrier_type: str = "inverse",
    population: bool = False,
    block_b: int = 4096,
    interpret: bool = False,
) -> ClosedLoopLog:
    """Returns a ClosedLoopLog with leading batch dim [B, H, ...]."""
    nx, nu = system.nx, system.nu
    N, H = cfg.N, cfg.H

    if w_seqs is None:
        if key is None or batch is None:
            raise ValueError("provide w_seqs or (key, batch)")
        w_seqs = system.sample_disturbance(key, (batch, H), dtype=target.dtype)
    B = w_seqs.shape[0]
    dtype = w_seqs.dtype

    if x0.ndim == 1:
        x0 = jnp.broadcast_to(x0, (B, nx))

    pb = make_lane_problem(sys_c, barrier_type=barrier_type, eps=eps)
    nom_cfg = cfg.nominal_ilqr()
    aux_cfg = cfg.aux_ilqr()

    # per-lane adaptation state unless population mode
    if not population:
        aux_init = AuxAdapt(
            Q=jnp.broadcast_to(aux_init.Q, (B, nx)),
            R=jnp.broadcast_to(aux_init.R, (B, nu)),
            qb=jnp.broadcast_to(aux_init.qb, (B,)),
        )

    b0 = aug.init_b0(x0, bp)
    X_ref_nom = jnp.broadcast_to(target[None, None], (B, N + 1, nx))
    U_ref_nom = jnp.zeros((B, N, nu), dtype=dtype)
    w_tm = jnp.swapaxes(w_seqs, 0, 1)  # [H, B, nx]

    def step(state: LaneLoopState, w_t):
        x_hat_bar = jnp.concatenate([state.x_bar, state.b_bar[:, None]], axis=-1)
        X_nom, U_nom = tube_ilqr_solve_lanes(
            pb, nom_cfg, w=w_nominal, bp=bp,
            x_hat0=x_hat_bar, U_init=state.U_nom_ws,
            X_ref=X_ref_nom, U_ref=U_ref_nom,
            block_b=block_b, interpret=interpret,
        )
        X_ref = X_nom[..., :nx]                      # [B, N+1, nx]

        x_hat = jnp.concatenate([state.x, state.b[:, None]], axis=-1)
        w_aux = CostWeights(Q=state.adapt.Q, R=state.adapt.R, Qf=state.adapt.Q, qb=state.adapt.qb)
        X_aux, U_aux = tube_ilqr_solve_lanes(
            pb, aux_cfg, w=w_aux, bp=bp,
            x_hat0=x_hat, U_init=state.U_aux_ws,
            X_ref=X_ref, U_ref=U_nom,
            block_b=block_b, interpret=interpret,
        )

        # upper loss + closed-form Algorithm-2 gradient from the δz sensitivity,
        # computed by the fused lane kernels (the vmapped feature-last XLA sweep
        # was ~89% of the step at B=8192; see ops/pallas/lane_sensitivity.py).
        dx = X_aux[..., :nx] - X_ref                 # [B, N+1, nx]
        db = X_aux[..., nx]                          # [B, N+1]
        L = jnp.sum(dx * dx, axis=(-2, -1)) + jnp.sum(db * db, axis=-1)  # [B]

        if population:
            Qb = jnp.broadcast_to(state.adapt.Q, (B, nx))
            Rb = jnp.broadcast_to(state.adapt.R, (B, nu))
            qbb = jnp.broadcast_to(state.adapt.qb, (B,))
        else:
            Qb, Rb, qbb = state.adapt.Q, state.adapt.R, state.adapt.qb
        grads = tube_sensitivity_grads_lanes(
            pb, w=CostWeights(Q=Qb, R=Rb, Qf=Qb, qb=qbb), bp=bp,
            X_hat=X_aux, U=U_aux, X_ref=X_ref, U_ref=U_nom,
            reg=1e-9, block_b=block_b, interpret=interpret,
        )
        # Fault isolation (parallel/scenarios.py design): in barrier-violating
        # regimes the TRUE sensitivity is astronomical and overflows f32 — a lane
        # whose gradient is non-finite skips this update (θ keeps its value and the
        # lane recovers once it escapes) instead of poisoning its θ forever.
        ok = (
            jnp.isfinite(grads.Q).all(axis=-1)
            & jnp.isfinite(grads.R).all(axis=-1)
            & jnp.isfinite(grads.qb)
            & jnp.isfinite(L)
        )  # [B]
        grads = AuxAdapt(
            Q=jnp.where(ok[:, None], grads.Q, 0.0),
            R=jnp.where(ok[:, None], grads.R, 0.0),
            qb=jnp.where(ok, grads.qb, 0.0),
        )
        if population:
            cnt = jnp.maximum(jnp.sum(ok.astype(L.dtype)), 1.0)
            grads = jax.tree.map(lambda g: jnp.sum(g, axis=0) / cnt, grads)

        adapt, vel = momentum_update(state.adapt, grads, state.vel, cfg.adapt, project_aux_adapt)

        # true + nominal propagation
        u = U_aux[:, 0]
        x_hat_next = aug.f_hat(x_hat, u, bp)
        u_bar = U_nom[:, 0]
        x_hat_bar_next = aug.f_hat(x_hat_bar, u_bar, bp)

        new_state = LaneLoopState(
            x=x_hat_next[..., :nx] + w_t,
            b=x_hat_next[..., nx],
            x_bar=x_hat_bar_next[..., :nx],
            b_bar=x_hat_bar_next[..., nx],
            U_nom_ws=jnp.concatenate([U_nom[:, 1:], U_nom[:, -1:]], axis=1),
            U_aux_ws=jnp.concatenate([U_aux[:, 1:], U_aux[:, -1:]], axis=1),
            adapt=adapt,
            vel=vel,
        )
        logQ = jnp.broadcast_to(adapt.Q, (B, nx))
        logR = jnp.broadcast_to(adapt.R, (B, nu))
        logqb = jnp.broadcast_to(adapt.qb, (B,))
        log = (state.x, u, state.x_bar, u_bar, state.b, L, logQ, logR, logqb)
        return new_state, log

    init = LaneLoopState(
        x=x0, b=b0, x_bar=x0, b_bar=b0,
        U_nom_ws=jnp.zeros((B, N, nu), dtype=dtype),
        U_aux_ws=jnp.zeros((B, N, nu), dtype=dtype),
        adapt=aux_init,
        vel=jax.tree.map(jnp.zeros_like, aux_init),
    )
    _, logs = jax.lax.scan(step, init, w_tm)
    # time-major -> batch-major
    logs = tuple(jnp.swapaxes(l, 0, 1) for l in logs)
    return ClosedLoopLog(*logs)
