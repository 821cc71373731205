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

from typing import NamedTuple, Optional, Tuple

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
    tube_sensitivity_grads_lanes_generic,
    tube_sensitivity_grads_lanes_nominal_coupled,
)
from .params import (
    AuxAdapt,
    RawAuxTheta,
    RawNominalTheta,
    momentum_update,
    project_aux_adapt,
    project_raw,
)


class LaneLoopState(NamedTuple):
    x: Array        # [B, nx]
    b: Array        # [B]
    x_bar: Array    # [B, nx]
    b_bar: Array    # [B]
    U_nom_ws: Array  # [B, N, nu]
    U_aux_ws: Array  # [B, N, nu]
    adapt: AuxAdapt  # per-lane ([B, ...]) or shared in population mode
    vel: AuxAdapt


def make_paper_lane_step(
    system: System,
    aug: AugmentedDynamics,
    pb,
    cfg: TubeMPCConfig,
    *,
    w_nominal: CostWeights,
    bp: BarrierParams,
    target: Array,
    B: int,
    dtype,
    population: bool = False,
    block_b: int = 4096,
    interpret: bool = False,
    axis_name: Optional[str] = None,
    iter_telemetry: bool = False,
    nom_compact_caps: Tuple[int, ...] = (),
    aux_compact_caps: Tuple[int, ...] = (),
):
    """Build the per-step lane scan body (shared by the monolithic driver below and
    the segmented/checkpointed runner in utils/checkpoint.py).

    iter_telemetry appends the per-lane solver iteration counts (nominal, aux) to
    the log tuple — the straggler diagnostic behind benchmarks/iter_probe.py (batch
    cost per step is gated by max over lanes; useful work is the mean).

    nom_compact_caps / aux_compact_caps: bitwise-identical straggler compaction for
    the two solves (see ops/pallas/lane_solver.lane_ilqr_solve compact_caps) —
    the aux solve (max_iter 20, long convergence tail) is the profitable target.

    axis_name: population mode inside shard_map — the shared-θ gradient becomes a
    GLOBAL finite-masked mean: (Σ grads, Σ ok) are psum'd over the mesh axis before
    dividing, so θ stays replicated-in-sync by construction (mirrors
    parallel/scenarios.py's population path; B is then the PER-DEVICE lane count)."""
    nx, nu = system.nx, system.nu
    N = cfg.N
    nom_cfg = cfg.nominal_ilqr()
    aux_cfg = cfg.aux_ilqr()
    X_ref_nom = jnp.broadcast_to(target[None, None], (B, N + 1, nx))
    U_ref_nom = jnp.zeros((B, N, nu), dtype=dtype)

    def step(state: LaneLoopState, w_t):
        x_hat_bar = jnp.concatenate([state.x_bar, state.b_bar[:, None]], axis=-1)
        nom_out = tube_ilqr_solve_lanes(
            pb, nom_cfg, w=w_nominal, bp=bp,
            x_hat0=x_hat_bar, U_init=state.U_nom_ws,
            X_ref=X_ref_nom, U_ref=U_ref_nom,
            block_b=block_b, interpret=interpret, with_lane_iters=iter_telemetry,
            compact_caps=nom_compact_caps,
        )
        X_nom, U_nom = nom_out[0], nom_out[1]
        X_ref = X_nom[..., :nx]                      # [B, N+1, nx]

        x_hat = jnp.concatenate([state.x, state.b[:, None]], axis=-1)
        w_aux = CostWeights(Q=state.adapt.Q, R=state.adapt.R, Qf=state.adapt.Q, qb=state.adapt.qb)
        aux_out = tube_ilqr_solve_lanes(
            pb, aux_cfg, w=w_aux, bp=bp,
            x_hat0=x_hat, U_init=state.U_aux_ws,
            X_ref=X_ref, U_ref=U_nom,
            block_b=block_b, interpret=interpret, with_lane_iters=iter_telemetry,
            compact_caps=aux_compact_caps,
        )
        X_aux, U_aux = aux_out[0], aux_out[1]

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
            cnt = jnp.sum(ok.astype(L.dtype))
            sums = jax.tree.map(lambda g: jnp.sum(g, axis=0), grads)
            if axis_name is not None:
                cnt = jax.lax.psum(cnt, axis_name)
                sums = jax.lax.psum(sums, axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            grads = jax.tree.map(lambda s: s / cnt, sums)

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
        if iter_telemetry:
            log = log + (nom_out[2], aux_out[2])
        return new_state, log

    return step


def paper_lane_init_state(
    system: System, aug: AugmentedDynamics, cfg: TubeMPCConfig,
    *, aux_init: AuxAdapt, bp: BarrierParams, x0: Array, B: int, dtype,
    population: bool = False,
) -> LaneLoopState:
    nx, nu = system.nx, system.nu
    if x0.ndim == 1:
        x0 = jnp.broadcast_to(x0, (B, nx))
    if not population:
        aux_init = AuxAdapt(
            Q=jnp.broadcast_to(aux_init.Q, (B, nx)),
            R=jnp.broadcast_to(aux_init.R, (B, nu)),
            qb=jnp.broadcast_to(aux_init.qb, (B,)),
        )
    b0 = aug.init_b0(x0, bp)
    return LaneLoopState(
        x=x0, b=b0, x_bar=x0, b_bar=b0,
        U_nom_ws=jnp.zeros((B, cfg.N, nu), dtype=dtype),
        U_aux_ws=jnp.zeros((B, cfg.N, nu), dtype=dtype),
        adapt=aux_init,
        vel=jax.tree.map(jnp.zeros_like, aux_init),
    )


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
    nom_compact_caps: Tuple[int, ...] = (),
    aux_compact_caps: Tuple[int, ...] = (),
) -> ClosedLoopLog:
    """Returns a ClosedLoopLog with leading batch dim [B, H, ...]."""
    H = cfg.H
    if w_seqs is None:
        if key is None or batch is None:
            raise ValueError("provide w_seqs or (key, batch)")
        w_seqs = system.sample_disturbance(key, (batch, H), dtype=target.dtype)
    B = w_seqs.shape[0]
    dtype = w_seqs.dtype

    pb = make_lane_problem(sys_c, barrier_type=barrier_type, eps=eps)
    step = make_paper_lane_step(
        system, aug, pb, cfg, w_nominal=w_nominal, bp=bp, target=target,
        B=B, dtype=dtype, population=population, block_b=block_b, interpret=interpret,
        nom_compact_caps=nom_compact_caps, aux_compact_caps=aux_compact_caps,
    )
    init = paper_lane_init_state(
        system, aug, cfg, aux_init=aux_init, bp=bp, x0=x0, B=B, dtype=dtype,
        population=population,
    )
    w_tm = jnp.swapaxes(w_seqs, 0, 1)  # [H, B, nx]
    _, logs = jax.lax.scan(step, init, w_tm)
    # time-major -> batch-major
    logs = tuple(jnp.swapaxes(l, 0, 1) for l in logs)
    return ClosedLoopLog(*logs)


def run_paper_closed_loop_lanes_sharded(
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
    w_seqs: Array,       # [B, H, nx] (global batch)
    mesh,
    eps: float = 1e-4,
    barrier_type: str = "inverse",
    population: bool = False,
    block_b: int = 4096,
    interpret: bool = False,
) -> ClosedLoopLog:
    """FLAGSHIP multi-chip path: the fused-kernel lane closed loop shard_map'd over
    a `jax.sharding.Mesh` scenario axis (SURVEY.md §2b rows 1-2).

    Each device advances B/n_dev lanes with the same fused Pallas kernels as the
    single-chip driver (lane blocks are sized against the PER-DEVICE batch, so block
    padding and shard sizes compose); independent mode shards trivially, population
    mode keeps the shared θ replicated-in-sync via an in-scan psum of the
    finite-masked gradient (see make_paper_lane_step). Equality with the
    single-device driver is pinned by tests/test_lane_mesh.py on the virtual
    8-device CPU mesh in interpret mode."""
    from jax.sharding import PartitionSpec as P

    H = cfg.H
    B = w_seqs.shape[0]
    n_dev = mesh.size
    if B % n_dev != 0:
        raise ValueError(f"global batch {B} not divisible by mesh size {n_dev}")
    b_local = B // n_dev
    dtype = w_seqs.dtype
    axis = mesh.axis_names[0]
    nx = system.nx
    if x0.ndim == 1:
        x0 = jnp.broadcast_to(x0, (B, nx))

    pb = make_lane_problem(sys_c, barrier_type=barrier_type, eps=eps)
    step = make_paper_lane_step(
        system, aug, pb, cfg, w_nominal=w_nominal, bp=bp, target=target,
        B=b_local, dtype=dtype, population=population, block_b=block_b,
        interpret=interpret, axis_name=axis if population else None,
    )

    def run(w_shard, x0_shard):
        init = paper_lane_init_state(
            system, aug, cfg, aux_init=aux_init, bp=bp, x0=x0_shard, B=b_local,
            dtype=dtype, population=population,
        )
        w_tm = jnp.swapaxes(w_shard, 0, 1)  # [H, b_local, nx]
        _, logs = jax.lax.scan(step, init, w_tm)
        return tuple(jnp.swapaxes(l, 0, 1) for l in logs)

    # check_vma=False: population mode mixes shard-varying lane state with
    # mesh-replicated shared θ (kept in sync by the psum), which the varying-axes
    # analysis can't express (same treatment as parallel/scenarios.py).
    logs = jax.shard_map(
        run, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(w_seqs, x0)
    return ClosedLoopLog(*logs)


class GenericLaneState(NamedTuple):
    x: Array        # [B, nx]
    b: Array        # [B]
    x_bar: Array    # [B, nx]
    b_bar: Array    # [B]
    U_nom_ws: Array  # [B, N, nu]
    U_aux_ws: Array  # [B, N, nu]
    raw_aux: RawAuxTheta   # [B, ...] leaves
    vel_aux: RawAuxTheta
    raw_nom: RawNominalTheta  # [B, ...] leaves (fixed when not adapt_nominal)
    vel_nom: RawNominalTheta


def _raw_chain(raw: RawAuxTheta, g) -> RawAuxTheta:
    """Chain-rule mapped-space gradients to raw space: softplus' = sigmoid(raw),
    (softplus+c)' = sigmoid(raw), tanh' = 1 - tanh^2 (reference ``params.py:29-35``
    reparameterizations; the reference autodiffs this, we apply it in closed form)."""
    sg = jax.nn.sigmoid
    th = jnp.tanh(raw.gamma_raw)
    return RawAuxTheta(
        Q_raw=g.Q * sg(raw.Q_raw),
        R_raw=g.R * sg(raw.R_raw),
        Qf_raw=g.Qf * sg(raw.Qf_raw),
        qb_raw=g.qb * sg(raw.qb_raw),
        alpha_raw=g.alpha * sg(raw.alpha_raw),
        gamma_raw=g.gamma * (1.0 - th * th),
    )


def _raw_chain_nom(raw: RawNominalTheta, g) -> RawNominalTheta:
    """Nominal-side chain rule (adds tight: softplus')."""
    sg = jax.nn.sigmoid
    th = jnp.tanh(raw.gamma_raw)
    return RawNominalTheta(
        Q_raw=g.Q * sg(raw.Q_raw),
        R_raw=g.R * sg(raw.R_raw),
        Qf_raw=g.Qf * sg(raw.Qf_raw),
        qb_raw=g.qb * sg(raw.qb_raw),
        alpha_raw=g.alpha * sg(raw.alpha_raw),
        gamma_raw=g.gamma * (1.0 - th * th),
        tight_raw=g.tight * sg(raw.tight_raw),
    )


def make_generic_lane_step(
    system: System,
    aug: AugmentedDynamics,
    pb,
    cfg: TubeMPCConfig,
    *,
    target: Array,
    B: int,
    dtype,
    block_b: int = 4096,
    interpret: bool = False,
    nom_compact_caps: Tuple[int, ...] = (),
    aux_compact_caps: Tuple[int, ...] = (),
):
    """Build the per-step generic/coupled lane scan body (shared by the monolithic
    driver below and the segmented/checkpointed runner in utils/checkpoint.py).

    cfg.adapt.steps > 1 runs the reference's inner adaptation loop
    (``tube_mpc.py:407-604``): iterations 2..steps re-derive the IFT gradient at the
    FIXED trajectories from this step's solves while θ moves — on the lane engine
    that is simply re-running the sensitivity kernels with the updated θ Hessians
    and barrier parameters on the same (X, U); the solves are not repeated. Static
    Python loop, unrolled into the scan body.
    """
    adapt_nominal = cfg.adapt_nominal
    nx, nu = system.nx, system.nu
    N = cfg.N
    nom_cfg = cfg.nominal_ilqr()
    aux_cfg = cfg.aux_ilqr()
    zero_t = jnp.zeros((B,), dtype=dtype)
    X_ref_nom = jnp.broadcast_to(target[None, None], (B, N + 1, nx))
    U_ref_nom = jnp.zeros((B, N, nu), dtype=dtype)

    def step(state: GenericLaneState, w_t):
        raw = state.raw_aux
        rawn = state.raw_nom
        w_aux = CostWeights(Q=raw.Q(), R=raw.R(), Qf=raw.Qf(), qb=raw.qb())
        bp_aux = BarrierParams(alpha=raw.alpha(), gamma=raw.gamma(), tight=zero_t)
        w_nom = CostWeights(Q=rawn.Q(), R=rawn.R(), Qf=rawn.Qf(), qb=rawn.qb())
        bp_nom = BarrierParams(alpha=rawn.alpha(), gamma=rawn.gamma(), tight=rawn.tight())

        x_hat_bar = jnp.concatenate([state.x_bar, state.b_bar[:, None]], axis=-1)
        X_nom, U_nom = tube_ilqr_solve_lanes(
            pb, nom_cfg, w=w_nom, bp=bp_nom,
            x_hat0=x_hat_bar, U_init=state.U_nom_ws,
            X_ref=X_ref_nom, U_ref=U_ref_nom,
            block_b=block_b, interpret=interpret, compact_caps=nom_compact_caps,
        )
        X_ref = X_nom[..., :nx]

        x_hat = jnp.concatenate([state.x, state.b[:, None]], axis=-1)
        X_aux, U_aux = tube_ilqr_solve_lanes(
            pb, aux_cfg, w=w_aux, bp=bp_aux,
            x_hat0=x_hat, U_init=state.U_aux_ws,
            X_ref=X_ref, U_ref=U_nom,
            block_b=block_b, interpret=interpret, compact_caps=aux_compact_caps,
        )

        dx = X_aux[..., :nx] - X_ref
        db = X_aux[..., nx]
        L = jnp.sum(dx * dx, axis=(-2, -1)) + jnp.sum(db * db, axis=-1)

        def grads_at(raw_i: RawAuxTheta, rawn_i: RawNominalTheta):
            """Raw-space IFT gradient at the FIXED trajectories with θ = (raw_i,
            rawn_i) — iteration 1 gets exactly the custom_vjp gradient; inner
            iterations get the reference's fixed-trajectory re-gradient."""
            w_aux_i = CostWeights(Q=raw_i.Q(), R=raw_i.R(), Qf=raw_i.Qf(), qb=raw_i.qb())
            bp_aux_i = BarrierParams(alpha=raw_i.alpha(), gamma=raw_i.gamma(), tight=zero_t)
            aux_out = tube_sensitivity_grads_lanes_generic(
                pb, w=w_aux_i, bp=bp_aux_i,
                X_hat=X_aux, U=U_aux, X_ref=X_ref, U_ref=U_nom,
                reg=1e-9, block_b=block_b, interpret=interpret,
                emit_ref_grads=adapt_nominal,
            )
            if not adapt_nominal:
                return _raw_chain(raw_i, aux_out), None
            g, g_Xref, g_Uref = aux_out
            if cfg.coupling == "full":
                # explicit ∂L/∂x̄ = -2 (x* - x̄) on the physical rows (the reference's
                # chain stops at the aux problem's cost dependence; this term makes
                # the bilevel gradient exact — tube/closed_loop.py coupling="full")
                expl = jnp.concatenate(
                    [-2.0 * dx, jnp.zeros((B, N + 1, 1), dtype=dtype)], axis=-1)
                g_Xref = g_Xref + expl
            w_nom_i = CostWeights(Q=rawn_i.Q(), R=rawn_i.R(), Qf=rawn_i.Qf(), qb=rawn_i.qb())
            bp_nom_i = BarrierParams(alpha=rawn_i.alpha(), gamma=rawn_i.gamma(),
                                     tight=rawn_i.tight())
            gn = tube_sensitivity_grads_lanes_nominal_coupled(
                pb, w=w_nom_i, bp=bp_nom_i,
                X_hat=X_nom, U=U_nom, target=target,
                upper_gX=g_Xref, upper_gU=g_Uref,
                reg=1e-9, block_b=block_b, interpret=interpret,
            )
            return _raw_chain(raw_i, g), _raw_chain_nom(rawn_i, gn)

        def _mask(tree, ok):
            return jax.tree.map(
                lambda v: jnp.where(ok[:, None] if v.ndim == 2 else ok, v, 0.0), tree)

        raw_new, vel_new = raw, state.vel_aux
        rawn_new, veln_new = rawn, state.vel_nom
        for _ in range(cfg.adapt.steps):
            g_raw, gn_raw = grads_at(raw_new, rawn_new)
            # fault isolation: lanes with non-finite gradients skip this update
            # (see run_paper_closed_loop_lanes)
            ok = jnp.isfinite(L)
            for leaf in g_raw:
                ok = ok & jnp.isfinite(leaf).all(axis=-1) if leaf.ndim == 2 else ok & jnp.isfinite(leaf)
            if adapt_nominal:
                for leaf in gn_raw:
                    ok = ok & jnp.isfinite(leaf).all(axis=-1) if leaf.ndim == 2 else ok & jnp.isfinite(leaf)
            raw_new, vel_new = momentum_update(
                raw_new, _mask(g_raw, ok), vel_new, cfg.adapt, project_raw)
            if adapt_nominal:
                rawn_new, veln_new = momentum_update(
                    rawn_new, _mask(gn_raw, ok), veln_new, cfg.adapt, project_raw)

        bp_aux_post = BarrierParams(alpha=raw_new.alpha(), gamma=raw_new.gamma(), tight=zero_t)
        bp_nom_post = BarrierParams(alpha=rawn_new.alpha(), gamma=rawn_new.gamma(),
                                    tight=rawn_new.tight())
        u = U_aux[:, 0]
        x_hat_next = aug.f_hat(x_hat, u, bp_aux_post)
        u_bar = U_nom[:, 0]
        x_hat_bar_next = aug.f_hat(x_hat_bar, u_bar, bp_nom_post)

        new_state = GenericLaneState(
            x=x_hat_next[..., :nx] + w_t,
            b=x_hat_next[..., nx],
            x_bar=x_hat_bar_next[..., :nx],
            b_bar=x_hat_bar_next[..., nx],
            U_nom_ws=jnp.concatenate([U_nom[:, 1:], U_nom[:, -1:]], axis=1),
            U_aux_ws=jnp.concatenate([U_aux[:, 1:], U_aux[:, -1:]], axis=1),
            raw_aux=raw_new,
            vel_aux=vel_new,
            raw_nom=rawn_new,
            vel_nom=veln_new,
        )
        log = (state.x, u, state.x_bar, u_bar, state.b, L,
               raw_new.Q(), raw_new.R(), raw_new.qb())
        return new_state, log

    return step


def generic_lane_init_state(
    system: System,
    aug: AugmentedDynamics,
    cfg: TubeMPCConfig,
    *,
    raw_nom: RawNominalTheta,
    raw_aux_init: RawAuxTheta,
    x0: Array,
    B: int,
    dtype,
) -> GenericLaneState:
    nx, nu = system.nx, system.nu
    if x0.ndim == 1:
        x0 = jnp.broadcast_to(x0, (B, nx))

    # per-lane raws (nominal broadcast too so the coupled path can adapt per lane)
    def _bcast(v, d):
        v = jnp.asarray(v, dtype=dtype)
        return jnp.broadcast_to(v, (B,) + v.shape[-1:]) if d else jnp.broadcast_to(v, (B,))

    raw_aux_init = RawAuxTheta(
        Q_raw=_bcast(raw_aux_init.Q_raw, True),
        R_raw=_bcast(raw_aux_init.R_raw, True),
        Qf_raw=_bcast(raw_aux_init.Qf_raw, True),
        qb_raw=_bcast(raw_aux_init.qb_raw, False),
        alpha_raw=_bcast(raw_aux_init.alpha_raw, False),
        gamma_raw=_bcast(raw_aux_init.gamma_raw, False),
    )
    raw_nom_init = RawNominalTheta(
        Q_raw=_bcast(raw_nom.Q_raw, True),
        R_raw=_bcast(raw_nom.R_raw, True),
        Qf_raw=_bcast(raw_nom.Qf_raw, True),
        qb_raw=_bcast(raw_nom.qb_raw, False),
        alpha_raw=_bcast(raw_nom.alpha_raw, False),
        gamma_raw=_bcast(raw_nom.gamma_raw, False),
        tight_raw=_bcast(raw_nom.tight_raw, False),
    )

    zero_t = jnp.zeros((B,), dtype=dtype)
    bp_aux0 = BarrierParams(alpha=raw_aux_init.alpha(), gamma=raw_aux_init.gamma(), tight=zero_t)
    b0 = aug.init_b0(x0, bp_aux0)
    bp_nom0 = BarrierParams(alpha=raw_nom_init.alpha(), gamma=raw_nom_init.gamma(),
                            tight=raw_nom_init.tight())
    b_bar0 = aug.init_b0(x0, bp_nom0)
    if b_bar0.ndim == 0:
        b_bar0 = jnp.broadcast_to(b_bar0, (B,))

    return GenericLaneState(
        x=x0, b=b0, x_bar=x0, b_bar=b_bar0,
        U_nom_ws=jnp.zeros((B, cfg.N, nu), dtype=dtype),
        U_aux_ws=jnp.zeros((B, cfg.N, nu), dtype=dtype),
        raw_aux=raw_aux_init,
        vel_aux=jax.tree.map(jnp.zeros_like, raw_aux_init),
        raw_nom=raw_nom_init,
        vel_nom=jax.tree.map(jnp.zeros_like, raw_nom_init),
    )


def run_generic_closed_loop_lanes(
    system: System,
    aug: AugmentedDynamics,
    sys_c: ComponentSystem,
    cfg: TubeMPCConfig,
    *,
    raw_nom: RawNominalTheta,      # fixed (uncoupled generic path)
    raw_aux_init: RawAuxTheta,     # shared [d]-leaves or per-lane [B, d]
    x0: Array,
    target: Array,
    w_seqs: Optional[Array] = None,
    key: Optional[Array] = None,
    batch: Optional[int] = None,
    eps: float = 1e-6,
    barrier_type: str = "inverse",
    block_b: int = 4096,
    interpret: bool = False,
    nom_compact_caps: Tuple[int, ...] = (),
    aux_compact_caps: Tuple[int, ...] = (),
) -> Tuple[ClosedLoopLog, Tuple[RawAuxTheta, RawNominalTheta]]:
    """Generic-path (raw-reparameterized θ, adaptive barrier α/γ) closed loop on the
    fused lane kernels — the reference's ``run_closed_loop_experiment`` with
    ``paper_dubins_mode: false, adapt_nominal: false`` (``tube_mpc.py:40-663``), B
    lanes at once. Semantics per step match tube/closed_loop.run_generic_closed_loop
    with adapt_nominal=False (parity-tested in tests/test_lane_generic.py).

    The nominal problem uses the FIXED mapped θ̄ (incl. its barrier α/γ and
    tightening); each lane's ancillary raw θ adapts by projected momentum on the
    full IFT gradient (weights + barrier dynamics parameters) computed by the
    generic lane sensitivity kernels. cfg.adapt.steps > 1 runs the reference's
    inner fixed-trajectory adaptation loop (see make_generic_lane_step).

    With cfg.adapt_nominal=True the COUPLED bilevel chain runs fully on the lane
    kernels: the aux sensitivity additionally emits ∂L/∂(X_ref, U_ref) (the
    reference-cotangents of the tracking cost), a second sweep on the nominal
    problem consumes them as upper gradients and accumulates the full θ̄ gradient
    (weights + α/γ/tight dynamics terms), and both raw parameter sets update by
    projected momentum — the reference's hand-wired chain of
    ``tube_mpc.py:505-599``, per lane. cfg.coupling="full" adds the explicit
    ∂L/∂x̄ term (capability beyond the reference).

    Returns (log [B, H, ...], (final raw_aux, final raw_nom)).
    """
    if cfg.adapt.steps < 1:
        raise ValueError("adapt.steps must be >= 1")
    nx = system.nx
    H = cfg.H

    if w_seqs is None:
        if key is None or batch is None:
            raise ValueError("provide w_seqs or (key, batch)")
        w_seqs = system.sample_disturbance(key, (batch, H), dtype=target.dtype)
    B = w_seqs.shape[0]
    dtype = w_seqs.dtype

    pb = make_lane_problem(sys_c, barrier_type=barrier_type, eps=eps)
    step = make_generic_lane_step(
        system, aug, pb, cfg, target=target, B=B, dtype=dtype,
        block_b=block_b, interpret=interpret,
        nom_compact_caps=nom_compact_caps, aux_compact_caps=aux_compact_caps,
    )
    init = generic_lane_init_state(
        system, aug, cfg, raw_nom=raw_nom, raw_aux_init=raw_aux_init,
        x0=x0, B=B, dtype=dtype,
    )
    w_tm = jnp.swapaxes(w_seqs, 0, 1)
    final, logs = jax.lax.scan(step, init, w_tm)
    logs = tuple(jnp.swapaxes(l, 0, 1) for l in logs)
    return ClosedLoopLog(*logs), (final.raw_aux, final.raw_nom)
