"""Scenario-parallel engines: vmapped sweeps, tube verification, and population
Algorithm-2 with psum-reduced adaptation gradients over a device mesh.

Three levels (all new capability vs the single-trajectory reference, per BASELINE.json
north star):

1. `vmap_paper_closed_loop` — B independent closed loops (each scenario adapts its own
   θ): pure vmap, shardable by simply sharding the batch dim.
2. `tube_verification` — fixed controller parameters, B disturbance realizations, tube
   statistics (max tracking deviation, min safety margin, collision rate).
3. `run_population_adaptation` — ONE shared θ adapted online from the MEAN upper-loss
   gradient over B scenarios: per closed-loop step, every scenario solves its own
   nominal+ancillary MPC pair (vmap within a shard), and the adaptation gradient is
   reduced across the mesh with `lax.pmean` inside `shard_map` — the psum/all-reduce
   design the reference lacks entirely (SURVEY.md §2b).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.costs import CostWeights
from ..ops.dbas import AugmentedDynamics, BarrierParams
from ..solvers.diff_ilqr import make_diff_ilqr
from ..solvers.ilqr import ilqr_solve
from ..systems.base import System
from ..tube.closed_loop import ClosedLoopLog, TubeMPCConfig, run_paper_closed_loop
from ..tube.params import AuxAdapt, momentum_update, project_aux_adapt
from ..tube.problem import AuxTheta, NominalTheta, make_aux_ocp, make_nominal_ocp
from .mesh import SCENARIO_AXIS


# ---------------------------------------------------------------------------
# 1. Independent scenario sweep (per-scenario adaptation).
# ---------------------------------------------------------------------------

def vmap_paper_closed_loop(system, aug, cfg, *, w_nominal, aux_init, bp, x0, target, keys):
    """B independent adaptive closed loops; keys [B] drive i.i.d. disturbances.

    Returns a ClosedLoopLog with a leading batch dim. Shard `keys`/outputs over the
    scenario axis for multi-chip execution.
    """
    def one(key):
        return run_paper_closed_loop(
            system, aug, cfg,
            w_nominal=w_nominal, aux_init=aux_init, bp=bp, x0=x0, target=target, key=key,
        )

    return jax.vmap(one)(keys)


# ---------------------------------------------------------------------------
# 2. Tube verification: fixed controller, batched disturbances, tube statistics.
# ---------------------------------------------------------------------------

class TubeStats(NamedTuple):
    max_deviation: Array      # [] max_t,b ||x_b(t) - x̄(t)||
    mean_deviation: Array     # []
    min_safety: Array         # [] min_t,b h(x_b(t))
    collision_rate: Array     # [] fraction of scenarios with min_t h <= 0
    deviations: Array         # [B, H] per-scenario tracking deviation over time


def tube_verification(
    system: System,
    aug: AugmentedDynamics,
    cfg: TubeMPCConfig,
    *,
    w_nominal: CostWeights,
    w_aux: CostWeights,
    bp: BarrierParams,
    x0: Array,
    target: Array,
    keys: Array,
    h_exact=None,
    sys_c=None,
    eps: float = 1e-4,
) -> tuple[ClosedLoopLog, TubeStats]:
    """Monte-Carlo tube check: B closed loops with FIXED ancillary weights, then
    deviation/safety statistics against the (disturbance-free) nominal trajectory.

    This is the batched analogue of re-running the reference experiment many times —
    one vmapped program instead of B processes (SURVEY.md §2b row 1).

    sys_c: a ComponentSystem (ops/lanes.py) routes the closed loops through the fused
    lane Pallas pipeline (~100x faster at fleet scale, f32) — disturbances are drawn
    per key exactly as on the XLA path, so both engines verify the same noise.
    """
    if h_exact is None:
        h_exact = system.h
    adapt_off = TubeMPCConfig(
        N=cfg.N, H=cfg.H,
        nominal_max_iter=cfg.nominal_max_iter, aux_max_iter=cfg.aux_max_iter,
        tol=cfg.tol, reg=cfg.reg, alphas=cfg.alphas,
        adapt=type(cfg.adapt)(lr=0.0, momentum=0.0),  # frozen weights
    )
    aux_init = AuxAdapt(Q=w_aux.Q, R=w_aux.R, qb=w_aux.qb)

    if sys_c is not None:
        from ..tube.lane_closed_loop import run_paper_closed_loop_lanes

        w_seqs = jax.vmap(
            lambda k: system.sample_disturbance(k, (cfg.H,), dtype=x0.dtype)
        )(keys)
        logs = run_paper_closed_loop_lanes(
            system, aug, sys_c, adapt_off,
            w_nominal=w_nominal, aux_init=aux_init, bp=bp,
            x0=x0, target=target, w_seqs=w_seqs, eps=eps,
        )
    else:
        def one(key):
            return run_paper_closed_loop(
                system, aug, adapt_off,
                w_nominal=w_nominal, aux_init=aux_init, bp=bp, x0=x0, target=target, key=key,
            )

        logs = jax.vmap(one)(keys)
    dev = jnp.linalg.norm(logs.x_real - logs.x_bar, axis=-1)   # [B, H]
    h_vals = h_exact(logs.x_real)                               # [B, H]
    collided = jnp.any(h_vals <= 0.0, axis=-1)
    stats = TubeStats(
        max_deviation=jnp.max(dev),
        mean_deviation=jnp.mean(dev),
        min_safety=jnp.min(h_vals),
        collision_rate=jnp.mean(collided.astype(dev.dtype)),
        deviations=dev,
    )
    return logs, stats


# ---------------------------------------------------------------------------
# 3. Population Algorithm-2: shared θ, pmean-reduced gradient over the mesh.
# ---------------------------------------------------------------------------

class PopulationState(NamedTuple):
    x: Array        # [B, nx]
    b: Array        # [B]
    x_bar: Array    # [B, nx]
    b_bar: Array    # [B]
    U_nom_ws: Array  # [B, N, nu]
    U_aux_ws: Array  # [B, N, nu]
    adapt: AuxAdapt  # shared (replicated)
    vel: AuxAdapt


class PopulationLog(NamedTuple):
    loss_mean: Array    # [H]  masked mean over scenarios with finite loss+grad
    Q_hist: Array       # [H, nx]
    R_hist: Array       # [H, nu]
    qb_hist: Array      # [H]
    finite_frac: Array  # [H]  fraction of scenarios contributing (1.0 = all healthy)


def _population_scan(system, aug, cfg, w_nominal, bp, target, axis_name):
    """Build the shard-local H-step scan; gradients pmean'd over `axis_name` if set."""
    nx = system.nx
    ocp_nom = make_nominal_ocp(system, aug, target)
    ocp_aux = make_aux_ocp(system, aug)
    solve_aux = make_diff_ilqr(ocp_aux, cfg.aux_ilqr())
    theta_nom = NominalTheta(w=w_nominal, bp=bp)

    def step(state: PopulationState, w_t):
        # per-scenario nominal solves (vmap over the local shard)
        x_hat_bar = jnp.concatenate([state.x_bar, state.b_bar[:, None]], axis=-1)
        X_nom, U_nom = jax.vmap(
            lambda xh, ws: ilqr_solve(ocp_nom, cfg.nominal_ilqr(), theta_nom, xh, ws)
        )(x_hat_bar, state.U_nom_ws)
        X_ref = X_nom[..., :nx]

        x_hat = jnp.concatenate([state.x, state.b[:, None]], axis=-1)

        def upper_one(adapt: AuxAdapt, xh, ws, Xr, Ur):
            w_aux = CostWeights(Q=adapt.Q, R=adapt.R, Qf=adapt.Q, qb=adapt.qb)
            th = AuxTheta(
                w=w_aux, bp=bp,
                X_ref=jax.lax.stop_gradient(Xr),
                U_ref=jax.lax.stop_gradient(Ur),
            )
            X_aux, U_aux = solve_aux(th, xh, ws)
            L_i = jnp.sum((X_aux[:, :nx] - Xr) ** 2) + jnp.sum(X_aux[:, nx] ** 2)
            return L_i, (X_aux, U_aux)

        # PER-SCENARIO gradients, then a finite-masked mean: a single blown-up
        # scenario (obstacle penetration can overflow even guarded numerics) must
        # not poison the shared-θ update — with a plain grad-of-mean, one NaN
        # contribution wipes out the whole population via the sum.
        (L_i, (X_aux, U_aux)), g_i = jax.vmap(
            lambda xh, ws, Xr, Ur: jax.value_and_grad(upper_one, has_aux=True)(
                state.adapt, xh, ws, Xr, Ur
            )
        )(x_hat, state.U_aux_ws, X_ref, U_nom)

        g_finite = jnp.stack(
            [jnp.all(jnp.isfinite(g.reshape(g.shape[0], -1)), axis=-1)
             for g in jax.tree_util.tree_leaves(g_i)],
            axis=0,
        ).all(axis=0)
        ok = jnp.isfinite(L_i) & g_finite                       # [B_local]
        cnt = jnp.sum(ok.astype(L_i.dtype))
        g_sum = jax.tree.map(
            lambda g: jnp.sum(jnp.where(ok.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0), axis=0),
            g_i,
        )
        L_sum = jnp.sum(jnp.where(ok, L_i, 0))
        B_total = jnp.asarray(L_i.shape[0], dtype=L_i.dtype)

        if axis_name is not None:
            # exact global masked mean: psum numerators and the healthy count
            g_sum = jax.lax.psum(g_sum, axis_name)
            L_sum = jax.lax.psum(L_sum, axis_name)
            cnt = jax.lax.psum(cnt, axis_name)
            B_total = jax.lax.psum(B_total, axis_name)

        denom = jnp.maximum(cnt, 1.0)
        grads = jax.tree.map(lambda g: g / denom, g_sum)
        L = L_sum / denom
        finite_frac = cnt / B_total

        adapt, vel = momentum_update(state.adapt, grads, state.vel, cfg.adapt, project_aux_adapt)

        u = U_aux[:, 0]
        x_hat_next = jax.vmap(lambda xh, uu: aug.f_hat(xh, uu, bp))(x_hat, u)
        u_bar = U_nom[:, 0]
        x_hat_bar_next = jax.vmap(lambda xh, uu: aug.f_hat(xh, uu, bp))(x_hat_bar, u_bar)

        new_state = PopulationState(
            x=x_hat_next[..., :nx] + w_t,
            b=x_hat_next[..., nx],
            x_bar=x_hat_bar_next[..., :nx],
            b_bar=x_hat_bar_next[..., nx],
            U_nom_ws=jnp.concatenate([U_nom[:, 1:], U_nom[:, -1:]], axis=1),
            U_aux_ws=jnp.concatenate([U_aux[:, 1:], U_aux[:, -1:]], axis=1),
            adapt=adapt,
            vel=vel,
        )
        return new_state, (L, adapt.Q, adapt.R, adapt.qb, finite_frac)

    def run(x0_b: Array, w_seqs: Array, adapt0: AuxAdapt):
        """x0_b [B_local, nx]; w_seqs [B_local, H, nx].

        The time-major swap for the scan happens HERE (shard-locally) rather than at
        the caller: an eager transpose on the global batch-sharded array would be a
        cross-process computation on a non-fully-addressable array in multi-host runs
        (tests/test_multiprocess.py)."""
        w_seqs = jnp.swapaxes(w_seqs, 0, 1)  # [H, B_local, nx]
        B = x0_b.shape[0]
        b0 = aug.init_b0(x0_b, bp)
        N = cfg.N
        init = PopulationState(
            x=x0_b, b=b0, x_bar=x0_b, b_bar=b0,
            U_nom_ws=jnp.zeros((B, N, system.nu), dtype=x0_b.dtype),
            U_aux_ws=jnp.zeros((B, N, system.nu), dtype=x0_b.dtype),
            adapt=adapt0,
            vel=jax.tree.map(jnp.zeros_like, adapt0),
        )
        final, (Ls, Qh, Rh, qbh, ff) = jax.lax.scan(step, init, w_seqs)
        return PopulationLog(loss_mean=Ls, Q_hist=Qh, R_hist=Rh, qb_hist=qbh,
                             finite_frac=ff), final.adapt

    return run


def run_population_adaptation(
    system: System,
    aug: AugmentedDynamics,
    cfg: TubeMPCConfig,
    *,
    w_nominal: CostWeights,
    aux_init: AuxAdapt,
    bp: BarrierParams,
    x0_batch: Array,     # [B, nx]
    target: Array,
    w_seqs: Array,       # [B, H, nx]
    mesh: Optional[Mesh] = None,
):
    """Algorithm 2 with ONE shared θ trained on B scenarios at once.

    Single-device: plain vmapped scan. With `mesh`: shard_map over the scenario axis —
    each device advances B/n_dev closed loops, the adaptation gradient is pmean'd over
    the mesh every step (psum over ICI/DCN), and θ stays replicated-in-sync by
    construction. B must be divisible by the mesh size.
    """
    if mesh is None:
        run = _population_scan(system, aug, cfg, w_nominal, bp, target, axis_name=None)
        return run(x0_batch, w_seqs, aux_init)

    axis = mesh.axis_names[0]
    run = _population_scan(system, aug, cfg, w_nominal, bp, target, axis_name=axis)

    shard = P(axis)
    # check_vma=False: the scan carry mixes shard-varying state (x, warm starts) with
    # mesh-replicated state (the shared θ, kept in sync by the pmean), which the
    # varying-axes analysis can't express; the collectives themselves are unaffected.
    sharded_run = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(shard, shard, P()),
        out_specs=(P(), P()),   # log and final adapt are identical on every device
        check_vma=False,
    )
    return sharded_run(x0_batch, w_seqs, aux_init)
