"""Closed-loop two-layer Tube MPC with online Algorithm-2 adaptation, as ONE jitted
lax.scan over the task horizon.

Reference behavior being reproduced (correctness oracle):
- paper path: ``core/tube_mpc.py:666-1048`` (_run_dubins_paper) — fixed nominal MPC,
  ancillary weights (Q, R, q_b) adapted by projected momentum descent on
  L = ||x* - x̄||² + ||b*||², one update per closed-loop step;
- generic path: ``core/tube_mpc.py:40-663`` — softplus/tanh-reparameterized θ̄ and θ
  (incl. barrier alpha/gamma and nominal tightening), optional coupled nominal
  adaptation through the auxiliary problem's reference dependence;
- nominal-only receding horizon: ``run_nominal.py:204-415`` with success/collision
  stopping.

TPU-native structure: where the reference steps a Python for-loop on the host calling
2 solver invocations + a hand-wired sensitivity pipeline per step
(``tube_mpc.py:803-1023``), here the entire H-step loop — both iLQR solves, the upper
loss, its gradient (via the diff-iLQR custom_vjp), the projected momentum update, the
disturbance step and the warm-start shifts — is a single `lax.scan` body compiled once
and run on-device with zero host round-trips. The whole closed loop vmaps over
scenarios (disturbance draws, initial states, θ inits) and shards over device meshes.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.costs import CostWeights
from ..ops.dbas import AugmentedDynamics, BarrierParams
from ..solvers.diff_ilqr import make_diff_ilqr, make_ift_regrad
from ..solvers.ilqr import ILQRConfig, ilqr_solve
from ..systems.base import System
from .params import (
    AdaptConfig,
    AuxAdapt,
    RawAuxTheta,
    RawNominalTheta,
    momentum_update,
    project_aux_adapt,
    project_raw,
)
from .problem import AuxTheta, NominalTheta, make_aux_ocp, make_nominal_ocp


@dataclasses.dataclass(frozen=True)
class TubeMPCConfig:
    """Static closed-loop configuration.

    Note the reference's paper path builds its ILQRConfig with tol=1e-3 and the
    DEFAULT reg=1e-6, ignoring the YAML's ilqr_reg (``tube_mpc.py:757-768``); the
    generic path uses the YAML reg (``tube_mpc.py:163-165``). Both are expressible
    here via `reg`.
    """

    N: int
    H: int
    nominal_max_iter: int = 10
    aux_max_iter: int = 20
    tol: float = 1e-3
    reg: float = 1e-6
    alphas: Tuple[float, ...] = (1.0,)
    adapt: AdaptConfig = AdaptConfig(lr=5e-2, momentum=0.9)
    adapt_nominal: bool = False
    adapt_ancillary: bool = True
    # "reference": L treats the nominal plan as constant (stop_gradient on x̄ in the
    # loss), matching the reference's coupled path which chains dL/dθ̄ only through the
    # auxiliary problem's reference dependence (tube_mpc.py:505-559). "full": exact
    # bilevel gradient including the explicit ∂L/∂x̄ term (the chain rule makes it free).
    coupling: str = "reference"

    def nominal_ilqr(self) -> ILQRConfig:
        return ILQRConfig(max_iter=self.nominal_max_iter, tol=self.tol, reg=self.reg, alphas=self.alphas)

    def aux_ilqr(self) -> ILQRConfig:
        return ILQRConfig(max_iter=self.aux_max_iter, tol=self.tol, reg=self.reg, alphas=self.alphas)


class ClosedLoopLog(NamedTuple):
    """Per-step trajectories (reference ``ExperimentTrajectories``, tube_mpc.py:27-37)."""

    x_real: Array   # [H, nx]   state at the start of each step
    u_real: Array   # [H, nu]   applied ancillary control
    x_bar: Array    # [H, nx]   nominal state
    u_bar: Array    # [H, nu]   applied nominal control
    b_real: Array   # [H]       barrier state
    loss: Array     # [H]       upper loss L per step
    Q_hist: Array   # [H, nx]   adapted ancillary Q (post-update)
    R_hist: Array   # [H, nu]
    qb_hist: Array  # [H]


def _shift(U: Array) -> Array:
    """Receding-horizon warm-start shift (reference ``tube_mpc.py:1016-1017``)."""
    return jnp.concatenate([U[1:], U[-1:]], axis=0)


def _upper_loss(X_aux: Array, x_nom: Array, nx: int) -> Array:
    """L = ||x* - x̄||² + ||b*||² over the full plan (reference ``tube_mpc.py:915-919``)."""
    return jnp.sum((X_aux[:, :nx] - x_nom) ** 2) + jnp.sum(X_aux[:, nx] ** 2)


# ---------------------------------------------------------------------------
# Paper path: fixed nominal, ancillary (Q, R, q_b) adapted.
# ---------------------------------------------------------------------------

class PaperLoopState(NamedTuple):
    x: Array
    b: Array
    x_bar: Array
    b_bar: Array
    U_nom_ws: Array
    U_aux_ws: Array
    adapt: AuxAdapt
    vel: AuxAdapt


def make_paper_step(
    system: System,
    aug: AugmentedDynamics,
    cfg: TubeMPCConfig,
    *,
    w_nominal: CostWeights,
    bp: BarrierParams,
    target: Array,
    debug_checks: bool = False,
    extra_log_fn=None,
):
    """Build the per-step closed-loop transition (scan body) for the paper path.

    Exposed separately so chunked/checkpointable runners (utils/checkpoint.py) and the
    monolithic scan below share one definition.

    debug_checks: arm in-scan located finite guards at each reference phase
    (A nominal solve, B aux solve, C sensitivity gradient, D propagation) —
    the ``_ensure_finite`` diagnostics of ``tube_mpc.py:786-801``; run the loop
    under utils.debug.run_checked to surface them.

    extra_log_fn(state, X_nom, U_nom, X_aux, U_aux) -> pytree: optional per-step
    observability hook (e.g. warm-start plan health for the agreement chaos
    classifier, tools/agreement_sweep.py); its output is scanned alongside the
    standard log and returned separately by run_paper_closed_loop.
    """
    from ..utils.debug import located_check

    def _chk(x, phase):
        return located_check(x, phase, enabled=debug_checks)

    nx = system.nx
    ocp_nom = make_nominal_ocp(system, aug, target)
    ocp_aux = make_aux_ocp(system, aug)
    solve_aux = make_diff_ilqr(ocp_aux, cfg.aux_ilqr())
    theta_nom = NominalTheta(w=w_nominal, bp=bp)

    def step(state: PaperLoopState, w_t):
        # (A) nominal MPC from the nominal state (fixed parameters)
        x_hat_bar = jnp.concatenate([state.x_bar, state.b_bar[None]])
        X_nom, U_nom = ilqr_solve(ocp_nom, cfg.nominal_ilqr(), theta_nom, x_hat_bar, state.U_nom_ws)
        X_nom = _chk(X_nom, "phase A: nominal iLQR solve X (tube_mpc.py:859)")
        U_nom = _chk(U_nom, "phase A: nominal iLQR solve U (tube_mpc.py:859)")
        X_ref = X_nom[:, :nx]
        U_ref = U_nom

        # (B) ancillary MPC from the real state + (C) upper loss & its gradient.
        x_hat = jnp.concatenate([state.x, state.b[None]])

        def upper(adapt: AuxAdapt):
            w_aux = CostWeights(Q=adapt.Q, R=adapt.R, Qf=adapt.Q, qb=adapt.qb)
            th = AuxTheta(
                w=w_aux,
                bp=bp,
                X_ref=jax.lax.stop_gradient(X_ref),
                U_ref=jax.lax.stop_gradient(U_ref),
            )
            X_aux, U_aux = solve_aux(th, x_hat, state.U_aux_ws)
            return _upper_loss(X_aux, X_ref, nx), (X_aux, U_aux)

        (L, (X_aux, U_aux)), grads = jax.value_and_grad(upper, has_aux=True)(state.adapt)
        X_aux = _chk(X_aux, "phase B: ancillary iLQR solve X (tube_mpc.py:910)")
        L = _chk(L, "phase C: upper loss (tube_mpc.py:915-919)")
        grads = jax.tree.map(
            lambda g: _chk(g, "phase C: sensitivity/IFT gradient (tube_mpc.py:958-976)"),
            grads)

        # Algorithm-2 projected momentum update.
        adapt, vel = momentum_update(state.adapt, grads, state.vel, cfg.adapt, project_aux_adapt)

        # (D) true step with disturbance; barrier state propagates on f(x,u), not on
        # the disturbed state (reference tube_mpc.py:994-996).
        u = U_aux[0]
        x_hat_next = aug.f_hat(x_hat, u, bp)
        x_hat_next = _chk(x_hat_next, "phase D: true step propagation (tube_mpc.py:991-996)")
        x_next = x_hat_next[:nx] + w_t
        b_next = x_hat_next[nx]

        # nominal propagation (tube structure)
        u_bar = U_nom[0]
        x_hat_bar_next = aug.f_hat(x_hat_bar, u_bar, bp)

        new_state = PaperLoopState(
            x=x_next,
            b=b_next,
            x_bar=x_hat_bar_next[:nx],
            b_bar=x_hat_bar_next[nx],
            U_nom_ws=_shift(U_nom),
            U_aux_ws=_shift(U_aux),
            adapt=adapt,
            vel=vel,
        )
        log = (state.x, u, state.x_bar, u_bar, state.b, L, adapt.Q, adapt.R, adapt.qb)
        if extra_log_fn is not None:
            return new_state, (log, extra_log_fn(state, X_nom, U_nom, X_aux, U_aux))
        return new_state, log

    return step


def paper_init_state(
    system: System,
    aug: AugmentedDynamics,
    cfg: TubeMPCConfig,
    *,
    aux_init: AuxAdapt,
    bp: BarrierParams,
    x0: Array,
) -> PaperLoopState:
    b0 = aug.init_b0(x0, bp)
    return PaperLoopState(
        x=x0,
        b=b0,
        x_bar=x0,
        b_bar=b0,
        U_nom_ws=jnp.zeros((cfg.N, system.nu), dtype=x0.dtype),
        U_aux_ws=jnp.zeros((cfg.N, system.nu), dtype=x0.dtype),
        adapt=aux_init,
        vel=jax.tree.map(jnp.zeros_like, aux_init),
    )


def run_paper_closed_loop(
    system: System,
    aug: AugmentedDynamics,
    cfg: TubeMPCConfig,
    *,
    w_nominal: CostWeights,
    aux_init: AuxAdapt,
    bp: BarrierParams,
    x0: Array,
    target: Array,
    w_seq: Optional[Array] = None,
    key: Optional[Array] = None,
    debug_checks: bool = False,
    extra_log_fn=None,
) -> ClosedLoopLog:
    """Closed-loop run of the paper-aligned configuration.

    w_seq [H, nx]: recorded disturbance sequence (for agreement runs against the
    reference, SURVEY.md §7 hard-part (d)); if None, sampled i.i.d. from `key`.

    debug_checks: arm per-phase located finite guards (reference _ensure_finite,
    tube_mpc.py:786-801); execute under utils.debug.run_checked to raise on the
    first failing phase.

    extra_log_fn: see make_paper_step; when set, returns (ClosedLoopLog, extras).
    """
    if w_seq is None:
        if key is None:
            raise ValueError("provide either w_seq or key")
        w_seq = system.sample_disturbance(key, (cfg.H,), dtype=x0.dtype)

    step = make_paper_step(system, aug, cfg, w_nominal=w_nominal, bp=bp, target=target,
                           debug_checks=debug_checks, extra_log_fn=extra_log_fn)
    init = paper_init_state(system, aug, cfg, aux_init=aux_init, bp=bp, x0=x0)
    _, logs = jax.lax.scan(step, init, w_seq)
    if extra_log_fn is not None:
        std, extra = logs
        return ClosedLoopLog(*std), extra
    return ClosedLoopLog(*logs)


def make_paper_closed_loop_diff(
    system: System,
    aug: AugmentedDynamics,
    cfg: TubeMPCConfig,
    *,
    bp: BarrierParams,
    target: Array,
    exact_hessians: bool = True,
):
    """Build a paper closed loop that is reverse-differentiable END-TO-END.

    Returns ``loop(w_nominal, aux_init, x0, w_seq) -> ClosedLoopLog``, safe to wrap
    in ``jax.jit``/``jax.grad`` w.r.t. (w_nominal, x0).

    The reference has no equivalent: its gradient machinery differentiates one step's
    upper loss w.r.t. the ancillary weights only (``tube_mpc.py:963-976``); the effect
    of the FIXED nominal weights on the whole H-step closed loop is only observable
    there by finite differences (``gradient_check.py``). Here both MPC solves carry
    implicit-function VJPs (solvers/diff_ilqr.py) and the Algorithm-2 adaptation
    gradient is computed by the EXPLICIT closed-form pipeline
    (ddp_sensitivity + solvers/weight_grads.py, parity-tested vs the custom_vjp in
    tests/test_gradients.py) rather than an inner jax.grad — so one outer
    ``jax.grad(lambda w: loop(w, ...).loss[-1])`` traverses the entire loop: solves,
    sensitivity sweeps, momentum updates, warm-start shifts.

    Forward-numerically identical to run_paper_closed_loop (same solves, same
    updates); use that one when no hypergradient is needed.

    This is a FACTORY (not a run_* function taking everything at once) because the
    ``jax.custom_vjp`` solver objects must be created OUTSIDE any active trace:
    constructing them inside a jit(grad(...)) trace leaks tracers into the scan
    residual jaxprs ("No constant handler for DynamicJaxprTracer" at lowering).
    """
    nx = system.nx
    ocp_nom = make_nominal_ocp(system, aug, target)
    ocp_aux = make_aux_ocp(system, aug)
    # exact_hessians applies to the OUTER hypergradient solves only; the Algorithm-2
    # adaptation gradient below stays on the reference's Gauss-Newton pipeline so the
    # forward loop is numerically identical to run_paper_closed_loop.
    solve_nom = make_diff_ilqr(ocp_nom, cfg.nominal_ilqr(), exact_hessians=exact_hessians)
    solve_aux = make_diff_ilqr(ocp_aux, cfg.aux_ilqr(), exact_hessians=exact_hessians)
    from ..solvers.sensitivity import ddp_sensitivity
    from ..solvers.weight_grads import grads_aux_from_deltas

    def step(w_nominal: CostWeights, state: PaperLoopState, w_t):
        theta_nom = NominalTheta(w=w_nominal, bp=bp)
        x_hat_bar = jnp.concatenate([state.x_bar, state.b_bar[None]])
        X_nom, U_nom = solve_nom(theta_nom, x_hat_bar, state.U_nom_ws)
        X_ref, U_ref = X_nom[:, :nx], U_nom

        x_hat = jnp.concatenate([state.x, state.b[None]])
        w_aux = CostWeights(Q=state.adapt.Q, R=state.adapt.R, Qf=state.adapt.Q,
                            qb=state.adapt.qb)
        th_aux = AuxTheta(w=w_aux, bp=bp, X_ref=X_ref, U_ref=U_ref)
        X_aux, U_aux = solve_aux(th_aux, x_hat, state.U_aux_ws)
        L = _upper_loss(X_aux, X_ref, nx)

        # Closed-form Algorithm-2 gradient: dL/dX_aux rows are [2(x-x̄), 2b].
        g_X = jnp.concatenate(
            [2.0 * (X_aux[:, :nx] - X_ref), 2.0 * X_aux[:, nx:]], axis=-1
        )
        g_U = jnp.zeros_like(U_aux)
        sens = ddp_sensitivity(ocp_aux, th_aux, X_aux, U_aux, g_X, g_U)
        grads = grads_aux_from_deltas(X_aux, U_aux, X_ref, U_ref, sens)
        adapt, vel = momentum_update(state.adapt, grads, state.vel, cfg.adapt,
                                     project_aux_adapt)

        u = U_aux[0]
        x_hat_next = aug.f_hat(x_hat, u, bp)
        x_next = x_hat_next[:nx] + w_t
        b_next = x_hat_next[nx]
        u_bar = U_nom[0]
        x_hat_bar_next = aug.f_hat(x_hat_bar, u_bar, bp)

        new_state = PaperLoopState(
            x=x_next, b=b_next,
            x_bar=x_hat_bar_next[:nx], b_bar=x_hat_bar_next[nx],
            U_nom_ws=_shift(U_nom), U_aux_ws=_shift(U_aux),
            adapt=adapt, vel=vel,
        )
        log = (state.x, u, state.x_bar, u_bar, state.b, L, adapt.Q, adapt.R, adapt.qb)
        return new_state, log

    def loop(w_nominal: CostWeights, aux_init: AuxAdapt, x0: Array, w_seq: Array) -> ClosedLoopLog:
        init = paper_init_state(system, aug, cfg, aux_init=aux_init, bp=bp, x0=x0)
        _, logs = jax.lax.scan(lambda s, w: step(w_nominal, s, w), init, w_seq)
        return ClosedLoopLog(*logs)

    return loop


# ---------------------------------------------------------------------------
# Generic path: raw-reparameterized θ̄ and θ, optional coupled nominal adaptation.
# ---------------------------------------------------------------------------

class GenericLoopState(NamedTuple):
    x: Array
    b: Array
    x_bar: Array
    b_bar: Array
    U_nom_ws: Array
    U_aux_ws: Array
    raw_nom: RawNominalTheta
    raw_aux: RawAuxTheta
    vel_nom: RawNominalTheta
    vel_aux: RawAuxTheta


def _nominal_theta(raw: RawNominalTheta) -> NominalTheta:
    return NominalTheta(
        w=CostWeights(Q=raw.Q(), R=raw.R(), Qf=raw.Qf(), qb=raw.qb()),
        bp=BarrierParams(alpha=raw.alpha(), gamma=raw.gamma(), tight=raw.tight()),
    )


def _aux_theta(raw: RawAuxTheta, X_ref: Array, U_ref: Array) -> AuxTheta:
    zero = jnp.zeros_like(raw.alpha())
    return AuxTheta(
        w=CostWeights(Q=raw.Q(), R=raw.R(), Qf=raw.Qf(), qb=raw.qb()),
        bp=BarrierParams(alpha=raw.alpha(), gamma=raw.gamma(), tight=zero),
        X_ref=X_ref,
        U_ref=U_ref,
    )


def run_generic_closed_loop(
    system: System,
    aug: AugmentedDynamics,
    cfg: TubeMPCConfig,
    *,
    raw_nom_init: RawNominalTheta,
    raw_aux_init: RawAuxTheta,
    x0: Array,
    target: Array,
    w_seq: Optional[Array] = None,
    key: Optional[Array] = None,
    debug_checks: bool = False,
):
    """Generic bilevel path: adapt θ (and optionally the coupled θ̄) online.

    The coupled nominal gradient needs NO hand-wired chaining: when
    cfg.adapt_nominal, the auxiliary references (X_ref, U_ref) stay differentiable and
    jax.grad routes cotangents through the aux solve's custom_vjp into the nominal
    solve's custom_vjp and on into θ̄ — the chain the reference builds manually at
    ``tube_mpc.py:505-599``.

    Returns (ClosedLoopLog, (raw_nom_final, raw_aux_final)).
    """
    nx = system.nx
    dtype = x0.dtype
    H, N = cfg.H, cfg.N
    if cfg.adapt.steps < 1:
        # The reference crashes on steps=0 (loss_val never defined, tube_mpc.py:414,624);
        # make the contract explicit instead.
        raise ValueError("adapt.steps must be >= 1")

    if w_seq is None:
        if key is None:
            raise ValueError("provide either w_seq or key")
        w_seq = system.sample_disturbance(key, (H,), dtype=dtype)

    from ..utils.debug import located_check

    def _chk(x, phase):
        return located_check(x, phase, enabled=debug_checks)

    ocp_nom = make_nominal_ocp(system, aug, target)
    ocp_aux = make_aux_ocp(system, aug)
    solve_nom = make_diff_ilqr(ocp_nom, cfg.nominal_ilqr())
    solve_aux = make_diff_ilqr(ocp_aux, cfg.aux_ilqr())
    # Inner adaptation iterations (adapt.steps > 1) re-derive gradients at the FIXED
    # trajectories from this step's solves while θ moves (reference tube_mpc.py:407).
    regrad_nom = make_ift_regrad(ocp_nom)
    regrad_aux = make_ift_regrad(ocp_aux)

    b0 = aug.init_b0(x0, BarrierParams(alpha=raw_aux_init.alpha(), gamma=raw_aux_init.gamma(), tight=jnp.zeros_like(raw_aux_init.alpha())))
    bp_nom0 = BarrierParams(alpha=raw_nom_init.alpha(), gamma=raw_nom_init.gamma(), tight=raw_nom_init.tight())
    b_bar0 = aug.init_b0(x0, bp_nom0)

    def step(state: GenericLoopState, w_t):
        x_hat_bar = jnp.concatenate([state.x_bar, state.b_bar[None]])
        x_hat = jnp.concatenate([state.x, state.b[None]])

        def upper(raws):
            raw_nom, raw_aux = raws
            th_nom = _nominal_theta(raw_nom)
            X_nom, U_nom = solve_nom(th_nom, x_hat_bar, state.U_nom_ws)
            X_ref, U_ref = X_nom[:, :nx], U_nom
            if not cfg.adapt_nominal:
                X_ref = jax.lax.stop_gradient(X_ref)
                U_ref = jax.lax.stop_gradient(U_ref)
            th_aux = _aux_theta(raw_aux, X_ref, U_ref)
            X_aux, U_aux = solve_aux(th_aux, x_hat, state.U_aux_ws)
            x_nom_in_L = X_nom[:, :nx]
            if cfg.coupling == "reference":
                x_nom_in_L = jax.lax.stop_gradient(x_nom_in_L)
            L = _upper_loss(X_aux, x_nom_in_L, nx)
            return L, (X_nom, U_nom, X_aux, U_aux)

        (L, (X_nom, U_nom, X_aux, U_aux)), (g_nom, g_aux) = jax.value_and_grad(
            upper, has_aux=True
        )((state.raw_nom, state.raw_aux))
        X_nom = _chk(X_nom, "phase A: nominal iLQR solve X (tube_mpc.py:291-321)")
        X_aux = _chk(X_aux, "phase B: ancillary iLQR solve X (tube_mpc.py:358-399)")
        L = _chk(L, "phase C: upper loss (tube_mpc.py:412-414)")
        g_aux = jax.tree.map(
            lambda g: _chk(g, "phase C: IFT gradient wrt theta (ift.py:35-92)"), g_aux)
        if cfg.adapt_nominal:
            g_nom = jax.tree.map(
                lambda g: _chk(g, "phase C: coupled IFT gradient wrt theta-bar (tube_mpc.py:586-599)"), g_nom)

        raw_nom, vel_nom = state.raw_nom, state.vel_nom
        raw_aux, vel_aux = state.raw_aux, state.vel_aux
        if cfg.adapt_nominal:
            raw_nom, vel_nom = momentum_update(raw_nom, g_nom, vel_nom, cfg.adapt, project_raw)
        if cfg.adapt_ancillary:
            raw_aux, vel_aux = momentum_update(raw_aux, g_aux, vel_aux, cfg.adapt, project_raw)

        # Inner iterations 2..steps: same upper composition, but the "solves" are the
        # fixed trajectories from above — only the sensitivity/IFT backward reruns with
        # the updated θ Hessians (reference tube_mpc.py:407-604). Static Python loop;
        # unrolled into the scan body.
        def upper_fixed(raws):
            raw_n, raw_a = raws
            th_n = _nominal_theta(raw_n)
            Xn, Un = regrad_nom(th_n, x_hat_bar, X_nom, U_nom)
            X_ref_f, U_ref_f = Xn[:, :nx], Un
            if not cfg.adapt_nominal:
                X_ref_f = jax.lax.stop_gradient(X_ref_f)
                U_ref_f = jax.lax.stop_gradient(U_ref_f)
            th_a = _aux_theta(raw_a, X_ref_f, U_ref_f)
            Xa, _Ua = regrad_aux(th_a, x_hat, X_aux, U_aux)
            x_nom_f = Xn[:, :nx]
            if cfg.coupling == "reference":
                x_nom_f = jax.lax.stop_gradient(x_nom_f)
            return _upper_loss(Xa, x_nom_f, nx)

        for _ in range(cfg.adapt.steps - 1):
            g_nom, g_aux = jax.grad(upper_fixed)((raw_nom, raw_aux))
            if cfg.adapt_nominal:
                raw_nom, vel_nom = momentum_update(raw_nom, g_nom, vel_nom, cfg.adapt, project_raw)
            if cfg.adapt_ancillary:
                raw_aux, vel_aux = momentum_update(raw_aux, g_aux, vel_aux, cfg.adapt, project_raw)

        # True + nominal propagation with the POST-update barrier parameters
        # (reference order: update at (C), then step at (D) with db_cfg_aux()).
        bp_aux = BarrierParams(alpha=raw_aux.alpha(), gamma=raw_aux.gamma(), tight=jnp.zeros_like(raw_aux.alpha()))
        bp_nom = BarrierParams(alpha=raw_nom.alpha(), gamma=raw_nom.gamma(), tight=raw_nom.tight())

        u = U_aux[0]
        x_hat_next = aug.f_hat(x_hat, u, bp_aux)
        x_next = x_hat_next[:nx] + w_t
        b_next = x_hat_next[nx]

        u_bar = U_nom[0]
        x_hat_bar_next = aug.f_hat(x_hat_bar, u_bar, bp_nom)

        new_state = GenericLoopState(
            x=x_next,
            b=b_next,
            x_bar=x_hat_bar_next[:nx],
            b_bar=x_hat_bar_next[nx],
            U_nom_ws=_shift(U_nom),
            U_aux_ws=_shift(U_aux),
            raw_nom=raw_nom,
            raw_aux=raw_aux,
            vel_nom=vel_nom,
            vel_aux=vel_aux,
        )
        log = (state.x, u, state.x_bar, u_bar, state.b, L, raw_aux.Q(), raw_aux.R(), raw_aux.qb())
        return new_state, log

    init = GenericLoopState(
        x=x0,
        b=b0,
        x_bar=x0,
        b_bar=b_bar0,
        U_nom_ws=jnp.zeros((N, system.nu), dtype=dtype),
        U_aux_ws=jnp.zeros((N, system.nu), dtype=dtype),
        raw_nom=raw_nom_init,
        raw_aux=raw_aux_init,
        vel_nom=jax.tree.map(jnp.zeros_like, raw_nom_init),
        vel_aux=jax.tree.map(jnp.zeros_like, raw_aux_init),
    )
    final, logs = jax.lax.scan(step, init, w_seq)
    return ClosedLoopLog(*logs), (final.raw_nom, final.raw_aux)


# ---------------------------------------------------------------------------
# Nominal-only receding horizon (validation harness, reference run_nominal.py).
# ---------------------------------------------------------------------------

class NominalRecedingResult(NamedTuple):
    x: Array        # [H, nx]
    u: Array        # [H, nu]
    b: Array        # [H]
    ran: Array      # [H] bool — step actually executed (before success/collision)
    success: Array  # [] bool
    success_t: Array  # [] int32 (H if never)
    collided: Array   # [] bool


def run_nominal_receding(
    system: System,
    aug: AugmentedDynamics,
    cfg: TubeMPCConfig,
    *,
    w_nominal: CostWeights,
    bp: BarrierParams,
    x0: Array,
    target: Array,
    h_exact=None,
    success_radius: float = 0.25,
    angle_dims: Tuple[int, ...] = (2,),
    warm_start: Optional[Array] = None,
):
    """Receding-horizon nominal-only MPC with success/collision stopping
    (reference ``run_nominal.py:204-415``), early exit expressed as state freezing
    inside the scan (static shapes; `ran` masks the live prefix).

    h_exact: exact (non-smoothed) safety value used for collision detection
    (reference checks the true min over obstacles, run_nominal.py:374-381).
    """
    nx = system.nx
    dtype = x0.dtype
    H, N = cfg.H, cfg.N
    ocp = make_nominal_ocp(system, aug, target, angle_dims=angle_dims)
    theta = NominalTheta(w=w_nominal, bp=bp)
    if h_exact is None:
        h_exact = system.h

    b0 = aug.init_b0(x0, bp)
    if warm_start is None:
        warm_start = jnp.zeros((N, system.nu), dtype=dtype)

    def step(state, _):
        t, x, b, U_ws, done, success, success_t, collided = state
        x_hat = jnp.concatenate([x, b[None]])
        X, U = ilqr_solve(ocp, cfg.nominal_ilqr(), theta, x_hat, U_ws)
        u = U[0]
        x_hat_next = aug.f_hat(x_hat, u, bp)

        ran = ~done
        now_collided = ran & (h_exact(x) <= 0.0)
        now_success = ran & (~now_collided) & (jnp.linalg.norm(x[:2] - target[:2]) <= success_radius)

        success = success | now_success
        collided = collided | now_collided
        success_t = jnp.where(now_success, t, success_t)
        newly_done = now_collided | now_success

        x_new = jnp.where(done | newly_done, x, x_hat_next[:nx])
        b_new = jnp.where(done | newly_done, b, x_hat_next[nx])
        U_ws_new = jnp.where(done | newly_done, U_ws, _shift(U))
        log = (x, u, b, ran)
        return (t + 1, x_new, b_new, U_ws_new, done | newly_done, success, success_t, collided), log

    init = (
        jnp.asarray(0, dtype=jnp.int32),
        x0,
        b0,
        warm_start,
        jnp.asarray(False),
        jnp.asarray(False),
        jnp.asarray(H, dtype=jnp.int32),
        jnp.asarray(False),
    )
    final, (xs, us, bs, ran) = jax.lax.scan(step, init, None, length=H)
    _, _, _, _, _, success, success_t, collided = final
    return NominalRecedingResult(
        x=xs, u=us, b=bs, ran=ran, success=success, success_t=success_t, collided=collided
    )
