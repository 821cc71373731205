"""Lane-major fused sensitivity+gradient kernels vs the vmapped XLA path.

The lane kernels must reproduce grads_aux_from_deltas(ddp_sensitivity(...)) —
including active-set elimination at saturated controls — exactly in f64.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tube_mpc_tpu.ops.costs import CostWeights
from tube_mpc_tpu.ops.dbas import BarrierParams, make_augmented
from tube_mpc_tpu.ops.lanes import dubins_components
from tube_mpc_tpu.solvers.ilqr import ILQRConfig, ilqr_solve
from tube_mpc_tpu.solvers.sensitivity import ddp_sensitivity
from tube_mpc_tpu.solvers.weight_grads import grads_aux_from_deltas
from tube_mpc_tpu.systems.dubins import DubinsConfig, make_dubins
from tube_mpc_tpu.systems.obstacles import CircleField
from tube_mpc_tpu.tube.lane_interface import (
    make_lane_problem,
    tube_ilqr_solve_lanes,
    tube_sensitivity_grads_lanes,
)
from tube_mpc_tpu.tube.problem import AuxTheta, make_aux_ocp

F64 = jnp.float64
OBS = [(4.0, 2.0), (2.0, 4.0), (6.0, 6.0)]
BETA, EPS = 20.0, 1e-4


def _setup():
    field = CircleField(
        centers=jnp.asarray([list(c) for c in OBS], dtype=F64),
        radii=jnp.ones((len(OBS),), dtype=F64),
    )
    system = make_dubins(DubinsConfig(dt=0.01), obstacles=field,
                         aggregation="smoothmin", beta=BETA, dtype=F64)
    aug = make_augmented(system, eps=EPS)
    sys_c = dubins_components(dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
                              centers=OBS, radii=[1.0] * len(OBS),
                              aggregation="smoothmin", beta=BETA)
    return system, aug, sys_c


def test_lane_sensitivity_matches_xla_path():
    system, aug, sys_c = _setup()
    pb = make_lane_problem(sys_c, eps=EPS)
    B, N = 6, 9
    # per-lane weights (the closed loop adapts per lane)
    key = jax.random.PRNGKey(7)
    Q = 1.0 + 0.3 * jax.random.uniform(key, (B, 3), dtype=F64)
    R = 0.5 + 0.5 * jax.random.uniform(jax.random.PRNGKey(8), (B, 2), dtype=F64)
    qb = 0.5 + 0.5 * jax.random.uniform(jax.random.PRNGKey(9), (B,), dtype=F64)
    bp = BarrierParams.create(0.0, 0.0, 0.0, dtype=F64)

    # SOLVE a tracking problem so (X, U) is a KKT point; references demand
    # high speed so several lanes saturate v at +10 (active set exercised).
    x0 = jnp.asarray([0.0, 0.0, np.pi / 4], dtype=F64)[None] \
        + 0.05 * jax.random.normal(jax.random.PRNGKey(3), (B, 3), dtype=F64)
    b0 = aug.init_b0(x0, bp)
    x_hat0 = jnp.concatenate([x0, b0[:, None]], axis=-1)
    ks = jnp.arange(N + 1, dtype=F64)
    X_ref1 = jnp.stack([0.2 * ks, 0.15 * ks, jnp.full(N + 1, np.pi / 4, dtype=F64)], axis=-1)
    X_ref = jnp.broadcast_to(X_ref1[None], (B, N + 1, 3))
    U_ref = jnp.broadcast_to(jnp.asarray([10.0, 0.0], dtype=F64)[None, None], (B, N, 2))
    U0 = jnp.zeros((B, N, 2), dtype=F64)
    cfg = ILQRConfig(max_iter=8, tol=1e-6, reg=1e-6, alphas=(1.0, 0.5, 0.1, 0.0))

    def solve_one(Qi, Ri, qbi, xh, uu, Xr, Ur):
        ocp = make_aux_ocp(system, aug)
        th = AuxTheta(w=CostWeights(Q=Qi, R=Ri, Qf=Qi, qb=qbi), bp=bp, X_ref=Xr, U_ref=Ur)
        return ilqr_solve(ocp, cfg, th, xh, uu)

    X, U = jax.vmap(solve_one)(Q, R, qb, x_hat0, U0, X_ref, U_ref)
    # confirm the active set is non-trivial somewhere
    assert bool(jnp.any(U >= 10.0 - 1e-8))

    # --- XLA path ---
    dx = X[..., :3] - X_ref
    db = X[..., 3]
    g_X = jnp.concatenate([2.0 * dx, (2.0 * db)[..., None]], axis=-1)
    g_U = jnp.zeros_like(U)

    def sens_one(Qi, Ri, qbi, Xr, Ur, Xi, Ui, gX, gU):
        ocp = make_aux_ocp(system, aug)
        th = AuxTheta(w=CostWeights(Q=Qi, R=Ri, Qf=Qi, qb=qbi), bp=bp, X_ref=Xr, U_ref=Ur)
        return ddp_sensitivity(ocp, th, Xi, Ui, gX, gU, reg=1e-9)

    sens = jax.vmap(sens_one)(Q, R, qb, X_ref, U_ref, X, U, g_X, g_U)
    ref_grads = grads_aux_from_deltas(X, U, X_ref, U_ref, sens)

    # --- lane path (interpret mode; CPU) ---
    lane_grads = tube_sensitivity_grads_lanes(
        pb, w=CostWeights(Q=Q, R=R, Qf=Q, qb=qb), bp=bp,
        X_hat=X, U=U, X_ref=X_ref, U_ref=U_ref,
        block_b=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(lane_grads.Q), np.asarray(ref_grads.Q), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(lane_grads.R), np.asarray(ref_grads.R), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(lane_grads.qb), np.asarray(ref_grads.qb), rtol=1e-9, atol=1e-11)
