"""Numeric-range robustness: solves stay finite in barrier-violating regimes.

TPU floats are range-limited (f32, and f64 is emulated with f32 exponent range);
barrier-inflated Riccati algebra overflows without the guards in solvers/ilqr.py,
ops/linalg.py and the lane kernels (scaled V carry, scale-invariant solves,
resolve-or-zero gains, NaN-robust candidate selection/gather). These tests pin the
behavior in f32 — the tightest regime — starting INSIDE an obstacle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tube_mpc_tpu.ops.lanes import dubins_components
from tube_mpc_tpu.presets import PAPER_OBSTACLES, dubins_paper_setup
from tube_mpc_tpu.solvers.ilqr import ilqr_solve
from tube_mpc_tpu.tube.lane_closed_loop import run_paper_closed_loop_lanes
from tube_mpc_tpu.tube.lane_interface import make_lane_problem, tube_ilqr_solve_lanes
from tube_mpc_tpu.tube.problem import NominalTheta, make_nominal_ocp

F32 = jnp.float32
OBSTACLE_CENTER = jnp.asarray([4.0, 2.0, 0.0], F32)  # h = -1 there (deepest violation)


def _setup():
    s = dubins_paper_setup(N=20, H=6, dtype=F32)
    sys_c = dubins_components(
        dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
        centers=PAPER_OBSTACLES, radii=[1.0] * len(PAPER_OBSTACLES),
        aggregation="smoothmin", beta=20.0,
    )
    return s, sys_c


def test_xla_solver_finite_from_violating_start():
    s, _ = _setup()
    ocp = make_nominal_ocp(s.system, s.aug, s.target)
    theta = NominalTheta(w=s.w_nominal, bp=s.bp)
    b0 = s.aug.init_b0(OBSTACLE_CENTER, s.bp)
    x_hat0 = jnp.concatenate([OBSTACLE_CENTER, b0[None]])
    X, U = jax.jit(
        lambda: ilqr_solve(ocp, s.cfg.nominal_ilqr(), theta, x_hat0, jnp.zeros((20, 2), F32))
    )()
    assert bool(jnp.isfinite(X).all() and jnp.isfinite(U).all())


@pytest.mark.slow  # interpret-mode lane runs from violating starts, 30-65s
def test_lane_solver_finite_and_escapes_from_violating_start():
    s, sys_c = _setup()
    pb = make_lane_problem(sys_c, eps=1e-4)
    B, N = 64, 20
    x0 = jnp.broadcast_to(OBSTACLE_CENTER, (B, 3))
    b0 = s.aug.init_b0(x0, s.bp)
    x_hat0 = jnp.concatenate([x0, b0[:, None]], axis=-1)
    X, U = tube_ilqr_solve_lanes(
        pb, s.cfg.nominal_ilqr(), w=s.w_nominal, bp=s.bp,
        x_hat0=x_hat0, U_init=jnp.zeros((B, N, 2), F32),
        X_ref=jnp.broadcast_to(s.target[None, None], (B, N + 1, 3)),
        U_ref=jnp.zeros((B, N, 2), F32),
        block_b=128, interpret=True,
    )
    assert bool(jnp.isfinite(X).all() and jnp.isfinite(U).all())
    # the plan must leave the violated obstacle (h(x_N) > 0)
    h_end = (X[:, -1, 0] - 4.0) ** 2 + (X[:, -1, 1] - 2.0) ** 2 - 1.0
    assert bool((h_end > 0).all())


@pytest.mark.slow  # interpret-mode lane runs from violating starts, 30-65s
def test_lane_closed_loop_finite_from_violating_start():
    s, sys_c = _setup()
    B = 32
    w = s.system.sample_disturbance(jax.random.PRNGKey(0), (B, s.cfg.H), dtype=F32)
    log = run_paper_closed_loop_lanes(
        s.system, s.aug, sys_c, s.cfg,
        w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
        x0=OBSTACLE_CENTER, target=s.target, w_seqs=w, eps=1e-4, interpret=True,
    )
    for f in log._fields:  # incl. loss and adapted-parameter histories
        assert np.isfinite(np.asarray(getattr(log, f))).all(), f"non-finite {f}"
