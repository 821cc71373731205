"""iLQR solver tests: LQR optimality, box constraints, and agreement vs the torch
reference solver on the Dubins DBaS-augmented nominal problem (SURVEY.md §4 plan)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tube_mpc_tpu.ops.costs import CostWeights
from tube_mpc_tpu.ops.dbas import BarrierParams, make_augmented
from tube_mpc_tpu.solvers.ilqr import ILQRConfig, ilqr_solve
from tube_mpc_tpu.solvers.ocp import OCP, rollout, total_cost
from tube_mpc_tpu.systems.dubins import DubinsConfig, make_dubins
from tube_mpc_tpu.systems.obstacles import CircleField
from tube_mpc_tpu.tube.problem import NominalTheta, make_nominal_ocp

F64 = jnp.float64


def _lqr_ocp(nx=3, nu=2, dtype=F64):
    key = jax.random.PRNGKey(42)
    A = jnp.eye(nx, dtype=dtype) + 0.1 * jax.random.normal(key, (nx, nx), dtype=dtype)
    B = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (nx, nu), dtype=dtype)
    Q = jnp.asarray([1.0, 2.0, 0.5], dtype=dtype)
    R = jnp.asarray([0.5, 1.0], dtype=dtype)

    def f(x, u, th):
        return A @ x + B @ u

    def stage(x, u, k, th):
        return jnp.sum(Q * x * x) + jnp.sum(R * u * u)

    def term(xN, th):
        return 10.0 * jnp.sum(xN * xN)

    return OCP(f=f, stage_cost=stage, terminal_cost=term)


class TestILQRCore:
    def test_lqr_first_order_optimality(self):
        # On an LQR problem, iLQR converges to a point with ~zero cost gradient in U.
        ocp = _lqr_ocp()
        cfg = ILQRConfig(max_iter=50, tol=1e-14, reg=1e-9, alphas=(1.0, 0.5))
        x0 = jnp.asarray([1.0, -2.0, 0.5], dtype=F64)
        U0 = jnp.zeros((15, 2), dtype=F64)
        X, U = jax.jit(lambda x, u: ilqr_solve(ocp, cfg, None, x, u))(x0, U0)

        gU = jax.grad(lambda UU: total_cost(ocp, None, rollout(ocp, None, x0, UU), UU))(U)
        np.testing.assert_allclose(gU, jnp.zeros_like(gU), atol=1e-8)
        # And the returned X is the rollout of U.
        np.testing.assert_allclose(X, rollout(ocp, None, x0, U), rtol=1e-12)

    def test_box_constraints_respected(self):
        ocp = _lqr_ocp()
        ocp = OCP(
            f=ocp.f, stage_cost=ocp.stage_cost, terminal_cost=ocp.terminal_cost,
            u_min=jnp.asarray([-0.1, -0.1], dtype=F64),
            u_max=jnp.asarray([0.1, 0.1], dtype=F64),
        )
        cfg = ILQRConfig(max_iter=30, tol=1e-12, reg=1e-9)
        x0 = jnp.asarray([3.0, -2.0, 1.5], dtype=F64)
        U0 = jnp.zeros((15, 2), dtype=F64)
        _, U = ilqr_solve(ocp, cfg, None, x0, U0)
        assert jnp.all(U >= -0.1 - 1e-12) and jnp.all(U <= 0.1 + 1e-12)

    def test_vmap_over_initial_states(self):
        ocp = _lqr_ocp()
        cfg = ILQRConfig(max_iter=20, tol=1e-10, reg=1e-9)
        x0s = jax.random.normal(jax.random.PRNGKey(0), (4, 3), dtype=F64)
        U0 = jnp.zeros((10, 2), dtype=F64)
        Xb, Ub = jax.vmap(lambda x: ilqr_solve(ocp, cfg, None, x, U0))(x0s)
        X1, U1 = ilqr_solve(ocp, cfg, None, x0s[1], U0)
        # vmapped and single solves compile to differently-fused programs; with the
        # tight tol=1e-10 convergence check a 1-ulp rounding difference can shift the
        # stopping iteration, so equivalence holds to solver accuracy, not bitwise.
        np.testing.assert_allclose(Ub[1], U1, rtol=1e-6, atol=1e-9)


@pytest.fixture(scope="module")
def ref():
    from reference_harness import import_reference
    return import_reference()


def _dubins_setup(dtype=F64, beta=20.0, eps=1e-4):
    field = CircleField(
        centers=jnp.asarray([[4.0, 2.0], [2.0, 4.0], [4.0, 8.0], [8.0, 4.0], [6.0, 6.0]], dtype=dtype),
        radii=jnp.ones((5,), dtype=dtype),
    )
    cfg = DubinsConfig(dt=0.01)
    system = make_dubins(cfg, obstacles=field, aggregation="smoothmin", beta=beta, dtype=dtype)
    aug = make_augmented(system, barrier_type="inverse", eps=eps)
    return cfg, system, aug


class TestAgreementWithReference:
    """Same nominal DBaS Dubins problem solved by both frameworks, float64."""

    def test_single_nominal_solve_matches(self, ref):
        import torch

        torch.manual_seed(0)
        N = 12
        max_iter = 8
        alphas = (1.0, 0.5, 0.25, 0.1, 0.05, 0.01, 0.0)
        reg = 1e-3
        beta, eps = 20.0, 1e-4
        Q = [1.0, 1.0, 0.0]
        R = [1.0, 1.0]
        Qf = [1000.0, 1000.0, 1000.0]
        qb = 1.0

        # ---- ours ----
        dcfg, system, aug = _dubins_setup(beta=beta, eps=eps)
        target = jnp.asarray([10.0, 10.0, float(np.pi / 4)], dtype=F64)
        ocp = make_nominal_ocp(system, aug, target)
        theta = NominalTheta(
            w=CostWeights.create(Q, R, Qf, qb, dtype=F64),
            bp=BarrierParams.create(0.0, 0.0, 0.0, dtype=F64),
        )
        x0 = jnp.asarray([0.0, 0.0, float(np.pi / 4)], dtype=F64)
        b0 = aug.init_b0(x0, theta.bp)
        x_hat0 = jnp.concatenate([x0, b0[None]])
        U0 = jnp.zeros((N, 2), dtype=F64)
        cfg = ILQRConfig(max_iter=max_iter, tol=1e-3, reg=reg, alphas=alphas)
        X_j, U_j = ilqr_solve(ocp, cfg, theta, x_hat0, U0)

        # ---- reference ----
        from diff_tube_mpc_strict_pt.core.barrier import DBaSConfig, dbas_init_b0, dbas_step
        from diff_tube_mpc_strict_pt.core.control import BoxClampControl
        from diff_tube_mpc_strict_pt.core.cost_derivs import (
            nominal_cost_derivs_u,
            nominal_terminal_derivs,
        )
        from diff_tube_mpc_strict_pt.core.ddp import ILQRConfig as RefCfg, ilqr_solve as ref_solve
        from diff_tube_mpc_strict_pt.core.systems.dubins import DubinsConfig as RefDub, dubins_step
        from diff_tube_mpc_strict_pt.core.systems.dubins_aug_jac import dubins_augmented_jacobian
        from diff_tube_mpc_strict_pt.core.systems.dubins_obstacles import (
            CircleObstacle,
            h_multi_circle_obstacles,
        )

        td = torch.float64
        rdub = RefDub(dt=0.01, v_max=10.0, omega_max=float(np.pi))
        obs = [CircleObstacle(center=c, radius=1.0) for c in [(4.0, 2.0), (2.0, 4.0), (4.0, 8.0), (8.0, 4.0), (6.0, 6.0)]]
        h_t = lambda x: h_multi_circle_obstacles(x, obstacles=obs, beta=beta)
        db = DBaSConfig(barrier_type="inverse", alpha=torch.tensor(0.0, dtype=td), gamma=torch.tensor(0.0, dtype=td), eps=eps)
        f_t = lambda x, u: dubins_step(x, u, cfg=rdub)

        def f_hat_t(xh, u):
            xn, bn = dbas_step(x_k=xh[:-1], u_k=u, b_k=xh[-1], f=f_t, h=h_t, cfg=db)
            return torch.cat([xn, bn.view(1)], dim=0)

        tgt = torch.tensor([10.0, 10.0, float(np.pi / 4)], dtype=td)
        Qt = torch.tensor(Q, dtype=td)
        Rt = torch.tensor(R, dtype=td)
        Qft = torch.tensor(Qf, dtype=td)
        qbt = torch.tensor(qb, dtype=td)

        def stage_t(xh, u, k):
            dx = xh[:-1] - tgt
            return (Qt * dx * dx).sum() + (Rt * u * u).sum() + qbt * xh[-1] ** 2

        def term_t(xh):
            dx = xh[:-1] - tgt
            return (Qft * dx * dx).sum() + qbt * xh[-1] ** 2

        def sderiv_t(xh, u, k):
            return nominal_cost_derivs_u(x_hat=xh, u=u, target=tgt, Q=Qt, R=Rt, qb=qbt)

        def tderiv_t(xh):
            px, pxx = nominal_terminal_derivs(x_hat_N=xh, target=tgt, Qf=Qft)
            px[-1] = 2.0 * qbt * xh[-1]
            pxx[-1, -1] = 2.0 * qbt
            return px, pxx

        ctrl = BoxClampControl(
            u_min=torch.tensor([-10.0, -float(np.pi)], dtype=td),
            u_max=torch.tensor([10.0, float(np.pi)], dtype=td),
        )
        x0_t = torch.tensor([0.0, 0.0, float(np.pi / 4)], dtype=td)
        b0_t = dbas_init_b0(x0_t, h=h_t, cfg=db)
        xh0_t = torch.cat([x0_t, b0_t.view(1)], dim=0)
        X_t, U_t = ref_solve(
            x0=xh0_t,
            V_init=torch.zeros(N, 2, dtype=td),
            cfg=RefCfg(horizon=N, nx=4, nu=2, max_iter=max_iter, tol=1e-3, reg=reg, line_search_alphas=alphas),
            f=f_hat_t,
            f_jac=lambda xh, u: dubins_augmented_jacobian(xh, u, cfg=rdub, obs=obs, obs_beta=beta, obs_agg="smoothmin", db_cfg=db),
            ctrl=ctrl,
            stage_cost=stage_t,
            terminal_cost=term_t,
            stage_derivs=sderiv_t,
            terminal_derivs=tderiv_t,
        )

        np.testing.assert_allclose(np.asarray(U_j), U_t.numpy(), rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(X_j), X_t.numpy(), rtol=1e-7, atol=1e-9)
