"""Differentiation-path tests (SURVEY.md §4 gradient tests):

1. custom_vjp gradient == finite differences on a linear-quadratic tracking problem
   (the DDP sensitivity is exact there: no dynamics curvature approximation).
2. δz from our ddp_sensitivity == the torch reference's ddp_sensitivity on the same
   Dubins DBaS problem (same Gauss-Newton-structured approximation).
3. custom_vjp gradient == jax.grad through the reference pipeline's closed-form weight
   formulas (tube_mpc.py:963-976 parity) on the auxiliary tracking problem.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tube_mpc_tpu.ops.costs import CostWeights
from tube_mpc_tpu.ops.dbas import BarrierParams, make_augmented
from tube_mpc_tpu.solvers.diff_ilqr import make_diff_ilqr
from tube_mpc_tpu.solvers.ilqr import ILQRConfig, ilqr_solve
from tube_mpc_tpu.solvers.ocp import OCP
from tube_mpc_tpu.solvers.sensitivity import ddp_sensitivity
from tube_mpc_tpu.systems.dubins import DubinsConfig, make_dubins
from tube_mpc_tpu.systems.obstacles import CircleField
from tube_mpc_tpu.tube.problem import AuxTheta, make_aux_ocp

F64 = jnp.float64


def _tracking_lq_ocp(nx=3, nu=2, bounded=False):
    key = jax.random.PRNGKey(3)
    A = jnp.eye(nx, dtype=F64) + 0.08 * jax.random.normal(key, (nx, nx), dtype=F64)
    B = 0.25 * jax.random.normal(jax.random.PRNGKey(4), (nx, nu), dtype=F64)

    def f(x, u, th):
        return A @ x + B @ u

    def stage(x, u, k, th):
        dx = x - th["X_ref"][k]
        du = u - th["U_ref"][k]
        return jnp.sum(th["Q"] * dx * dx) + jnp.sum(th["R"] * du * du)

    def term(xN, th):
        dx = xN - th["X_ref"][-1]
        return jnp.sum(th["Qf"] * dx * dx)

    kw = {}
    if bounded:
        kw = dict(u_min=-0.4 * jnp.ones(nu, dtype=F64), u_max=0.4 * jnp.ones(nu, dtype=F64))
    return OCP(f=f, stage_cost=stage, terminal_cost=term, **kw)


class TestCustomVJPvsFiniteDiff:
    @pytest.mark.slow  # finite-difference / dense-KKT oracle sweeps, 30-55s
    def test_lq_tracking_grads(self):
        # Unconstrained case: the clamped-iLQR fixed point is the exact KKT point, so
        # the IFT gradient must match finite differences tightly. (With active box
        # constraints the clamped-iLQR fixed point deviates slightly from the exact
        # constrained KKT point — same as the reference solver — so FD is only a
        # coarse check there; the bounded path is instead pinned against the torch
        # reference pipeline in TestBoundedGradsMatchReference.)
        N, nx, nu = 8, 3, 2
        bounded = False
        ocp = _tracking_lq_ocp(bounded=bounded)
        cfg = ILQRConfig(max_iter=60, tol=1e-14, reg=1e-10, alphas=(1.0, 0.5, 0.25))
        solve = make_diff_ilqr(ocp, cfg)

        key = jax.random.PRNGKey(11)
        theta = {
            "Q": jnp.asarray([1.0, 2.0, 0.5], dtype=F64),
            "R": jnp.asarray([0.5, 1.0], dtype=F64),
            "Qf": jnp.asarray([5.0, 5.0, 5.0], dtype=F64),
            "X_ref": 0.5 * jax.random.normal(key, (N + 1, nx), dtype=F64),
            "U_ref": 0.3 * jax.random.normal(jax.random.PRNGKey(12), (N, nu), dtype=F64),
        }
        x0 = jnp.asarray([1.0, -0.5, 0.8], dtype=F64)
        U0 = jnp.zeros((N, nu), dtype=F64)
        goal = jnp.asarray([0.3, -0.2, 0.1], dtype=F64)

        def upper_loss(th, x0_):
            X, U = solve(th, x0_, U0)
            return jnp.sum((X - goal) ** 2) + 0.1 * jnp.sum(U**2)

        (g_theta, g_x0) = jax.grad(upper_loss, argnums=(0, 1))(theta, x0)

        # Central finite differences on a handful of scalar coordinates. eps must stay
        # well above the solver's stationarity residual (~1e-10) or FD is noise.
        eps = 1e-5

        def fd(fn, base, setter):
            return (fn(setter(base, eps)) - fn(setter(base, -eps))) / (2 * eps)

        checks = [
            ("Q", 0, lambda th, e: {**th, "Q": th["Q"].at[0].add(e)}),
            ("Q", 2, lambda th, e: {**th, "Q": th["Q"].at[2].add(e)}),
            ("R", 1, lambda th, e: {**th, "R": th["R"].at[1].add(e)}),
            ("Qf", 1, lambda th, e: {**th, "Qf": th["Qf"].at[1].add(e)}),
            ("X_ref", (3, 1), lambda th, e: {**th, "X_ref": th["X_ref"].at[3, 1].add(e)}),
            ("U_ref", (2, 0), lambda th, e: {**th, "U_ref": th["U_ref"].at[2, 0].add(e)}),
        ]
        # FD noise floor ~ solver stationarity residual / (2 eps) ≈ 1e-6 absolute.
        for name, idx, setter in checks:
            fd_val = fd(lambda th: upper_loss(th, x0), theta, setter)
            an_val = g_theta[name][idx] if isinstance(idx, tuple) else g_theta[name][idx]
            np.testing.assert_allclose(an_val, fd_val, rtol=1e-3, atol=5e-6, err_msg=f"{name}[{idx}]")

        # gradient w.r.t. x0 (the ξ_θᵀ δλ0 term)
        for i in range(3):
            fd_val = fd(lambda x_: upper_loss(theta, x_), x0, lambda x_, e: x_.at[i].add(e))
            np.testing.assert_allclose(g_x0[i], fd_val, rtol=1e-3, atol=5e-6, err_msg=f"x0[{i}]")


@pytest.fixture(scope="module")
def ref():
    from reference_harness import import_reference
    return import_reference()


def _dubins_aux_setup(N=10, beta=20.0, eps=1e-4):
    field = CircleField(
        centers=jnp.asarray([[4.0, 2.0], [2.0, 4.0], [6.0, 6.0]], dtype=F64),
        radii=jnp.ones((3,), dtype=F64),
    )
    system = make_dubins(DubinsConfig(dt=0.01), obstacles=field, aggregation="smoothmin", beta=beta, dtype=F64)
    aug = make_augmented(system, barrier_type="inverse", eps=eps)
    ocp = make_aux_ocp(system, aug)
    # a plausible reference trajectory: straight-ish plan
    ks = jnp.arange(N + 1, dtype=F64)
    X_ref = jnp.stack([0.05 * ks, 0.04 * ks, jnp.full(N + 1, np.pi / 4)], axis=-1)
    U_ref = jnp.tile(jnp.asarray([5.0, 0.1], dtype=F64), (N, 1))
    theta = AuxTheta(
        w=CostWeights.create([1.0, 1.0, 1.0], [1.0, 1.0], [1.0, 1.0, 1.0], 1.0, dtype=F64),
        bp=BarrierParams.create(0.0, 0.0, 0.0, dtype=F64),
        X_ref=X_ref,
        U_ref=U_ref,
    )
    return system, aug, ocp, theta


@pytest.mark.slow  # torch-oracle parity
class TestBoundedGradsMatchReference:
    def test_active_set_gradient_parity(self, ref):
        """Bounded LQ tracking with heavily saturated controls: our custom_vjp gradient
        must equal the reference pipeline (ddp_sensitivity + IFT accumulation) run in
        torch on the same solved trajectory — i.e. identical active-set semantics."""
        import torch

        N, nx, nu = 8, 3, 2
        ocp = _tracking_lq_ocp(bounded=True)
        cfg = ILQRConfig(max_iter=60, tol=1e-14, reg=1e-10, alphas=(1.0, 0.5, 0.25))
        solve = make_diff_ilqr(ocp, cfg)
        theta = {
            "Q": jnp.asarray([1.0, 2.0, 0.5], dtype=F64),
            "R": jnp.asarray([0.5, 1.0], dtype=F64),
            "Qf": jnp.asarray([5.0, 5.0, 5.0], dtype=F64),
            "X_ref": 0.5 * jax.random.normal(jax.random.PRNGKey(11), (N + 1, nx), dtype=F64),
            "U_ref": 0.3 * jax.random.normal(jax.random.PRNGKey(12), (N, nu), dtype=F64),
        }
        x0 = jnp.asarray([1.0, -0.5, 0.8], dtype=F64)
        U0 = jnp.zeros((N, nu), dtype=F64)
        goal = jnp.asarray([0.3, -0.2, 0.1], dtype=F64)

        def upper_loss(th):
            X, U = solve(th, x0, U0)
            return jnp.sum((X - goal) ** 2) + 0.1 * jnp.sum(U**2)

        g = jax.grad(upper_loss)(theta)
        X, U = solve(theta, x0, U0)
        assert bool(jnp.any(ocp.active_mask(U))), "test needs saturated controls"

        # ---- reference pipeline in torch on the same (X, U) ----
        from diff_tube_mpc_strict_pt.core.control import BoxClampControl
        from diff_tube_mpc_strict_pt.core.ddp import ddp_sensitivity as ref_sens
        from diff_tube_mpc_strict_pt.core.ift import IFTInputs, ift_gradient as ref_ift

        td = torch.float64
        # rebuild the same dynamics matrices in torch
        A_j = jnp.eye(nx, dtype=F64) + 0.08 * jax.random.normal(jax.random.PRNGKey(3), (nx, nx), dtype=F64)
        B_j = 0.25 * jax.random.normal(jax.random.PRNGKey(4), (nx, nu), dtype=F64)
        A_t = torch.tensor(np.asarray(A_j), dtype=td)
        B_t = torch.tensor(np.asarray(B_j), dtype=td)
        Q_t = torch.tensor(np.asarray(theta["Q"]), dtype=td, requires_grad=True)
        R_t = torch.tensor(np.asarray(theta["R"]), dtype=td, requires_grad=True)
        Qf_t = torch.tensor(np.asarray(theta["Qf"]), dtype=td, requires_grad=True)
        Xref_t = torch.tensor(np.asarray(theta["X_ref"]), dtype=td)
        Uref_t = torch.tensor(np.asarray(theta["U_ref"]), dtype=td)
        goal_t = torch.tensor(np.asarray(goal), dtype=td)
        X_t = torch.tensor(np.asarray(X), dtype=td)
        U_t = torch.tensor(np.asarray(U), dtype=td)

        f_t = lambda x, u: A_t @ x + B_t @ u

        def stage_hess(x, u, k):
            lxx = torch.diag(2.0 * Q_t.detach())
            luu = torch.diag(2.0 * R_t.detach())
            lux = torch.zeros(nu, nx, dtype=td)
            return lxx, luu, lux

        def term_hess(xN):
            return torch.diag(2.0 * Qf_t.detach())

        ctrl = BoxClampControl(
            u_min=torch.full((nu,), -0.4, dtype=td), u_max=torch.full((nu,), 0.4, dtype=td)
        )
        rs = ref_sens(
            X=X_t, V=U_t, f=f_t, ctrl=ctrl,
            f_jac=lambda x, u: (A_t.clone(), B_t.clone()),
            stage_hess=stage_hess, terminal_hess=term_hess,
            upper_grad_x=lambda x, k: 2.0 * (x - goal_t),
            upper_grad_u=lambda u, k: 0.2 * u,
            upper_grad_xN=lambda x: 2.0 * (x - goal_t),
        )
        g_ref = ref_ift(
            inputs=IFTInputs(X=X_t, V=U_t, delta_X=rs.delta_X, delta_V=rs.delta_V, delta_lambda=rs.delta_lambda),
            theta_tensors=[Q_t, R_t, Qf_t],
            xi_fn=lambda: torch.tensor(np.asarray(x0), dtype=td),
            f_fn=f_t,
            stage_cost_fn=lambda x, u, k: ((Q_t * (x - Xref_t[k]) ** 2).sum() + (R_t * (u - Uref_t[k]) ** 2).sum()),
            terminal_cost_fn=lambda xN: (Qf_t * (xN - Xref_t[-1]) ** 2).sum(),
        )
        np.testing.assert_allclose(g["Q"], g_ref[0].numpy(), rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(g["R"], g_ref[1].numpy(), rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(g["Qf"], g_ref[2].numpy(), rtol=1e-7, atol=1e-10)


@pytest.mark.slow  # torch-oracle parity
class TestSensitivityAgainstReference:
    def test_delta_z_matches_torch(self, ref):
        import torch

        N = 10
        beta, eps = 20.0, 1e-4
        system, aug, ocp, theta = _dubins_aux_setup(N=N, beta=beta, eps=eps)
        cfg = ILQRConfig(max_iter=10, tol=1e-3, reg=1e-3, alphas=(1.0, 0.5, 0.25, 0.1, 0.0))

        x0 = jnp.asarray([0.0, 0.0, float(np.pi / 4)], dtype=F64)
        b0 = aug.init_b0(x0, theta.bp)
        x_hat0 = jnp.concatenate([x0, b0[None]])
        U0 = jnp.zeros((N, 2), dtype=F64)
        X, U = ilqr_solve(ocp, cfg, theta, x_hat0, U0)

        # upper loss L = ||x - x_ref||^2 + ||b||^2 -> gradients as cotangents
        x_nom = theta.X_ref
        def gx(xh, xr):
            return jnp.concatenate([2.0 * (xh[:3] - xr), (2.0 * xh[3])[None]])
        g_X = jax.vmap(gx)(X, x_nom)
        g_U = jnp.zeros_like(U)
        sens = ddp_sensitivity(ocp, theta, X, U, g_X, g_U)

        # ---- reference on the SAME solved trajectory ----
        from diff_tube_mpc_strict_pt.core.barrier import DBaSConfig, dbas_step
        from diff_tube_mpc_strict_pt.core.control import BoxClampControl
        from diff_tube_mpc_strict_pt.core.cost_derivs import (
            auxiliary_cost_derivs_u,
            auxiliary_terminal_derivs,
        )
        from diff_tube_mpc_strict_pt.core.ddp import ddp_sensitivity as ref_sens
        from diff_tube_mpc_strict_pt.core.systems.dubins import DubinsConfig as RefDub, dubins_step
        from diff_tube_mpc_strict_pt.core.systems.dubins_aug_jac import dubins_augmented_jacobian
        from diff_tube_mpc_strict_pt.core.systems.dubins_obstacles import (
            CircleObstacle,
            h_multi_circle_obstacles,
        )

        td = torch.float64
        rdub = RefDub(dt=0.01)
        obs = [CircleObstacle(center=c, radius=1.0) for c in [(4.0, 2.0), (2.0, 4.0), (6.0, 6.0)]]
        h_t = lambda x: h_multi_circle_obstacles(x, obstacles=obs, beta=beta)
        db = DBaSConfig(barrier_type="inverse", alpha=torch.tensor(0.0, dtype=td), gamma=torch.tensor(0.0, dtype=td), eps=eps)
        f_t = lambda x, u: dubins_step(x, u, cfg=rdub)

        def f_hat_t(xh, u):
            xn, bn = dbas_step(x_k=xh[:-1], u_k=u, b_k=xh[-1], f=f_t, h=h_t, cfg=db)
            return torch.cat([xn, bn.view(1)], dim=0)

        X_t = torch.tensor(np.asarray(X), dtype=td)
        U_t = torch.tensor(np.asarray(U), dtype=td)
        Xref_t = torch.tensor(np.asarray(theta.X_ref), dtype=td)
        Uref_t = torch.tensor(np.asarray(theta.U_ref), dtype=td)
        Qa = torch.ones(3, dtype=td)
        Ra = torch.ones(2, dtype=td)
        qba = torch.tensor(1.0, dtype=td)

        def stage_hess(xh, u, k):
            _, _, lxx, luu, lux = auxiliary_cost_derivs_u(
                x_hat=xh, u=u, x_ref=Xref_t[k], u_ref=Uref_t[k], Q=Qa, R=Ra, qb=qba
            )
            return lxx, luu, lux

        def term_hess(xh):
            _, pxx = auxiliary_terminal_derivs(x_hat_N=xh, x_ref_N=Xref_t[-1], Qf=Qa)
            pxx[-1, -1] = 2.0 * qba
            return pxx

        def ugx(xh, k):
            return torch.cat([2.0 * (xh[:-1] - Xref_t[k]), (2.0 * xh[-1]).view(1)])

        def ugu(u, k):
            return torch.zeros_like(u)

        def ugxN(xh):
            return torch.cat([2.0 * (xh[:-1] - Xref_t[-1]), (2.0 * xh[-1]).view(1)])

        ctrl = BoxClampControl(
            u_min=torch.tensor([-10.0, -float(np.pi)], dtype=td),
            u_max=torch.tensor([10.0, float(np.pi)], dtype=td),
        )
        rs = ref_sens(
            X=X_t, V=U_t, f=f_hat_t, ctrl=ctrl,
            f_jac=lambda xh, u: dubins_augmented_jacobian(xh, u, cfg=rdub, obs=obs, obs_beta=beta, obs_agg="smoothmin", db_cfg=db),
            stage_hess=stage_hess, terminal_hess=term_hess,
            upper_grad_x=ugx, upper_grad_u=ugu, upper_grad_xN=ugxN,
        )
        np.testing.assert_allclose(np.asarray(sens.delta_X), rs.delta_X.numpy(), rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(np.asarray(sens.delta_U), rs.delta_V.numpy(), rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(np.asarray(sens.delta_lambda), rs.delta_lambda.numpy(), rtol=1e-7, atol=1e-10)


class TestClosedFormWeightGrads:
    @pytest.mark.slow  # finite-difference / dense-KKT oracle sweeps, 30-55s
    def test_custom_vjp_matches_closed_form(self):
        """Paper-path parity: jax.grad through diff_ilqr == the closed-form
        gQ/gR/gqb formulas (reference tube_mpc.py:963-976) computed from δz."""
        N = 10
        system, aug, ocp, theta = _dubins_aux_setup(N=N)
        cfg = ILQRConfig(max_iter=10, tol=1e-3, reg=1e-3, alphas=(1.0, 0.5, 0.25, 0.1, 0.0))
        solve = make_diff_ilqr(ocp, cfg)

        x0 = jnp.asarray([0.0, 0.0, float(np.pi / 4)], dtype=F64)
        b0 = aug.init_b0(x0, theta.bp)
        x_hat0 = jnp.concatenate([x0, b0[None]])
        U0 = jnp.zeros((N, 2), dtype=F64)

        def upper_loss(adapt):
            Qa, Ra, qba = adapt
            w = CostWeights(Q=Qa, R=Ra, Qf=Qa, qb=qba)
            th = AuxTheta(w=w, bp=theta.bp, X_ref=theta.X_ref, U_ref=theta.U_ref)
            X, U = solve(th, x_hat0, U0)
            return jnp.sum((X[:, :3] - theta.X_ref) ** 2) + jnp.sum(X[:, 3] ** 2)

        adapt = (theta.w.Q, theta.w.R, theta.w.qb)
        gQ, gR, gqb = jax.grad(upper_loss)(adapt)

        # closed-form from δz on the same solution
        w = CostWeights(Q=adapt[0], R=adapt[1], Qf=adapt[0], qb=adapt[2])
        th = AuxTheta(w=w, bp=theta.bp, X_ref=theta.X_ref, U_ref=theta.U_ref)
        X, U = ilqr_solve(ocp, cfg, th, x_hat0, U0)
        def gx(xh, xr):
            return jnp.concatenate([2.0 * (xh[:3] - xr), (2.0 * xh[3])[None]])
        g_X = jax.vmap(gx)(X, theta.X_ref)
        sens = ddp_sensitivity(ocp, th, X, U, g_X, jnp.zeros_like(U))

        dx = X[:, :3] - theta.X_ref
        du = U - theta.U_ref
        b = X[:, 3]
        gQ_cf = jnp.sum(2.0 * dx * sens.delta_X[:, :3], axis=0)
        gR_cf = jnp.sum(2.0 * du * sens.delta_U, axis=0)
        gqb_cf = jnp.sum(2.0 * b * sens.delta_X[:, 3])

        np.testing.assert_allclose(gQ, gQ_cf, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(gR, gR_cf, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(gqb, gqb_cf, rtol=1e-9, atol=1e-12)


class TestExactHessianSensitivity:
    """exact_hessians=True must reproduce the EXACT solution-map derivative.

    The reference's recursion (core/ddp.py:360-410) is Gauss-Newton: it drops the
    λᵀ∇²f Lagrangian curvature, which biases its sensitivities ~2-3x on the
    barrier-augmented Dubins problem (exact only for linear dynamics — case 1 above).
    Oracle here: a dense reduced-KKT solve. On dubins.yaml shrunk to N=6 the v-dim
    saturates at v_max for every k, so the reduced problem is single-shooting in the
    free ω dims: dω*/dθ = -H⁻¹ ∂²J/∂ω∂θ with H the TRUE (jax.hessian) reduced
    Hessian through the rollout.
    """

    @pytest.mark.slow  # finite-difference / dense-KKT oracle sweeps, 30-55s
    def test_exact_mode_matches_dense_kkt_oracle(self):
        from tube_mpc_tpu.presets import dubins_paper_setup
        from tube_mpc_tpu.solvers.ocp import rollout, total_cost
        from tube_mpc_tpu.tube.problem import NominalTheta, make_nominal_ocp

        N = 6
        s = dubins_paper_setup(N=N, H=1, dtype=F64)
        cfg = ILQRConfig(max_iter=120, tol=0.0, reg=1e-6,
                         alphas=s.cfg.nominal_ilqr().alphas)
        ocp = make_nominal_ocp(s.system, s.aug, s.target)
        x0 = jnp.asarray([0.0, 0.0, np.pi / 4], dtype=F64)
        b0 = s.aug.init_b0(x0, s.bp)
        x_hat0 = jnp.concatenate([x0, b0[None]])
        U0 = jnp.zeros((N, 2), dtype=F64)
        q = jnp.asarray(1.0, dtype=F64)
        v_max = float(s.system.u_max[0])

        def th_of(q0):
            return NominalTheta(w=s.w_nominal._replace(Q=s.w_nominal.Q.at[0].set(q0)),
                                bp=s.bp)

        solve = make_diff_ilqr(ocp, cfg, exact_hessians=True)
        X_star, U_star = jax.jit(lambda: solve(th_of(q), x_hat0, U0))()
        # precondition for the single-shooting oracle: v strictly active everywhere
        assert np.allclose(np.asarray(U_star[:, 0]), v_max), "v must saturate"

        def J(omega, q0):
            U = jnp.stack([jnp.full((N,), v_max, dtype=F64), omega], axis=-1)
            X = rollout(ocp, th_of(q0), x_hat0, U)
            return total_cost(ocp, th_of(q0), X, U)

        om = U_star[:, 1]
        g_norm = float(jnp.linalg.norm(jax.jit(jax.grad(J))(om, q)))
        assert g_norm < 1e-10, f"solver did not converge: ||g||={g_norm}"
        H = jax.jit(jax.hessian(J, argnums=0))(om, q)
        cross = jax.jit(jax.jacobian(jax.grad(J, argnums=0), argnums=1))(om, q)
        dom_exact = -jnp.linalg.solve(H, cross)

        for k in range(N):
            g = jax.jit(jax.grad(lambda q0, kk=k: solve(th_of(q0), x_hat0, U0)[1][kk, 1]))(q)
            np.testing.assert_allclose(float(g), float(dom_exact[k]), rtol=1e-6,
                                       atol=1e-12, err_msg=f"k={k}")
