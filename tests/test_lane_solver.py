"""Lane-major fused Pallas solver vs the vmapped XLA solver (interpret mode).

Also pins the component forms (ops/lanes.py) against the feature-last systems.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tube_mpc_tpu.ops.costs import CostWeights
from tube_mpc_tpu.ops.dbas import BarrierParams, make_augmented
from tube_mpc_tpu.ops.lanes import augmented_step_fn, dubins_components, jac_rows
from tube_mpc_tpu.solvers.ilqr import ILQRConfig, ilqr_solve
from tube_mpc_tpu.systems.dubins import DubinsConfig, make_dubins
from tube_mpc_tpu.systems.obstacles import CircleField
from tube_mpc_tpu.tube.lane_interface import make_lane_problem, tube_ilqr_solve_lanes
from tube_mpc_tpu.tube.problem import AuxTheta, NominalTheta, make_aux_ocp, make_nominal_ocp

F32 = jnp.float32

OBS = [(4.0, 2.0), (2.0, 4.0), (6.0, 6.0)]
BETA, EPS = 20.0, 1e-4


def _systems(dtype=F32):
    field = CircleField(
        centers=jnp.asarray([list(c) for c in OBS], dtype=dtype),
        radii=jnp.ones((len(OBS),), dtype=dtype),
    )
    system = make_dubins(DubinsConfig(dt=0.01), obstacles=field, aggregation="smoothmin",
                         beta=BETA, dtype=dtype)
    aug = make_augmented(system, eps=EPS)
    sys_c = dubins_components(
        dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
        centers=OBS, radii=[1.0] * len(OBS), aggregation="smoothmin", beta=BETA,
    )
    return system, aug, sys_c


class TestComponentForms:
    def test_component_step_and_h_match_feature_last(self):
        system, aug, sys_c = _systems(jnp.float64)
        key = jax.random.PRNGKey(0)
        x = jax.random.uniform(key, (17, 3), dtype=jnp.float64) * 3.0
        u = jax.random.uniform(jax.random.PRNGKey(1), (17, 2), dtype=jnp.float64)
        xs = tuple(x[:, i] for i in range(3))
        us = tuple(u[:, a] for a in range(2))
        fn = jnp.stack(sys_c.f(xs, us), axis=-1)
        np.testing.assert_allclose(fn, system.f(x, u), rtol=1e-12)
        np.testing.assert_allclose(sys_c.h(xs), system.h(x), rtol=1e-10)

    def test_augmented_component_jacobian_matches(self):
        system, aug, sys_c = _systems(jnp.float64)
        bp = BarrierParams.create(0.05, 0.3, 0.02, dtype=jnp.float64)
        f_hat_c = augmented_step_fn(sys_c, eps=EPS)
        x_hat = jnp.asarray([1.0, 0.4, 0.7, 0.05], dtype=jnp.float64)
        u = jnp.asarray([4.0, 0.3], dtype=jnp.float64)
        xs = tuple(x_hat[i] for i in range(4))
        us = tuple(u[a] for a in range(2))
        # value parity
        np.testing.assert_allclose(
            jnp.stack(f_hat_c(xs, us, bp)), aug.f_hat(x_hat, u, bp), rtol=1e-12
        )
        # jvp-derived jacobian rows vs analytic chain-rule jacobian
        A_rows, B_rows = jac_rows(lambda xx, uu: f_hat_c(xx, uu, bp), xs, us)
        A_ref, B_ref = aug.f_hat_jac(x_hat, u, bp)
        A = jnp.asarray([[A_rows[i][j] for j in range(4)] for i in range(4)])
        Bm = jnp.asarray([[B_rows[i][a] for a in range(2)] for i in range(4)])
        np.testing.assert_allclose(A, A_ref, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(Bm, B_ref, rtol=1e-9, atol=1e-12)


class TestLaneSolverEquivalence:
    def _solve_both(self, *, tracking: bool, dtype):
        system, aug, sys_c = _systems(dtype)
        pb = make_lane_problem(sys_c, eps=EPS)
        cfg = ILQRConfig(max_iter=6, tol=1e-3, reg=1e-3, alphas=(1.0, 0.5, 0.1, 0.0))

        B, N = 5, 9
        w = CostWeights.create([1.0, 1.0, 0.0], [1.0, 1.0], [100.0] * 3, 1.0, dtype=dtype)
        bp = BarrierParams.create(0.0, 0.0, 0.0, dtype=dtype)
        key = jax.random.PRNGKey(3)
        x0 = jnp.asarray([0.0, 0.0, np.pi / 4], dtype=dtype) + 0.05 * jax.random.normal(key, (B, 3), dtype=dtype)
        b0 = aug.init_b0(x0, bp)
        x_hat0 = jnp.concatenate([x0, b0[:, None]], axis=-1)
        U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (B, N, 2), dtype=dtype)

        if tracking:
            ks = jnp.arange(N + 1, dtype=dtype)
            X_ref1 = jnp.stack([0.05 * ks, 0.04 * ks, jnp.full(N + 1, np.pi / 4, dtype=dtype)], axis=-1)
            X_ref = jnp.broadcast_to(X_ref1[None], (B, N + 1, 3))
            U_ref = jnp.broadcast_to(jnp.asarray([5.0, 0.1], dtype=dtype)[None, None], (B, N, 2))
            ocp = make_aux_ocp(system, aug)
            thetas = AuxTheta(w=w, bp=bp, X_ref=X_ref1, U_ref=U_ref[0])
            X_x, U_x = jax.vmap(lambda xh, uu: ilqr_solve(ocp, cfg, thetas, xh, uu))(x_hat0, U0)
        else:
            target = jnp.asarray([10.0, 10.0, np.pi / 4], dtype=dtype)
            X_ref = jnp.broadcast_to(target[None, None], (B, N + 1, 3))
            U_ref = jnp.zeros((B, N, 2), dtype=dtype)
            ocp = make_nominal_ocp(system, aug, target)
            theta = NominalTheta(w=w, bp=bp)
            X_x, U_x = jax.vmap(lambda xh, uu: ilqr_solve(ocp, cfg, theta, xh, uu))(x_hat0, U0)

        X_l, U_l = tube_ilqr_solve_lanes(
            pb, cfg, w=w, bp=bp, x_hat0=x_hat0, U_init=U0,
            X_ref=X_ref, U_ref=U_ref, block_b=128, interpret=True,
        )
        return (X_x, U_x), (X_l, U_l)

    @pytest.mark.slow  # interpret-mode lane solve, 30-160s; reference_tracking_exact_f64 keeps fast coverage
    def test_goal_tracking_exact_f64(self):
        (X_x, U_x), (X_l, U_l) = self._solve_both(tracking=False, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(U_l), np.asarray(U_x), rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(np.asarray(X_l), np.asarray(X_x), rtol=1e-12, atol=1e-13)

    def test_reference_tracking_exact_f64(self):
        (X_x, U_x), (X_l, U_l) = self._solve_both(tracking=True, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(U_l), np.asarray(U_x), rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(np.asarray(X_l), np.asarray(X_x), rtol=1e-12, atol=1e-13)

    @pytest.mark.slow  # interpret-mode lane solve, 30-160s; reference_tracking_exact_f64 keeps fast coverage
    def test_goal_tracking_f32_close(self):
        # f32 op-order round-off amplifies through the iterative solve; the f64 check
        # above pins exact semantics, this one pins the f32 noise envelope.
        (X_x, U_x), (X_l, U_l) = self._solve_both(tracking=False, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(U_l), np.asarray(U_x), rtol=0.05, atol=5e-3)


class TestIterTelemetry:
    """with_iters / with_lane_iters semantics (the straggler diagnostic behind
    benchmarks/iter_probe.py): the per-lane count is how many while_loop trips the
    lane entered unconverged, so max over lanes == the executed batch trip count,
    every lane counts >= 1, and the solution is bitwise unchanged by telemetry."""

    def test_lane_iters_semantics(self):
        system, aug, sys_c = _systems(jnp.float64)
        pb = make_lane_problem(sys_c, eps=EPS)
        cfg = ILQRConfig(max_iter=6, tol=1e-3, reg=1e-3, alphas=(1.0, 0.5, 0.1, 0.0))
        B, N = 5, 9
        w = CostWeights.create([1.0, 1.0, 0.0], [1.0, 1.0], [100.0] * 3, 1.0, dtype=jnp.float64)
        bp = BarrierParams.create(0.0, 0.0, 0.0, dtype=jnp.float64)
        x0 = jnp.asarray([0.0, 0.0, np.pi / 4], dtype=jnp.float64) + 0.05 * jax.random.normal(
            jax.random.PRNGKey(3), (B, 3), dtype=jnp.float64)
        b0 = aug.init_b0(x0, bp)
        x_hat0 = jnp.concatenate([x0, b0[:, None]], axis=-1)
        U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (B, N, 2), dtype=jnp.float64)
        target = jnp.asarray([10.0, 10.0, np.pi / 4], dtype=jnp.float64)
        X_ref = jnp.broadcast_to(target[None, None], (B, N + 1, 3))
        U_ref = jnp.zeros((B, N, 2), dtype=jnp.float64)

        kw = dict(w=w, bp=bp, x_hat0=x_hat0, U_init=U0, X_ref=X_ref, U_ref=U_ref,
                  block_b=128, interpret=True)
        X_p, U_p = tube_ilqr_solve_lanes(pb, cfg, **kw)
        X_t, U_t, it, lane_it = tube_ilqr_solve_lanes(
            pb, cfg, with_iters=True, with_lane_iters=True, **kw)

        np.testing.assert_array_equal(np.asarray(U_t), np.asarray(U_p))
        np.testing.assert_array_equal(np.asarray(X_t), np.asarray(X_p))
        it, lane_it = int(it), np.asarray(lane_it)
        assert lane_it.shape == (B,)
        assert lane_it.min() >= 1
        assert lane_it.max() == it
        assert it <= cfg.max_iter


class TestCompaction:
    """compact_caps straggler compaction must be BITWISE identical to the plain
    loop — both when the unconverged lanes fit the halved width (compact branch)
    and when they don't (full-width fallback). Lanes are independent in the
    kernels, so gathering them into a narrower batch cannot change their math."""

    @pytest.mark.slow  # interpret-mode lane solves at B=136 with multiple phase variants
    def test_bitwise_parity_both_branches(self):
        system, aug, sys_c = _systems(F32)
        pb = make_lane_problem(sys_c, eps=EPS)
        cfg = ILQRConfig(max_iter=6, tol=1e-3, reg=1e-3, alphas=(1.0, 0.5, 0.1, 0.0))
        B, N = 136, 9   # B_pad=256 at block_b=128 -> halvable to 128
        w = CostWeights.create([1.0, 1.0, 0.0], [1.0, 1.0], [100.0] * 3, 1.0, dtype=F32)
        bp = BarrierParams.create(0.0, 0.0, 0.0, dtype=F32)
        x0 = jnp.asarray([0.0, 0.0, np.pi / 4], dtype=F32) + 0.05 * jax.random.normal(
            jax.random.PRNGKey(3), (B, 3), dtype=F32)
        b0 = aug.init_b0(x0, bp)
        x_hat0 = jnp.concatenate([x0, b0[:, None]], axis=-1)
        U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (B, N, 2), dtype=F32)
        target = jnp.asarray([10.0, 10.0, np.pi / 4], dtype=F32)
        X_ref = jnp.broadcast_to(target[None, None], (B, N + 1, 3))
        U_ref = jnp.zeros((B, N, 2), dtype=F32)

        kw = dict(w=w, bp=bp, x_hat0=x_hat0, U_init=U0, X_ref=X_ref, U_ref=U_ref,
                  block_b=128, interpret=True)
        X_p, U_p, lane_it = tube_ilqr_solve_lanes(
            pb, cfg, with_lane_iters=True, **kw)
        lane_it = np.asarray(lane_it)
        # caps=(1,): after 1 trip nearly all lanes are unconverged -> fallback path;
        # caps chosen at the median convergence point -> compact path exercised
        mid = int(np.median(lane_it))
        for caps in [(1,), (max(2, mid),), (1, max(2, mid))]:
            X_c, U_c = tube_ilqr_solve_lanes(pb, cfg, compact_caps=caps, **kw)
            np.testing.assert_array_equal(np.asarray(U_c), np.asarray(U_p), err_msg=f"caps={caps}")
            np.testing.assert_array_equal(np.asarray(X_c), np.asarray(X_p), err_msg=f"caps={caps}")


class TestNewFamilyComponentForms:
    """Lane solver equivalence on the other shipped families (cartpole nu=1,
    quadrotor2d nx=6), pinning component forms to the feature-last systems."""

    def _solve_both(self, name, dtype=jnp.float64):
        from tube_mpc_tpu.ops.lanes import cartpole_components, quadrotor2d_components

        if name == "cartpole":
            from tube_mpc_tpu.systems.cartpole import CartPoleConfig, make_cartpole

            system = make_cartpole(CartPoleConfig(dt=0.02), dtype=dtype)
            sys_c = cartpole_components(dt=0.02)
            target = jnp.zeros((4,), dtype=dtype)
            x0_center = jnp.asarray([0.3, 0.0, 0.6, 0.0], dtype=dtype)
            Q = [1.0, 0.1, 5.0, 0.1]; R = [0.01]; Qf = [10.0, 1.0, 50.0, 1.0]
        else:
            from tube_mpc_tpu.systems.quadrotor2d import Quadrotor2DConfig, make_quadrotor2d

            obs = [(3.0, 3.0), (5.0, 6.0)]
            field = CircleField(
                centers=jnp.asarray([list(c) for c in obs], dtype=dtype),
                radii=jnp.ones((2,), dtype=dtype),
            )
            system = make_quadrotor2d(Quadrotor2DConfig(dt=0.02), obstacles=field,
                                      aggregation="smoothmin", beta=BETA, dtype=dtype)
            sys_c = quadrotor2d_components(dt=0.02, centers=obs, radii=[1.0, 1.0],
                                           aggregation="smoothmin", beta=BETA)
            target = jnp.asarray([8.0, 8.0, 0.0, 0.0, 0.0, 0.0], dtype=dtype)
            x0_center = jnp.asarray([0.0, 0.5, 0.0, 0.0, 0.0, 0.0], dtype=dtype)
            Q = [1.0, 1.0, 0.5, 0.1, 0.1, 0.1]; R = [0.1, 0.1]; Qf = [50.0] * 6

        n, m = system.nx, system.nu
        aug = make_augmented(system, eps=EPS)
        pb = make_lane_problem(sys_c, eps=EPS)
        cfg = ILQRConfig(max_iter=5, tol=1e-3, reg=1e-3, alphas=(1.0, 0.5, 0.1, 0.0))

        B, N = 4, 8
        w = CostWeights.create(Q, R, Qf, 1.0, dtype=dtype)
        bp = BarrierParams.create(0.0, 0.0, 0.0, dtype=dtype)
        x0 = x0_center[None] + 0.02 * jax.random.normal(jax.random.PRNGKey(5), (B, n), dtype=dtype)
        b0 = aug.init_b0(x0, bp)
        x_hat0 = jnp.concatenate([x0, b0[:, None]], axis=-1)
        U0 = 0.05 * jax.random.normal(jax.random.PRNGKey(6), (B, N, m), dtype=dtype)

        X_ref = jnp.broadcast_to(target[None, None], (B, N + 1, n))
        U_ref = jnp.zeros((B, N, m), dtype=dtype)
        ocp = make_nominal_ocp(system, aug, target)
        theta = NominalTheta(w=w, bp=bp)
        X_x, U_x = jax.vmap(lambda xh, uu: ilqr_solve(ocp, cfg, theta, xh, uu))(x_hat0, U0)
        X_l, U_l = tube_ilqr_solve_lanes(
            pb, cfg, w=w, bp=bp, x_hat0=x_hat0, U_init=U0,
            X_ref=X_ref, U_ref=U_ref, block_b=128, interpret=True,
        )
        return (X_x, U_x), (X_l, U_l)

    @pytest.mark.slow  # interpret-mode lane solve, 30-160s; reference_tracking_exact_f64 keeps fast coverage
    def test_cartpole_lane_solver_matches(self):
        (X_x, U_x), (X_l, U_l) = self._solve_both("cartpole")
        np.testing.assert_allclose(np.asarray(U_l), np.asarray(U_x), rtol=1e-11, atol=1e-12)
        np.testing.assert_allclose(np.asarray(X_l), np.asarray(X_x), rtol=1e-11, atol=1e-12)

    @pytest.mark.slow  # interpret-mode lane solve, 30-160s; reference_tracking_exact_f64 keeps fast coverage
    def test_quadrotor2d_lane_solver_matches(self):
        (X_x, U_x), (X_l, U_l) = self._solve_both("quadrotor2d")
        np.testing.assert_allclose(np.asarray(U_l), np.asarray(U_x), rtol=1e-11, atol=1e-12)
        np.testing.assert_allclose(np.asarray(X_l), np.asarray(X_x), rtol=1e-11, atol=1e-12)
