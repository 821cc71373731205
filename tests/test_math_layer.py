"""Unit tests for the core math layer: barrier, obstacles, augmented dynamics, costs.

Strategy per SURVEY.md §4: analytic derivatives are cross-checked against jax autodiff;
barrier piecewise values are checked against the closed-form definition; everything is
checked to broadcast correctly under vmap.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tube_mpc_tpu.ops import barrier as bar
from tube_mpc_tpu.ops.costs import CostWeights, stage_cost, stage_derivs, terminal_cost, terminal_derivs
from tube_mpc_tpu.ops.dbas import BarrierParams, make_augmented
from tube_mpc_tpu.ops.linalg import masked_reduced_solve, solve_spd
from tube_mpc_tpu.systems.dubins import DubinsConfig, dubins_jac, dubins_step, make_dubins
from tube_mpc_tpu.systems.obstacles import CircleField, grad_h_min, grad_h_smoothmin, h_min, h_smoothmin

F64 = jnp.float64


def _field(dtype=F64):
    return CircleField(
        centers=jnp.asarray([[4.0, 2.0], [2.0, 4.0], [6.0, 6.0]], dtype=dtype),
        radii=jnp.asarray([1.0, 1.0, 1.0], dtype=dtype),
    )


class TestBarrier:
    def test_piecewise_values(self):
        alpha, eps = 0.1, 1e-12
        # Safe branch: exact inverse.
        z = jnp.asarray([0.1, 0.5, 2.0], dtype=F64)
        np.testing.assert_allclose(bar.relaxed_inverse_barrier(z, alpha, eps=eps), 1.0 / z)
        # Unsafe branch: quadratic extension.
        z = jnp.asarray(0.05, dtype=F64)
        d = z - alpha
        expected = 1 / alpha - d / alpha**2 + d**2 / alpha**3
        np.testing.assert_allclose(bar.relaxed_inverse_barrier(z, alpha, eps=eps), expected)

    def test_alpha_zero_uses_eps(self):
        # alpha=0 -> alpha_eff = eps; gradients stay alive for z <= 0.
        eps = 1e-4
        z = jnp.asarray(-0.5, dtype=F64)
        v = bar.relaxed_inverse_barrier(z, 0.0, eps=eps)
        assert jnp.isfinite(v) and v > 0
        g = bar.d_relaxed_inverse_barrier(z, 0.0, eps=eps)
        assert jnp.isfinite(g) and g < 0

    def test_derivative_matches_autodiff(self):
        alpha, eps = 0.07, 1e-6
        zs = jnp.asarray([-0.3, 0.01, 0.06, 0.0699, 0.0701, 0.5, 3.0], dtype=F64)
        analytic = bar.d_relaxed_inverse_barrier(zs, alpha, eps=eps)
        auto = jax.vmap(jax.grad(lambda z: bar.relaxed_inverse_barrier(z, alpha, eps=eps)))(zs)
        np.testing.assert_allclose(analytic, auto, rtol=1e-10)

    def test_dbas_step_formula(self):
        # b+ = B(h(f(x,u))) - gamma*(B(h(x)) - b)  (reference barrier.py:107)
        f = lambda x, u: x + u[..., :3]
        h = lambda x: x[..., 0]
        x = jnp.asarray([0.5, 0.0, 0.0], dtype=F64)
        u = jnp.asarray([0.25, 0.0, 0.0], dtype=F64)
        b = jnp.asarray(0.3, dtype=F64)
        alpha, gamma, eps = 0.0, 0.5, 1e-6
        xn, bn = bar.dbas_step(x, u, b, f=f, h=h, alpha=alpha, gamma=gamma, eps=eps)
        np.testing.assert_allclose(xn, jnp.asarray([0.75, 0.0, 0.0]))
        np.testing.assert_allclose(bn, 1 / 0.75 - 0.5 * (1 / 0.5 - 0.3))


class TestObstacles:
    def test_h_values(self):
        field = _field()
        x = jnp.asarray([1.0, 0.0, 0.3], dtype=F64)  # unique closest obstacle
        each = jnp.asarray([3**2 + 2**2 - 1, 1**2 + 4**2 - 1, 5**2 + 6**2 - 1], dtype=F64)
        np.testing.assert_allclose(h_min(x, field), jnp.min(each))
        # smooth-min below exact min, converging as beta grows
        assert h_smoothmin(x, field, beta=20.0) <= h_min(x, field)
        np.testing.assert_allclose(h_smoothmin(x, field, beta=500.0), h_min(x, field), rtol=1e-6)

    @pytest.mark.parametrize("beta", [5.0, 20.0])
    def test_smoothmin_grad_matches_autodiff(self, beta):
        field = _field()
        xs = jnp.asarray([[0.0, 0.0, 0.3], [3.2, 2.2, -1.0], [5.0, 5.0, 0.0]], dtype=F64)
        analytic = grad_h_smoothmin(xs, field, beta=beta)
        auto = jax.vmap(jax.grad(lambda x: h_smoothmin(x, field, beta=beta)))(xs)
        np.testing.assert_allclose(analytic, auto, rtol=1e-9, atol=1e-12)

    def test_min_grad_is_argmin_gradient(self):
        field = _field()
        x = jnp.asarray([3.2, 2.2, 0.0], dtype=F64)  # closest to obstacle 0
        g = grad_h_min(x, field)
        expected = jnp.asarray([2 * (3.2 - 4.0), 2 * (2.2 - 2.0), 0.0], dtype=F64)
        np.testing.assert_allclose(g, expected, rtol=1e-12)


class TestDubins:
    def test_step_batched(self):
        dt = 0.01
        x = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 2.0, jnp.pi / 2]], dtype=F64)
        u = jnp.asarray([[1.0, 0.5], [2.0, -0.5]], dtype=F64)
        out = dubins_step(x, u, dt=dt)
        np.testing.assert_allclose(out[0], [0.01, 0.0, 0.005])
        np.testing.assert_allclose(out[1], [1.0, 2.02, jnp.pi / 2 - 0.005], atol=1e-12)

    def test_jacobian_matches_autodiff(self):
        dt = 0.01
        x = jnp.asarray([1.3, -0.2, 0.8], dtype=F64)
        u = jnp.asarray([4.0, 1.1], dtype=F64)
        A, B = dubins_jac(x, u, dt=dt)
        A_auto = jax.jacfwd(lambda xx: dubins_step(xx, u, dt=dt))(x)
        B_auto = jax.jacfwd(lambda uu: dubins_step(x, uu, dt=dt))(u)
        np.testing.assert_allclose(A, A_auto, rtol=1e-12)
        np.testing.assert_allclose(B, B_auto, rtol=1e-12)


class TestAugmented:
    def _aug(self):
        cfg = DubinsConfig()
        sys = make_dubins(cfg, obstacles=_field(), aggregation="smoothmin", beta=20.0, dtype=F64)
        return make_augmented(sys, barrier_type="inverse", eps=1e-4)

    def test_jacobian_matches_autodiff(self):
        aug = self._aug()
        bp = BarrierParams.create(alpha=0.0, gamma=0.0, tight=0.0, dtype=F64)
        x_hat = jnp.asarray([1.0, 0.5, 0.7, 0.05], dtype=F64)
        u = jnp.asarray([6.0, 0.4], dtype=F64)
        A, B = aug.f_hat_jac(x_hat, u, bp)
        A_auto = jax.jacfwd(lambda xh: aug.f_hat(xh, u, bp))(x_hat)
        B_auto = jax.jacfwd(lambda uu: aug.f_hat(x_hat, uu, bp))(u)
        np.testing.assert_allclose(A, A_auto, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(B, B_auto, rtol=1e-9, atol=1e-12)

    def test_jacobian_with_gamma_and_tight(self):
        aug = self._aug()
        bp = BarrierParams.create(alpha=0.05, gamma=0.4, tight=0.1, dtype=F64)
        x_hat = jnp.asarray([0.3, 0.2, 1.1, 0.02], dtype=F64)
        u = jnp.asarray([-2.0, 1.0], dtype=F64)
        A, B = aug.f_hat_jac(x_hat, u, bp)
        A_auto = jax.jacfwd(lambda xh: aug.f_hat(xh, u, bp))(x_hat)
        B_auto = jax.jacfwd(lambda uu: aug.f_hat(x_hat, uu, bp))(u)
        np.testing.assert_allclose(A, A_auto, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(B, B_auto, rtol=1e-9, atol=1e-12)
        # ∂b+/∂b = gamma exactly
        np.testing.assert_allclose(A[3, 3], 0.4)

    def test_vmap_batched(self):
        aug = self._aug()
        bp = BarrierParams.create(dtype=F64)
        key = jax.random.PRNGKey(0)
        x_hat = jax.random.uniform(key, (7, 4), dtype=F64)
        u = jax.random.uniform(jax.random.PRNGKey(1), (7, 2), dtype=F64)
        # direct broadcasting == vmap of single-sample
        A_b, B_b = aug.f_hat_jac(x_hat, u, bp)
        A_v, B_v = jax.vmap(lambda xh, uu: aug.f_hat_jac(xh, uu, bp))(x_hat, u)
        np.testing.assert_allclose(A_b, A_v, rtol=1e-12)
        np.testing.assert_allclose(B_b, B_v, rtol=1e-12)


class TestCosts:
    def test_derivs_match_autodiff(self):
        w = CostWeights.create(Q=[1.0, 2.0, 0.5], R=[1.0, 3.0], Qf=[10.0, 10.0, 10.0], qb=0.7, dtype=F64)
        x_hat = jnp.asarray([1.0, -2.0, 0.3, 0.1], dtype=F64)
        u = jnp.asarray([0.5, -0.5], dtype=F64)
        x_ref = jnp.asarray([0.2, 0.1, 0.0], dtype=F64)
        u_ref = jnp.asarray([0.1, 0.0], dtype=F64)

        lx, lu, lxx, luu, lux = stage_derivs(x_hat, u, w, x_ref, u_ref)
        c = lambda xh, uu: stage_cost(xh, uu, w, x_ref, u_ref)
        np.testing.assert_allclose(lx, jax.grad(c, 0)(x_hat, u), rtol=1e-12)
        np.testing.assert_allclose(lu, jax.grad(c, 1)(x_hat, u), rtol=1e-12)
        np.testing.assert_allclose(lxx, jax.hessian(c, 0)(x_hat, u), rtol=1e-12)
        np.testing.assert_allclose(luu, jax.hessian(c, 1)(x_hat, u), rtol=1e-12)
        np.testing.assert_allclose(lux, jax.jacfwd(jax.grad(c, 1), 0)(x_hat, u), atol=1e-12)

        px, pxx = terminal_derivs(x_hat, w, x_ref)
        tc = lambda xh: terminal_cost(xh, w, x_ref)
        np.testing.assert_allclose(px, jax.grad(tc)(x_hat), rtol=1e-12)
        np.testing.assert_allclose(pxx, jax.hessian(tc)(x_hat), rtol=1e-12)


class TestLinalg:
    def test_solve_spd_2x2(self):
        key = jax.random.PRNGKey(0)
        M = jax.random.normal(key, (5, 2, 2), dtype=F64)
        A = M @ jnp.swapaxes(M, -1, -2) + 0.5 * jnp.eye(2, dtype=F64)
        b = jax.random.normal(jax.random.PRNGKey(1), (5, 2), dtype=F64)
        np.testing.assert_allclose(solve_spd(A, b), jnp.linalg.solve(A, b[..., None])[..., 0], rtol=1e-10)
        B = jax.random.normal(jax.random.PRNGKey(2), (5, 2, 3), dtype=F64)
        np.testing.assert_allclose(solve_spd(A, B), jnp.linalg.solve(A, B), rtol=1e-10)

    def test_masked_reduced_solve_matches_reference_semantics(self):
        # Mirror _solve_reduced (ref ddp.py:23-60): X[active]=0, X[free]=A_ff^{-1}B_f.
        A = jnp.asarray([[4.0, 1.0], [1.0, 3.0]], dtype=F64)
        B = jnp.asarray([[1.0], [2.0]], dtype=F64)

        # no active dims: plain solve
        X = masked_reduced_solve(A, B, jnp.asarray([False, False]))
        np.testing.assert_allclose(X, jnp.linalg.solve(A, B), rtol=1e-12)

        # dim 0 active: x0 = 0, x1 = B1 / A11
        X = masked_reduced_solve(A, B, jnp.asarray([True, False]))
        np.testing.assert_allclose(X[0], 0.0)
        np.testing.assert_allclose(X[1], 2.0 / 3.0, rtol=1e-12)

        # all active: zero
        X = masked_reduced_solve(A, B, jnp.asarray([True, True]))
        np.testing.assert_allclose(X, jnp.zeros_like(B))

    def test_masked_reduced_solve_vector_rhs(self):
        A = jnp.asarray([[4.0, 1.0], [1.0, 3.0]], dtype=F64)
        b = jnp.asarray([1.0, 2.0], dtype=F64)
        X = masked_reduced_solve(A, b, jnp.asarray([False, True]))
        np.testing.assert_allclose(X[1], 0.0)
        np.testing.assert_allclose(X[0], 0.25, rtol=1e-12)
