"""Parallel-scan (associative) Riccati vs the sequential lax.scan backward pass.

The associative formulation must reproduce the sequential gains/values up to O(reg)
(it uses exact control elimination where the sequential pass uses the reference's
split regularized update, ddp.py:240-253), and exactly for reg -> 0.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tube_mpc_tpu.solvers.ilqr import ILQRConfig, _backward_pass, ilqr_solve
from tube_mpc_tpu.solvers.pscan import (
    parallel_affine_rollout,
    parallel_backward_pass,
    riccati_value_sweep,
)

F64 = jnp.float64


def _random_lq(key, N, n, m, dtype=F64):
    ks = jax.random.split(key, 8)
    A = jnp.eye(n, dtype=dtype) + 0.1 * jax.random.normal(ks[0], (N, n, n), dtype=dtype)
    B = 0.5 * jax.random.normal(ks[1], (N, n, m), dtype=dtype)
    lx = jax.random.normal(ks[2], (N, n), dtype=dtype)
    lu = jax.random.normal(ks[3], (N, m), dtype=dtype)

    def spd(k, sz, scale):
        W = jax.random.normal(k, (N, sz, sz), dtype=dtype)
        return scale * (W @ jnp.swapaxes(W, -1, -2)) + jnp.eye(sz, dtype=dtype)

    lxx = spd(ks[4], n, 0.1)
    luu = spd(ks[5], m, 0.1)
    lux = 0.1 * jax.random.normal(ks[6], (N, m, n), dtype=dtype)
    phi_x = jax.random.normal(ks[7], (n,), dtype=dtype)
    W = jax.random.normal(ks[7], (n, n), dtype=dtype)
    phi_xx = 0.5 * (W @ W.T) + jnp.eye(n, dtype=dtype)
    return A, B, lx, lu, lxx, luu, lux, phi_x, phi_xx


@pytest.mark.parametrize("n,m,N", [(4, 2, 17), (4, 1, 32), (6, 2, 50), (3, 3, 8)])
@pytest.mark.slow  # associative-scan sweeps, 15-30s; horizon_parallel_dubins keeps fast coverage
def test_parallel_gains_match_sequential(n, m, N):
    data = _random_lq(jax.random.PRNGKey(0), N, n, m)
    reg = 1e-9  # tiny reg: split vs exact updates coincide to O(reg)
    K_s, k_s = _backward_pass(*data, reg)
    K_p, k_p = parallel_backward_pass(*data, reg)
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_s), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(k_p), np.asarray(k_s), rtol=1e-7, atol=1e-8)


@pytest.mark.slow  # associative-scan sweeps, 15-30s; horizon_parallel_dubins keeps fast coverage
def test_value_sweep_matches_sequential_recursion():
    n, m, N = 4, 2, 21
    data = _random_lq(jax.random.PRNGKey(1), N, n, m)
    A, B, lx, lu, lxx, luu, lux, phi_x, phi_xx = data
    V_x_p, V_xx_p = riccati_value_sweep(*data, elem_reg=0.0)

    # sequential exact-elimination reference recursion
    V_x, V_xx = phi_x, phi_xx
    seq_x, seq_xx = [V_x], [V_xx]
    for k in reversed(range(N)):
        Q_x = lx[k] + A[k].T @ V_x
        Q_u = lu[k] + B[k].T @ V_x
        Q_xx = lxx[k] + A[k].T @ V_xx @ A[k]
        Q_ux = lux[k] + B[k].T @ V_xx @ A[k]
        Q_uu = luu[k] + B[k].T @ V_xx @ B[k]
        Kk = -jnp.linalg.solve(Q_uu, Q_ux)
        V_x = Q_x + Kk.T @ Q_u
        V_xx = Q_xx + Kk.T @ Q_ux
        seq_x.insert(0, V_x)
        seq_xx.insert(0, V_xx)
    np.testing.assert_allclose(np.asarray(V_x_p), np.asarray(jnp.stack(seq_x)), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(V_xx_p), np.asarray(jnp.stack(seq_xx)), rtol=1e-7, atol=1e-9)


@pytest.mark.slow  # associative-scan sweeps, 15-30s; horizon_parallel_dubins keeps fast coverage
def test_parallel_affine_rollout():
    n, N = 5, 33
    key = jax.random.PRNGKey(2)
    F = jnp.eye(n, dtype=F64) + 0.05 * jax.random.normal(key, (N, n, n), dtype=F64)
    c = jax.random.normal(jax.random.PRNGKey(3), (N, n), dtype=F64)
    x0 = jnp.arange(n, dtype=F64)
    X = parallel_affine_rollout(F, c, x0)
    x = x0
    for k in range(N):
        x = F[k] @ x + c[k]
        np.testing.assert_allclose(np.asarray(X[k + 1]), np.asarray(x), rtol=1e-9, atol=1e-10)


def test_ilqr_horizon_parallel_matches_sequential_on_dubins():
    """Full nonlinear solve: horizon_parallel=True reproduces the sequential solution."""
    from tube_mpc_tpu.ops.costs import CostWeights
    from tube_mpc_tpu.ops.dbas import BarrierParams, make_augmented
    from tube_mpc_tpu.systems.dubins import DubinsConfig, make_dubins
    from tube_mpc_tpu.systems.obstacles import CircleField
    from tube_mpc_tpu.tube.problem import NominalTheta, make_nominal_ocp

    field = CircleField(
        centers=jnp.asarray([[4.0, 2.0], [2.0, 4.0]], dtype=F64),
        radii=jnp.ones((2,), dtype=F64),
    )
    system = make_dubins(DubinsConfig(dt=0.01), obstacles=field, aggregation="smoothmin", beta=20.0, dtype=F64)
    aug = make_augmented(system, barrier_type="inverse", eps=1e-4)
    ocp = make_nominal_ocp(system, aug, jnp.asarray([10.0, 10.0, np.pi / 4], dtype=F64))
    theta = NominalTheta(
        w=CostWeights.create([1.0, 1.0, 0.0], [1.0, 1.0], [1000.0] * 3, 1.0, dtype=F64),
        bp=BarrierParams.create(0.0, 0.0, 0.0, dtype=F64),
    )
    x_hat0 = jnp.asarray([0.0, 0.0, np.pi / 4, 0.1], dtype=F64)
    U0 = jnp.zeros((40, 2), dtype=F64)

    cfg_s = ILQRConfig(max_iter=10, tol=1e-3, reg=1e-6, alphas=(1.0, 0.5, 0.25, 0.1, 0.0))
    cfg_p = ILQRConfig(max_iter=10, tol=1e-3, reg=1e-6, alphas=(1.0, 0.5, 0.25, 0.1, 0.0),
                       horizon_parallel=True)
    X_s, U_s = jax.jit(lambda: ilqr_solve(ocp, cfg_s, theta, x_hat0, U0))()
    X_p, U_p = jax.jit(lambda: ilqr_solve(ocp, cfg_p, theta, x_hat0, U0))()
    np.testing.assert_allclose(np.asarray(U_p), np.asarray(U_s), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(X_p), np.asarray(X_s), rtol=1e-5, atol=1e-7)
