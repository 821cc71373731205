"""Differential test: C++ oracle vs the JAX scan path (f64) for the Riccati backward
sweep and the active-set DDP sensitivity — two independent implementations of
reference ddp.py:213-254 / 317-427 must agree to near machine precision."""
import jax
import jax.numpy as jnp
import numpy as np

from tube_mpc_tpu import native
from tube_mpc_tpu.solvers.ilqr import _backward_pass
from tube_mpc_tpu.solvers.ocp import OCP
from tube_mpc_tpu.solvers.sensitivity import ddp_sensitivity

F64 = jnp.float64


def _problem(key, N, n, m):
    ks = jax.random.split(key, 9)
    A = jnp.eye(n, dtype=F64) + 0.1 * jax.random.normal(ks[0], (N, n, n), dtype=F64)
    B = 0.3 * jax.random.normal(ks[1], (N, n, m), dtype=F64)
    lx = jax.random.normal(ks[2], (N, n), dtype=F64)
    lu = jax.random.normal(ks[3], (N, m), dtype=F64)
    M1 = jax.random.normal(ks[4], (N, n, n), dtype=F64)
    lxx = 0.1 * (M1 @ jnp.swapaxes(M1, -1, -2)) + jnp.eye(n, dtype=F64)
    M2 = jax.random.normal(ks[5], (N, m, m), dtype=F64)
    luu = 0.1 * (M2 @ jnp.swapaxes(M2, -1, -2)) + jnp.eye(m, dtype=F64)
    lux = 0.05 * jax.random.normal(ks[6], (N, m, n), dtype=F64)
    phix = jax.random.normal(ks[7], (n,), dtype=F64)
    M3 = jax.random.normal(ks[8], (n, n), dtype=F64)
    phixx = 0.1 * (M3 @ M3.T) + jnp.eye(n, dtype=F64)
    return A, B, lx, lu, lxx, luu, lux, phix, phixx


def test_backward_sweep_matches_cpp():
    N, n, m, reg = 9, 4, 2, 1e-6
    args = _problem(jax.random.PRNGKey(0), N, n, m)
    K_j, kff_j = _backward_pass(*args, reg)
    K_c, kff_c = native.riccati_backward(*[np.asarray(a) for a in args], reg)
    np.testing.assert_allclose(np.asarray(K_j), K_c, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(kff_j), kff_c, rtol=1e-10, atol=1e-12)


def test_sensitivity_matches_cpp_with_active_sets():
    N, n, m, reg = 7, 4, 2, 1e-9
    A, B, lx, lu, lxx, luu, lux, phix, phixx = _problem(jax.random.PRNGKey(1), N, n, m)
    gx = jax.random.normal(jax.random.PRNGKey(2), (N + 1, n), dtype=F64)
    gu = jax.random.normal(jax.random.PRNGKey(3), (N, m), dtype=F64)
    active = jax.random.bernoulli(jax.random.PRNGKey(4), 0.4, (N, m))

    # JAX path: a synthetic OCP that replays the raw matrices. The sensitivity math
    # only consumes Jacobians/Hessians, so the state just encodes its own index k.
    def f_jac(x, u, th):
        k = x[0].astype(jnp.int32)
        return A[k], B[k]

    def stage_derivs(x, u, k, th):
        return lx[k], lu[k], lxx[k], luu[k], lux[k]

    def terminal_derivs(xN, th):
        return phix, phixx  # phi_x unused by the sensitivity; phi_xx seeds V_xx

    X_idx = jnp.concatenate(
        [jnp.arange(N + 1, dtype=F64)[:, None], jnp.zeros((N + 1, n - 1), dtype=F64)], axis=1
    )
    # drive ocp.active_mask: put U exactly at the upper bound where active
    u_min = -jnp.ones((m,), dtype=F64)
    u_max = jnp.ones((m,), dtype=F64)
    U_act = jnp.where(active, 1.0, 0.0)  # at upper bound where active

    ocp = OCP(
        f=lambda x, u, th: x,
        stage_cost=lambda x, u, k, th: jnp.asarray(0.0, dtype=F64),
        terminal_cost=lambda x, th: jnp.asarray(0.0, dtype=F64),
        f_jac=f_jac,
        stage_derivs=stage_derivs,
        terminal_derivs=terminal_derivs,
        u_min=u_min,
        u_max=u_max,
    )
    sens = ddp_sensitivity(ocp, None, X_idx, U_act, gx, gu, reg=reg)

    dX_c, dU_c, dlam_c = native.ddp_sensitivity(
        *[np.asarray(a) for a in (A, B, lxx, luu, lux, phixx, gx, gu)],
        np.asarray(active), reg,
    )
    np.testing.assert_allclose(np.asarray(sens.delta_X), dX_c, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(sens.delta_U), dU_c, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(sens.delta_lambda), dlam_c, rtol=1e-9, atol=1e-11)
