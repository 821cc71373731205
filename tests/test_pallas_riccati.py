"""Pallas fused Riccati sweep vs the lax.scan reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tube_mpc_tpu.ops.pallas.riccati import riccati_sweep_pallas
from tube_mpc_tpu.solvers.ilqr import _backward_pass

F32 = jnp.float32


def _random_problem(key, B, N, n, m, dtype=F32):
    ks = jax.random.split(key, 9)
    A = jnp.eye(n, dtype=dtype) + 0.1 * jax.random.normal(ks[0], (B, N, n, n), dtype=dtype)
    Bm = 0.3 * jax.random.normal(ks[1], (B, N, n, m), dtype=dtype)
    lx = jax.random.normal(ks[2], (B, N, n), dtype=dtype)
    lu = jax.random.normal(ks[3], (B, N, m), dtype=dtype)
    M1 = jax.random.normal(ks[4], (B, N, n, n), dtype=dtype)
    lxx = 0.1 * (M1 @ jnp.swapaxes(M1, -1, -2)) + jnp.eye(n, dtype=dtype)
    M2 = jax.random.normal(ks[5], (B, N, m, m), dtype=dtype)
    luu = 0.1 * (M2 @ jnp.swapaxes(M2, -1, -2)) + jnp.eye(m, dtype=dtype)
    lux = 0.05 * jax.random.normal(ks[6], (B, N, m, n), dtype=dtype)
    phix = jax.random.normal(ks[7], (B, n), dtype=dtype)
    M3 = jax.random.normal(ks[8], (B, n, n), dtype=dtype)
    phixx = 0.1 * (M3 @ jnp.swapaxes(M3, -1, -2)) + jnp.eye(n, dtype=dtype)
    return A, Bm, lx, lu, lxx, luu, lux, phix, phixx


@pytest.mark.parametrize("n,m", [(4, 2), (4, 1), (6, 2)])
def test_kernel_matches_scan(n, m):
    B, N, reg = 4, 7, 1e-6
    args = _random_problem(jax.random.PRNGKey(0), B, N, n, m)
    K_p, kff_p = riccati_sweep_pallas(*args, reg=reg, block_b=128, interpret=True)

    K_s, kff_s = jax.vmap(
        lambda A, Bm, lx, lu, lxx, luu, lux, px, pxx: _backward_pass(
            A, Bm, lx, lu, lxx, luu, lux, px, pxx, reg
        )
    )(*args)
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_s), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(kff_p), np.asarray(kff_s), rtol=2e-4, atol=2e-5)


def test_kernel_padding_lanes_are_sliced_away():
    # B not a multiple of the lane tile: padded lanes must not leak into outputs.
    B, N, n, m, reg = 3, 5, 4, 2, 1e-6
    args = _random_problem(jax.random.PRNGKey(1), B, N, n, m)
    K_p, kff_p = riccati_sweep_pallas(*args, reg=reg, block_b=128, interpret=True)
    assert K_p.shape == (B, N, m, n)
    K_s, kff_s = jax.vmap(
        lambda A, Bm, lx, lu, lxx, luu, lux, px, pxx: _backward_pass(
            A, Bm, lx, lu, lxx, luu, lux, px, pxx, reg
        )
    )(*args)
    np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_s), rtol=2e-4, atol=2e-5)
