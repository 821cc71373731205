"""Latency: sequential lax.scan Riccati vs parallel-scan (associative) Riccati.

The parallel formulation targets the LOW-BATCH, LONG-HORIZON regime (single-scenario
MPC latency): the sequential sweep is O(N) depth and leaves the chip idle between tiny
4x4 steps, while the associative scan is O(log N) depth. Run on the real chip:

    python benchmarks/bench_pscan.py

Prints one JSON line per (N, B) point with both times and the speedup.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tube_mpc_tpu.solvers.ilqr import _backward_pass
from tube_mpc_tpu.solvers.pscan import parallel_backward_pass


def _data(key, N, B, n=4, m=2, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    shape = (B, N) if B else (N,)
    A = jnp.eye(n, dtype=dtype) + 0.05 * jax.random.normal(ks[0], shape + (n, n), dtype=dtype)
    Bm = 0.3 * jax.random.normal(ks[1], shape + (n, m), dtype=dtype)
    lx = jax.random.normal(ks[2], shape + (n,), dtype=dtype)
    lu = jax.random.normal(ks[3], shape + (m,), dtype=dtype)
    Wx = jax.random.normal(ks[4], shape + (n, n), dtype=dtype)
    lxx = 0.05 * Wx @ jnp.swapaxes(Wx, -1, -2) + jnp.eye(n, dtype=dtype)
    Wu = jax.random.normal(ks[5], shape + (m, m), dtype=dtype)
    luu = 0.05 * Wu @ jnp.swapaxes(Wu, -1, -2) + jnp.eye(m, dtype=dtype)
    lux = 0.05 * jax.random.normal(ks[6], shape + (m, n), dtype=dtype)
    tshape = (B,) if B else ()
    phi_x = jax.random.normal(ks[7], tshape + (n,), dtype=dtype)
    Wt = jax.random.normal(ks[7], tshape + (n, n), dtype=dtype)
    phi_xx = 0.5 * Wt @ jnp.swapaxes(Wt, -1, -2) + jnp.eye(n, dtype=dtype)
    return A, Bm, lx, lu, lxx, luu, lux, phi_x, phi_xx


def _time(fn, args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    reg = 1e-6
    for N in (64, 256, 1024):
        for B in (0, 64):  # 0 = unbatched single problem
            data = _data(jax.random.PRNGKey(0), N, B)
            if B:
                seq = jax.jit(jax.vmap(lambda *d: _backward_pass(*d, reg)))
                par = jax.jit(jax.vmap(lambda *d: parallel_backward_pass(*d, reg)))
            else:
                seq = jax.jit(lambda *d: _backward_pass(*d, reg))
                par = jax.jit(lambda *d: parallel_backward_pass(*d, reg))
            t_seq = _time(seq, data)
            t_par = _time(par, data)
            print(json.dumps({
                "metric": "riccati_backward_latency",
                "N": N, "B": B or 1,
                "seq_us": round(t_seq * 1e6, 1),
                "pscan_us": round(t_par * 1e6, 1),
                "speedup": round(t_seq / t_par, 2),
            }))


if __name__ == "__main__":
    main()
