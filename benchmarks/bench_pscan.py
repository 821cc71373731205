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


def _flops(fn, args) -> float:
    """XLA-modeled FLOPs of the jitted fn (cost analysis on the lowered module)."""
    try:
        return float(jax.jit(fn).lower(*args).compile().cost_analysis()["flops"])
    except (KeyError, TypeError, IndexError):
        return float("nan")


def _scanned(core, data, repeats: int):
    """Amortize `repeats` dependent evaluations of the backward pass inside ONE
    jitted lax.scan (the only trustworthy timing pattern on this tunneled chip —
    docs/PERFORMANCE.md 'Measurement pitfalls'). A 1e-30-scaled scalar of the
    output is fed back into lx so iterations are data-dependent (serialized,
    not elidable) while the math is numerically unchanged."""
    A, Bm, lx, lu, lxx, luu, lux, phi_x, phi_xx = data

    def run(lx0):
        def body(c, _):
            K, kff = core(A, Bm, lx0 + c, lu, lxx, luu, lux, phi_x, phi_xx)
            return 1e-30 * (jnp.sum(K) + jnp.sum(kff)), None

        c, _ = jax.lax.scan(body, jnp.zeros((), lx0.dtype), None, length=repeats)
        return c

    return jax.jit(run), (lx,)


def headline() -> None:
    """The VERDICT-r4 experiment: seq vs associative-scan Riccati at the HEADLINE
    operating point (N=50, B up to 16384, f32, tube-MPC matrix sizes) plus the
    XLA-modeled FLOP ratio — the measured decision data for whether a lane-kernel
    pscan variant could pay (docs/PERFORMANCE.md round-5 section)."""
    reg = 1e-6
    N = 50
    R = 100
    for B in (64, 1024, 16384):
        data = _data(jax.random.PRNGKey(0), N, B)
        seq = jax.vmap(lambda *d: _backward_pass(*d, reg))
        par = jax.vmap(lambda *d: parallel_backward_pass(*d, reg))
        seq_s, args_s = _scanned(seq, data, R)
        par_s, args_p = _scanned(par, data, R)
        t_seq = _time(seq_s, args_s, iters=3) / R
        t_par = _time(par_s, args_p, iters=3) / R
        # XLA cost_analysis counts a lax.scan body ONCE (the HLO while body),
        # while associative_scan is unrolled into log-N slicing stages and fully
        # counted — so the sequential side must be multiplied by N (verified:
        # seq flops are N-independent, pscan flops scale ~N).
        f_seq = _flops(seq, data) * N
        f_par = _flops(par, data)
        row = {
            "metric": "riccati_backward_headline",
            "N": N, "B": B,
            "seq_us": round(t_seq * 1e6, 1),
            "pscan_us": round(t_par * 1e6, 1),
            "pscan_over_seq_time_x": round(t_par / t_seq, 2),
            "pscan_over_seq_flops_x": round(f_par / f_seq, 2),
            "flops_note": "seq = XLA-modeled scan-body flops x N; "
                          "pscan = XLA-modeled (unrolled) flops",
        }
        print(json.dumps(row))


def main() -> None:
    if "--headline" in sys.argv:
        headline()
        return
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
