#!/usr/bin/env python
"""Split/low-precision experiment (docs/PERFORMANCE.md remaining lever (a)):
run the paper lane pipeline at bfloat16 vs float32 in ONE process and report
throughput + numerical-health deltas.

The hypothesis to kill or confirm: bf16 lane rows double the effective vector
width, but the DBaS barrier rows (1/h, quadratic extension ~1e8) are not
range-safe-in-MANTISSA at 8 bits — closed-loop adaptation quality should
collapse even though bf16 shares f32's exponent range.

    python benchmarks/bench_bf16.py [--B 16384] [--H 300]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(dtype_name: str, B: int, H: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tube_mpc_tpu.ops.lanes import dubins_components
    from tube_mpc_tpu.presets import PAPER_OBSTACLES, dubins_paper_setup
    from tube_mpc_tpu.tube.lane_closed_loop import run_paper_closed_loop_lanes

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    s = dubins_paper_setup(N=50, H=H, dtype=dtype)
    sys_c = dubins_components(
        dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
        centers=PAPER_OBSTACLES, radii=[1.0] * len(PAPER_OBSTACLES),
        aggregation="smoothmin", beta=20.0,
    )

    def run(w_seqs):
        log = run_paper_closed_loop_lanes(
            s.system, s.aug, sys_c, s.cfg,
            w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
            x0=s.x0, target=s.target, w_seqs=w_seqs, eps=1e-4,
        )
        return log.u_real, log.loss

    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(0), (B, H), dtype=dtype)
    fn = jax.jit(run)
    out = fn(w_seqs)
    jax.block_until_ready(out)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(w_seqs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    elapsed = sorted(times)[1]

    final_losses = np.asarray(out[1][:, -1], dtype=np.float64)
    finite = np.isfinite(final_losses)
    return {
        "dtype": dtype_name,
        "solves_per_sec": round(2 * H * B / elapsed, 1),
        "finite_lane_frac": round(float(finite.mean()), 4),
        "median_final_loss_finite": (
            round(float(np.median(final_losses[finite])), 3) if finite.any() else None),
        "elapsed_s": round(elapsed, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=16384)
    ap.add_argument("--H", type=int, default=300)
    args = ap.parse_args()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    results = []
    for d in ("float32", "bfloat16"):
        try:
            r = run_one(d, args.B, args.H)
        except Exception as e:  # noqa: BLE001 - record the failure as data
            r = {"dtype": d, "error": f"{type(e).__name__}: {e}"[:500]}
        results.append(r)
        print(json.dumps(r), flush=True)
    if len(results) == 2 and "solves_per_sec" in results[0] and "solves_per_sec" in results[1]:
        print(json.dumps({
            "bf16_speedup": round(results[1]["solves_per_sec"] / results[0]["solves_per_sec"], 3)
        }))


if __name__ == "__main__":
    main()
