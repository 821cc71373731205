#!/usr/bin/env python
"""Scaling-efficiency benchmark: population Algorithm-2 over 1..n devices.

Measures solves/sec of the mesh-sharded population adaptation (shared θ, pmean-reduced
gradients) at fixed PER-DEVICE batch (weak scaling), and reports efficiency
eff(n) = throughput(n) / (n * throughput(1)) — the BASELINE.md >= 80% target shape.

On this box, multi-chip TPU hardware is unavailable; run on the virtual CPU mesh for
the collective-overhead shape (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_
device_count=8), or on a real multi-chip slice unchanged.

    python benchmarks/bench_scaling.py [--per-device 32] [--devices 1 2 4 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=32)
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    import jax

    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from tube_mpc_tpu.parallel.mesh import make_mesh
    from tube_mpc_tpu.parallel.scenarios import run_population_adaptation
    from tube_mpc_tpu.presets import dubins_paper_setup

    n_avail = len(jax.devices())
    device_counts = args.devices or sorted({1, max(1, n_avail // 2), n_avail})
    s = dubins_paper_setup(N=args.horizon, H=args.steps, dtype=jnp.float32)

    results = []
    base_tp = None
    for n in device_counts:
        if n > n_avail:
            continue
        B = args.per_device * n
        mesh = make_mesh(n)
        key = jax.random.PRNGKey(0)
        w_seqs = s.system.sample_disturbance(key, (B, s.cfg.H), dtype=jnp.float32)
        x0_b = jnp.tile(s.x0, (B, 1))

        def run():
            return run_population_adaptation(
                s.system, s.aug, s.cfg,
                w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
                x0_batch=x0_b, target=s.target, w_seqs=w_seqs, mesh=mesh,
            )

        out = run()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0

        solves = 2 * s.cfg.H * B
        tp = solves / dt
        if base_tp is None:
            base_tp = tp / n  # per-device baseline from the first (smallest) config
        eff = tp / (n * base_tp)
        results.append({
            "devices": n, "batch": B, "wall_ms": round(dt * 1e3, 1),
            "solves_per_sec": round(tp, 1), "scaling_efficiency": round(eff, 3),
        })
        print(json.dumps(results[-1]))

    with open("benchmarks/scaling_results.json", "w", encoding="utf-8") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
