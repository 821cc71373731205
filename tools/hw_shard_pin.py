#!/usr/bin/env python
"""Pin the shard_map + Mosaic composition on REAL TPU hardware.

Every multi-device lane test runs interpret=True (Mosaic has no CPU backend),
so until now the sharded lane engine had never compiled on a physical chip
(VERDICT r4 weak-3). This tool closes that gap with what this 1-chip
environment CAN test: `run_paper_closed_loop_lanes_sharded` on a 1-device
`jax.sharding.Mesh` with interpret=False — real shard_map tracing, real Mosaic
kernel compilation inside the shard_map body, real psum lowering in population
mode — asserted equal to the unsharded engine on the same chip. The only
remaining untested composition is >1 physical device, which this environment
cannot provide.

    python tools/hw_shard_pin.py [--out HW_SHARD_PIN.json]

Writes one artifact with max|Δ| per field for both modes (independent θ and
psum'd population θ). Run by tools/bench_battery.py as a battery step.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="HW_SHARD_PIN.json")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--horizon", type=int, default=50)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        print(json.dumps({"error": "no real accelerator visible; this pin is "
                                    "only meaningful on the TPU"}))
        sys.exit(1)

    from tube_mpc_tpu.ops.lanes import dubins_components
    from tube_mpc_tpu.presets import PAPER_OBSTACLES, dubins_paper_setup
    from tube_mpc_tpu.tube.lane_closed_loop import (
        run_paper_closed_loop_lanes,
        run_paper_closed_loop_lanes_sharded,
    )

    s = dubins_paper_setup(N=args.horizon, H=args.steps, dtype=jnp.float32)
    sys_c = dubins_components(
        dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
        centers=PAPER_OBSTACLES, radii=[1.0] * len(PAPER_OBSTACLES),
        aggregation="smoothmin", beta=20.0,
    )
    w_seqs = s.system.sample_disturbance(
        jax.random.PRNGKey(0), (args.batch, args.steps), dtype=jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("scenario",))

    report = {
        "what": "run_paper_closed_loop_lanes_sharded on a 1-device mesh on the "
                "REAL chip (interpret=False: shard_map-traced Mosaic kernels, "
                "lowered psum in population mode) vs the unsharded engine",
        "device": str(dev), "batch": args.batch, "steps": args.steps,
        "horizon": args.horizon, "modes": {},
    }
    ok = True
    for population in (False, True):
        t0 = time.perf_counter()
        single = run_paper_closed_loop_lanes(
            s.system, s.aug, sys_c, s.cfg,
            w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
            x0=s.x0, target=s.target, w_seqs=w_seqs, eps=1e-4,
            population=population)
        sharded = run_paper_closed_loop_lanes_sharded(
            s.system, s.aug, sys_c, s.cfg,
            w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
            x0=s.x0, target=s.target, w_seqs=w_seqs, mesh=mesh, eps=1e-4,
            population=population, interpret=False)
        jax.block_until_ready((single, sharded))
        diffs = {}
        for f in ("u_real", "x_real", "loss", "Q_hist", "R_hist", "qb_hist"):
            a = np.asarray(getattr(single, f), dtype=np.float64)
            b = np.asarray(getattr(sharded, f), dtype=np.float64)
            diffs[f] = float(np.max(np.abs(a - b)))
        mode_ok = all(d == 0.0 for d in diffs.values())
        ok = ok and mode_ok
        report["modes"]["population" if population else "independent"] = {
            "max_abs_diff": diffs, "bit_exact": mode_ok,
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        print(f"[hw_shard_pin] population={population}: bit_exact={mode_ok} "
              f"diffs={diffs}", flush=True)

    report["verdict"] = (
        "shard_map+Mosaic composes on real hardware; 1-device sharded engine "
        + ("is BIT-EXACT vs unsharded in both modes"
           if ok else "DIFFERS from unsharded — investigate"))
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "modes"}, indent=2))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
