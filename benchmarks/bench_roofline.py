#!/usr/bin/env python
"""MFU/roofline analysis for the lane closed-loop pipeline (VERDICT r1 item 5).

The tube-MPC lane kernels are VPU-bound by design (4x4 algebra as elementwise row
ops; no MXU-shaped matmuls — ops/pallas/lane_solver.py docstring). This harness
measures:

1. the chip's ACHIEVABLE elementwise-FMA throughput ("VPU roofline") with a fused
   multiply-add chain over a VMEM-resident block, amortized inside one jitted scan
   (the tunnel adds ~10-30 ms per dispatch; see BASELINE.md pitfalls);
2. the lane closed-loop step's achieved FLOP/s: XLA's compiled cost-analysis FLOP
   count for the jitted program divided by measured wall time.

MFU := achieved FLOP/s ÷ measured FMA roofline. Prints one JSON dict.

    python benchmarks/bench_roofline.py [--batch 16384] [--steps 8]
"""
from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tube_mpc_tpu.ops.lanes import dubins_components
    from tube_mpc_tpu.presets import PAPER_OBSTACLES, dubins_paper_setup
    from tube_mpc_tpu.tube.lane_closed_loop import run_paper_closed_loop_lanes

    dev = jax.devices()[0]
    report = {"device": str(dev), "platform": dev.platform}

    # ---- 1. empirical elementwise-FMA roofline ----
    # One [8, 64*1024] f32 block (2 MB, VMEM-resident after the first touch),
    # K chained FMAs inside a scan: flops = 2 * size * K.
    size_r, size_c, K = 8, 64 * 1024, 4096
    a = jnp.full((size_r, size_c), 1.0000001, jnp.float32)
    b = jnp.full((size_r, size_c), 1e-7, jnp.float32)

    @jax.jit
    def fma_chain(y):
        def body(y, _):
            return y * a + b, None
        y, _ = jax.lax.scan(body, y, None, length=K)
        return y

    y0 = jnp.ones((size_r, size_c), jnp.float32)
    fma_chain(y0).block_until_ready()
    t0 = time.perf_counter()
    reps = 8
    y = y0
    for _ in range(reps):
        y = fma_chain(y)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    fma_flops = 2.0 * size_r * size_c * K
    roofline = fma_flops / dt
    report["fma_roofline_gflops"] = round(roofline / 1e9, 1)
    report["fma_roofline_note"] = (
        f"{size_r}x{size_c} f32 block, {K}-deep FMA chain in one scan, "
        f"best of {reps} amortized reps"
    )

    # ---- 2. lane closed-loop achieved FLOP/s ----
    B, H = args.batch, args.steps
    s = dubins_paper_setup(N=50, H=H, dtype=jnp.float32)
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

    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(0), (B, H), jnp.float32)
    lowered = jax.jit(run).lower(w_seqs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    total_flops = float(ca.get("flops", float("nan"))) if ca else float("nan")

    out = compiled(w_seqs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = compiled(w_seqs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    solves = 2 * H * B
    report["closed_loop"] = {
        "batch": B, "steps": H, "N": 50,
        "wall_s": round(dt, 4),
        "solves_per_sec": round(solves / dt, 1),
        "xla_cost_analysis_flops": total_flops,
        "achieved_gflops": round(total_flops / dt / 1e9, 1) if total_flops == total_flops else None,
        "flops_per_solve": round(total_flops / solves, 1) if total_flops == total_flops else None,
    }
    if total_flops == total_flops and roofline > 0:
        report["mfu_vs_fma_roofline"] = round(total_flops / dt / roofline, 4)

    txt = json.dumps(report, indent=2)
    print(txt)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(txt)


if __name__ == "__main__":
    main()
