#!/usr/bin/env python
"""Per-lane solver-iteration telemetry over the H=300 paper closed loop.

Answers the round-3 performance question: the reference-faithful (no-clip) paper
workload runs ~1.75x slower per solve than the clipped one (docs/PERFORMANCE.md);
is that STRAGGLER WASTE (a few unconverged lanes forcing the whole lockstep batch
through extra iterations — reclaimable) or REAL WORK (most lanes genuinely
unconverged — the reference would pay it too)?

Per closed-loop step, for both solves, it records each lane's unconverged-iteration
count (ops/pallas/lane_solver.py with_lane_iters). Batch cost per step is
max-over-lanes + 1 (the while_loop runs one extra trip to observe convergence,
capped at max_iter); useful work is the mean. The ratio sum(max)/sum(mean) bounds
the reclaimable speedup from any per-lane early-exit scheme.

    python benchmarks/iter_probe.py [--batch 4096] [--steps 300] [--clip 0.0]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--clip", type=float, default=0.0,
                    help="grad_clip_norm (0 = reference-faithful no clipping)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU with interpret-mode kernels (tiny sizes only)")
    args = ap.parse_args()

    import dataclasses

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tube_mpc_tpu.ops.lanes import dubins_components
    from tube_mpc_tpu.presets import PAPER_OBSTACLES, dubins_paper_setup
    from tube_mpc_tpu.tube.lane_closed_loop import (
        make_paper_lane_step,
        paper_lane_init_state,
    )
    from tube_mpc_tpu.tube.lane_interface import make_lane_problem
    from tube_mpc_tpu.tube.params import AdaptConfig

    s = dubins_paper_setup(N=50, H=args.steps, dtype=jnp.float32)
    cfg = s.cfg
    if args.clip:
        cfg = dataclasses.replace(
            cfg, adapt=AdaptConfig(lr=5e-2, momentum=0.9, grad_clip_norm=args.clip))
    sys_c = dubins_components(
        dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
        centers=PAPER_OBSTACLES, radii=[1.0] * len(PAPER_OBSTACLES),
        aggregation="smoothmin", beta=20.0,
    )
    B, H = args.batch, args.steps
    pb = make_lane_problem(sys_c, barrier_type="inverse", eps=1e-4)
    step = make_paper_lane_step(
        s.system, s.aug, pb, cfg, w_nominal=s.w_nominal, bp=s.bp,
        target=s.target, B=B, dtype=jnp.float32, iter_telemetry=True,
        interpret=args.cpu,
    )
    init = paper_lane_init_state(
        s.system, s.aug, cfg, aux_init=s.aux_init, bp=s.bp, x0=s.x0,
        B=B, dtype=jnp.float32,
    )
    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(0), (B, H), dtype=jnp.float32)

    @jax.jit
    def run(w):
        _, logs = jax.lax.scan(step, init, jnp.swapaxes(w, 0, 1))
        return logs[-2], logs[-1]  # it_nom, it_aux: [H, B] each

    it_nom, it_aux = jax.block_until_ready(run(w_seqs))
    it_nom = np.asarray(it_nom)
    it_aux = np.asarray(it_aux)

    def stats(it, max_iter):
        # batch cost per step = max over lanes: every executed trip has >=1 live
        # lane and each live lane counts it, so max(lane_it) == executed trips
        # (pinned by tests/test_lane_solver.py::TestIterTelemetry)
        cost = it.max(axis=1)
        return {
            "mean_lane_iters": round(float(it.mean()), 3),
            "p50_lane_iters": round(float(np.median(it)), 1),
            "p99_lane_iters": round(float(np.percentile(it, 99)), 1),
            "mean_batch_cost": round(float(cost.mean()), 3),
            "lockstep_overhead_x": round(float(cost.mean() / max(it.mean(), 1e-9)), 3),
            "steps_at_max_iter": int((cost >= max_iter).sum()),
        }

    def simulate_caps(it, max_iter, caps, block_b=4096):
        """Replay the measured per-lane trip counts through the staged-width cost
        model of lane_ilqr_solve(compact_caps=caps). Returns cost in units of
        full-batch (B_pad-wide) trips (uncompacted cost per step = max(lane_it):
        every executed trip has >=1 live lane). Mirrors the solver's width
        computation exactly — B_pad lane padding, stage widths B_pad >> si rounded
        up to a multiple of the stage's block width, the W >= B_pad full-width
        skip, and the per-stage fallback to FULL width (not the previous stage's
        width) when the unconverged lanes don't fit. Pad lanes start converged
        (done0 in lane_ilqr_solve) so they never appear in the live count."""
        Bn = it.shape[1]
        Bt = min(block_b, max(128, ((Bn + 127) // 128) * 128))
        B_pad = ((Bn + Bt - 1) // Bt) * Bt
        caps_eff = [c for c in caps if c < max_iter]
        total = 0.0
        for step_it in it:
            # lane l is live on trip t (0-indexed trips executed so far) iff
            # step_it[l] > t
            live = lambda t: int((step_it > t).sum())
            t = 0
            cost = 0.0
            # stage 0: full width until the first cap (or max_iter when uncapped)
            cap0 = caps_eff[0] if caps_eff else max_iter
            while t < cap0 and live(t) > 0:
                cost += 1.0
                t += 1
            rest = caps_eff[1:] + ([max_iter] if caps_eff else [])
            for si, cap in enumerate(rest):
                W = max(128, B_pad >> (si + 1))
                Wt = min(Bt, W)
                W = ((W + Wt - 1) // Wt) * Wt
                if W >= B_pad:
                    width = B_pad       # can't narrow below one tile: full width
                elif live(t) <= W:
                    width = W           # compacted stage
                else:
                    width = B_pad       # lax.cond fallback is the FULL-width loop
                while t < cap and live(t) > 0:
                    cost += width / B_pad
                    t += 1
            total += cost
        return round(float(total), 1)

    def schedule_scan(it, max_iter):
        """Candidate compact_caps schedules scored by the simulator."""
        base = simulate_caps(it, max_iter, [])
        qs = np.percentile(it, [50, 75, 90]).astype(int)
        cands = {
            f"({qs[0]},)": [int(qs[0])],
            f"({qs[1]},)": [int(qs[1])],
            f"({qs[0]},{qs[1]})": [int(qs[0]), int(qs[1])],
            f"({qs[0]},{qs[1]},{qs[2]})": [int(qs[0]), int(qs[1]), int(qs[2])],
        }
        out = {"uncompacted_trips": base}
        for name, caps in cands.items():
            c = simulate_caps(it, max_iter, [v for v in caps if v < max_iter])
            out[name] = {"trips": c, "speedup_x": round(base / max(c, 1e-9), 3)}
        return out

    print(json.dumps({
        "batch": B, "steps": H, "clip": args.clip,
        "max_iter": {"nominal": cfg.nominal_max_iter, "aux": cfg.aux_max_iter},
        "nominal": stats(it_nom, cfg.nominal_max_iter),
        "aux": stats(it_aux, cfg.aux_max_iter),
        "compact_schedule_sim": {
            "nominal": schedule_scan(it_nom, cfg.nominal_max_iter),
            "aux": schedule_scan(it_aux, cfg.aux_max_iter),
        },
    }, indent=2))


if __name__ == "__main__":
    main()
