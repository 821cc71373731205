#!/usr/bin/env python
"""Goal-rate diagnostic: replay OUR driver on the REFERENCE's exact disturbances.

DISTRIBUTIONAL.json's one disjoint statistic is goal_rate (reference 0.02
[0.004, 0.105] vs ours-on-i.i.d.-draws 0.203 [0.14, 0.28], Wilson 95%). Two
hypotheses: (a) a disturbance-sampler difference (our uniform-W draws are a
different stream than torch's — a potential bug), or (b) post-chaos behavioral
drift (identical per-step semantics — pinned at machine precision by the
teacher-forced study — but the chaotic branches land in different
terminal-approach basins).

This tool separates them: for every cached reference seed the disturbance
sequence torch actually experienced is reconstructed exactly
(w_t = x_{t+1} − f(x_t, u_t), tools/agreement_sweep.reconstruct_w) and fed to
OUR f64 paper driver. Same w stream, same start, same task. If our goal rate
on torch's own streams stays ≈0.2, the sampler is exonerated and (b) stands;
if it collapses to ≈0.02, the sampler distribution is suspect.

    python tools/goal_rate_replay.py [--out GOAL_RATE_REPLAY.json]

Reference loop being compared: /root/reference/core/tube_mpc.py:803-1023.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.agreement_sweep import reconstruct_w  # noqa: E402
from tools.distributional_agreement import run_stats, wilson_ci  # noqa: E402
from tools.ref_sweep import ARTIFACTS, CACHE_ROOT, is_cached, seed_dir  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--out", type=str, default="GOAL_RATE_REPLAY.json")
    args = ap.parse_args()

    seeds = sorted(
        int(d[4:]) for d in os.listdir(CACHE_ROOT)
        if d.startswith("seed") and d[4:].isdigit() and is_cached(int(d[4:]))
    )
    print(f"[goal_rate_replay] {len(seeds)} cached reference seeds", flush=True)

    refs, w_all = [], []
    for s in seeds:
        d = seed_dir(s)
        arts = {k: np.load(os.path.join(d, f"{k}.npy")) for k in ARTIFACTS}
        refs.append(run_stats(arts["x_real"], arts["x_bar"], arts["loss"]))
        w_all.append(reconstruct_w(arts["x_real"], arts["u_real"])[: args.steps])
    w_all = np.stack(w_all)  # [S, H, 3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from tube_mpc_tpu.presets import dubins_paper_setup
    from tube_mpc_tpu.tube.closed_loop import run_paper_closed_loop

    s = dubins_paper_setup(N=args.horizon, H=args.steps, dtype=jnp.float64)
    t0 = time.perf_counter()
    log = jax.jit(jax.vmap(lambda w: run_paper_closed_loop(
        s.system, s.aug, s.cfg, w_nominal=s.w_nominal, aux_init=s.aux_init,
        bp=s.bp, x0=s.x0, target=s.target, w_seq=w)))(jnp.asarray(w_all))
    jax.block_until_ready(log)
    print(f"[goal_rate_replay] {len(seeds)} replays in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    ours = [run_stats(np.asarray(log.x_real[i]), np.asarray(log.x_bar[i]),
                      np.asarray(log.loss[i])) for i in range(len(seeds))]

    n = len(seeds)
    ref_rate = float(np.mean([r["goal_reached"] for r in refs]))
    our_rate = float(np.mean([o["goal_reached"] for o in ours]))
    report = {
        "what": "our f64 driver replayed on each cached reference seed's EXACT "
                "reconstructed disturbance sequence (same w stream, same task) "
                "— isolates the goal-rate gap from any sampler difference",
        "seeds": n,
        "goal_rate_reference": ref_rate,
        "goal_rate_ours_on_reference_w": our_rate,
        "goal_rate_ours_ci95_wilson": wilson_ci(our_rate, n),
        "goal_rate_reference_ci95_wilson": wilson_ci(ref_rate, n),
        "collision_rate_reference": float(np.mean([r["collided"] for r in refs])),
        "collision_rate_ours_on_reference_w": float(np.mean([o["collided"] for o in ours])),
        "per_seed": [
            {"seed": int(s_), "ref_goal": r["goal_reached"], "our_goal": o["goal_reached"],
             "ref_final_dist": round(r["final_dist"], 3),
             "our_final_dist": round(o["final_dist"], 3)}
            for s_, r, o in zip(seeds, refs, ours)
        ],
    }
    report["conclusion"] = (
        "sampler exonerated: the gap persists on torch's own disturbance streams "
        "— post-chaos behavioral drift, not a sampling-distribution difference"
        if abs(our_rate - 0.2) < abs(our_rate - ref_rate)
        else "gap collapses on identical streams — investigate the disturbance sampler"
    )
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "per_seed"}, indent=2))


if __name__ == "__main__":
    main()
