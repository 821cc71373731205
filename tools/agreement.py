#!/usr/bin/env python
"""Closed-loop agreement harness vs the PyTorch reference (BASELINE.json oracle).

1. Runs the reference paper-path closed loop (configs/dubins.yaml semantics) on CPU
   float64 and records its trajectories.
2. Reconstructs the disturbance sequence w_t = x_{t+1} - f(x_t, u_t) (PRNG parity
   across frameworks is impossible; injection is the oracle protocol, SURVEY.md §7d).
3. Replays the identical disturbances through our jitted scan driver (float64).
4. Reports agreement = 1 - ||u_ours - u_ref||_F / ||u_ref||_F, plus max errors.

    python tools/agreement.py [--steps 300] [--horizon 50] [--out AGREEMENT.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.measure_reference import import_reference  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--out", type=str, default="AGREEMENT.json")
    ap.add_argument("--ref-dir", type=str, default=None,
                    help="reuse a saved reference run dir (skips the ~9 min torch run)")
    args = ap.parse_args()

    # ---- reference run ----
    import_reference()
    import numpy as np
    import torch
    import yaml

    from diff_tube_mpc_strict_pt.core.tube_mpc import run_closed_loop_experiment

    torch.manual_seed(0)
    np.random.seed(0)
    with open("/root/reference/configs/dubins.yaml", "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    cfg["device"] = "cpu"
    cfg["system"]["task_horizon_H"] = args.steps
    cfg["system"]["horizon_N"] = args.horizon

    keys = ["x_real", "u_real", "b_real", "loss", "Qa_history", "Ra_history", "qba_history"]
    if args.ref_dir and os.path.exists(os.path.join(args.ref_dir, "u_real.npy")):
        ref = {k: np.load(os.path.join(args.ref_dir, f"{k}.npy")) for k in keys}
        ref_wall = float("nan")
    else:
        with tempfile.TemporaryDirectory() as d:
            out_dir = args.ref_dir or d
            os.makedirs(out_dir, exist_ok=True)
            t0 = time.perf_counter()
            run_closed_loop_experiment(cfg, device=torch.device("cpu"), run_dir=out_dir)
            ref_wall = time.perf_counter() - t0
            ref = {k: np.load(os.path.join(out_dir, f"{k}.npy")) for k in keys}

    # reconstruct disturbances
    dt = float(cfg["system"]["dt"])
    x, u = ref["x_real"], ref["u_real"]
    fx = np.stack(
        [
            x[:-1, 0] + dt * u[:-1, 0] * np.cos(x[:-1, 2]),
            x[:-1, 1] + dt * u[:-1, 0] * np.sin(x[:-1, 2]),
            x[:-1, 2] + dt * u[:-1, 1],
        ],
        axis=-1,
    )
    w = np.concatenate([x[1:] - fx, np.zeros((1, 3))], axis=0)

    # ---- our run ----
    import jax

    jax.config.update("jax_platforms", "cpu")  # f64 agreement runs on CPU
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from tube_mpc_tpu.presets import dubins_paper_setup
    from tube_mpc_tpu.tube.closed_loop import run_paper_closed_loop

    s = dubins_paper_setup(N=args.horizon, H=args.steps, dtype=jnp.float64)
    t0 = time.perf_counter()
    log = jax.jit(
        lambda ws: run_paper_closed_loop(
            s.system, s.aug, s.cfg,
            w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
            x0=s.x0, target=s.target, w_seq=ws,
        )
    )(jnp.asarray(w))
    jax.block_until_ready(log)
    our_wall = time.perf_counter() - t0

    u_ours = np.asarray(log.u_real)
    agreement = 1.0 - np.linalg.norm(u_ours - ref["u_real"]) / np.linalg.norm(ref["u_real"])

    # Divergence diagnostics: closed loops through decision boundaries (line-search
    # candidate ties, clamp boundaries, post-goal chatter) can bifurcate from
    # O(1e-12) numerical differences; locate the first step where that happens.
    per_step = np.max(np.abs(u_ours - ref["u_real"]), axis=-1)
    div = np.nonzero(per_step > 1e-3)[0]
    first_div = int(div[0]) if len(div) else args.steps
    pre = slice(0, first_div)
    pre_norm = np.linalg.norm(ref["u_real"][pre])
    pre_agreement = (
        1.0 - np.linalg.norm(u_ours[pre] - ref["u_real"][pre]) / pre_norm
        if pre_norm > 0 else 1.0
    )
    goal = np.asarray([10.0, 10.0])
    dist = np.linalg.norm(ref["x_real"][:, :2] - goal, axis=-1)
    reached = np.nonzero(dist <= 0.25)[0]
    goal_step = int(reached[0]) if len(reached) else args.steps

    report = {
        "steps": args.steps,
        "horizon": args.horizon,
        "control_seq_agreement": float(agreement),
        "first_divergent_step": first_div,
        "agreement_before_divergence": float(pre_agreement),
        "reference_goal_reached_step": goal_step,
        "u_max_err": float(np.max(np.abs(u_ours - ref["u_real"]))),
        "x_max_err": float(np.max(np.abs(np.asarray(log.x_real) - ref["x_real"]))),
        "loss_max_err": float(np.max(np.abs(np.asarray(log.loss) - ref["loss"]))),
        "Qa_max_err": float(np.max(np.abs(np.asarray(log.Q_hist) - ref["Qa_history"]))),
        "reference_wall_s": round(ref_wall, 2) if ref_wall == ref_wall else None,
        "ours_wall_s_cpu_f64_incl_compile": round(our_wall, 2),
        "target": ">= 0.99 (BASELINE.json)",
    }
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
