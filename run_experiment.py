#!/usr/bin/env python
"""Closed-loop adaptive Tube-MPC experiment CLI.

Same surface as the reference entry point (``run_experiment.py:35-79``):

    python run_experiment.py --config configs/dubins.yaml [--plot]

plus TPU-era flags: --platform to pin the JAX backend, --batch B to run B vmapped
scenarios at once (B=1 reproduces the single-trajectory reference behavior).
"""
from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--plot", action="store_true", help="write plots into the run dir")
    ap.add_argument("--platform", type=str, default=None, help="jax platform override (cpu/tpu)")
    ap.add_argument("--batch", type=int, default=None,
                    help="run B vmapped disturbance scenarios at once (default: 1)")
    ap.add_argument("--checkpoint-every", type=int, default=None, metavar="K",
                    help="paper mode: run in resumable K-step segments, persisting "
                         "the carry to <run_dir>/ckpt; relaunch with --run-dir to resume")
    ap.add_argument("--run-dir", type=str, default=None,
                    help="reuse an existing run dir (required to resume a checkpointed run)")
    ap.add_argument("--profile", type=str, default=None, metavar="TRACE_DIR",
                    help="capture a jax.profiler trace of the run into TRACE_DIR")
    ap.add_argument("--engine", choices=("xla", "lanes"), default="xla",
                    help="'lanes' = fused lane-major Pallas pipeline (paper path; "
                         "f32 throughput flagship, ~550000x the reference CPU)")
    ap.add_argument("--compact-caps", type=str, default=None, metavar="C1,C2[;N1]",
                    help="lanes engine: straggler-compaction iteration caps for the "
                         "aux (and after ';' the nominal) solves — halves the "
                         "working batch width at each cap, bitwise-identical "
                         "results. Defaults to the measured per-workload sweep "
                         "winner ('1,4,8' when the config clips gradients, "
                         "'2,5,8' reference-faithful no-clip — "
                         "docs/PERFORMANCE.md round 5); pass '' to disable")
    args = ap.parse_args()
    if args.batch is not None and args.batch < 1:
        ap.error("--batch must be >= 1")
    if args.checkpoint_every is not None and args.checkpoint_every < 1:
        ap.error("--checkpoint-every must be >= 1")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tube_mpc_tpu.utils.config import load_config
    from tube_mpc_tpu.utils.debug import debug_nans
    from tube_mpc_tpu.utils.io import make_run_dir, save_json
    from tube_mpc_tpu.runners import run_experiment

    cfg = load_config(args.config)
    if args.compact_caps is None and args.engine == "lanes":
        # measured per-workload defaults (BENCH_MODE_SWEEP.json runoffs):
        # clipped adaptation converges in fewer improvement-loop trips, so the
        # shorter straggler tail rewards earlier compaction
        args.compact_caps = "1,4,8" if cfg.adaptation.grad_clip_norm else "2,5,8"
    if cfg.use_float64:
        if args.engine == "lanes":
            # the lanes engine is f32-only (TPU Mosaic has no 64-bit support);
            # leave global x64 off and let the runner rebuild the config at f32.
            print("note: --engine lanes is float32-only; ignoring use_float64")
        else:
            jax.config.update("jax_enable_x64", True)
    if cfg.debug_numerics:
        debug_nans(True)

    run_dir = args.run_dir or make_run_dir(cfg.out_dir, cfg.run_name)

    if args.profile:
        from tube_mpc_tpu.utils.profiling import trace

        with trace(args.profile):
            results = run_experiment(cfg, run_dir, batch=args.batch,
                                     checkpoint_every=args.checkpoint_every,
                                     engine=args.engine,
                                     compact_caps=args.compact_caps)
    else:
        results = run_experiment(cfg, run_dir, batch=args.batch,
                                 checkpoint_every=args.checkpoint_every,
                                 engine=args.engine,
                                 compact_caps=args.compact_caps)

    with open(args.config, "r", encoding="utf-8") as f:
        import yaml

        save_json(run_dir, "config_used.json", yaml.safe_load(f))

    print(f"Saved run to: {run_dir}")
    print(json.dumps(results["summary"], indent=2, ensure_ascii=False))

    if cfg.plot or args.plot:
        from tube_mpc_tpu.plotting import plot_run

        plot_run(run_dir, obstacles=[dict(o) for o in cfg.environment.obstacles], show=False)
        print("Plots saved.")


if __name__ == "__main__":
    main()
