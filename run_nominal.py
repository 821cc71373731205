#!/usr/bin/env python
"""Nominal-only receding-horizon MPC CLI (validation harness).

Same role as the reference's ``run_nominal.py:418-455``: exercises the solver +
barrier stack without adaptation or disturbances, with success/collision checks.
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--mode", choices=("receding", "once"), default="receding",
                    help="receding horizon (reference run_nominal_receding) or a "
                         "single solve from x0 (reference run_nominal_once)")
    ap.add_argument("--feasible-filter", action="store_true",
                    help="once-mode: strict-feasibility line-search filter")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tube_mpc_tpu.utils.config import load_config
    from tube_mpc_tpu.utils.io import make_run_dir, save_json
    from tube_mpc_tpu.runners import run_nominal, run_nominal_single

    cfg = load_config(args.config)
    if cfg.use_float64:
        jax.config.update("jax_enable_x64", True)

    run_dir = make_run_dir(cfg.out_dir, cfg.run_name + "_nominal")
    if args.mode == "once":
        results = run_nominal_single(cfg, run_dir, feasible_filter=args.feasible_filter)
    else:
        results = run_nominal(cfg, run_dir)

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
