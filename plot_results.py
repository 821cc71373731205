#!/usr/bin/env python
"""Plot a finished run directory (reference ``plot_results.py:189-200`` CLI)."""
from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", type=str)
    args = ap.parse_args()

    obstacles = None
    cfg_path = os.path.join(args.run_dir, "config_used.json")
    if os.path.exists(cfg_path):
        with open(cfg_path, "r", encoding="utf-8") as f:
            cfg = json.load(f)
        env = cfg.get("environment") or {}
        obstacles = env.get("obstacles")
        if not obstacles and "obstacle" in env:  # reference's singular key
            obstacles = [env["obstacle"]]

    from tube_mpc_tpu.plotting import plot_run

    written = plot_run(args.run_dir, obstacles=obstacles, show=False)
    for p in written:
        print(p)


if __name__ == "__main__":
    main()
