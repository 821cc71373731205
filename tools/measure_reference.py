#!/usr/bin/env python
"""Measure the PyTorch reference on this machine's CPU (the BASELINE.md anchor).

Times `run_closed_loop_experiment` on configs/dubins.yaml (optionally truncated) and
reports solves/sec (2 iLQR solves per closed-loop step, tube_mpc.py:803-996).

    python tools/measure_reference.py [--steps 20]
"""
from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import tempfile
import time


def import_reference():
    pkg_dir = "/tmp/_refpkg"
    link = os.path.join(pkg_dir, "diff_tube_mpc_strict_pt")
    os.makedirs(pkg_dir, exist_ok=True)
    if not os.path.islink(link):
        os.symlink("/root/reference", link)
    if pkg_dir not in sys.path:
        sys.path.insert(0, pkg_dir)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--config", type=str, default="/root/reference/configs/dubins.yaml")
    args = ap.parse_args()

    import_reference()
    import numpy as np
    import torch
    import yaml

    from diff_tube_mpc_strict_pt.core.tube_mpc import run_closed_loop_experiment

    torch.manual_seed(0)
    np.random.seed(0)
    with open(args.config, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    cfg["device"] = "cpu"
    cfg["system"]["task_horizon_H"] = args.steps

    with tempfile.TemporaryDirectory() as d:
        t0 = time.perf_counter()
        run_closed_loop_experiment(copy.deepcopy(cfg), device=torch.device("cpu"), run_dir=d)
        wall = time.perf_counter() - t0

    print(json.dumps({
        "reference_steps": args.steps,
        "wall_s": round(wall, 2),
        "per_step_ms": round(wall / args.steps * 1e3, 1),
        "solves_per_sec": round(2 * args.steps / wall, 4),
        "torch_threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
