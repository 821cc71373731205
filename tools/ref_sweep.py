#!/usr/bin/env python
"""Populate the persistent reference-run cache, one seed at a time.

Runs the PyTorch reference closed loop (`/root/reference/core/tube_mpc.py:803-1023`,
the BASELINE.json oracle) at full size (N=50, H=300, configs/dubins.yaml semantics)
for each requested seed and saves the run artifacts to ``tools/ref_runs/seedNNN/``.
Each seed costs ~10 minutes of CPU on this host, so the cache is the unit of reuse:
``tools/agreement.py --seed N`` and ``tools/distributional_agreement.py`` read it
instead of re-running torch.

    python tools/ref_sweep.py --seeds 0-49          # fill the cache (skips done seeds)
    python tools/ref_sweep.py --seeds 3,7,11
"""
from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.measure_reference import import_reference  # noqa: E402

CACHE_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_runs")
ARTIFACTS = ["x_real", "u_real", "x_bar", "u_bar", "b_real", "loss",
             "Qa_history", "Ra_history", "qba_history"]

# "farobs": the no-excursion CONTROL variant — identical pipeline (5 circles,
# smooth-min, DBaS, adaptation) but obstacles displaced +100 so no plan can ever
# penetrate one; isolates barrier-excursion chaos as the only divergence source
# in the free-running agreement study (tools/agreement_sweep.py --variant farobs).
VARIANTS = {"": None, "farobs": 100.0}


def seed_dir(seed: int, variant: str = "") -> str:
    prefix = f"{variant}_" if variant else ""
    return os.path.join(CACHE_ROOT, f"{prefix}seed{seed:03d}")


def is_cached(seed: int, variant: str = "") -> bool:
    d = seed_dir(seed, variant)
    return all(os.path.exists(os.path.join(d, f"{k}.npy")) for k in ARTIFACTS)


def parse_seeds(spec: str) -> list[int]:
    out: list[int] = []
    for part in spec.split(","):
        if "-" in part:
            a, b = part.split("-")
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(part))
    return out


def run_seed(seed: int, steps: int = 300, horizon: int = 50, variant: str = "") -> dict:
    import numpy as np
    import torch
    import yaml

    from diff_tube_mpc_strict_pt.core.tube_mpc import run_closed_loop_experiment

    with open("/root/reference/configs/dubins.yaml", "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    cfg["device"] = "cpu"
    cfg["system"]["task_horizon_H"] = steps
    cfg["system"]["horizon_N"] = horizon
    offset = VARIANTS[variant]
    if offset:
        for o in cfg["environment"]["obstacles"]:
            o["center"] = [c + offset for c in o["center"]]

    d = seed_dir(seed, variant)
    os.makedirs(d, exist_ok=True)
    torch.manual_seed(seed)
    np.random.seed(seed)
    t0 = time.perf_counter()
    run_closed_loop_experiment(copy.deepcopy(cfg), device=torch.device("cpu"), run_dir=d)
    wall = time.perf_counter() - t0
    meta = {"seed": seed, "steps": steps, "horizon": horizon,
            "wall_s": round(wall, 1), "torch_threads": torch.get_num_threads()}
    with open(os.path.join(d, "meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f, indent=2)
    return meta


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=str, default="0-49")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--variant", type=str, default="", choices=sorted(VARIANTS))
    args = ap.parse_args()

    import_reference()
    seeds = parse_seeds(args.seeds)
    todo = [s for s in seeds if not is_cached(s, args.variant)]
    print(f"[ref_sweep] {len(seeds)} requested, {len(seeds) - len(todo)} cached, "
          f"{len(todo)} to run", flush=True)
    for i, seed in enumerate(todo):
        meta = run_seed(seed, steps=args.steps, horizon=args.horizon,
                        variant=args.variant)
        print(f"[ref_sweep] {i + 1}/{len(todo)} seed {seed} done in "
              f"{meta['wall_s']:.0f}s", flush=True)


if __name__ == "__main__":
    main()
