#!/usr/bin/env python
"""Reference-side chaos-ensemble control for the goal-rate discrepancy.

The last open correctness question (VERDICT r4 item 2): on the 7 seeds where
the reference and our driver disagree on goal_reached even when fed the SAME
reconstructed disturbance stream (GOAL_RATE_REPLAY.json, seeds
{0,7,13,20,28,32,46}), is the outcome determined by solver semantics (a real
behavioral bug) or by the chaotic branch the trajectory lands in after the
first Lyapunov/excursion divergence (post-chaos drift)?

The decisive experiment runs on the REFERENCE ITSELF: K perturbed replicas of
the torch closed loop (``core/tube_mpc.py:803-1023``) per seed, each with ONE
disturbance component of ONE draw nudged by 1e-13 at the draw site
(``core/tube_mpc.py:991-996``, wrapped at runtime like tools/torch_self_test.py
— /root/reference is never modified). A 1e-13 nudge preserves the disturbance
distribution to machine precision, so every replica is an equally valid sample
of "the reference on this seed". If the replicas FLIP goal_reached relative to
the unperturbed run on most seeds, goal outcome on these draws is a property of
the chaotic branch, not the solver — the attribution is closed. If every
replica reproduces the unperturbed outcome (e.g. seed 13 never reaches the
goal no matter the branch, while ours does), the difference is systematic and
a real bug hunt is warranted.

Each replica costs one full reference run (~10 min on this 1-core host);
replicas are cached in tools/ref_runs/seedNNN_ens_sScC/ so the ensemble can be
grown incrementally across invocations.

    python tools/goal_rate_ensemble.py [--seeds 0,7,13,20,28,32,46]
        [--replicas 3] [--out GOAL_RATE_ENSEMBLE.json]
"""
from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.reference_harness import import_reference  # noqa: E402
from tools.distributional_agreement import run_stats, wilson_ci  # noqa: E402
from tools.ref_sweep import ARTIFACTS, is_cached, run_seed, seed_dir  # noqa: E402

PERT_EPS = 1e-13
# (draw step, component) per replica — distinct nudge sites so each replica
# explores an independent chaotic branch. Dubins w is 3-dimensional.
REPLICA_SITES = [(5, 0), (5, 1), (5, 2), (9, 0), (9, 1), (9, 2), (13, 0), (13, 1)]
GOAL_DISAGREEMENT_SEEDS = "0,7,13,20,28,32,46"  # GOAL_RATE_REPLAY.json per_seed


def replica_dir(seed: int, step: int, comp: int) -> str:
    return seed_dir(seed) + f"_ens_s{step}c{comp}"


def run_reference_perturbed(seed: int, steps: int, horizon: int,
                            pert_step: int, pert_comp: int, out_dir: str) -> None:
    """One reference closed loop with draw #pert_step's component pert_comp
    nudged by PERT_EPS (runtime wrapper around tube_mpc.sample_disturbance,
    the symbol the paper loop calls at core/tube_mpc.py:994)."""
    import torch
    import yaml

    import_reference()
    from diff_tube_mpc_strict_pt.core import tube_mpc as tm

    with open("/root/reference/configs/dubins.yaml", "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    cfg["device"] = "cpu"
    cfg["system"]["task_horizon_H"] = steps
    cfg["system"]["horizon_N"] = horizon

    orig = tm.sample_disturbance
    counter = {"n": 0}

    def perturbed(*args, **kwargs):
        w = orig(*args, **kwargs)
        if counter["n"] == pert_step:
            w = w.clone()
            w[pert_comp] = w[pert_comp] + PERT_EPS
        counter["n"] += 1
        return w

    os.makedirs(out_dir, exist_ok=True)
    torch.manual_seed(seed)
    np.random.seed(seed)
    tm.sample_disturbance = perturbed
    try:
        tm.run_closed_loop_experiment(
            copy.deepcopy(cfg), device=torch.device("cpu"), run_dir=out_dir)
    finally:
        tm.sample_disturbance = orig


def load_stats(d: str) -> dict:
    arts = {k: np.load(os.path.join(d, f"{k}.npy")) for k in
            ("x_real", "x_bar", "loss")}
    return run_stats(arts["x_real"], arts["x_bar"], arts["loss"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=str, default=GOAL_DISAGREEMENT_SEEDS)
    ap.add_argument("--replicas", type=int, default=3)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--out", type=str, default="GOAL_RATE_ENSEMBLE.json")
    args = ap.parse_args()

    import_reference()
    seeds = [int(s) for s in args.seeds.split(",")]
    sites = REPLICA_SITES[: args.replicas]

    # our verdict on the same streams, for the per-seed comparison column
    ours_by_seed = {}
    replay_path = os.path.join(os.path.dirname(seed_dir(0)), "..", "..",
                               "GOAL_RATE_REPLAY.json")
    replay_path = os.path.normpath(replay_path)
    if os.path.exists(replay_path):
        with open(replay_path, "r", encoding="utf-8") as f:
            for row in json.load(f)["per_seed"]:
                ours_by_seed[row["seed"]] = row["our_goal"]

    rows = []
    for seed in seeds:
        if not is_cached(seed):
            print(f"[ensemble] seed {seed}: running unperturbed reference", flush=True)
            run_seed(seed, steps=args.steps, horizon=args.horizon)
        base = load_stats(seed_dir(seed))

        reps = []
        for (ps, pc) in sites:
            d = replica_dir(seed, ps, pc)
            if not all(os.path.exists(os.path.join(d, f"{k}.npy")) for k in ARTIFACTS):
                print(f"[ensemble] seed {seed}: replica w[{ps},{pc}]+={PERT_EPS} ...",
                      flush=True)
                t0 = time.perf_counter()
                run_reference_perturbed(seed, args.steps, args.horizon, ps, pc, d)
                print(f"[ensemble] seed {seed}: replica ({ps},{pc}) done in "
                      f"{time.perf_counter() - t0:.0f}s", flush=True)
            st = load_stats(d)
            reps.append({"site": [ps, pc], "goal": st["goal_reached"],
                         "final_dist": round(st["final_dist"], 3),
                         "collided": st["collided"]})

        flipped = any(r["goal"] != base["goal_reached"] for r in reps)
        rows.append({
            "seed": seed,
            "torch_unperturbed_goal": base["goal_reached"],
            "torch_unperturbed_final_dist": round(base["final_dist"], 3),
            "ours_same_stream_goal": ours_by_seed.get(seed),
            "replicas": reps,
            "ensemble_flips_goal_outcome": flipped,
        })
        print(f"[ensemble] seed {seed}: base goal={base['goal_reached']} "
              f"replicas={[r['goal'] for r in reps]} flip={flipped}", flush=True)
        _write(args.out, rows, sites, seeds)  # checkpoint after every seed

    _write(args.out, rows, sites, seeds, final=True)


def _write(out: str, rows: list, sites: list, seeds: list, final: bool = False) -> None:
    all_goals = [r["goal"] for row in rows for r in row["replicas"]]
    n = len(all_goals)
    rate = float(np.mean(all_goals)) if n else None
    n_flip = sum(r["ensemble_flips_goal_outcome"] for r in rows)
    report = {
        "what": "the PyTorch REFERENCE closed loop re-run K times per "
                "goal-disagreement seed with one disturbance component nudged by "
                "1e-13 (draw site core/tube_mpc.py:991-996) — measures whether "
                "goal_reached on these draws is a property of the chaotic branch "
                "or of the solver",
        "perturbation_eps": PERT_EPS,
        "replica_sites": [list(s) for s in sites],
        "seeds": seeds,
        "complete": final and len(rows) == len(seeds),
        "torch_ensemble_goal_rate_on_disagreement_seeds": rate,
        "torch_ensemble_goal_rate_ci95_wilson": wilson_ci(rate, n) if n else None,
        "torch_unperturbed_goal_rate_on_these_seeds":
            float(np.mean([r["torch_unperturbed_goal"] for r in rows])) if rows else None,
        "ours_same_stream_goal_rate_on_these_seeds":
            float(np.mean([bool(r["ours_same_stream_goal"]) for r in rows])) if rows else None,
        "seeds_where_1e-13_flips_torch_goal_outcome": f"{n_flip}/{len(rows)}",
        "per_seed": rows,
    }
    if final and rows:
        if n_flip >= (len(rows) + 1) // 2:
            report["conclusion"] = (
                "attribution closed: a 1e-13 disturbance nudge flips the reference's "
                "own goal outcome on most disagreement seeds — goal_reached on these "
                "draws is a property of the chaotic branch, not of solver semantics; "
                "the 0.02-vs-0.12 rate gap is basin-sampling variance, not a bug")
        else:
            report["conclusion"] = (
                "systematic difference: the reference's goal outcome is stable under "
                "1e-13 nudges on most disagreement seeds — the cross-framework "
                "goal-rate gap is NOT explained by chaos alone; open a bug hunt on "
                "the terminal-approach behavior")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    if final:
        print(json.dumps({k: v for k, v in report.items() if k != "per_seed"},
                         indent=2))


if __name__ == "__main__":
    main()
