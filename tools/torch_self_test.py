#!/usr/bin/env python
"""Torch-side Lyapunov self-test: does the REFERENCE closed loop diverge from
ITSELF under a 1e-13 disturbance perturbation?

Closes the symmetry gap in the chaos attribution (VERDICT r3 item 3a): the
excursion mechanism was already proven on the reference's own solver
(tools/replay_step.py flips torch's gains under 1e-13 state perturbations,
vs ``core/ddp.py:213-254``), but the Lyapunov-instability mechanism had only
been demonstrated on OUR driver (tools/agreement_sweep.py:192-220 perturbs our
w). Here the SAME experiment runs on the reference itself: the closed loop
(``core/tube_mpc.py:803-1023``) is run twice with identical seeding, once with
one component of one disturbance draw perturbed by 1e-13
(``core/tube_mpc.py:991-996`` is the draw site), by wrapping
``sample_disturbance`` at runtime — /root/reference is never modified. If the
reference's own control sequence then diverges from itself at a comparable
step, NO reimplementation that differs in the last ulp of any libm call can
track it on that draw — the attribution is airtight in both directions.

The unperturbed side reuses the persistent reference cache
(tools/ref_runs/<variant>seedNNN/u_real.npy) when present, so each seed costs
ONE reference run (~10 min on this host), not two.

    python tools/torch_self_test.py --seeds 1 --variant farobs \
        [--out TORCH_SELF_TEST.json]
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
from tools.ref_sweep import VARIANTS, is_cached, run_seed, seed_dir  # noqa: E402

DIV_TOL = 1e-3   # per-step max |Δu| marking divergence (tools/agreement.py)
PERT_STEP = 5    # perturb the disturbance drawn at closed-loop step 5 ...
PERT_COMP = 0    # ... component 0, by 1e-13 — identical to the perturbation
PERT_EPS = 1e-13  # agreement_sweep applies to OUR driver (w[5,0] += 1e-13)


def run_reference_perturbed(seed: int, steps: int, horizon: int, variant: str,
                            out_dir: str) -> None:
    """One reference closed loop with draw #PERT_STEP's component PERT_COMP
    perturbed by PERT_EPS, via a runtime wrapper around sample_disturbance on
    the tube_mpc module (the symbol its paper loop calls at tube_mpc.py:994)."""
    import torch
    import yaml

    import_reference()
    from diff_tube_mpc_strict_pt.core import tube_mpc as tm

    with open("/root/reference/configs/dubins.yaml", "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    cfg["device"] = "cpu"
    cfg["system"]["task_horizon_H"] = steps
    cfg["system"]["horizon_N"] = horizon
    offset = VARIANTS[variant]
    if offset:
        for o in cfg["environment"]["obstacles"]:
            o["center"] = [c + offset for c in o["center"]]

    orig = tm.sample_disturbance
    counter = {"n": 0}

    def perturbed(*args, **kwargs):
        w = orig(*args, **kwargs)
        if counter["n"] == PERT_STEP:
            w = w.clone()
            w[PERT_COMP] = w[PERT_COMP] + PERT_EPS
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


STEP_MATCH_CRITERION = (
    "step_match compares torch's first SELF-divergent step against the "
    "cross-framework first divergent step for the same seed "
    "(AGREEMENT_CONTROL.json): 'exact' = identical step; 'within_10' = within "
    "10 closed-loop steps; 'same_draw_unstable' = larger offset — still "
    "conclusive, because the self-test's 1e-13 nudge enters at a FIXED site "
    "(w[5,0]) while cross-framework divergence is seeded by last-ulp libm "
    "noise at every step, so divergence ONSET may differ even though both "
    "prove the closed loop is Lyapunov-unstable on that draw"
)


def annotate_cross_framework(report: dict, control_path: str) -> dict:
    """Fold the cross-framework divergence step (AGREEMENT_CONTROL.json) into
    each per-seed row so the artifact is self-explanatory (VERDICT r4 weak-5:
    which seeds are exactly step-matched vs window-matched lived only in a
    docs/numbers.json footnote)."""
    with open(control_path, "r", encoding="utf-8") as f:
        control = {r["seed"]: r for r in json.load(f)["per_seed"]}
    for row in report["per_seed"]:
        c = control.get(row["seed"])
        cross = c.get("first_divergent_step") if c else None
        row["cross_framework_first_divergent_step"] = cross
        ours = row["first_self_divergent_step"]
        if cross is None or ours is None:
            row["step_match"] = None
            continue
        d = abs(ours - cross)
        row["step_match_delta"] = d
        row["step_match"] = ("exact" if d == 0
                             else "within_10" if d <= 10
                             else "same_draw_unstable")
    report["step_match_criterion"] = STEP_MATCH_CRITERION
    matched = [r.get("step_match") for r in report["per_seed"]]
    report["step_match_summary"] = {
        "exact": matched.count("exact"),
        "within_10": matched.count("within_10"),
        "same_draw_unstable": matched.count("same_draw_unstable"),
    }
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=str, default="1")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--variant", type=str, default="farobs", choices=sorted(VARIANTS))
    ap.add_argument("--out", type=str, default="TORCH_SELF_TEST.json")
    ap.add_argument("--annotate-only", action="store_true",
                    help="re-annotate an existing --out artifact with the "
                         "cross-framework step match and exit (no torch runs)")
    args = ap.parse_args()

    control_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "AGREEMENT_CONTROL.json")
    if args.annotate_only:
        with open(args.out, "r", encoding="utf-8") as f:
            report = json.load(f)
        report = annotate_cross_framework(report, control_path)
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report["step_match_summary"], indent=2))
        return

    import_reference()
    seeds = [int(s) for s in args.seeds.split(",")]
    rows = []
    for seed in seeds:
        # unperturbed side: the persistent cache (run if missing)
        if not is_cached(seed, args.variant):
            print(f"[torch_self_test] seed {seed}: running unperturbed reference",
                  flush=True)
            run_seed(seed, steps=args.steps, horizon=args.horizon,
                     variant=args.variant)
        u_a = np.load(os.path.join(seed_dir(seed, args.variant), "u_real.npy"))

        pert_dir = seed_dir(seed, args.variant) + "_selfpert"
        if not os.path.exists(os.path.join(pert_dir, "u_real.npy")):
            print(f"[torch_self_test] seed {seed}: running PERTURBED reference "
                  f"(w[{PERT_STEP},{PERT_COMP}] += {PERT_EPS})", flush=True)
            t0 = time.perf_counter()
            run_reference_perturbed(seed, args.steps, args.horizon, args.variant,
                                    pert_dir)
            print(f"[torch_self_test] seed {seed}: perturbed run "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
        u_b = np.load(os.path.join(pert_dir, "u_real.npy"))

        n = min(len(u_a), len(u_b))
        d = np.max(np.abs(u_a[:n] - u_b[:n]), axis=-1)
        div = np.nonzero(d > DIV_TOL)[0]
        first_div = int(div[0]) if len(div) else None
        agree = float(1.0 - np.linalg.norm(u_a[:n] - u_b[:n]) / np.linalg.norm(u_a[:n]))
        rows.append({
            "seed": seed,
            "variant": args.variant,
            "perturbation": f"w[{PERT_STEP},{PERT_COMP}] += {PERT_EPS}",
            "self_agreement": round(agree, 6),
            "first_self_divergent_step": first_div,
            "lyapunov_unstable": bool(agree < 0.99 and first_div is not None),
        })
        print(f"[torch_self_test] seed {seed}: self-agreement {agree:.6f}, "
              f"first divergence @ {first_div}", flush=True)

    report = {
        "what": "the PyTorch REFERENCE closed loop (core/tube_mpc.py:803-1023) run "
                "against itself with one disturbance component perturbed by 1e-13 "
                "(draw site core/tube_mpc.py:991-996, wrapped at runtime) — the "
                "torch-side mirror of agreement_sweep's Lyapunov self-test",
        "div_tol": DIV_TOL,
        "per_seed": rows,
    }
    if os.path.exists(control_path):
        report = annotate_cross_framework(report, control_path)
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
