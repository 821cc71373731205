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
    ap.add_argument("--iters", type=int, default=3,
                    help="iLQR iteration cap for the shrunken problem (default 3, "
                         "the reference's; raise it to tighten FD-vs-analytic "
                         "agreement — the analytic column assumes converged solves)")
    ap.add_argument("--tol", type=float, default=None,
                    help="override the solver convergence tol (the paper path's "
                         "loose 1e-3 stops far from a KKT point; use ~1e-12 with "
                         "--iters 50 for a tight FD-vs-analytic comparison)")
    ap.add_argument("--json-out", type=str, default=None,
                    help="also write the result dict to this path (for tests)")
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
    sysc["nominal_max_iter"] = int(args.iters)
    sysc["aux_max_iter"] = int(args.iters)
    if args.tol is not None:
        sysc["ilqr_tol"] = float(args.tol)

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

    # Analytic column: the same dL/dQ_nominal[0], by jax.grad through the FULLY
    # differentiable closed loop (tube/closed_loop.run_paper_closed_loop_diff —
    # implicit-function VJPs on both solves, explicit sensitivity for Algorithm-2).
    # The reference prints only the FD column and asks for eyeball comparison
    # (gradient_check.py:66-75); this one is machine-checkable.
    analytic = None
    paper_mode = cfg.paper_dubins_mode and not cfg.adaptation.adapt_nominal
    if paper_mode:
        from tube_mpc_tpu.tube.closed_loop import make_paper_closed_loop_diff

        # The FD run perturbs raw["cost_nominal"]["Q"][0]; if the config omits Qf it
        # is tied to Q by parse_config, so the perturbation reaches Qf too.
        qf_tied = raw["cost_nominal"].get("Qf") is None
        loop = make_paper_closed_loop_diff(
            built.system, built.aug, built.tube_cfg, bp=built.bp, target=built.target
        )

        def final_loss(q0):
            w_nom = built.w_nominal._replace(
                Q=built.w_nominal.Q.at[0].set(q0),
                Qf=built.w_nominal.Qf.at[0].set(q0) if qf_tied else built.w_nominal.Qf,
            )
            return loop(w_nom, built.aux_init, built.x0, w_seq).loss[-1]

        q0 = jnp.asarray(float(raw["cost_nominal"]["Q"][0]), dtype=cfg.dtype)
        analytic = float(jax.jit(jax.grad(final_loss))(q0))

    result = {
        "baseline_loss": base,
        "loss_plus": loss_p,
        "loss_minus": loss_m,
        "fd_dL_dQ0": fd,
        "analytic_dL_dQ0": analytic,
        "rel_err": (abs(fd - analytic) / max(abs(fd), abs(analytic), 1e-30)
                    if analytic is not None else None),
    }
    print("Finite-difference vs analytic check (whole closed loop):")
    print(json.dumps(result, indent=2))
    print()
    print("Note: FD perturbs the configured nominal weight through the full closed loop")
    print("(solver, adaptation, warm starts); the analytic column is jax.grad through")
    print("the differentiable closed loop (paper mode only). The analytic gradient is")
    print("exact under the IFT assumption that each solve converged — raise --iters if")
    print("the columns disagree at loose iteration caps.")
    if args.json_out:
        with open(args.json_out, "w", encoding="utf-8") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
