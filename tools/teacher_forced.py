#!/usr/bin/env python
"""Teacher-forced (step-local) agreement vs the PyTorch reference paper path.

Free-running closed-loop agreement (tools/agreement.py) is chaotic: O(1e-12)
framework-numerics differences (libm ulps, accumulation order) amplify through
2 iLQR solves x 300 steps, and a line-search/convergence tie eventually flips a
discrete decision (measured: first flip at t=25 on dubins.yaml, perfect 1-2e-14
agreement before it). That measures sensitivity of the trajectory, not correctness
of the solver.

This harness removes the feedback loop: the TORCH reference drives the official
state (solves, sensitivity, Algorithm-2 update, disturbed step, warm-start shift),
and at EVERY step our jitted scan body (tube.closed_loop.make_paper_step) is fed the
reference's exact pre-step state (x, b, x_bar, b_bar, warm starts, adapted weights,
momentum buffers, w_t). Per-step outputs are compared:

  u_t (applied ancillary control), u_bar_t (nominal control), upper loss L_t,
  the post-update (Qa, Ra, qba), and the shifted warm starts (= full control plans).

Identical inputs => any disagreement is a real semantic difference inside ONE step
of the pipeline (solver, sensitivity, gradient, update), not chaos.

    python tools/teacher_forced.py [--steps 300] [--horizon 50] [--out TEACHER_FORCED.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.measure_reference import import_reference  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--out", type=str, default="TEACHER_FORCED.json")
    ap.add_argument("--dump-divergent", type=str, default=None,
                    help="directory: save the full pre-step teacher state at every "
                         "step with u_err > 1e-6 (for single-step replay debugging)")
    args = ap.parse_args()
    H, N = args.steps, args.horizon

    import_reference()
    import torch
    import yaml

    from diff_tube_mpc_strict_pt.core.barrier import DBaSConfig, dbas_init_b0, dbas_step
    from diff_tube_mpc_strict_pt.core.control import BoxClampControl
    from diff_tube_mpc_strict_pt.core.cost_derivs import (
        auxiliary_cost_derivs_u,
        auxiliary_terminal_derivs,
        nominal_cost_derivs_u,
        nominal_terminal_derivs,
    )
    from diff_tube_mpc_strict_pt.core.ddp import (
        ILQRConfig as RefCfg,
        ddp_sensitivity,
        ilqr_solve as ref_solve,
    )
    from diff_tube_mpc_strict_pt.core.systems.dubins import (
        DubinsConfig as RefDub,
        dubins_step,
        sample_disturbance,
    )
    from diff_tube_mpc_strict_pt.core.systems.dubins_aug_jac import dubins_augmented_jacobian
    from diff_tube_mpc_strict_pt.core.systems.dubins_obstacles import (
        CircleObstacle,
        h_multi_circle_obstacles,
    )

    with open("/root/reference/configs/dubins.yaml", "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    td = torch.float64
    sc = cfg["system"]
    dt = float(sc["dt"])
    alphas = tuple(sc["line_search_alphas"])
    beta = float(cfg["environment"]["obstacle_smoothmin_beta"])
    eps = float(cfg["dbas"]["eps"])
    target_l = [float(v) for v in sc["target"]]

    rdub = RefDub(dt=dt, v_max=float(sc["control_bounds"]["v_max"]),
                  omega_max=float(sc["control_bounds"]["omega_max"]),
                  w_low=tuple(sc["disturbance"]["w_low"]),
                  w_high=tuple(sc["disturbance"]["w_high"]),
                  x_target=tuple(target_l))
    obs = [CircleObstacle(center=tuple(o["center"]), radius=float(o["radius"]))
           for o in cfg["environment"]["obstacles"]]
    h_t = lambda x: h_multi_circle_obstacles(x, obstacles=obs, beta=beta)
    db = DBaSConfig(barrier_type="inverse", alpha=torch.tensor(0.0, dtype=td),
                    gamma=torch.tensor(0.0, dtype=td), eps=eps)
    f_t = lambda x, u: dubins_step(x, u, cfg=rdub)
    f_jac_t = lambda xh, vk: dubins_augmented_jacobian(
        xh, vk, cfg=rdub, obs=obs, obs_beta=beta, obs_agg="smoothmin", db_cfg=db)

    def f_hat_t(xh, u):
        xn, bn = dbas_step(x_k=xh[:-1], u_k=u, b_k=xh[-1], f=f_t, h=h_t, cfg=db)
        return torch.cat([xn, bn.view(1)], dim=0)

    tgt = torch.tensor(target_l, dtype=td)
    Qn = torch.tensor(cfg["cost_nominal"]["Q"], dtype=td)
    Rn = torch.tensor(cfg["cost_nominal"]["R"], dtype=td)
    Qfn = torch.tensor(cfg["cost_nominal"]["Qf"], dtype=td)
    qbn = torch.tensor(float(cfg["cost_nominal"]["q_b"]), dtype=td)
    Qa = torch.tensor(cfg["cost_auxiliary"]["Q"], dtype=td)
    Ra = torch.tensor(cfg["cost_auxiliary"]["R"], dtype=td)
    qba = torch.tensor(float(cfg["cost_auxiliary"]["q_b"]), dtype=td)
    eta = float(cfg["adaptation"]["lr_eta"])
    mom = float(cfg["adaptation"]["momentum"])

    ctrl = BoxClampControl(
        u_min=torch.tensor([float(sc["control_bounds"]["v_min"]), -rdub.omega_max], dtype=td),
        u_max=torch.tensor([rdub.v_max, rdub.omega_max], dtype=td),
    )
    ilqr_nom = RefCfg(horizon=N, nx=4, nu=2, max_iter=int(sc["nominal_max_iter"]),
                      tol=1e-3, line_search_alphas=alphas)
    ilqr_aux = RefCfg(horizon=N, nx=4, nu=2, max_iter=int(sc["aux_max_iter"]),
                      tol=1e-3, line_search_alphas=alphas)

    # ---- our jitted step (built once) ----
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from tube_mpc_tpu.presets import dubins_paper_setup
    from tube_mpc_tpu.tube.closed_loop import PaperLoopState, make_paper_step
    from tube_mpc_tpu.tube.params import AuxAdapt

    s = dubins_paper_setup(N=N, H=H, dtype=jnp.float64)
    our_step = jax.jit(make_paper_step(
        s.system, s.aug, s.cfg, w_nominal=s.w_nominal, bp=s.bp, target=s.target))

    def J(t_arr):
        return jnp.asarray(np.asarray(t_arr.detach()), dtype=jnp.float64)

    # ---- teacher loop ----
    torch.manual_seed(0)
    np.random.seed(0)
    x = torch.tensor([0.0, 0.0, float(np.pi / 4)], dtype=td)
    x_bar = x.clone()
    b = dbas_init_b0(x, h=h_t, cfg=db)
    b_bar = dbas_init_b0(x_bar, h=h_t, cfg=db)
    V_nom_ws = torch.zeros(N, 2, dtype=td)
    V_aux_ws = torch.zeros(N, 2, dtype=td)
    vQ, vR, vqb = torch.zeros_like(Qa), torch.zeros_like(Ra), torch.zeros_like(qba)

    errs = {k: [] for k in ["u", "u_bar", "L", "Qa", "Ra", "qba", "U_nom_plan", "U_aux_plan"]}
    u_ref_seq, u_our_seq = [], []
    t0 = time.perf_counter()
    for t in range(H):
        # ===== torch reference step (official state) =====
        xh_bar = torch.cat([x_bar, b_bar.view(1)], dim=0)
        xh = torch.cat([x, b.view(1)], dim=0)

        def stage_nom(xhk, vk, k):
            dx = xhk[:-1] - tgt
            return (Qn * dx * dx).sum() + (Rn * vk * vk).sum() + qbn * xhk[-1] ** 2

        def term_nom(xhN):
            dx = xhN[:-1] - tgt
            return (Qfn * dx * dx).sum() + qbn * xhN[-1] ** 2

        def sderiv_nom(xhk, vk, k):
            return nominal_cost_derivs_u(x_hat=xhk, u=vk, target=tgt, Q=Qn, R=Rn, qb=qbn)

        def tderiv_nom(xhN):
            px, pxx = nominal_terminal_derivs(x_hat_N=xhN, target=tgt, Qf=Qfn)
            px[-1] = 2.0 * qbn * xhN[-1]
            pxx[-1, -1] = 2.0 * qbn
            return px, pxx

        X_nom, V_nom = ref_solve(x0=xh_bar, V_init=V_nom_ws, cfg=ilqr_nom, f=f_hat_t,
                                 ctrl=ctrl, f_jac=f_jac_t, stage_cost=stage_nom,
                                 terminal_cost=term_nom, stage_derivs=sderiv_nom,
                                 terminal_derivs=tderiv_nom)
        X_ref, U_ref = X_nom[:, :-1], V_nom

        def stage_aux(xhk, vk, k):
            dx = xhk[:-1] - X_ref[k]
            du = vk - U_ref[k]
            return (Qa * dx * dx).sum() + (Ra * du * du).sum() + qba * xhk[-1] ** 2

        def term_aux(xhN):
            dx = xhN[:-1] - X_ref[N]
            return (Qa * dx * dx).sum() + qba * xhN[-1] ** 2

        def sderiv_aux(xhk, vk, k):
            return auxiliary_cost_derivs_u(x_hat=xhk, u=vk, x_ref=X_ref[k], u_ref=U_ref[k],
                                           Q=Qa, R=Ra, qb=qba)

        def tderiv_aux(xhN):
            px, pxx = auxiliary_terminal_derivs(x_hat_N=xhN, x_ref_N=X_ref[N], Qf=Qa)
            px[-1] = 2.0 * qba * xhN[-1]
            pxx[-1, -1] = 2.0 * qba
            return px, pxx

        X_aux, V_aux = ref_solve(x0=xh, V_init=V_aux_ws, cfg=ilqr_aux, f=f_hat_t,
                                 ctrl=ctrl, f_jac=f_jac_t, stage_cost=stage_aux,
                                 terminal_cost=term_aux, stage_derivs=sderiv_aux,
                                 terminal_derivs=tderiv_aux)

        x_aux, b_aux, x_nom_phys = X_aux[:, :-1], X_aux[:, -1], X_nom[:, :-1]
        L = (x_aux - x_nom_phys).pow(2).sum() + b_aux.pow(2).sum()

        sens = ddp_sensitivity(
            X=X_aux, V=V_aux, f=f_hat_t, ctrl=ctrl, f_jac=f_jac_t,
            stage_hess=lambda xhk, vk, k: sderiv_aux(xhk, vk, k)[2:5],
            terminal_hess=lambda xhN: tderiv_aux(xhN)[1],
            upper_grad_x=lambda xhk, k: torch.cat(
                [2.0 * (xhk[:-1] - x_nom_phys[k]), (2.0 * xhk[-1]).view(1)]),
            upper_grad_u=lambda vk, k: torch.zeros_like(vk),
            upper_grad_xN=lambda xhN: torch.cat(
                [2.0 * (xhN[:-1] - x_nom_phys[N]), (2.0 * xhN[-1]).view(1)]),
        )
        dX, dV = sens.delta_X, sens.delta_V
        dx_tr = x_aux - x_nom_phys
        du_tr = V_aux - U_ref
        gQ = (2.0 * dx_tr * dX[:, :-1]).sum(dim=0)
        gR = (2.0 * du_tr * dV).sum(dim=0)
        gqb = (2.0 * b_aux * dX[:, -1]).sum()

        vQ_pre, vR_pre, vqb_pre = vQ.clone(), vR.clone(), vqb.clone()
        vQ = mom * vQ + gQ
        vR = mom * vR + gR
        vqb = mom * vqb + gqb
        Qa_new = (Qa - eta * vQ).clamp(min=0.0)
        Ra_new = (Ra - eta * vR).clamp(min=1e-4)
        qba_new = (qba - eta * vqb).clamp(min=0.0, max=1.0)

        u = V_aux[0]
        w = sample_disturbance(x, cfg=rdub)
        x_next = f_t(x, u) + w
        _, b_next = dbas_step(x_k=x, u_k=u, b_k=b, f=f_t, h=h_t, cfg=db)
        u_bar0 = V_nom[0]
        x_bar_next = f_t(x_bar, u_bar0)
        _, b_bar_next = dbas_step(x_k=x_bar, u_k=u_bar0, b_k=b_bar, f=f_t, h=h_t, cfg=db)

        # ===== our step from the SAME pre-step inputs =====
        state = PaperLoopState(
            x=J(x), b=J(b), x_bar=J(x_bar), b_bar=J(b_bar),
            U_nom_ws=J(V_nom_ws), U_aux_ws=J(V_aux_ws),
            adapt=AuxAdapt(Q=J(Qa), R=J(Ra), qb=J(qba)),
            vel=AuxAdapt(Q=J(vQ_pre), R=J(vR_pre), qb=J(vqb_pre)),
        )
        new_state, log = our_step(state, J(w))
        (x_j, u_j, xbar_j, ubar_j, b_j, L_j, Q_j, R_j, qb_j) = log

        def e(a, b_):
            return float(np.max(np.abs(np.asarray(a) - np.asarray(b_.detach()))))

        errs["u"].append(e(u_j, u))
        if args.dump_divergent and errs["u"][-1] > 1e-6:
            os.makedirs(args.dump_divergent, exist_ok=True)
            np.savez(
                os.path.join(args.dump_divergent, f"step_{t:04d}.npz"),
                t=t,
                x=x.detach().numpy(), b=b.detach().numpy(),
                x_bar=x_bar.detach().numpy(), b_bar=b_bar.detach().numpy(),
                V_nom_ws=V_nom_ws.numpy(), V_aux_ws=V_aux_ws.numpy(),
                Qa=Qa.detach().numpy(), Ra=Ra.detach().numpy(),
                qba=qba.detach().numpy(),
                vQ=vQ_pre.numpy(), vR=vR_pre.numpy(), vqb=vqb_pre.numpy(),
                w=w.detach().numpy(),
                u_ref=u.detach().numpy(), u_ours=np.asarray(u_j),
                U_nom_ref=V_nom.detach().numpy(), U_aux_ref=V_aux.detach().numpy(),
            )
        errs["u_bar"].append(e(ubar_j, u_bar0))
        errs["L"].append(e(L_j, L))
        errs["Qa"].append(e(Q_j, Qa_new))
        errs["Ra"].append(e(R_j, Ra_new))
        errs["qba"].append(e(qb_j, qba_new))
        errs["U_nom_plan"].append(e(new_state.U_nom_ws, torch.cat([V_nom[1:], V_nom[-1:]], dim=0)))
        errs["U_aux_plan"].append(e(new_state.U_aux_ws, torch.cat([V_aux[1:], V_aux[-1:]], dim=0)))
        u_ref_seq.append(u.detach().numpy().copy())
        u_our_seq.append(np.asarray(u_j))

        # ===== teacher advances with ITS OWN outputs =====
        Qa, Ra, qba = Qa_new, Ra_new, qba_new
        V_nom_ws = torch.cat([V_nom[1:], V_nom[-1:]], dim=0).detach()
        V_aux_ws = torch.cat([V_aux[1:], V_aux[-1:]], dim=0).detach()
        x, b, x_bar, b_bar = x_next.detach(), b_next.detach(), x_bar_next.detach(), b_bar_next.detach()
        if (t % 25) == 0:
            print(f"[{t}/{H}] u_err={errs['u'][-1]:.2e} Qa_err={errs['Qa'][-1]:.2e}", flush=True)

    wall = time.perf_counter() - t0
    u_ref_arr = np.stack(u_ref_seq)
    u_our_arr = np.stack(u_our_seq)
    agreement = 1.0 - np.linalg.norm(u_our_arr - u_ref_arr) / np.linalg.norm(u_ref_arr)
    report = {
        "steps": H, "horizon": N,
        "teacher_forced_control_agreement": float(agreement),
        **{f"max_{k}_err": float(np.max(v)) for k, v in errs.items()},
        **{f"median_{k}_err": float(np.median(v)) for k, v in errs.items()},
        "steps_with_u_err_gt_1e-6": int(np.sum(np.asarray(errs["u"]) > 1e-6)),
        "divergent_steps": [int(i) for i in np.nonzero(np.asarray(errs["u"]) > 1e-6)[0]],
        "wall_s": round(wall, 1),
        "target": ">= 0.99 control agreement (BASELINE.json), step-local",
    }
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
