#!/usr/bin/env python
"""Replay one teacher-forced step from a --dump-divergent npz in isolation.

Runs the torch reference and our jitted pipeline from the identical pre-step state
and reports WHERE they part ways: nominal plan, aux plan, per-iteration solver
internals. Debugging tool for the full-size agreement gate (BASELINE.json).

    python tools/replay_step.py /tmp/tf_divergent/step_0025.npz
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.measure_reference import import_reference  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--iter-trace", action="store_true",
                    help="print per-iteration cost/gain traces for both solvers")
    args = ap.parse_args()
    d = np.load(args.npz)
    N = args.horizon

    import_reference()
    import torch
    import yaml

    from diff_tube_mpc_strict_pt.core.barrier import DBaSConfig, dbas_step
    from diff_tube_mpc_strict_pt.core.control import BoxClampControl
    from diff_tube_mpc_strict_pt.core.cost_derivs import (
        auxiliary_cost_derivs_u,
        auxiliary_terminal_derivs,
        nominal_cost_derivs_u,
        nominal_terminal_derivs,
    )
    from diff_tube_mpc_strict_pt.core.ddp import ILQRConfig as RefCfg, ilqr_solve as ref_solve
    from diff_tube_mpc_strict_pt.core.systems.dubins import DubinsConfig as RefDub, dubins_step
    from diff_tube_mpc_strict_pt.core.systems.dubins_aug_jac import dubins_augmented_jacobian
    from diff_tube_mpc_strict_pt.core.systems.dubins_obstacles import (
        CircleObstacle,
        h_multi_circle_obstacles,
    )

    with open("/root/reference/configs/dubins.yaml", "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    td = torch.float64
    sc = cfg["system"]
    alphas = tuple(sc["line_search_alphas"])
    beta = float(cfg["environment"]["obstacle_smoothmin_beta"])
    eps = float(cfg["dbas"]["eps"])
    tgt = torch.tensor([float(v) for v in sc["target"]], dtype=td)
    rdub = RefDub(dt=float(sc["dt"]), v_max=float(sc["control_bounds"]["v_max"]),
                  omega_max=float(sc["control_bounds"]["omega_max"]),
                  w_low=tuple(sc["disturbance"]["w_low"]),
                  w_high=tuple(sc["disturbance"]["w_high"]),
                  x_target=tuple(tgt.tolist()))
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

    Qn = torch.tensor(cfg["cost_nominal"]["Q"], dtype=td)
    Rn = torch.tensor(cfg["cost_nominal"]["R"], dtype=td)
    Qfn = torch.tensor(cfg["cost_nominal"]["Qf"], dtype=td)
    qbn = torch.tensor(float(cfg["cost_nominal"]["q_b"]), dtype=td)
    ctrl = BoxClampControl(
        u_min=torch.tensor([float(sc["control_bounds"]["v_min"]), -rdub.omega_max], dtype=td),
        u_max=torch.tensor([rdub.v_max, rdub.omega_max], dtype=td),
    )
    ilqr_nom = RefCfg(horizon=N, nx=4, nu=2, max_iter=int(sc["nominal_max_iter"]),
                      tol=1e-3, line_search_alphas=alphas)
    ilqr_aux = RefCfg(horizon=N, nx=4, nu=2, max_iter=int(sc["aux_max_iter"]),
                      tol=1e-3, line_search_alphas=alphas)

    x = torch.tensor(d["x"], dtype=td)
    b = torch.tensor(d["b"], dtype=td)
    x_bar = torch.tensor(d["x_bar"], dtype=td)
    b_bar = torch.tensor(d["b_bar"], dtype=td)
    V_nom_ws = torch.tensor(d["V_nom_ws"], dtype=td)
    V_aux_ws = torch.tensor(d["V_aux_ws"], dtype=td)
    Qa = torch.tensor(d["Qa"], dtype=td)
    Ra = torch.tensor(d["Ra"], dtype=td)
    qba = torch.tensor(d["qba"], dtype=td)

    xh_bar = torch.cat([x_bar, b_bar.view(1)], dim=0)
    xh = torch.cat([x, b.view(1)], dim=0)

    def sderiv_nom(xhk, vk, k):
        return nominal_cost_derivs_u(x_hat=xhk, u=vk, target=tgt, Q=Qn, R=Rn, qb=qbn)

    def tderiv_nom(xhN):
        px, pxx = nominal_terminal_derivs(x_hat_N=xhN, target=tgt, Qf=Qfn)
        px[-1] = 2.0 * qbn * xhN[-1]
        pxx[-1, -1] = 2.0 * qbn
        return px, pxx

    def stage_nom(xhk, vk, k):
        dx = xhk[:-1] - tgt
        return (Qn * dx * dx).sum() + (Rn * vk * vk).sum() + qbn * xhk[-1] ** 2

    def term_nom(xhN):
        dx = xhN[:-1] - tgt
        return (Qfn * dx * dx).sum() + qbn * xhN[-1] ** 2

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

    # ---- ours ----
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from tube_mpc_tpu.presets import dubins_paper_setup
    from tube_mpc_tpu.solvers.ilqr import ilqr_solve
    from tube_mpc_tpu.tube.problem import AuxTheta, NominalTheta, make_aux_ocp, make_nominal_ocp

    s = dubins_paper_setup(N=N, H=1, dtype=jnp.float64)
    ocp_nom = make_nominal_ocp(s.system, s.aug, s.target)
    ocp_aux = make_aux_ocp(s.system, s.aug)
    th_nom = NominalTheta(w=s.w_nominal, bp=s.bp)

    J = lambda t: jnp.asarray(np.asarray(t.detach()), dtype=jnp.float64)
    Xn_j, Un_j = jax.jit(lambda: ilqr_solve(
        ocp_nom, s.cfg.nominal_ilqr(), th_nom, J(xh_bar), J(V_nom_ws)))()
    nom_err = float(np.max(np.abs(np.asarray(Un_j) - V_nom.detach().numpy())))
    print(f"nominal plan max err: {nom_err:.3e}")

    from tube_mpc_tpu.ops.costs import CostWeights

    w_aux = CostWeights(Q=J(Qa), R=J(Ra), Qf=J(Qa), qb=J(qba))
    # feed our aux solve the REFERENCE's nominal plan so the aux comparison is isolated
    th_aux_ref = AuxTheta(w=w_aux, bp=s.bp, X_ref=J(X_ref), U_ref=J(U_ref))
    Xa_j, Ua_j = jax.jit(lambda: ilqr_solve(
        ocp_aux, s.cfg.aux_ilqr(), th_aux_ref, J(xh), J(V_aux_ws)))()
    aux_err = float(np.max(np.abs(np.asarray(Ua_j) - V_aux.detach().numpy())))
    print(f"aux plan max err (given ref nominal): {aux_err:.3e}")

    # aux from OUR nominal (the composed path, as in the closed loop)
    th_aux_ours = AuxTheta(w=w_aux, bp=s.bp,
                           X_ref=Xn_j[:, :3], U_ref=Un_j)
    Xa2_j, Ua2_j = jax.jit(lambda: ilqr_solve(
        ocp_aux, s.cfg.aux_ilqr(), th_aux_ours, J(xh), J(V_aux_ws)))()
    aux2_err = float(np.max(np.abs(np.asarray(Ua2_j) - V_aux.detach().numpy())))
    print(f"aux plan max err (composed): {aux2_err:.3e}")
    print(f"ref u: {V_aux[0].detach().numpy()}  ours(composed) u: {np.asarray(Ua2_j[0])}")
    print(f"dumped u_ref: {d['u_ref']}  dumped u_ours: {d['u_ours']}")


if __name__ == "__main__":
    main()
