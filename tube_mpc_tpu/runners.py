"""Experiment runners: config -> jitted drivers -> run-dir artifacts.

The TPU-native counterpart of the reference's entry-point layer
(``run_experiment.py:35-76``, ``run_nominal.py:418-455``), including the paper/generic
mode dispatch of ``tube_mpc.py:48-49``.
"""
from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .tube.closed_loop import (
    run_generic_closed_loop,
    run_nominal_receding,
    run_paper_closed_loop,
)
from .tube.params import RawAuxTheta, RawNominalTheta
from .utils.config import BuiltExperiment, ExperimentConfig, build_experiment
from .utils.debug import check_finite_log
from .utils.io import save_closed_loop_log, save_json
from .systems.obstacles import h_min


def run_experiment(cfg: ExperimentConfig, run_dir: str, *, w_seq=None,
                   batch: Optional[int] = None,
                   checkpoint_every: Optional[int] = None,
                   engine: str = "xla",
                   compact_caps=None) -> Dict[str, Any]:
    """Closed-loop adaptive tube MPC; returns the results summary (also written to
    run_dir). Paper mode when paper_dubins_mode and not adapt_nominal
    (reference dispatch tube_mpc.py:48-49).

    batch: run B i.i.d.-disturbance scenarios at once (vmapped over PRNG keys;
    each scenario adapts its own θ). Scenario 0 is saved as the reference-compatible
    single-run artifacts; the full [B, ...] arrays go to *_batch.npy and the summary
    gains population statistics. batch=None/1 reproduces the single-trajectory
    reference behavior exactly.

    checkpoint_every: execute the closed loop in resumable segments of this many
    steps, persisting the full carry to <run_dir>/ckpt (utils/checkpoint.py); a
    killed run re-launched with the same run_dir resumes bit-exactly. Covered:
    XLA paper single-trajectory, and every lane-engine mode (paper / generic /
    coupled, any batch).

    compact_caps (lanes engine): "c1,c2[;n1,n2]" — bitwise-identical straggler
    compaction caps for the aux (and optionally nominal) solves
    (ops/pallas/lane_solver.lane_ilqr_solve)."""
    paper_mode = cfg.paper_dubins_mode and not cfg.adaptation.adapt_nominal
    built = build_experiment(cfg, paper_mode=paper_mode)
    key = jax.random.PRNGKey(cfg.seed)
    B = int(batch) if batch else 0
    if B > 1 and w_seq is not None:
        raise ValueError("batch mode samples disturbances; don't pass w_seq")
    if engine == "lanes":
        from .utils.config import validate_for_engine

        validate_for_engine(built, "lanes")
        return _run_experiment_lanes(cfg, built, run_dir, key=key, w_seq=w_seq,
                                     B=max(B, 1), paper_mode=paper_mode,
                                     checkpoint_every=checkpoint_every,
                                     compact_caps=compact_caps)
    if engine != "xla":
        raise ValueError(f"unknown engine {engine!r} (xla or lanes)")
    if compact_caps:
        raise ValueError("compact_caps is a lanes-engine feature (--engine lanes)")
    if checkpoint_every:
        if not paper_mode or B > 1 or w_seq is not None:
            raise ValueError("checkpoint_every requires paper mode, single trajectory")
        from .utils.checkpoint import run_paper_closed_loop_checkpointed

        t0 = time.perf_counter()
        log = run_paper_closed_loop_checkpointed(
            built.system, built.aug, built.tube_cfg,
            w_nominal=built.w_nominal, aux_init=built.aux_init, bp=built.bp,
            x0=built.x0, target=built.target, key=key,
            ckpt_dir=f"{run_dir}/ckpt", segment_len=int(checkpoint_every),
        )
        mode = "paper"
        jax.block_until_ready(log)
        wall = time.perf_counter() - t0
        return _finish_single(cfg, run_dir, log, mode, wall)

    t0 = time.perf_counter()
    if paper_mode:
        def paper(w, k):
            return run_paper_closed_loop(
                built.system, built.aug, built.tube_cfg,
                w_nominal=built.w_nominal, aux_init=built.aux_init, bp=built.bp,
                x0=built.x0, target=built.target,
                w_seq=w, key=k,
                # debug_numerics arms the reference's per-phase located finite
                # guards inside the scan (_ensure_finite, tube_mpc.py:786-801);
                # run_checked below surfaces the first failing phase by name.
                debug_checks=cfg.debug_numerics,
            )

        if cfg.debug_numerics:
            from .utils.debug import run_checked

            if w_seq is not None:
                log = run_checked(lambda w: paper(w, None), w_seq)
            elif B > 1:
                log = run_checked(jax.vmap(lambda k: paper(None, k)),
                                  jax.random.split(key, B))
            else:
                log = run_checked(lambda k: paper(None, k), key)
        elif w_seq is not None:
            log = jax.jit(lambda w: paper(w, None))(w_seq)
        elif B > 1:
            log = jax.jit(jax.vmap(lambda k: paper(None, k)))(jax.random.split(key, B))
        else:
            log = jax.jit(lambda k: paper(None, k))(key)
        mode = "paper"
    else:
        dtype = cfg.dtype
        raw_nom = RawNominalTheta(
            Q_raw=jnp.asarray(list(cfg.cost_nominal.Q), dtype=dtype),
            R_raw=jnp.asarray(list(cfg.cost_nominal.R), dtype=dtype),
            Qf_raw=jnp.asarray(list(cfg.cost_nominal.Qf or cfg.cost_nominal.Q), dtype=dtype),
            qb_raw=jnp.asarray(cfg.cost_nominal.q_b, dtype=dtype),
            alpha_raw=jnp.asarray(cfg.dbas.alpha, dtype=dtype),
            gamma_raw=jnp.asarray(cfg.dbas.gamma, dtype=dtype),
            tight_raw=jnp.asarray(cfg.dbas.nominal_tightening, dtype=dtype),
        )
        raw_aux = RawAuxTheta(
            Q_raw=jnp.asarray(list(cfg.cost_auxiliary.Q or cfg.cost_nominal.Q), dtype=dtype),
            R_raw=jnp.asarray(list(cfg.cost_auxiliary.R or cfg.cost_nominal.R), dtype=dtype),
            Qf_raw=jnp.asarray(list(cfg.cost_auxiliary.Qf or cfg.cost_auxiliary.Q or cfg.cost_nominal.Q), dtype=dtype),
            qb_raw=jnp.asarray(cfg.cost_auxiliary.q_b, dtype=dtype),
            alpha_raw=jnp.asarray(cfg.dbas.alpha, dtype=dtype),
            gamma_raw=jnp.asarray(cfg.dbas.gamma, dtype=dtype),
        )
        def generic(k):
            log_, _final = run_generic_closed_loop(
                built.system, built.aug, built.tube_cfg,
                raw_nom_init=raw_nom, raw_aux_init=raw_aux,
                x0=built.x0, target=built.target, key=k,
                debug_checks=cfg.debug_numerics,
            )
            return log_

        if cfg.debug_numerics:
            from .utils.debug import run_checked

            if B > 1:
                log = run_checked(jax.vmap(generic), jax.random.split(key, B))
            else:
                log = run_checked(generic, key)
        elif B > 1:
            log = jax.jit(jax.vmap(generic))(jax.random.split(key, B))
        else:
            log = jax.jit(generic)(key)
        mode = "generic"
    jax.block_until_ready(log)
    wall = time.perf_counter() - t0

    if cfg.debug_numerics:
        check_finite_log(log)

    H = cfg.system.task_horizon_H
    if B > 1:
        import os

        os.makedirs(run_dir, exist_ok=True)
        for name, arr in log._asdict().items():
            np.save(os.path.join(run_dir, f"{name}_batch.npy"),
                    np.asarray(arr, dtype=np.float64))
        log0 = type(log)(*(leaf[0] for leaf in log))
        save_closed_loop_log(run_dir, log0)
        final_losses = np.asarray(log.loss[:, -1], dtype=np.float64)
        summary = {
            "system": cfg.system.name,
            "mode": mode,
            "H": H,
            "N": cfg.system.horizon_N,
            "batch": B,
            "final_state": np.asarray(log.x_real[0, -1]).tolist(),
            "final_barrier_state": float(np.asarray(log.b_real[0, -1])),
            "final_loss": float(final_losses[0]),
            "final_loss_mean": float(final_losses.mean()),
            "final_loss_std": float(final_losses.std()),
            "final_loss_max": float(final_losses.max()),
            "wall_time_s": wall,
            "solves_per_sec": 2 * H * B / wall,
        }
    else:
        return _finish_single(cfg, run_dir, log, mode, wall)
    save_json(run_dir, "results_summary.json", summary)
    return {"summary": summary, "log": log}


def _run_experiment_lanes(cfg: ExperimentConfig, built: BuiltExperiment, run_dir: str,
                          *, key, w_seq, B: int, paper_mode: bool = True,
                          checkpoint_every: Optional[int] = None,
                          compact_caps=None) -> Dict[str, Any]:
    """Closed loop on the fused lane Pallas pipeline (the throughput flagship; see
    tube/lane_closed_loop.py) — paper path or the uncoupled generic path
    (raw-reparameterized θ with adaptive barrier α/γ). B lanes advance together;
    lane 0 is saved as the reference-compatible single-run artifacts.

    Always runs float32: TPU cannot execute f64 Pallas custom calls (XLA's x64
    rewriting is not implemented for them), and f32 is this engine's design point.
    use_float64 configs are rebuilt at f32 with a note in the summary."""
    import dataclasses as _dc
    import os

    from .systems.registry import build_components
    from .tube.lane_closed_loop import (
        run_generic_closed_loop_lanes,
        run_paper_closed_loop_lanes,
    )

    if jax.config.jax_enable_x64 and jax.devices()[0].platform != "cpu":
        raise ValueError(
            "engine='lanes' cannot run with jax_enable_x64 on TPU: the Mosaic "
            "kernel compiler has no 64-bit support (it aborts even on f32 data). "
            "Leave x64 off — the lanes engine is the f32 throughput path "
            "(run_experiment.py handles this automatically)."
        )
    forced_f32 = cfg.use_float64
    if forced_f32:
        cfg = _dc.replace(cfg, use_float64=False)
        built = build_experiment(cfg, paper_mode=paper_mode)

    sys_c = build_components(
        cfg.system.name,
        dt=cfg.system.dt,
        control_bounds=dict(cfg.system.control_bounds),
        obstacles=[dict(o) for o in cfg.environment.obstacles] or None,
        aggregation=cfg.environment.obstacle_aggregation,
        beta=cfg.environment.obstacle_smoothmin_beta,
        extra=dict(cfg.system.extra),
    )
    if w_seq is not None and w_seq.ndim == 2:
        w_seq = w_seq[None]

    # Mosaic kernels only compile for TPU; on any other backend (CPU
    # verification drives, virtual meshes, GPU-default processes) run the same
    # kernels in interpret mode automatically.
    interpret = jax.default_backend() != "tpu"
    lane_kw = dict(interpret=interpret)
    if compact_caps:
        # "c1,c2[;n1,n2]": aux caps, optionally nominal caps after ';'
        parts = str(compact_caps).split(";")
        lane_kw["aux_compact_caps"] = tuple(int(c) for c in parts[0].split(",") if c)
        if len(parts) > 1:
            lane_kw["nom_compact_caps"] = tuple(int(c) for c in parts[1].split(",") if c)

    t0 = time.perf_counter()
    if paper_mode and checkpoint_every:
        from .utils.checkpoint import run_paper_closed_loop_lanes_checkpointed

        log = run_paper_closed_loop_lanes_checkpointed(
            built.system, built.aug, sys_c, built.tube_cfg,
            w_nominal=built.w_nominal, aux_init=built.aux_init, bp=built.bp,
            x0=built.x0, target=built.target,
            w_seqs=w_seq, key=None if w_seq is not None else key,
            batch=None if w_seq is not None else B,
            ckpt_dir=f"{run_dir}/ckpt", segment_len=int(checkpoint_every),
            eps=cfg.dbas.eps, barrier_type=cfg.dbas.barrier_type,
            **lane_kw,
        )
    elif paper_mode:
        log = jax.jit(
            lambda k: run_paper_closed_loop_lanes(
                built.system, built.aug, sys_c, built.tube_cfg,
                w_nominal=built.w_nominal, aux_init=built.aux_init, bp=built.bp,
                x0=built.x0, target=built.target,
                w_seqs=w_seq, key=None if w_seq is not None else k,
                batch=None if w_seq is not None else B,
                eps=cfg.dbas.eps, barrier_type=cfg.dbas.barrier_type,
                **lane_kw,
            )
        )(key)
    else:
        from .tube.params import RawAuxTheta, RawNominalTheta

        dtype = cfg.dtype
        raw_nom = RawNominalTheta(
            Q_raw=jnp.asarray(list(cfg.cost_nominal.Q), dtype=dtype),
            R_raw=jnp.asarray(list(cfg.cost_nominal.R), dtype=dtype),
            Qf_raw=jnp.asarray(list(cfg.cost_nominal.Qf or cfg.cost_nominal.Q), dtype=dtype),
            qb_raw=jnp.asarray(cfg.cost_nominal.q_b, dtype=dtype),
            alpha_raw=jnp.asarray(cfg.dbas.alpha, dtype=dtype),
            gamma_raw=jnp.asarray(cfg.dbas.gamma, dtype=dtype),
            tight_raw=jnp.asarray(cfg.dbas.nominal_tightening, dtype=dtype),
        )
        raw_aux = RawAuxTheta(
            Q_raw=jnp.asarray(list(cfg.cost_auxiliary.Q or cfg.cost_nominal.Q), dtype=dtype),
            R_raw=jnp.asarray(list(cfg.cost_auxiliary.R or cfg.cost_nominal.R), dtype=dtype),
            Qf_raw=jnp.asarray(list(cfg.cost_auxiliary.Qf or cfg.cost_auxiliary.Q or cfg.cost_nominal.Q), dtype=dtype),
            qb_raw=jnp.asarray(cfg.cost_auxiliary.q_b, dtype=dtype),
            alpha_raw=jnp.asarray(cfg.dbas.alpha, dtype=dtype),
            gamma_raw=jnp.asarray(cfg.dbas.gamma, dtype=dtype),
        )
        if checkpoint_every:
            from .utils.checkpoint import run_generic_closed_loop_lanes_checkpointed

            log, _raw_final = run_generic_closed_loop_lanes_checkpointed(
                built.system, built.aug, sys_c, built.tube_cfg,
                raw_nom=raw_nom, raw_aux_init=raw_aux,
                x0=built.x0, target=built.target,
                w_seqs=w_seq, key=None if w_seq is not None else key,
                batch=None if w_seq is not None else B,
                ckpt_dir=f"{run_dir}/ckpt", segment_len=int(checkpoint_every),
                eps=cfg.dbas.eps, barrier_type=cfg.dbas.barrier_type,
                **lane_kw,
            )
            jax.block_until_ready(log)
            wall = time.perf_counter() - t0
            return _finish_lanes(cfg, run_dir, log, wall, B=B,
                                 paper_mode=paper_mode, forced_f32=forced_f32)
        log, _raw_final = jax.jit(
            lambda k: run_generic_closed_loop_lanes(
                built.system, built.aug, sys_c, built.tube_cfg,
                raw_nom=raw_nom, raw_aux_init=raw_aux,
                x0=built.x0, target=built.target,
                w_seqs=w_seq, key=None if w_seq is not None else k,
                batch=None if w_seq is not None else B,
                eps=cfg.dbas.eps, barrier_type=cfg.dbas.barrier_type,
                **lane_kw,
            )
        )(key)
    jax.block_until_ready(log)
    wall = time.perf_counter() - t0
    return _finish_lanes(cfg, run_dir, log, wall, B=B,
                         paper_mode=paper_mode, forced_f32=forced_f32)


def _finish_lanes(cfg: ExperimentConfig, run_dir: str, log, wall: float, *,
                  B: int, paper_mode: bool, forced_f32: bool) -> Dict[str, Any]:
    import os

    if cfg.debug_numerics:
        check_finite_log(log)

    H = cfg.system.task_horizon_H
    os.makedirs(run_dir, exist_ok=True)
    if B > 1:
        for name, arr in log._asdict().items():
            np.save(os.path.join(run_dir, f"{name}_batch.npy"), np.asarray(arr, dtype=np.float64))
    log0 = type(log)(*(leaf[0] for leaf in log))
    save_closed_loop_log(run_dir, log0)
    final_losses = np.asarray(log.loss[:, -1], dtype=np.float64)
    finite = np.isfinite(final_losses)
    summary = {
        "system": cfg.system.name,
        "mode": "paper" if paper_mode else "generic",
        "engine": "lanes",
        "dtype": "float32" + (" (forced; lanes engine is f32-only)" if forced_f32 else ""),
        "H": H,
        "N": cfg.system.horizon_N,
        "batch": B,
        "final_state": np.asarray(log.x_real[0, -1]).tolist(),
        "final_barrier_state": float(np.asarray(log.b_real[0, -1])),
        "final_loss": float(final_losses[0]),
        # f32 closed-loop ADAPTATION degrades over long horizons on barrier-tight
        # problems (the reference runs f64 for a reason; the XLA f32 path degrades
        # identically). Lanes whose numerics blew up are excluded and counted.
        "final_loss_mean_finite": float(final_losses[finite].mean()) if finite.any() else None,
        "final_loss_median_finite": float(np.median(final_losses[finite])) if finite.any() else None,
        "finite_lane_frac": float(finite.mean()),
        "wall_time_s": wall,
        "solves_per_sec": 2 * H * B / wall,
    }
    save_json(run_dir, "results_summary.json", summary)
    return {"summary": summary, "log": log}


def _finish_single(cfg: ExperimentConfig, run_dir: str, log, mode: str, wall: float) -> Dict[str, Any]:
    H = cfg.system.task_horizon_H
    save_closed_loop_log(run_dir, log)
    summary = {
        "system": cfg.system.name,
        "mode": mode,
        "H": H,
        "N": cfg.system.horizon_N,
        "final_state": np.asarray(log.x_real[-1]).tolist(),
        "final_barrier_state": float(np.asarray(log.b_real[-1])),
        "final_loss": float(np.asarray(log.loss[-1])),
        "wall_time_s": wall,
        "solves_per_sec": 2 * H / wall,
    }
    save_json(run_dir, "results_summary.json", summary)
    return {"summary": summary, "log": log}


def run_nominal_single(cfg: ExperimentConfig, run_dir: str,
                       *, feasible_filter: bool = False) -> Dict[str, Any]:
    """Single nominal solve from x0 (reference ``run_nominal.py:37-201``,
    run_nominal_once): one angle-wrapped iLQR solve with the v=v_max warm start,
    saving the plan as x_bar_single/u_bar_single.

    feasible_filter enables the strict-feasibility line-search filter the reference
    defines but never passes to its solver (``run_nominal.py:119-124, 173-184``)."""
    import os

    from .tube.problem import NominalTheta, make_nominal_ocp

    built = build_experiment(cfg, paper_mode=False)
    system, aug = built.system, built.aug
    ocp = make_nominal_ocp(system, aug, built.target,
                           angle_dims=system.angle_dims, feasible_h=feasible_filter)
    theta = NominalTheta(w=built.w_nominal, bp=built.bp)
    b0 = aug.init_b0(built.x0, built.bp)
    x_hat0 = jnp.concatenate([built.x0, b0[None]])
    # reference warm start: forward at v = v_max (run_nominal.py:170-171)
    U_ws = jnp.zeros((cfg.system.horizon_N, system.nu), dtype=built.x0.dtype)
    U_ws = U_ws.at[:, 0].set(system.u_max[0])

    from .solvers.ilqr import ilqr_solve

    X_hat, U = jax.jit(
        lambda: ilqr_solve(ocp, built.tube_cfg.nominal_ilqr(), theta, x_hat0, U_ws)
    )()
    jax.block_until_ready((X_hat, U))

    x_plan = np.asarray(X_hat[:, : system.nx], dtype=np.float64)
    u_plan = np.asarray(U, dtype=np.float64)
    os.makedirs(run_dir, exist_ok=True)
    np.save(os.path.join(run_dir, "x_bar_single.npy"), x_plan)
    np.save(os.path.join(run_dir, "u_bar_single.npy"), u_plan)
    summary = {
        "system": cfg.system.name,
        "mode": "nominal_only",
        "N": cfg.system.horizon_N,
        "x0": x_plan[0].tolist(),
        "xN": x_plan[-1].tolist(),
        "min_h_on_plan": (
            float(np.min(np.asarray(system.h(X_hat[:, : system.nx]))))
            if system.h is not None else None
        ),
    }
    save_json(run_dir, "results_summary.json", summary)
    return {"summary": summary, "X": X_hat, "U": U}


def run_nominal(cfg: ExperimentConfig, run_dir: str) -> Dict[str, Any]:
    """Nominal-only receding horizon with success/collision checks
    (reference ``run_nominal.py:204-415``)."""
    built = build_experiment(cfg, paper_mode=False)
    h_exact = None
    if built.field is not None:
        field = built.field
        h_exact = lambda x: h_min(x, field)

    res = jax.jit(
        lambda: run_nominal_receding(
            built.system, built.aug, built.tube_cfg,
            w_nominal=built.w_nominal, bp=built.bp,
            x0=built.x0, target=built.target, h_exact=h_exact,
            angle_dims=built.system.angle_dims,
        )
    )()
    jax.block_until_ready(res)

    ran = np.asarray(res.ran)
    h_ran = int(ran.sum())
    xs = np.asarray(res.x, dtype=np.float64)[:h_ran]
    us = np.asarray(res.u, dtype=np.float64)[:h_ran]
    bs = np.asarray(res.b, dtype=np.float64)[:h_ran]

    import os

    os.makedirs(run_dir, exist_ok=True)
    np.save(os.path.join(run_dir, "x_bar.npy"), xs)
    np.save(os.path.join(run_dir, "u_bar.npy"), us)
    np.save(os.path.join(run_dir, "x_real.npy"), xs)
    np.save(os.path.join(run_dir, "u_real.npy"), us)
    np.save(os.path.join(run_dir, "b_real.npy"), bs)
    np.save(os.path.join(run_dir, "loss.npy"), np.zeros((h_ran,), dtype=np.float64))

    success_t = int(np.asarray(res.success_t))
    summary = {
        "system": cfg.system.name,
        "mode": "nominal_receding",
        "H_ran": h_ran,
        "success": bool(np.asarray(res.success)),
        "success_t": None if success_t >= cfg.system.task_horizon_H else success_t,
        "collided": bool(np.asarray(res.collided)),
        "final_state": xs[-1].tolist() if h_ran else np.asarray(built.x0).tolist(),
    }
    save_json(run_dir, "results_summary.json", summary)
    return {"summary": summary, "result": res}
