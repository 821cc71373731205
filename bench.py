"""Headline benchmark: tube-MPC solves/sec/chip on the Dubins paper workload (N=50).

Runs B adaptive closed loops on the lane-major fused Pallas pipeline
(tube/lane_closed_loop.py): per closed-loop step each scenario does a nominal iLQR
solve + an ancillary iLQR solve (fused lane kernels), the O(T) DDP sensitivity, the
closed-form Algorithm-2 gradient and the projected momentum update, then the disturbed
step — all inside one jitted lax.scan, float32.

Counted work: 2 iLQR solves per closed-loop step per scenario (how BASELINE.md counts
the reference: tube_mpc.py:803-996). vs_baseline is against the PyTorch reference on
this machine's CPU: 0.956 solves/s (tools/measure_reference.py; BASELINE.md).

Prints ONE JSON line. Env knobs: BENCH_B (batch), BENCH_H (steps; default 300 — the
REFERENCE task horizon, configs/dubins.yaml:14-15, so the recorded metric is the real
workload), BENCH_REPEATS (timed repeats, median reported), BENCH_PATH=xla for
the non-Pallas path, BENCH_MODE=generic for the generic engine (raw-reparameterized
θ incl. adaptive barrier α/γ; tube/lane_closed_loop.run_generic_closed_loop_lanes).
The JSON includes finite_lane_frac — the fraction of lanes whose f32 closed loop
stayed numerically healthy to the end (see BASELINE.md on long-horizon f32).
"""
import json
import os
import statistics
import subprocess
import sys
import time

REF_CPU_SOLVES_PER_SEC = 0.956  # measured; see BASELINE.md / tools/measure_reference.py

# Backend-probe resilience (round-3 post-mortem: one tunnel blip at the first
# device op left the round with rc=1 and an unparseable traceback tail —
# BENCH_r03.json). The probe runs `jax.devices()` + one tiny device op in a
# SUBPROCESS with a hard timeout (a downed tunnel makes jax.devices() *hang*,
# not raise), retrying with backoff. On final failure main() still prints ONE
# parseable JSON line naming the cause and exits 0, so the captured artifact
# is always machine-readable.
PROBE_ATTEMPTS = int(os.environ.get("BENCH_PROBE_ATTEMPTS", 3))
PROBE_TIMEOUT_S = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", 180))
PROBE_BACKOFF_S = (10.0, 45.0)  # sleep after attempt 1, 2, ...

# BENCH_PLATFORM pins the backend (e.g. "cpu" to exercise bench off-chip).
# Must go through jax.config.update AFTER import: the environment's
# sitecustomize force-overrides jax_platforms to "axon,cpu" (see tests/conftest.py).
_PROBE_SRC = (
    "import os, jax, jax.numpy as jnp;"
    "p = os.environ.get('BENCH_PLATFORM');"
    "p and jax.config.update('jax_platforms', p);"
    "d = jax.devices();"
    "x = jnp.ones((4, 4)); jax.block_until_ready(x @ x);"
    "print('PROBE_OK', d[0].platform, len(d))"
)


def _probe_backend() -> tuple[bool, str]:
    """Bounded-retry device probe in a subprocess. Returns (ok, detail)."""
    detail = ""
    for attempt in range(PROBE_ATTEMPTS):
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, text=True, timeout=PROBE_TIMEOUT_S,
            )
            if r.returncode == 0 and "PROBE_OK" in r.stdout:
                return True, r.stdout.strip().splitlines()[-1]
            detail = (r.stderr.strip().splitlines() or ["unknown probe failure"])[-1]
        except subprocess.TimeoutExpired:
            detail = f"probe timed out after {PROBE_TIMEOUT_S:.0f}s (backend hang)"
        if attempt < PROBE_ATTEMPTS - 1:
            time.sleep(PROBE_BACKOFF_S[min(attempt, len(PROBE_BACKOFF_S) - 1)])
    return False, detail


def _emit_failure(cause: str) -> None:
    sysname = os.environ.get("BENCH_SYSTEM", "dubins")
    horizon = os.environ.get("BENCH_N", "50")
    print(json.dumps({
        "metric": f"tube_mpc_solves_per_sec_per_chip_{sysname}_T{horizon}",
        "value": None,
        "unit": "solves/s",
        "vs_baseline": None,
        "error": cause,
    }), flush=True)


# A tunnel death AFTER a successful probe makes device ops HANG (not raise), so
# the try/except around main() never fires and the capture gets no JSON line.
# The watchdog bounds the whole run: on expiry it emits the failure line and
# hard-exits 0 (os._exit — the hung runtime thread can't be joined).
WATCHDOG_S = float(os.environ.get("BENCH_WATCHDOG_S", 3300))


def _arm_watchdog() -> "threading.Timer":
    import threading

    def expire():
        _emit_failure(f"watchdog: run exceeded {WATCHDOG_S:.0f}s "
                      "(backend hang after successful probe?)")
        os._exit(0)

    t = threading.Timer(WATCHDOG_S, expire)
    t.daemon = True
    t.start()
    return t


def main() -> None:
    ok, detail = _probe_backend()
    if not ok:
        _emit_failure(f"backend_unavailable after {PROBE_ATTEMPTS} probe attempts: {detail}")
        return
    watchdog = _arm_watchdog()

    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    # Persistent compile cache: kernel compilation dominates bench wall time
    # (~5 min/process via the remote Mosaic compiler); the measured region is
    # unaffected (timing starts after warmup).
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tube_mpc_tpu.ops.lanes import dubins_components
    from tube_mpc_tpu.presets import PAPER_OBSTACLES, dubins_paper_setup
    from tube_mpc_tpu.tube.closed_loop import run_paper_closed_loop
    from tube_mpc_tpu.tube.lane_closed_loop import (
        run_generic_closed_loop_lanes,
        run_paper_closed_loop_lanes,
    )

    B = int(os.environ.get("BENCH_B", 16384))
    H = int(os.environ.get("BENCH_H", 300))
    # BENCH_N: planning horizon (default 50 — the reference task, dubins.yaml:14).
    # The solves/s metric counts SOLVES (2 per closed-loop step), so longer
    # horizons lower it roughly linearly; see PERFORMANCE.md "Scaling profile".
    N = int(os.environ.get("BENCH_N", 50))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    path = os.environ.get("BENCH_PATH", "lanes")
    mode = os.environ.get("BENCH_MODE", "paper")
    # BENCH_SYSTEM: any registered family (dubins/double_integrator/cartpole/
    # quadrotor2d) — non-dubins families run the SAME fused lane pipeline from
    # their shipped configs/<name>.yaml (costs, bounds, barrier), with N and
    # H forced for cross-family comparability. Paper path only.
    system_name = os.environ.get("BENCH_SYSTEM", "dubins")
    # BENCH_CLIP: optional grad_clip_norm for the paper path (default 0 =
    # reference-faithful no clipping; the reference paper path never clips).
    clip = float(os.environ.get("BENCH_CLIP", 0) or 0)
    s = dubins_paper_setup(N=N, H=H, dtype=jnp.float32)
    if system_name != "dubins":
        import dataclasses as _dcs
        import types as _types

        from tube_mpc_tpu.systems.registry import build_components
        from tube_mpc_tpu.utils.config import build_experiment, load_config

        if (mode, path) != ("paper", "lanes"):
            _emit_failure(f"BENCH_SYSTEM={system_name} supports only the paper "
                          "lane path (BENCH_MODE=paper, BENCH_PATH=lanes)")
            return
        ycfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                        "configs", f"{system_name}.yaml"))
        ycfg = _dcs.replace(ycfg, use_float64=False)
        built = build_experiment(ycfg, paper_mode=True)
        s = _types.SimpleNamespace(
            system=built.system, aug=built.aug,
            cfg=_dcs.replace(built.tube_cfg, N=N, H=H),
            w_nominal=built.w_nominal, aux_init=built.aux_init, bp=built.bp,
            x0=built.x0, target=built.target,
            components=build_components(
                system_name, dt=ycfg.system.dt,
                control_bounds=dict(ycfg.system.control_bounds),
                obstacles=[dict(o) for o in ycfg.environment.obstacles] or None,
                aggregation=ycfg.environment.obstacle_aggregation,
                beta=ycfg.environment.obstacle_smoothmin_beta,
                extra=dict(ycfg.system.extra),
            ),
            dbas_eps=ycfg.dbas.eps, barrier_type=ycfg.dbas.barrier_type,
        )
    if clip:
        import dataclasses as _dc0

        from tube_mpc_tpu.tube.params import AdaptConfig as _AC
        if system_name == "dubins":
            s = _dc0.replace(s, cfg=_dc0.replace(
                s.cfg, adapt=_AC(lr=5e-2, momentum=0.9, grad_clip_norm=clip)))
        else:  # families: override only the clip, keep the YAML's adapt knobs
            s.cfg = _dc0.replace(
                s.cfg, adapt=_dc0.replace(s.cfg.adapt, grad_clip_norm=clip))

    if path == "lanes":
        if system_name != "dubins":
            sys_c = s.components
            lane_eps, lane_barrier = s.dbas_eps, s.barrier_type
        else:
            sys_c = dubins_components(
                dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
                centers=PAPER_OBSTACLES, radii=[1.0] * len(PAPER_OBSTACLES),
                aggregation="smoothmin", beta=20.0,
            )
            lane_eps, lane_barrier = 1e-4, "inverse"

        # BENCH_COMPACT="10,15;8" -> aux compact caps (10,15), nominal (8);
        # "10,15" sets aux only; BENCH_COMPACT="" disables. Bitwise-identical
        # straggler compaction (ops/pallas/lane_solver.lane_ilqr_solve
        # compact_caps). Defaults are the per-mode winners of the measured
        # on-chip schedule sweeps (BENCH_COMPACT_AB.json schedule_sweep for
        # no-clip; BENCH_MODE_SWEEP.json + 7-repeat runoffs for the clipped
        # modes — clipping keeps theta tame, lanes converge in fewer trips,
        # and the shorter straggler tail rewards EARLIER compaction):
        # paper no-clip "2,5,8" (1.70x vs uncompacted), paper clip "1,4,8",
        # generic/coupled "1,3,5". docs/PERFORMANCE.md round 5.
        if mode in ("generic", "coupled"):
            default_caps = "1,3,5"
        elif clip:
            default_caps = "1,4,8"
        else:
            default_caps = "2,5,8"
        compact = os.environ.get("BENCH_COMPACT", default_caps)
        aux_caps, nom_caps = (), ()
        if compact:
            parts = compact.split(";")
            aux_caps = tuple(int(c) for c in parts[0].split(",") if c)
            if len(parts) > 1:
                nom_caps = tuple(int(c) for c in parts[1].split(",") if c)

        if mode in ("generic", "coupled"):
            from tube_mpc_tpu.tube.params import RawAuxTheta, RawNominalTheta
            import dataclasses as _dc

            from tube_mpc_tpu.tube.params import AdaptConfig
            cfg = _dc.replace(s.cfg, adapt=AdaptConfig(
                lr=5e-2, momentum=0.9, steps=1, grad_clip_norm=1.0, project=True),
                adapt_nominal=(mode == "coupled"))
            F32 = jnp.float32
            raw_nom = RawNominalTheta(
                Q_raw=jnp.asarray([1.0, 1.0, 0.0], F32), R_raw=jnp.asarray([1.0, 1.0], F32),
                Qf_raw=jnp.asarray([1000.0] * 3, F32), qb_raw=jnp.asarray(1.0, F32),
                alpha_raw=jnp.asarray(0.0, F32), gamma_raw=jnp.asarray(0.0, F32),
                tight_raw=jnp.asarray(0.0, F32))
            raw_aux = RawAuxTheta(
                Q_raw=jnp.asarray([1.0, 1.0, 0.0], F32), R_raw=jnp.asarray([1.0, 1.0], F32),
                Qf_raw=jnp.asarray([1000.0] * 3, F32), qb_raw=jnp.asarray(1.0, F32),
                alpha_raw=jnp.asarray(0.0, F32), gamma_raw=jnp.asarray(0.0, F32))

            def run(w_seqs):
                log, _ = run_generic_closed_loop_lanes(
                    s.system, s.aug, sys_c, cfg,
                    raw_nom=raw_nom, raw_aux_init=raw_aux,
                    x0=s.x0, target=s.target, w_seqs=w_seqs, eps=1e-4,
                    nom_compact_caps=nom_caps, aux_compact_caps=aux_caps,
                )
                return log.u_real, log.loss
        else:
            def run(w_seqs):
                log = run_paper_closed_loop_lanes(
                    s.system, s.aug, sys_c, s.cfg,
                    w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
                    x0=s.x0, target=s.target, w_seqs=w_seqs, eps=lane_eps,
                    barrier_type=lane_barrier,
                    nom_compact_caps=nom_caps, aux_compact_caps=aux_caps,
                )
                return log.u_real, log.loss

        w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(0), (B, H), dtype=jnp.float32)
        fn = jax.jit(run)
        args = (w_seqs,)
    else:
        def one(key):
            log = run_paper_closed_loop(
                s.system, s.aug, s.cfg,
                w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
                x0=s.x0, target=s.target, key=key,
            )
            return log.u_real, log.loss

        fn = jax.jit(jax.vmap(one))
        args = (jax.random.split(jax.random.PRNGKey(0), B),)

    out = fn(*args)  # compile + warmup
    jax.block_until_ready(out)

    times = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    elapsed = statistics.median(times)

    watchdog.cancel()
    solves = 2 * H * B
    solves_per_sec = solves / elapsed
    finite_frac = float(np.isfinite(np.asarray(out[1][:, -1])).mean())
    metric = f"tube_mpc_solves_per_sec_per_chip_{system_name}_T{N}"
    if mode != "paper":
        metric += "_" + mode
    print(json.dumps({
        "metric": metric,
        "value": round(solves_per_sec, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / REF_CPU_SOLVES_PER_SEC, 2),
        "finite_lane_frac": round(finite_frac, 4),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # tunnel death mid-run, compile failure, OOM, ...
        _emit_failure(f"{type(exc).__name__}: {exc}")
