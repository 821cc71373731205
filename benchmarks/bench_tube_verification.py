"""Production-scale Monte-Carlo tube verification on one chip.

The reference validates its tube empirically with ONE trajectory per run
(tube_mpc.py:251). Here we push the batched engine (parallel/scenarios.py) to
fleet scale: B i.i.d. disturbance realizations of the full closed loop — nominal
solve + frozen-weight ancillary tracking per step — in one vmapped program on the
lane-feasible XLA path, reporting tube statistics and scenario throughput.

    python benchmarks/bench_tube_verification.py          # B=4096, H=32, N=50
    BENCH_B=16384 BENCH_H=16 python benchmarks/bench_tube_verification.py

Prints one JSON line per run.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    from tube_mpc_tpu.ops.costs import CostWeights
    from tube_mpc_tpu.parallel.scenarios import tube_verification
    from tube_mpc_tpu.presets import dubins_paper_setup
    from tube_mpc_tpu.systems.obstacles import CircleField, h_min
    from tube_mpc_tpu.presets import PAPER_OBSTACLES

    B = int(os.environ.get("BENCH_B", 65536))
    H = int(os.environ.get("BENCH_H", 32))
    engine = os.environ.get("BENCH_ENGINE", "lanes")
    s = dubins_paper_setup(N=50, H=H, dtype=jnp.float32)
    sys_c = None
    if engine == "lanes":
        from tube_mpc_tpu.ops.lanes import dubins_components

        sys_c = dubins_components(
            dt=0.01, v_min=-10.0, v_max=10.0, omega_max=3.141592653589793,
            centers=PAPER_OBSTACLES, radii=[1.0] * len(PAPER_OBSTACLES),
            aggregation="smoothmin", beta=20.0,
        )
    field = CircleField(
        centers=jnp.asarray([list(c) for c in PAPER_OBSTACLES], dtype=jnp.float32),
        radii=jnp.ones((len(PAPER_OBSTACLES),), dtype=jnp.float32),
    )
    w_aux = CostWeights.create([1.0, 1.0, 1.0], [1.0, 1.0], [1.0] * 3, 1.0, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    run = jax.jit(lambda ks: tube_verification(
        s.system, s.aug, s.cfg, w_nominal=s.w_nominal, w_aux=w_aux, bp=s.bp,
        x0=s.x0, target=s.target, keys=ks, h_exact=lambda x: h_min(x, field),
        sys_c=sys_c,
    ))
    logs, stats = run(keys)          # compile + warmup
    jax.block_until_ready(stats)
    t0 = time.perf_counter()
    logs, stats = run(keys)
    jax.block_until_ready(stats)
    el = time.perf_counter() - t0

    print(json.dumps({
        "metric": "tube_verification_scenarios_per_sec",
        "engine": engine,
        "B": B, "H": H, "N": 50,
        "value": round(B / el, 1),
        "unit": "full-closed-loop scenarios/s",
        "wall_s": round(el, 3),
        "max_deviation": float(stats.max_deviation),
        "p99_deviation": float(jnp.quantile(stats.deviations, 0.99)),
        "min_safety_margin": float(stats.min_safety),
        "collision_rate": float(stats.collision_rate),
    }))


if __name__ == "__main__":
    main()
