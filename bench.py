"""Headline benchmark: tube-MPC solves/sec/chip on the Dubins paper workload (N=50).

Runs B independent adaptive closed loops (the full per-step pipeline: nominal iLQR +
ancillary iLQR + Algorithm-2 IFT gradient + projected momentum update + disturbed
step), vmapped on one chip in float32, and reports iLQR solves per second
(2 solves per closed-loop step per scenario, matching how BASELINE.md counts the
reference's work: tube_mpc.py:803-996 does 2 solves/step).

vs_baseline is measured against the PyTorch reference on this machine's CPU:
0.956 solves/sec (configs/dubins.yaml at H=20, float64, single thread — measured with
tools/measure_reference.py; see BASELINE.md).

Prints ONE JSON line.
"""
import json
import time

REF_CPU_SOLVES_PER_SEC = 0.956  # measured, see BASELINE.md / tools/measure_reference.py


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tube_mpc_tpu.presets import dubins_paper_setup
    from tube_mpc_tpu.tube.closed_loop import run_paper_closed_loop

    B = 128   # scenarios vmapped on the chip
    H = 16    # closed-loop steps per scenario (steady-state timing window)
    s = dubins_paper_setup(N=50, H=H, dtype=jnp.float32)

    def one(key):
        log = run_paper_closed_loop(
            s.system, s.aug, s.cfg,
            w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
            x0=s.x0, target=s.target, key=key,
        )
        return log.u_real, log.loss

    run = jax.jit(jax.vmap(one))
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    # compile + warmup
    u, loss = run(keys)
    jax.block_until_ready((u, loss))

    t0 = time.perf_counter()
    u, loss = run(keys)
    jax.block_until_ready((u, loss))
    elapsed = time.perf_counter() - t0

    solves = 2 * H * B
    solves_per_sec = solves / elapsed
    print(json.dumps({
        "metric": "tube_mpc_solves_per_sec_per_chip_dubins_T50",
        "value": round(solves_per_sec, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / REF_CPU_SOLVES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
