#!/usr/bin/env python
"""MFU/roofline analysis for the lane closed-loop pipeline (VERDICT r1 item 5).

The tube-MPC lane kernels are VPU-bound by design (all 4x4 algebra as elementwise
row ops; nothing MXU-shaped — ops/pallas/lane_solver.py docstring). This measures:

1. the chip's elementwise-FMA ceiling two ways: a SERIAL chain (dependency-bound —
   the recursions in our kernels look like this) and 8 INDEPENDENT chains (ILP —
   closer to the VPU's issue-rate peak);
2. FLOPs per solve, assembled from (a) arithmetic-op counts of the augmented step
   f̂ and its JVP taken from their jaxprs (exact for the dominant term) plus the
   closed-form Riccati/line-search algebra counted from the kernel structure, and
   (b) the MEASURED while_loop iteration counts on cold- and warm-started solves;
3. MFU = measured solve throughput x FLOPs/solve ÷ each ceiling.

NOTE: XLA's compiled cost_analysis cannot see inside Mosaic custom-calls, so it
reports only the XLA-glue FLOPs (~700/solve); it is printed for reference but the
hand-assembled count is the real numerator.

    python benchmarks/bench_roofline.py [--batch 16384]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ARITH = {
    "add", "sub", "mul", "div", "neg", "max", "min", "exp", "log", "tanh",
    "rsqrt", "sqrt", "integer_pow", "pow", "log1p", "expm1", "logistic",
    "sin", "cos", "abs", "sign", "floor", "select_n", "clamp",
}


def jaxpr_flops(fn, *args) -> int:
    """Count arithmetic primitives in fn's jaxpr (1 flop each; scalar rows)."""
    import jax

    jpr = jax.make_jaxpr(fn)(*args)

    def count(eqns):
        n = 0
        for eq in eqns:
            prim = eq.primitive.name
            if prim in ("pjit", "custom_jvp_call", "custom_vjp_call", "closed_call"):
                for v in eq.params.values():
                    if hasattr(v, "jaxpr"):
                        n += count(v.jaxpr.eqns)
                continue
            if prim in _ARITH:
                n += 1
        return n

    return count(jpr.jaxpr.eqns)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tube_mpc_tpu.ops.dbas import BarrierParams
    from tube_mpc_tpu.ops.lanes import dubins_components
    from tube_mpc_tpu.presets import PAPER_OBSTACLES, dubins_paper_setup
    from tube_mpc_tpu.tube.lane_closed_loop import run_paper_closed_loop_lanes
    from tube_mpc_tpu.tube.lane_interface import make_lane_problem, tube_ilqr_solve_lanes

    dev = jax.devices()[0]
    report = {"device": str(dev), "platform": dev.platform}

    # ---- 1. FMA ceilings ----
    size_r, size_c, K = 8, 64 * 1024, 2048
    a = jnp.full((size_r, size_c), 1.0000001, jnp.float32)
    b = jnp.full((size_r, size_c), 1e-7, jnp.float32)

    @jax.jit
    def serial_chain(y):
        def body(y, _):
            return y * a + b, None
        y, _ = jax.lax.scan(body, y, None, length=K)
        return y

    @jax.jit
    def ilp_chain(ys):
        def body(ys, _):
            return tuple(y * a + b for y in ys), None
        ys, _ = jax.lax.scan(body, ys, None, length=K)
        return ys

    def timed(fn, arg, flops):
        out = fn(arg)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn(arg)
        jax.block_until_ready(out)
        return flops / ((time.perf_counter() - t0) / 4)

    y0 = jnp.ones((size_r, size_c), jnp.float32)
    serial = timed(serial_chain, y0, 2.0 * size_r * size_c * K)
    ilp = timed(ilp_chain, tuple(jnp.ones((size_r, size_c), jnp.float32) + i
                                 for i in range(8)), 8 * 2.0 * size_r * size_c * K)
    report["fma_serial_gflops"] = round(serial / 1e9, 1)
    report["fma_ilp8_gflops"] = round(ilp / 1e9, 1)

    # ---- 2. FLOPs per solve ----
    N, nh, m, na = 50, 4, 2, 7
    s = dubins_paper_setup(N=N, H=args.steps, dtype=jnp.float32)
    sys_c = dubins_components(
        dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
        centers=PAPER_OBSTACLES, radii=[1.0] * len(PAPER_OBSTACLES),
        aggregation="smoothmin", beta=20.0,
    )
    pb = make_lane_problem(sys_c, eps=1e-4)
    xs = tuple(jnp.float32(v) for v in (0.3, 0.2, 0.5, 1.0))
    us = (jnp.float32(1.0), jnp.float32(0.2))
    bp = BarrierParams(alpha=jnp.float32(0.0), gamma=jnp.float32(0.0), tight=jnp.float32(0.0))

    f_hat_flops = jaxpr_flops(lambda x, u: pb.f_hat(x, u, bp), xs, us)
    jvp_flops = jaxpr_flops(
        lambda x, u, tx, tu: jax.jvp(lambda xx, uu: pb.f_hat(xx, uu, bp), (x, u), (tx, tu))[1],
        xs, us, xs, us,
    )
    # kernel algebra per lane per horizon step (ops/pallas/lane_solver.py):
    #   backward: (nh+m) basis-JVPs for the fused linearization + Q-blocks
    #   (VA/VB/Qxx/Qux/Quu ~ 2nh^3 + 4nh^2 m + ...) + 2x2 inverse + gains + V update
    bwd_algebra = (2 * nh**3 + 2 * nh**2 * m + 2 * nh * m**2 + 2 * nh**3  # Q blocks
                   + 25                                                    # 2x2 inverse
                   + 2 * m * (nh + 1) * m + 4 * nh * m + 2 * nh**2 * m)    # gains + V
    bwd_per_k = (nh + m) * jvp_flops + 4 * (nh + m) + bwd_algebra
    fwd_per_k_per_alpha = f_hat_flops + 2 * m * nh + 2 * m + 3 * (nh + m)
    per_iter = N * (bwd_per_k + na * fwd_per_k_per_alpha)
    # sensitivity sweep per closed-loop step (lane_sensitivity.py): one backward of
    # the same shape + one forward with a single JVP + accumulators
    sens_per_step = N * (bwd_per_k + jvp_flops + 6 * nh + 4 * m)

    # measured iteration counts: cold (zeros warm start) and warm (shifted plan)
    B = args.batch
    x0 = jnp.broadcast_to(jnp.asarray([0.0, 0.0, np.pi / 4, 0.05], jnp.float32), (B, nh))
    U0 = jnp.zeros((B, N, m), jnp.float32)
    tgt = jnp.broadcast_to(s.target[None, None], (B, N + 1, 3))
    Ur = jnp.zeros((B, N, m), jnp.float32)

    def solve_iters(U_init):
        _, U, it = tube_ilqr_solve_lanes(
            pb, s.cfg.nominal_ilqr(), w=s.w_nominal, bp=s.bp,
            x_hat0=x0, U_init=U_init, X_ref=tgt, U_ref=Ur, with_iters=True)
        return U, it

    solve_j = jax.jit(solve_iters)
    U_cold, it_cold = solve_j(U0)
    U_warm, it_warm = solve_j(jnp.concatenate([U_cold[:, 1:], U_cold[:, -1:]], axis=1))
    it_cold, it_warm = int(it_cold), int(it_warm)
    iters_est = it_warm  # steady-state closed loop runs warm-started solves

    flops_per_solve = iters_est * per_iter + sens_per_step / 2.0  # sens shared by 2 solves
    report["flops_model"] = {
        "f_hat_flops": f_hat_flops, "f_hat_jvp_flops": jvp_flops,
        "bwd_per_k": bwd_per_k, "fwd_per_k_per_alpha": fwd_per_k_per_alpha,
        "per_iteration": per_iter, "sensitivity_per_step": sens_per_step,
        "iters_cold": it_cold, "iters_warm": it_warm,
        "flops_per_solve_warm": round(flops_per_solve, 0),
    }

    # ---- 3. measured throughput -> MFU ----
    def run(w_seqs):
        log = run_paper_closed_loop_lanes(
            s.system, s.aug, sys_c, s.cfg,
            w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
            x0=s.x0, target=s.target, w_seqs=w_seqs, eps=1e-4,
        )
        return log.u_real, log.loss

    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(0), (B, args.steps), jnp.float32)
    fn = jax.jit(run)
    out = fn(w_seqs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(w_seqs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    solves_per_sec = 2 * args.steps * B / dt
    achieved = solves_per_sec * flops_per_solve
    report["closed_loop"] = {
        "batch": B, "steps": args.steps, "N": N,
        "solves_per_sec": round(solves_per_sec, 1),
        "achieved_gflops_modeled": round(achieved / 1e9, 1),
    }
    report["mfu_vs_serial_chain"] = round(achieved / serial, 3)
    report["mfu_vs_ilp8_chain"] = round(achieved / ilp, 3)

    txt = json.dumps(report, indent=2)
    print(txt)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(txt)


if __name__ == "__main__":
    main()
