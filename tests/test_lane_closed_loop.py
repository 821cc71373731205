"""Lane closed loop vs the per-sample scan driver: same disturbances -> same logs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tube_mpc_tpu.ops.dbas import make_augmented
from tube_mpc_tpu.ops.lanes import dubins_components
from tube_mpc_tpu.presets import dubins_paper_setup, PAPER_OBSTACLES
from tube_mpc_tpu.tube.closed_loop import run_paper_closed_loop
from tube_mpc_tpu.tube.lane_closed_loop import run_paper_closed_loop_lanes

F64 = jnp.float64


@pytest.mark.slow  # interpret-mode lane closed loops, 60-90s
def test_lane_closed_loop_matches_reference_driver():
    s = dubins_paper_setup(N=8, H=5, dtype=F64, nominal_max_iter=4, aux_max_iter=4,
                           alphas=(1.0, 0.5, 0.1, 0.0))
    sys_c = dubins_components(
        dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
        centers=PAPER_OBSTACLES, radii=[1.0] * 5, aggregation="smoothmin", beta=20.0,
    )
    B = 3
    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(0), (B, s.cfg.H), dtype=F64)

    lane = run_paper_closed_loop_lanes(
        s.system, s.aug, sys_c, s.cfg,
        w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
        x0=s.x0, target=s.target, w_seqs=w_seqs,
        eps=1e-4, block_b=128, interpret=True,
    )

    per_sample = jax.vmap(
        lambda w: run_paper_closed_loop(
            s.system, s.aug, s.cfg,
            w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
            x0=s.x0, target=s.target, w_seq=w,
        )
    )(w_seqs)

    # The lane kernel and the XLA driver are numerically equivalent, not bitwise:
    # the XLA Riccati carries a scaled V (overflow guard, solvers/ilqr.py) while the
    # lane kernel keeps the plain carry, so near-zero controls can differ at ~1e-8.
    np.testing.assert_allclose(np.asarray(lane.u_real), np.asarray(per_sample.u_real), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lane.x_real), np.asarray(per_sample.x_real), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lane.loss), np.asarray(per_sample.loss), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lane.Q_hist), np.asarray(per_sample.Q_hist), rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(np.asarray(lane.R_hist), np.asarray(per_sample.R_hist), rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(np.asarray(lane.qb_hist), np.asarray(per_sample.qb_hist), rtol=1e-8, atol=1e-11)


@pytest.mark.slow  # interpret-mode lane closed loops, 60-90s
def test_lane_population_mode_runs():
    s = dubins_paper_setup(N=6, H=3, dtype=F64, nominal_max_iter=3, aux_max_iter=3,
                           alphas=(1.0, 0.5, 0.0))
    sys_c = dubins_components(
        dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
        centers=PAPER_OBSTACLES, radii=[1.0] * 5, aggregation="smoothmin", beta=20.0,
    )
    B = 4
    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(1), (B, s.cfg.H), dtype=F64)
    log = run_paper_closed_loop_lanes(
        s.system, s.aug, sys_c, s.cfg,
        w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
        x0=s.x0, target=s.target, w_seqs=w_seqs,
        eps=1e-4, block_b=128, interpret=True, population=True,
    )
    assert np.all(np.isfinite(np.asarray(log.loss)))
    # shared θ: identical across lanes
    np.testing.assert_allclose(np.asarray(log.Q_hist[0]), np.asarray(log.Q_hist[-1]))
