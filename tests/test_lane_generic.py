"""Generic-path lane engine vs the XLA scan driver: same disturbances -> same logs.

The lane engine computes the full generic IFT gradient (separate Qf, and the barrier
dynamics parameters α/γ via the Σ δλᵀ ∂f̂/∂θ term) in fused Pallas kernels; the XLA
driver gets the same numbers from the diff-iLQR custom_vjp + ift_accumulate. Equality
of the adapted-parameter histories therefore pins the whole generic kernel pipeline
(value-function emission, δλ reconstruction, chain rule to raws, projection).
"""
import jax
import jax.numpy as jnp
import numpy as np

from tube_mpc_tpu.ops.lanes import dubins_components
from tube_mpc_tpu.presets import PAPER_OBSTACLES, dubins_paper_setup
from tube_mpc_tpu.tube.closed_loop import TubeMPCConfig, run_generic_closed_loop
from tube_mpc_tpu.tube.lane_closed_loop import run_generic_closed_loop_lanes
from tube_mpc_tpu.tube.params import AdaptConfig, RawAuxTheta, RawNominalTheta
import pytest

F64 = jnp.float64



pytestmark = pytest.mark.slow  # interpret-mode lane+XLA closed-loop parity: ~1.5-2 min/test on this host


def _setup(N=8, H=5):
    s = dubins_paper_setup(N=N, H=H, dtype=F64)
    sys_c = dubins_components(
        dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
        centers=PAPER_OBSTACLES, radii=[1.0] * 5, aggregation="smoothmin", beta=20.0,
    )
    cfg = TubeMPCConfig(
        N=N, H=H,
        nominal_max_iter=4, aux_max_iter=4,
        tol=1e-6, reg=1e-6, alphas=(1.0, 0.5, 0.1, 0.0),
        adapt=AdaptConfig(lr=5e-2, momentum=0.9, steps=1, project=True),
        adapt_nominal=False, adapt_ancillary=True,
    )
    raw_nom = RawNominalTheta(
        Q_raw=jnp.asarray([1.0, 1.0, 0.0], dtype=F64),
        R_raw=jnp.asarray([1.0, 1.0], dtype=F64),
        Qf_raw=jnp.asarray([100.0] * 3, dtype=F64),
        qb_raw=jnp.asarray(1.0, dtype=F64),
        alpha_raw=jnp.asarray(0.01, dtype=F64),
        gamma_raw=jnp.asarray(0.1, dtype=F64),
        tight_raw=jnp.asarray(0.02, dtype=F64),
    )
    raw_aux = RawAuxTheta(
        Q_raw=jnp.asarray([1.0, 1.0, 0.5], dtype=F64),
        R_raw=jnp.asarray([1.0, 1.0], dtype=F64),
        Qf_raw=jnp.asarray([2.0, 2.0, 1.0], dtype=F64),
        qb_raw=jnp.asarray(1.0, dtype=F64),
        alpha_raw=jnp.asarray(0.5, dtype=F64),
        gamma_raw=jnp.asarray(0.2, dtype=F64),
    )
    # start NEAR an obstacle (h(x0) = 0.8^2 + 1 - 1 = 0.64 < alpha ~ 0.97) so the
    # barrier's quadratic-extension branch is active and the alpha/gamma dynamics
    # gradients are nonzero — otherwise dB/dalpha = 0 on the 1/h branch and the
    # parity test would not exercise the dynamics IFT term.
    x0 = jnp.asarray([3.2, 1.0, np.pi / 4], dtype=F64)
    return s, sys_c, cfg, raw_nom, raw_aux, x0


def test_generic_lane_closed_loop_matches_xla_driver():
    s, sys_c, cfg, raw_nom, raw_aux, x0 = _setup()
    B = 3
    eps = 1e-4
    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(0), (B, cfg.H), dtype=F64)

    lane, (raw_final, _) = run_generic_closed_loop_lanes(
        s.system, s.aug, sys_c, cfg,
        raw_nom=raw_nom, raw_aux_init=raw_aux,
        x0=x0, target=s.target, w_seqs=w_seqs,
        eps=eps, block_b=128, interpret=True,
    )

    from tube_mpc_tpu.ops.dbas import make_augmented
    aug = make_augmented(s.system, barrier_type="inverse", eps=eps)
    per_sample = jax.vmap(
        lambda w: run_generic_closed_loop(
            s.system, aug, cfg,
            raw_nom_init=raw_nom, raw_aux_init=raw_aux,
            x0=x0, target=s.target, w_seq=w,
        )[0]
    )(w_seqs)

    np.testing.assert_allclose(np.asarray(lane.u_real), np.asarray(per_sample.u_real), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lane.x_real), np.asarray(per_sample.x_real), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lane.x_bar), np.asarray(per_sample.x_bar), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lane.loss), np.asarray(per_sample.loss), rtol=1e-7, atol=1e-8)
    # adapted parameter histories: pins the full generic gradient (Q, R, Qf, qb, α, γ)
    np.testing.assert_allclose(np.asarray(lane.Q_hist), np.asarray(per_sample.Q_hist), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(lane.R_hist), np.asarray(per_sample.R_hist), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(lane.qb_hist), np.asarray(per_sample.qb_hist), rtol=1e-7, atol=1e-10)
    assert np.all(np.isfinite(np.asarray(raw_final.alpha_raw)))


def test_generic_lane_adapts_barrier_params():
    """α/γ must actually move (their gradients flow through the dynamics term)."""
    s, sys_c, cfg, raw_nom, raw_aux, x0 = _setup(N=6, H=4)
    B = 2
    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(1), (B, cfg.H), dtype=F64)
    _, (raw_final, _) = run_generic_closed_loop_lanes(
        s.system, s.aug, sys_c, cfg,
        raw_nom=raw_nom, raw_aux_init=raw_aux,
        x0=x0, target=s.target, w_seqs=w_seqs,
        eps=1e-4, block_b=128, interpret=True,
    )
    assert np.max(np.abs(np.asarray(raw_final.alpha_raw) - float(raw_aux.alpha_raw))) > 0
    assert np.max(np.abs(np.asarray(raw_final.gamma_raw) - float(raw_aux.gamma_raw))) > 0


def test_generic_lane_steps2_matches_xla_driver():
    """adaptation.steps=2 (the reference's inner fixed-trajectory re-gradient loop,
    tube_mpc.py:407-604) on the lane kernels vs the XLA make_ift_regrad driver —
    iteration 2 reruns the sensitivity kernels with the UPDATED θ Hessians and
    barrier params on the same trajectories; θ histories pin the whole loop."""
    import dataclasses

    s, sys_c, cfg, raw_nom, raw_aux, x0 = _setup(N=6, H=4)
    cfg = dataclasses.replace(
        cfg, adapt=dataclasses.replace(cfg.adapt, steps=2))
    B = 2
    eps = 1e-4
    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(4), (B, cfg.H), dtype=F64)

    lane, (raw_final, _) = run_generic_closed_loop_lanes(
        s.system, s.aug, sys_c, cfg,
        raw_nom=raw_nom, raw_aux_init=raw_aux,
        x0=x0, target=s.target, w_seqs=w_seqs,
        eps=eps, block_b=128, interpret=True,
    )

    from tube_mpc_tpu.ops.dbas import make_augmented
    aug = make_augmented(s.system, barrier_type="inverse", eps=eps)
    per_sample = jax.vmap(
        lambda w: run_generic_closed_loop(
            s.system, aug, cfg,
            raw_nom_init=raw_nom, raw_aux_init=raw_aux,
            x0=x0, target=s.target, w_seq=w,
        )[0]
    )(w_seqs)

    np.testing.assert_allclose(np.asarray(lane.u_real), np.asarray(per_sample.u_real), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lane.x_real), np.asarray(per_sample.x_real), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lane.Q_hist), np.asarray(per_sample.Q_hist), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(lane.R_hist), np.asarray(per_sample.R_hist), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(lane.qb_hist), np.asarray(per_sample.qb_hist), rtol=1e-7, atol=1e-10)
    assert np.all(np.isfinite(np.asarray(raw_final.alpha_raw)))


def test_coupled_steps2_lane_closed_loop_matches_xla_driver():
    """steps=2 WITH the coupled bilevel chain: both raw parameter sets re-gradient
    at fixed trajectories per inner iteration."""
    import dataclasses

    s, sys_c, cfg, raw_nom, raw_aux, x0 = _setup(N=6, H=3)
    cfg = dataclasses.replace(
        cfg, adapt_nominal=True, nominal_max_iter=3, aux_max_iter=3,
        adapt=dataclasses.replace(cfg.adapt, steps=2))
    B = 2
    eps = 1e-4
    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(5), (B, cfg.H), dtype=F64)

    lane, (_, raw_nom_f) = run_generic_closed_loop_lanes(
        s.system, s.aug, sys_c, cfg,
        raw_nom=raw_nom, raw_aux_init=raw_aux,
        x0=x0, target=s.target, w_seqs=w_seqs,
        eps=eps, block_b=128, interpret=True,
    )

    from tube_mpc_tpu.ops.dbas import make_augmented
    aug = make_augmented(s.system, barrier_type="inverse", eps=eps)
    per_sample = jax.vmap(
        lambda w: run_generic_closed_loop(
            s.system, aug, cfg,
            raw_nom_init=raw_nom, raw_aux_init=raw_aux,
            x0=x0, target=s.target, w_seq=w,
        )[0]
    )(w_seqs)

    np.testing.assert_allclose(np.asarray(lane.u_real), np.asarray(per_sample.u_real), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lane.x_bar), np.asarray(per_sample.x_bar), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lane.Q_hist), np.asarray(per_sample.Q_hist), rtol=1e-7, atol=1e-10)
    assert np.max(np.abs(np.asarray(raw_nom_f.Q_raw) - np.asarray(raw_nom.Q_raw))) > 0


def test_coupled_lane_closed_loop_matches_xla_driver():
    """COUPLED bilevel (adapt_nominal=True) on the lane kernels vs the XLA
    custom_vjp driver: the aux sweep's reference-cotangents feed a second nominal
    sweep whose full θ̄ gradient (incl. α/γ/tight dynamics terms) updates the
    per-lane nominal raws — x_bar/u_bar equality across steps pins the chain."""
    import dataclasses

    s, sys_c, cfg, raw_nom, raw_aux, x0 = _setup(N=6, H=4)
    cfg = dataclasses.replace(cfg, adapt_nominal=True, nominal_max_iter=3, aux_max_iter=3)
    B = 2
    eps = 1e-4
    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(2), (B, cfg.H), dtype=F64)

    lane, (raw_aux_f, raw_nom_f) = run_generic_closed_loop_lanes(
        s.system, s.aug, sys_c, cfg,
        raw_nom=raw_nom, raw_aux_init=raw_aux,
        x0=x0, target=s.target, w_seqs=w_seqs,
        eps=eps, block_b=128, interpret=True,
    )

    from tube_mpc_tpu.ops.dbas import make_augmented
    aug = make_augmented(s.system, barrier_type="inverse", eps=eps)
    per_sample = jax.vmap(
        lambda w: run_generic_closed_loop(
            s.system, aug, cfg,
            raw_nom_init=raw_nom, raw_aux_init=raw_aux,
            x0=x0, target=s.target, w_seq=w,
        )[0]
    )(w_seqs)

    np.testing.assert_allclose(np.asarray(lane.u_real), np.asarray(per_sample.u_real), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lane.x_real), np.asarray(per_sample.x_real), rtol=1e-7, atol=1e-8)
    # the coupled chain moves θ̄ — the nominal trajectory history pins it
    np.testing.assert_allclose(np.asarray(lane.x_bar), np.asarray(per_sample.x_bar), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lane.u_bar), np.asarray(per_sample.u_bar), rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(lane.Q_hist), np.asarray(per_sample.Q_hist), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(lane.R_hist), np.asarray(per_sample.R_hist), rtol=1e-7, atol=1e-10)
    # θ̄ actually moved
    assert np.max(np.abs(np.asarray(raw_nom_f.Q_raw) - np.asarray(raw_nom.Q_raw))) > 0
    assert np.max(np.abs(np.asarray(raw_nom_f.tight_raw) - float(raw_nom.tight_raw))) > 0


def test_coupled_full_lane_closed_loop_matches_xla_driver():
    """coupling="full" (explicit ∂L/∂x̄ term added to the reference-cotangents) on
    the lane kernels vs the XLA driver — pins the sign/placement of the `expl`
    term in lane_closed_loop.py, which no other test exercises on the lane path."""
    import dataclasses

    s, sys_c, cfg, raw_nom, raw_aux, x0 = _setup(N=6, H=4)
    cfg = dataclasses.replace(cfg, adapt_nominal=True, coupling="full",
                              nominal_max_iter=3, aux_max_iter=3)
    B = 2
    eps = 1e-4
    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(3), (B, cfg.H), dtype=F64)

    lane, (_raw_aux_f, raw_nom_f) = run_generic_closed_loop_lanes(
        s.system, s.aug, sys_c, cfg,
        raw_nom=raw_nom, raw_aux_init=raw_aux,
        x0=x0, target=s.target, w_seqs=w_seqs,
        eps=eps, block_b=128, interpret=True,
    )

    from tube_mpc_tpu.ops.dbas import make_augmented
    aug = make_augmented(s.system, barrier_type="inverse", eps=eps)
    per_sample = jax.vmap(
        lambda w: run_generic_closed_loop(
            s.system, aug, cfg,
            raw_nom_init=raw_nom, raw_aux_init=raw_aux,
            x0=x0, target=s.target, w_seq=w,
        )[0]
    )(w_seqs)

    np.testing.assert_allclose(np.asarray(lane.u_real), np.asarray(per_sample.u_real), rtol=1e-7, atol=1e-8)
    # θ̄ histories diverge from coupling="reference" if and only if the expl term
    # lands with the right sign on the right rows — x_bar/u_bar pin it
    np.testing.assert_allclose(np.asarray(lane.x_bar), np.asarray(per_sample.x_bar), rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(lane.u_bar), np.asarray(per_sample.u_bar), rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(lane.Q_hist), np.asarray(per_sample.Q_hist), rtol=1e-7, atol=1e-10)
    assert np.max(np.abs(np.asarray(raw_nom_f.Q_raw) - np.asarray(raw_nom.Q_raw))) > 0
