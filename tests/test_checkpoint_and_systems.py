"""Checkpoint/resume bit-exactness + new system families (jacobians, closed loops)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tube_mpc_tpu.ops.costs import CostWeights
from tube_mpc_tpu.ops.dbas import BarrierParams, make_augmented
from tube_mpc_tpu.systems.cartpole import make_cartpole
from tube_mpc_tpu.systems.double_integrator import make_double_integrator
from tube_mpc_tpu.systems.obstacles import CircleField
from tube_mpc_tpu.systems.quadrotor2d import make_quadrotor2d
from tube_mpc_tpu.tube.closed_loop import ClosedLoopLog, TubeMPCConfig, run_paper_closed_loop
from tube_mpc_tpu.tube.params import AdaptConfig, AuxAdapt
from tube_mpc_tpu.utils.checkpoint import latest_checkpoint, run_paper_closed_loop_checkpointed

F64 = jnp.float64


def _di_setup(H=10, N=8):
    field = CircleField(
        centers=jnp.asarray([[4.0, 4.0]], dtype=F64), radii=jnp.asarray([1.0], dtype=F64)
    )
    system = make_double_integrator(obstacles=field, dtype=F64)
    aug = make_augmented(system, eps=1e-4)
    cfg = TubeMPCConfig(
        N=N, H=H, nominal_max_iter=4, aux_max_iter=4, tol=1e-3, reg=1e-6,
        alphas=(1.0, 0.5, 0.0), adapt=AdaptConfig(lr=1e-2, momentum=0.9),
    )
    kw = dict(
        w_nominal=CostWeights.create([1.0] * 4, [0.1] * 2, [100.0] * 4, 1.0, dtype=F64),
        aux_init=AuxAdapt(Q=jnp.ones(4, dtype=F64), R=jnp.ones(2, dtype=F64), qb=jnp.asarray(1.0, dtype=F64)),
        bp=BarrierParams.create(0.0, 0.0, 0.0, dtype=F64),
        x0=jnp.zeros(4, dtype=F64),
        target=jnp.asarray([10.0, 10.0, 0.0, 0.0], dtype=F64),
    )
    return system, aug, cfg, kw


class TestCheckpoint:
    def test_segmented_matches_monolithic_and_resumes(self, tmp_path):
        # segment_len divides H so only ONE scan length is compiled (a trailing
        # remainder segment would cost a second compile for no extra coverage)
        system, aug, cfg, kw = _di_setup(H=10)
        key = jax.random.PRNGKey(7)

        mono = run_paper_closed_loop(system, aug, cfg, key=key, **kw)

        d1 = str(tmp_path / "ck1")
        seg = run_paper_closed_loop_checkpointed(
            system, aug, cfg, key=key, ckpt_dir=d1, segment_len=5, **kw
        )
        np.testing.assert_array_equal(np.asarray(seg.u_real), np.asarray(mono.u_real))
        np.testing.assert_array_equal(np.asarray(seg.Q_hist), np.asarray(mono.Q_hist))

        # simulate a crash: delete the final checkpoint, resume from step 5
        for t in (10,):
            for p in (f"state_{t}.npz", f"logs_{t}.npz"):
                f = os.path.join(d1, p)
                if os.path.exists(f):
                    os.remove(f)
        assert latest_checkpoint(d1).endswith("state_5.npz")
        resumed = run_paper_closed_loop_checkpointed(
            system, aug, cfg, key=key, ckpt_dir=d1, segment_len=5, **kw
        )
        np.testing.assert_array_equal(np.asarray(resumed.u_real), np.asarray(mono.u_real))
        np.testing.assert_array_equal(np.asarray(resumed.loss), np.asarray(mono.loss))


class TestNewSystems:
    def test_double_integrator_jacobian(self):
        system, _, _, _ = _di_setup()
        x = jnp.asarray([1.0, 2.0, 0.3, -0.4], dtype=F64)
        u = jnp.asarray([0.5, -0.2], dtype=F64)
        A, B = system.f_jac(x, u)
        np.testing.assert_allclose(A, jax.jacfwd(system.f, 0)(x, u), rtol=1e-12)
        np.testing.assert_allclose(B, jax.jacfwd(system.f, 1)(x, u), rtol=1e-12)

    def test_quadrotor_jacobian(self):
        system = make_quadrotor2d(dtype=F64)
        x = jnp.asarray([1.0, 2.0, 0.3, -0.4, 0.2, 0.1], dtype=F64)
        u = jnp.asarray([3.0, 4.0], dtype=F64)
        A, B = system.f_jac(x, u)
        np.testing.assert_allclose(A, jax.jacfwd(system.f, 0)(x, u), rtol=1e-12, atol=1e-15)
        np.testing.assert_allclose(B, jax.jacfwd(system.f, 1)(x, u), rtol=1e-12, atol=1e-15)

    def test_cartpole_autodiff_jacobian_and_safety(self):
        system = make_cartpole(dtype=F64)
        jac = system.jacobians()
        x = jnp.asarray([0.1, 0.0, 2.8, 0.2], dtype=F64)
        u = jnp.asarray([1.5], dtype=F64)
        A, B = jac(x, u)
        assert A.shape == (4, 4) and B.shape == (4, 1)
        np.testing.assert_allclose(system.h_grad(x), jax.grad(lambda xx: system.h(xx))(x), rtol=1e-12)

    def test_di_closed_loop_reaches_toward_target(self):
        system, aug, cfg, kw = _di_setup(H=30, N=10)
        log = run_paper_closed_loop(system, aug, cfg, key=jax.random.PRNGKey(0), **kw)
        d0 = np.linalg.norm(np.asarray(kw["x0"][:2]) - np.asarray(kw["target"][:2]))
        dT = np.linalg.norm(np.asarray(log.x_real[-1][:2]) - np.asarray(kw["target"][:2]))
        assert dT < d0  # made progress
        assert np.all(np.isfinite(np.asarray(log.loss)))

    def test_quadrotor_closed_loop_smoke(self):
        field = CircleField(
            centers=jnp.asarray([[4.0, 4.0], [6.0, 2.0]], dtype=F64),
            radii=jnp.asarray([1.0, 1.0], dtype=F64),
        )
        system = make_quadrotor2d(obstacles=field, dtype=F64)
        aug = make_augmented(system, eps=1e-4)
        cfg = TubeMPCConfig(
            N=8, H=6, nominal_max_iter=4, aux_max_iter=4, tol=1e-3, reg=1e-4,
            alphas=(1.0, 0.5, 0.1, 0.0), adapt=AdaptConfig(lr=1e-3, momentum=0.9),
        )
        log = run_paper_closed_loop(
            system, aug, cfg,
            w_nominal=CostWeights.create([1.0] * 6, [0.1] * 2, [100.0] * 6, 1.0, dtype=F64),
            aux_init=AuxAdapt(Q=jnp.ones(6, dtype=F64), R=jnp.ones(2, dtype=F64), qb=jnp.asarray(1.0, dtype=F64)),
            bp=BarrierParams.create(0.0, 0.0, 0.0, dtype=F64),
            x0=jnp.zeros(6, dtype=F64),
            target=jnp.asarray([8.0, 8.0, 0.0, 0.0, 0.0, 0.0], dtype=F64),
            key=jax.random.PRNGKey(0),
        )
        assert np.all(np.isfinite(np.asarray(log.x_real)))

    def test_cartpole_closed_loop_smoke(self):
        system = make_cartpole(dtype=F64)
        aug = make_augmented(system, eps=1e-4)
        cfg = TubeMPCConfig(
            N=10, H=6, nominal_max_iter=5, aux_max_iter=5, tol=1e-3, reg=1e-4,
            alphas=(1.0, 0.5, 0.1, 0.0), adapt=AdaptConfig(lr=1e-4, momentum=0.9),
        )
        log = run_paper_closed_loop(
            system, aug, cfg,
            w_nominal=CostWeights.create([1.0, 0.1, 5.0, 0.1], [0.01], [10.0, 1.0, 50.0, 1.0], 0.1, dtype=F64),
            aux_init=AuxAdapt(Q=jnp.ones(4, dtype=F64), R=jnp.ones(1, dtype=F64), qb=jnp.asarray(0.1, dtype=F64)),
            bp=BarrierParams.create(0.0, 0.0, 0.0, dtype=F64),
            x0=jnp.asarray([0.0, 0.0, 3.0, 0.0], dtype=F64),
            target=jnp.zeros(4, dtype=F64),
            key=jax.random.PRNGKey(0),
        )
        assert np.all(np.isfinite(np.asarray(log.x_real)))


@pytest.mark.slow  # interpret-mode lane checkpoint runs: 1-7 min each
class TestLaneCheckpoint:
    def test_lane_checkpoint_resume_bit_exact(self, tmp_path):
        """Batched lane-engine checkpointing: kill after segment 2, resume, match the
        monolithic lane run bit-exactly (all [B, ...] carries incl. per-lane θ)."""
        import os

        from tube_mpc_tpu.ops.lanes import dubins_components
        from tube_mpc_tpu.presets import PAPER_OBSTACLES, dubins_paper_setup
        from tube_mpc_tpu.tube.lane_closed_loop import run_paper_closed_loop_lanes
        from tube_mpc_tpu.utils.checkpoint import (
            latest_checkpoint,
            run_paper_closed_loop_lanes_checkpointed,
        )

        s = dubins_paper_setup(N=6, H=7, dtype=F64, nominal_max_iter=3, aux_max_iter=3,
                               alphas=(1.0, 0.5, 0.0))
        sys_c = dubins_components(
            dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
            centers=PAPER_OBSTACLES, radii=[1.0] * 5, aggregation="smoothmin", beta=20.0,
        )
        B = 2
        w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(3), (B, s.cfg.H), dtype=F64)
        kw = dict(w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
                  x0=s.x0, target=s.target, w_seqs=w_seqs, eps=1e-4,
                  block_b=128, interpret=True)

        mono = run_paper_closed_loop_lanes(s.system, s.aug, sys_c, s.cfg, **kw)

        d1 = str(tmp_path / "ck")
        full = run_paper_closed_loop_lanes_checkpointed(
            s.system, s.aug, sys_c, s.cfg, ckpt_dir=d1, segment_len=3, **kw)
        # simulate a crash: drop the final checkpoints, resume from step 3
        for t in (6, 7):
            for p in (f"state_{t}.npz", f"logs_{t}.npz"):
                f = os.path.join(d1, p)
                if os.path.exists(f):
                    os.remove(f)
        assert latest_checkpoint(d1).endswith("state_3.npz")
        resumed = run_paper_closed_loop_lanes_checkpointed(
            s.system, s.aug, sys_c, s.cfg, ckpt_dir=d1, segment_len=3, **kw)

        for f in ClosedLoopLog._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(resumed, f)), np.asarray(getattr(full, f)), err_msg=f)
        # segmented vs monolithic: same scan body, ulp-level agreement
        np.testing.assert_allclose(np.asarray(full.u_real), np.asarray(mono.u_real),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(full.Q_hist), np.asarray(mono.Q_hist),
                                   rtol=1e-9, atol=1e-11)

    def test_lane_checkpoint_rejects_different_run(self, tmp_path):
        """Resuming with a different disturbance stream must fail loudly, not
        silently concatenate inconsistent logs (fingerprint via save_state extra=)."""
        import pytest

        from tube_mpc_tpu.ops.lanes import dubins_components
        from tube_mpc_tpu.presets import PAPER_OBSTACLES, dubins_paper_setup
        from tube_mpc_tpu.utils.checkpoint import run_paper_closed_loop_lanes_checkpointed

        s = dubins_paper_setup(N=5, H=4, dtype=F64, nominal_max_iter=2, aux_max_iter=2,
                               alphas=(1.0, 0.0))
        sys_c = dubins_components(
            dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
            centers=PAPER_OBSTACLES, radii=[1.0] * 5, aggregation="smoothmin", beta=20.0,
        )
        B = 2
        kw = dict(w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
                  x0=s.x0, target=s.target, eps=1e-4, block_b=128, interpret=True)
        d = str(tmp_path / "ck")
        w1 = s.system.sample_disturbance(jax.random.PRNGKey(0), (B, s.cfg.H), dtype=F64)
        run_paper_closed_loop_lanes_checkpointed(
            s.system, s.aug, sys_c, s.cfg, ckpt_dir=d, segment_len=2, w_seqs=w1, **kw)
        w2 = s.system.sample_disturbance(jax.random.PRNGKey(9), (B, s.cfg.H), dtype=F64)
        with pytest.raises(ValueError, match="different run"):
            run_paper_closed_loop_lanes_checkpointed(
                s.system, s.aug, sys_c, s.cfg, ckpt_dir=d, segment_len=2, w_seqs=w2, **kw)

    def test_generic_lane_checkpoint_resume_bit_exact(self, tmp_path):
        """Generic/coupled lane-engine checkpointing (both raw θ sets + momentum in
        the carry): crash after segment 1, resume, match the monolithic run."""
        import os

        from tube_mpc_tpu.ops.lanes import dubins_components
        from tube_mpc_tpu.presets import PAPER_OBSTACLES, dubins_paper_setup
        from tube_mpc_tpu.tube.closed_loop import TubeMPCConfig
        from tube_mpc_tpu.tube.lane_closed_loop import run_generic_closed_loop_lanes
        from tube_mpc_tpu.tube.params import AdaptConfig, RawAuxTheta, RawNominalTheta
        from tube_mpc_tpu.utils.checkpoint import (
            latest_checkpoint,
            run_generic_closed_loop_lanes_checkpointed,
        )

        s = dubins_paper_setup(N=5, H=5, dtype=F64)
        sys_c = dubins_components(
            dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
            centers=PAPER_OBSTACLES, radii=[1.0] * 5, aggregation="smoothmin", beta=20.0,
        )
        cfg = TubeMPCConfig(
            N=5, H=5, nominal_max_iter=3, aux_max_iter=3, tol=1e-6, reg=1e-6,
            alphas=(1.0, 0.5, 0.0),
            adapt=AdaptConfig(lr=5e-2, momentum=0.9, steps=1, project=True),
            adapt_nominal=True, adapt_ancillary=True,
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
        B = 2
        w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(7), (B, cfg.H), dtype=F64)
        kw = dict(raw_nom=raw_nom, raw_aux_init=raw_aux, x0=s.x0, target=s.target,
                  w_seqs=w_seqs, eps=1e-4, block_b=128, interpret=True)

        mono, (mono_aux, mono_nom) = run_generic_closed_loop_lanes(
            s.system, s.aug, sys_c, cfg, **kw)

        d1 = str(tmp_path / "ck")
        full, (full_aux, full_nom) = run_generic_closed_loop_lanes_checkpointed(
            s.system, s.aug, sys_c, cfg, ckpt_dir=d1, segment_len=2, **kw)
        for t in (4, 5):
            for p in (f"state_{t}.npz", f"logs_{t}.npz"):
                f = os.path.join(d1, p)
                if os.path.exists(f):
                    os.remove(f)
        assert latest_checkpoint(d1).endswith("state_2.npz")
        resumed, (res_aux, res_nom) = run_generic_closed_loop_lanes_checkpointed(
            s.system, s.aug, sys_c, cfg, ckpt_dir=d1, segment_len=2, **kw)

        for f in ClosedLoopLog._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(resumed, f)), np.asarray(getattr(full, f)), err_msg=f)
        for a, b in ((res_aux, full_aux), (res_nom, full_nom)):
            for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        # segmented vs monolithic: same scan body, ulp-level agreement (θ̄ moved too)
        np.testing.assert_allclose(np.asarray(full.u_real), np.asarray(mono.u_real),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(full.x_bar), np.asarray(mono.x_bar),
                                   rtol=1e-9, atol=1e-11)
        for la, lb in zip(jax.tree.leaves(full_nom), jax.tree.leaves(mono_nom)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-9, atol=1e-11)
