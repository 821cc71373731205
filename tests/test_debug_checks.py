"""In-scan located numeric diagnostics (reference ``_ensure_finite``,
``tube_mpc.py:786-801`` / ``ddp.py:138-159``): with debug_checks armed and the loop
run under utils.debug.run_checked, a poisoned run must raise naming the FIRST
failing pipeline phase — not just "NaN somewhere".
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tube_mpc_tpu.presets import dubins_paper_setup
from tube_mpc_tpu.tube.closed_loop import run_paper_closed_loop
from tube_mpc_tpu.utils.debug import run_checked

F64 = jnp.float64


def _loop(s, w_seq):
    return run_paper_closed_loop(
        s.system, s.aug, s.cfg,
        w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
        x0=s.x0, target=s.target, w_seq=w_seq, debug_checks=True,
    )


def test_clean_run_passes_checks():
    s = dubins_paper_setup(N=5, H=3, dtype=F64, nominal_max_iter=2, aux_max_iter=2,
                           alphas=(1.0, 0.0))
    w_seq = s.system.sample_disturbance(jax.random.PRNGKey(0), (s.cfg.H,), dtype=F64)
    log = run_checked(lambda w: _loop(s, w), w_seq)
    assert np.all(np.isfinite(np.asarray(log.u_real)))


def test_poisoned_run_names_failing_phase():
    """An inf disturbance at step 0 corrupts the real state; the ancillary solve is
    the first phase that consumes it, so the located error must name phase B."""
    s = dubins_paper_setup(N=5, H=3, dtype=F64, nominal_max_iter=2, aux_max_iter=2,
                           alphas=(1.0, 0.0))
    w_seq = s.system.sample_disturbance(jax.random.PRNGKey(0), (s.cfg.H,), dtype=F64)
    w_seq = w_seq.at[0, 0].set(jnp.inf)
    with pytest.raises(Exception, match=r"phase B: ancillary iLQR solve"):
        run_checked(lambda w: _loop(s, w), w_seq)


def test_generic_path_checks_smoke():
    """Generic path with debug_checks on: clean run compiles + passes under
    run_checked (pins the checkify transform through the custom_vjp solves)."""
    from tube_mpc_tpu.tube.closed_loop import TubeMPCConfig, run_generic_closed_loop
    from tube_mpc_tpu.tube.params import AdaptConfig, RawAuxTheta, RawNominalTheta

    s = dubins_paper_setup(N=5, H=2, dtype=F64)
    cfg = TubeMPCConfig(
        N=5, H=2, nominal_max_iter=2, aux_max_iter=2, tol=1e-6, reg=1e-6,
        alphas=(1.0, 0.0), adapt=AdaptConfig(lr=5e-2, momentum=0.9),
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
    w_seq = s.system.sample_disturbance(jax.random.PRNGKey(0), (cfg.H,), dtype=F64)
    log, _ = run_checked(
        lambda w: run_generic_closed_loop(
            s.system, s.aug, cfg,
            raw_nom_init=raw_nom, raw_aux_init=raw_aux,
            x0=s.x0, target=s.target, w_seq=w, debug_checks=True,
        ), w_seq)
    assert np.all(np.isfinite(np.asarray(log.u_real)))
