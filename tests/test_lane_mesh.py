"""Flagship lane engine on the virtual 8-device CPU mesh (interpret-mode kernels).

Pins the multi-chip behavior of the deployment path (VERDICT r2 weak #3): the
shard_map'd lane closed loop must equal the single-device lane driver exactly —
independent mode (trivially parallel, stresses lane-block padding vs shard sizes)
and population mode (shared θ synced by an in-scan psum of the finite-masked
gradient). Mirrors tests/test_parallel.py's XLA-path mesh invariant.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tube_mpc_tpu.ops.lanes import dubins_components
from tube_mpc_tpu.parallel.mesh import make_mesh
from tube_mpc_tpu.presets import PAPER_OBSTACLES, dubins_paper_setup
from tube_mpc_tpu.tube.closed_loop import ClosedLoopLog
from tube_mpc_tpu.tube.lane_closed_loop import (
    run_paper_closed_loop_lanes,
    run_paper_closed_loop_lanes_sharded,
)

F64 = jnp.float64



pytestmark = pytest.mark.slow  # 8-virtual-device interpret-mode lane runs: 3-8 min/test on this host


def _setup(N=5, H=4):
    s = dubins_paper_setup(N=N, H=H, dtype=F64, nominal_max_iter=3, aux_max_iter=3,
                           alphas=(1.0, 0.5, 0.0))
    sys_c = dubins_components(
        dt=0.01, v_min=-10.0, v_max=10.0, omega_max=float(np.pi),
        centers=PAPER_OBSTACLES, radii=[1.0] * 5, aggregation="smoothmin", beta=20.0,
    )
    return s, sys_c


@pytest.mark.parametrize("B,block_b", [(24, 8), (16, 128)])
def test_lane_mesh_independent_matches_single_device(B, block_b):
    """Per-lane θ adaptation sharded over 8 devices == single device, including the
    uneven case where the per-device batch (3) is smaller than the lane block (8)."""
    s, sys_c = _setup()
    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(0), (B, s.cfg.H), dtype=F64)
    kw = dict(w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
              x0=s.x0, target=s.target, w_seqs=w_seqs, eps=1e-4,
              block_b=block_b, interpret=True)

    single = run_paper_closed_loop_lanes(s.system, s.aug, sys_c, s.cfg, **kw)
    mesh = make_mesh()
    assert mesh.size == 8
    sharded = run_paper_closed_loop_lanes_sharded(
        s.system, s.aug, sys_c, s.cfg, mesh=mesh, **kw)

    for f in ClosedLoopLog._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(sharded, f)), np.asarray(getattr(single, f)),
            rtol=1e-10, atol=1e-12, err_msg=f)


def test_lane_mesh_population_matches_single_device():
    """Shared-θ population mode: the psum'd global gradient mean must reproduce the
    single-device batch mean bit-for-bit at f64 tolerance; θ history pins it."""
    s, sys_c = _setup()
    B = 16
    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(1), (B, s.cfg.H), dtype=F64)
    kw = dict(w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
              x0=s.x0, target=s.target, w_seqs=w_seqs, eps=1e-4,
              population=True, block_b=8, interpret=True)

    single = run_paper_closed_loop_lanes(s.system, s.aug, sys_c, s.cfg, **kw)
    mesh = make_mesh()
    sharded = run_paper_closed_loop_lanes_sharded(
        s.system, s.aug, sys_c, s.cfg, mesh=mesh, **kw)

    np.testing.assert_allclose(np.asarray(sharded.Q_hist), np.asarray(single.Q_hist),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sharded.R_hist), np.asarray(single.R_hist),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sharded.u_real), np.asarray(single.u_real),
                               rtol=1e-10, atol=1e-12)
    # θ actually moved (otherwise the sync invariant is vacuous)
    assert np.max(np.abs(np.asarray(sharded.Q_hist[:, -1])
                         - np.asarray(s.aux_init.Q))) > 0


@pytest.mark.parametrize("population", [False, True])
def test_lane_mesh_checkpoint_resume_bit_exact(tmp_path, population):
    """Sharded AND resumable (VERDICT r3 item 6): the segmented shard_map'd lane
    driver must equal the monolithic sharded driver, and a killed sweep must
    resume bit-exactly from the last segment boundary on the same 8-device mesh."""
    import os

    from tube_mpc_tpu.utils.checkpoint import (
        latest_checkpoint,
        run_paper_closed_loop_lanes_sharded_checkpointed,
    )

    s, sys_c = _setup()
    B = 16
    w_seqs = s.system.sample_disturbance(jax.random.PRNGKey(2), (B, s.cfg.H), dtype=F64)
    kw = dict(w_nominal=s.w_nominal, aux_init=s.aux_init, bp=s.bp,
              x0=s.x0, target=s.target, w_seqs=w_seqs, eps=1e-4,
              population=population, block_b=8, interpret=True)
    mesh = make_mesh()
    assert mesh.size == 8

    mono = run_paper_closed_loop_lanes_sharded(
        s.system, s.aug, sys_c, s.cfg, mesh=mesh, **kw)

    d1 = str(tmp_path / "ck")
    full = run_paper_closed_loop_lanes_sharded_checkpointed(
        s.system, s.aug, sys_c, s.cfg, mesh=mesh, ckpt_dir=d1, segment_len=2, **kw)
    # segmented vs monolithic sharded: same scan body per segment
    for f in ClosedLoopLog._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(full, f)), np.asarray(getattr(mono, f)),
            rtol=1e-9, atol=1e-11, err_msg=f)

    # simulate a crash: drop the final checkpoint, resume from step 2
    for t in (4,):
        for p in (f"state_{t}.npz", f"logs_{t}.npz", f"state_{t}.npz.meta.json"):
            fpath = os.path.join(d1, p)
            if os.path.exists(fpath):
                os.remove(fpath)
    assert latest_checkpoint(d1).endswith("state_2.npz")
    resumed = run_paper_closed_loop_lanes_sharded_checkpointed(
        s.system, s.aug, sys_c, s.cfg, mesh=mesh, ckpt_dir=d1, segment_len=2, **kw)
    for f in ClosedLoopLog._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(resumed, f)), np.asarray(getattr(full, f)), err_msg=f)

    # a different mesh size must be REJECTED by the fingerprint, not silently
    # re-sharded (results would no longer be bitwise comparable)
    import json

    meta = os.path.join(d1, "state_2.npz.meta.json")
    with open(meta) as fh:
        fp = json.load(fh)
    fp["mesh_devices"] = 4
    with open(meta, "w") as fh:
        json.dump(fp, fh)
    # drop later checkpoints so resume starts from the tampered one
    for t in (4,):
        for p in (f"state_{t}.npz", f"logs_{t}.npz", f"state_{t}.npz.meta.json"):
            fpath = os.path.join(d1, p)
            if os.path.exists(fpath):
                os.remove(fpath)
    with pytest.raises(ValueError, match="different run"):
        run_paper_closed_loop_lanes_sharded_checkpointed(
            s.system, s.aug, sys_c, s.cfg, mesh=mesh, ckpt_dir=d1,
            segment_len=2, **kw)
