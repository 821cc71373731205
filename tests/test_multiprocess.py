"""Multi-process (simulated multi-host) exercise of the distributed path
(VERDICT r1 item 6; SURVEY.md §4 "multi-host tests runnable on CPU").

Launches 2 separate processes × 4 virtual CPU devices each, brings them up with
jax.distributed.initialize through parallel.mesh.init_distributed, and runs the
population Algorithm-2 over the GLOBAL 8-device mesh — the per-step adaptation
gradients are psum'd across the process boundary (the DCN stand-in). Both processes
must produce the identical replicated log, equal to the single-process 8-device run
of the same workload.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_population_adaptation_across_processes(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             coord, "2", str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    r0 = np.load(tmp_path / "proc0.npz")
    r1 = np.load(tmp_path / "proc1.npz")
    # replicated outputs identical across processes
    for k in r0.files:
        np.testing.assert_array_equal(r0[k], r1[k], err_msg=k)

    # equal to the single-process 8-virtual-device mesh run (this process)
    import jax

    from tests.mp_workload import SEED, make_workload
    from tube_mpc_tpu.parallel.mesh import make_mesh
    from tube_mpc_tpu.parallel.scenarios import run_population_adaptation

    system, aug, cfg, w_nominal, aux_init, bp, target, x0_np, w_np = make_workload(SEED)
    mesh = make_mesh()  # conftest forces 8 virtual devices
    log, final_adapt = run_population_adaptation(
        system, aug, cfg,
        w_nominal=w_nominal, aux_init=aux_init, bp=bp,
        x0_batch=x0_np, target=target, w_seqs=w_np, mesh=mesh,
    )
    jax.block_until_ready(log)
    np.testing.assert_allclose(r0["loss_mean"], np.asarray(log.loss_mean), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(r0["Q_hist"], np.asarray(log.Q_hist), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(r0["qb_hist"], np.asarray(log.qb_hist), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(r0["Q_final"], np.asarray(final_adapt.Q), rtol=1e-12, atol=1e-12)
    assert float(np.min(r0["finite_frac"])) == 1.0
