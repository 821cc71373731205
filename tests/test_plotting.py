"""L7 post-processing: the reference's 5-figure set (``plot_results.py:27-186``)
is produced from a run dir, both via the library (`tube_mpc_tpu.plotting.plot_run`)
and the root CLI (`plot_results.py`)."""
import json
import os
import subprocess
import sys

import numpy as np

from tube_mpc_tpu.plotting import plot_run

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FIGS = ["traj_xy.png", "states.png", "controls.png",
        "barrier_and_loss.png", "adaptive_params.png"]


def _write_run_dir(d):
    H = 12
    rng = np.random.default_rng(0)
    np.save(d / "x_real.npy", rng.normal(size=(H + 1, 3)))
    np.save(d / "x_bar.npy", rng.normal(size=(H + 1, 3)))
    np.save(d / "u_real.npy", rng.normal(size=(H, 2)))
    np.save(d / "u_bar.npy", rng.normal(size=(H, 2)))
    np.save(d / "b_real.npy", rng.uniform(0.1, 2.0, size=(H + 1,)))
    np.save(d / "loss.npy", rng.uniform(0.0, 5.0, size=(H,)))
    np.save(d / "Qa_history.npy", rng.uniform(1.0, 2.0, size=(H, 4)))
    np.save(d / "Ra_history.npy", rng.uniform(0.1, 0.2, size=(H, 2)))
    np.save(d / "qba_history.npy", rng.uniform(0.5, 1.5, size=(H,)))


def test_plot_run_writes_all_five_figures(tmp_path):
    _write_run_dir(tmp_path)
    written = plot_run(str(tmp_path))
    assert sorted(os.path.basename(p) for p in written) == sorted(FIGS)
    for p in written:
        assert os.path.getsize(p) > 1000  # a real rendered PNG, not a stub


def test_plot_results_cli_reads_obstacles_from_config(tmp_path):
    _write_run_dir(tmp_path)
    # the CLI pulls the obstacle field from config_used.json (incl. the
    # reference's singular `obstacle` key, tube_mpc.py:77-80)
    with open(tmp_path / "config_used.json", "w", encoding="utf-8") as f:
        json.dump({"environment": {"obstacle": {"center": [5.0, 5.0],
                                                "radius": 1.5}}}, f)
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "plot_results.py"), str(tmp_path)],
        capture_output=True, text=True, cwd=ROOT, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    produced = [line for line in r.stdout.splitlines() if line.endswith(".png")]
    assert len(produced) == len(FIGS)
    for p in produced:
        assert os.path.exists(p)
