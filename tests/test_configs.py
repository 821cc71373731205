"""Every shipped config builds and runs the closed loop end-to-end (shrunken sizes)."""
import copy

import numpy as np
import pytest
import yaml

from tube_mpc_tpu.runners import run_experiment
from tube_mpc_tpu.utils.config import parse_config


@pytest.mark.parametrize(
    "name", ["dubins", "double_integrator", "cartpole", "quadrotor2d"]
)
def test_config_runs_closed_loop(name, tmp_path):
    with open(f"configs/{name}.yaml", "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f)
    raw = copy.deepcopy(raw)
    raw["use_float64"] = True
    raw["system"]["horizon_N"] = min(6, raw["system"]["horizon_N"])
    raw["system"]["task_horizon_H"] = 3
    raw["system"]["nominal_max_iter"] = 3
    raw["system"]["aux_max_iter"] = 3
    cfg = parse_config(raw)
    out = run_experiment(cfg, str(tmp_path / name))
    s = out["summary"]
    assert s["system"] == name
    assert np.isfinite(s["final_loss"])
    assert np.all(np.isfinite(np.asarray(s["final_state"])))


def test_singular_obstacle_key(tmp_path):
    """Reference also accepts environment.obstacle (singular, tube_mpc.py:77-80)."""
    with open("configs/dubins.yaml", "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f)
    raw = copy.deepcopy(raw)
    raw["use_float64"] = True
    raw["system"]["horizon_N"] = 6
    raw["system"]["task_horizon_H"] = 2
    raw["system"]["nominal_max_iter"] = 3
    raw["system"]["aux_max_iter"] = 3
    raw["environment"].pop("obstacles")
    raw["environment"]["obstacle"] = {"center": [5.0, 5.0], "radius": 1.5}
    cfg = parse_config(raw)
    assert len(cfg.environment.obstacles) == 1
    assert cfg.environment.obstacle_aggregation == "single"
    out = run_experiment(cfg, str(tmp_path / "single_obs"))
    assert np.isfinite(out["summary"]["final_loss"])
