"""Nominal receding-horizon agreement vs reference run_nominal.py (angle-wrapped
costs, success/collision stopping) + barrier-type coverage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tube_mpc_tpu.ops import barrier as bar
from tube_mpc_tpu.ops.costs import CostWeights
from tube_mpc_tpu.ops.dbas import BarrierParams, make_augmented
from tube_mpc_tpu.systems.dubins import DubinsConfig, make_dubins
from tube_mpc_tpu.systems.obstacles import CircleField, h_min
from tube_mpc_tpu.tube.closed_loop import TubeMPCConfig, run_nominal_receding
from tube_mpc_tpu.tube.params import AdaptConfig

F64 = jnp.float64
OBS = [(4.0, 2.0), (2.0, 4.0), (6.0, 6.0)]


@pytest.fixture(scope="module")
def ref():
    from reference_harness import import_reference
    return import_reference()


@pytest.mark.slow
def test_receding_matches_reference(ref, tmp_path):
    """Run the reference run_nominal_receding at small size and compare the full
    state/control sequences and stopping behavior."""
    import torch

    N, H = 10, 12
    cfg_dict = {
        "system": {
            "name": "dubins",
            "dt": 0.01,
            "horizon_N": N,
            "task_horizon_H": H,
            "nominal_max_iter": 6,
            "ilqr_reg": 1e-3,
            "line_search_alphas": [1.0, 0.5, 0.25, 0.1, 0.0],
            "control_bounds": {"v_min": -10.0, "v_max": 10.0, "omega_max": float(np.pi)},
            "target": [10.0, 10.0, float(np.pi / 4)],
        },
        "dbas": {"barrier_type": "inverse", "alpha": 0.0, "gamma": 0.0, "eps": 1e-4},
        "environment": {
            "obstacles": [{"center": list(c), "radius": 1.0} for c in OBS],
            "obstacle_smoothmin_beta": 20.0,
            "obstacle_aggregation": "smoothmin",
        },
        "cost_nominal": {"Q": [1.0, 1.0, 0.0], "R": [1.0, 1.0], "q_b": 1.0, "Qf": [1000.0] * 3},
    }
    torch.manual_seed(0)
    np.random.seed(0)
    from diff_tube_mpc_strict_pt.run_nominal import run_nominal_receding as ref_run

    out = ref_run(cfg_dict, device=torch.device("cpu"), run_dir=str(tmp_path))
    ref_x = np.load(tmp_path / "x_real.npy")
    ref_u = np.load(tmp_path / "u_real.npy")

    # ours — note: the reference's receding runner warm-starts with v=v_max
    # (run_nominal.py:337-338); replicate that warm start.
    field = CircleField(
        centers=jnp.asarray([list(c) for c in OBS], dtype=F64),
        radii=jnp.ones((len(OBS),), dtype=F64),
    )
    system = make_dubins(DubinsConfig(dt=0.01), obstacles=field, aggregation="smoothmin", beta=20.0, dtype=F64)
    aug = make_augmented(system, eps=1e-4)
    cfg = TubeMPCConfig(
        N=N, H=H, nominal_max_iter=6, aux_max_iter=6, tol=1e-3, reg=1e-3,
        alphas=(1.0, 0.5, 0.25, 0.1, 0.0), adapt=AdaptConfig(lr=0.0, momentum=0.0),
    )
    ws = jnp.zeros((N, 2), dtype=F64).at[:, 0].set(10.0)
    res = run_nominal_receding(
        system, aug, cfg,
        w_nominal=CostWeights.create([1.0, 1.0, 0.0], [1.0, 1.0], [1000.0] * 3, 1.0, dtype=F64),
        bp=BarrierParams.create(0.0, 0.0, 0.0, dtype=F64),
        x0=jnp.asarray([0.0, 0.0, np.pi / 4], dtype=F64),
        target=jnp.asarray([10.0, 10.0, np.pi / 4], dtype=F64),
        h_exact=lambda x: h_min(x, field),
        angle_dims=(2,),
        warm_start=ws,
    )
    h_ran = int(np.asarray(res.ran).sum())
    assert h_ran == ref_x.shape[0]
    np.testing.assert_allclose(np.asarray(res.x)[:h_ran], ref_x, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.u)[:h_ran], ref_u, rtol=1e-7, atol=1e-9)
    assert bool(res.success) == bool(out["summary"]["success"])
    assert bool(res.collided) == bool(out["summary"]["collided"])


def test_log_barrier_type():
    """Log-barrier DBaS variant (reference barrier.py:62-72, 100-104)."""
    field = CircleField(centers=jnp.asarray([[4.0, 4.0]], dtype=F64), radii=jnp.asarray([1.0], dtype=F64))
    system = make_dubins(DubinsConfig(dt=0.01), obstacles=field, dtype=F64)
    aug = make_augmented(system, barrier_type="log", eps=1e-6)
    bp = BarrierParams.create(0.0, 0.5, 0.0, dtype=F64)
    x_hat = jnp.asarray([1.0, 1.0, 0.3, 0.2], dtype=F64)
    u = jnp.asarray([2.0, 0.1], dtype=F64)
    out = aug.f_hat(x_hat, u, bp)
    # manual: b+ = -log(h(x+)) - gamma*(-log(h(x)) - b)
    xn = system.f(x_hat[:3], u)
    expected = -jnp.log(system.h(xn)) - 0.5 * (-jnp.log(system.h(x_hat[:3])) - 0.2)
    np.testing.assert_allclose(out[3], expected, rtol=1e-12)
    # analytic jacobian matches autodiff for the log branch too
    A, B = aug.f_hat_jac(x_hat, u, bp)
    A_auto = jax.jacfwd(lambda xh: aug.f_hat(xh, u, bp))(x_hat)
    np.testing.assert_allclose(A, A_auto, rtol=1e-9, atol=1e-12)
