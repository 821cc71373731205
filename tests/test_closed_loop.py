"""Closed-loop agreement vs the PyTorch reference paper path (BASELINE.json oracle).

Runs the reference `_run_dubins_paper` at reduced size, reconstructs its disturbance
sequence from the logged trajectories (w_t = x_{t+1} - f(x_t, u_t); PRNG parity is
impossible across frameworks, SURVEY.md §7 hard-part (d)), then replays the same
disturbances through our jitted scan driver and compares control sequences, states,
losses and adapted parameters.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tube_mpc_tpu.ops.costs import CostWeights
from tube_mpc_tpu.ops.dbas import BarrierParams, make_augmented
from tube_mpc_tpu.systems.dubins import DubinsConfig, make_dubins
from tube_mpc_tpu.systems.obstacles import CircleField
from tube_mpc_tpu.tube.closed_loop import (
    TubeMPCConfig,
    run_generic_closed_loop,
    run_paper_closed_loop,
)
from tube_mpc_tpu.tube.params import AdaptConfig, AuxAdapt, RawAuxTheta, RawNominalTheta, inv_softplus

F64 = jnp.float64

N, H = 16, 24
ALPHAS = (1.0, 0.5, 0.25, 0.1, 0.05, 0.01, 0.0)
OBS = [(4.0, 2.0), (2.0, 4.0), (4.0, 8.0), (8.0, 4.0), (6.0, 6.0)]
BETA, EPS = 20.0, 1e-4


def _ref_cfg():
    return {
        "seed": 0,
        "use_float64": True,
        "paper_dubins_mode": True,
        "system": {
            "name": "dubins",
            "dt": 0.01,
            "horizon_N": N,
            "task_horizon_H": H,
            "nominal_max_iter": 10,
            "aux_max_iter": 20,
            "line_search_alphas": list(ALPHAS),
            "control_bounds": {"v_min": -10.0, "v_max": 10.0, "omega_max": float(np.pi)},
            "disturbance": {"w_low": [-0.05] * 3, "w_high": [0.05] * 3},
            "target": [10.0, 10.0, float(np.pi / 4)],
        },
        "dbas": {"barrier_type": "inverse", "alpha": 0.0, "gamma": 0.0, "eps": EPS},
        "environment": {
            "obstacles": [{"center": list(c), "radius": 1.0} for c in OBS],
            "obstacle_smoothmin_beta": BETA,
            "obstacle_aggregation": "smoothmin",
        },
        "cost_nominal": {"Q": [1.0, 1.0, 0.0], "R": [1.0, 1.0], "q_b": 1.0, "Qf": [1000.0] * 3},
        "cost_auxiliary": {"Q": [1.0, 1.0, 1.0], "R": [1.0, 1.0], "q_b": 1.0},
        "adaptation": {"lr_eta": 5e-2, "steps": 1, "momentum": 0.9, "adapt_nominal": False, "adapt_ancillary": True},
    }


@pytest.fixture(scope="module")
def reference_run(tmp_path_factory):
    import json

    from reference_harness import cached_oracle, import_reference

    def compute():
        import_reference()
        import torch
        from diff_tube_mpc_strict_pt.core.tube_mpc import run_closed_loop_experiment

        torch.manual_seed(0)
        np.random.seed(0)
        run_dir = str(tmp_path_factory.mktemp("refrun"))
        run_closed_loop_experiment(_ref_cfg(), device=torch.device("cpu"), run_dir=run_dir)
        return {
            name: np.load(f"{run_dir}/{name}.npy")
            for name in ["x_real", "u_real", "x_bar", "u_bar", "b_real", "loss", "Qa_history", "Ra_history", "qba_history"]
        }

    return cached_oracle("paper_seed0:" + json.dumps(_ref_cfg(), sort_keys=True), compute)


def _our_setup():
    field = CircleField(
        centers=jnp.asarray([list(c) for c in OBS], dtype=F64),
        radii=jnp.ones((len(OBS),), dtype=F64),
    )
    system = make_dubins(DubinsConfig(dt=0.01), obstacles=field, aggregation="smoothmin", beta=BETA, dtype=F64)
    aug = make_augmented(system, barrier_type="inverse", eps=EPS)
    cfg = TubeMPCConfig(
        N=N, H=H,
        nominal_max_iter=10, aux_max_iter=20,
        tol=1e-3, reg=1e-6, alphas=ALPHAS,
        adapt=AdaptConfig(lr=5e-2, momentum=0.9),
    )
    return system, aug, cfg


def _recover_disturbances(x_real, u_real, dt=0.01):
    """w_t = x_{t+1} - f(x_t, u_t); last step padded with zeros (it affects no log)."""
    x = x_real
    px, py, th = x[:-1, 0], x[:-1, 1], x[:-1, 2]
    v, om = u_real[:-1, 0], u_real[:-1, 1]
    fx = np.stack([px + dt * v * np.cos(th), py + dt * v * np.sin(th), th + dt * om], axis=-1)
    w = x[1:] - fx
    return np.concatenate([w, np.zeros((1, 3))], axis=0)


@pytest.mark.slow
class TestClosedLoopAgreement:
    def test_paper_path_matches_reference(self, reference_run):
        ref = reference_run
        w_seq = jnp.asarray(_recover_disturbances(ref["x_real"], ref["u_real"]), dtype=F64)
        assert np.max(np.abs(np.asarray(w_seq[:-1]))) <= 0.05 + 1e-12  # sanity: inside W

        system, aug, cfg = _our_setup()
        log = jax.jit(
            lambda w: run_paper_closed_loop(
                system, aug, cfg,
                w_nominal=CostWeights.create([1.0, 1.0, 0.0], [1.0, 1.0], [1000.0] * 3, 1.0, dtype=F64),
                aux_init=AuxAdapt(Q=jnp.ones(3, dtype=F64), R=jnp.ones(2, dtype=F64), qb=jnp.asarray(1.0, dtype=F64)),
                bp=BarrierParams.create(0.0, 0.0, 0.0, dtype=F64),
                x0=jnp.asarray([0.0, 0.0, np.pi / 4], dtype=F64),
                target=jnp.asarray([10.0, 10.0, np.pi / 4], dtype=F64),
                w_seq=w,
            )
        )(w_seq)

        u_ours = np.asarray(log.u_real)
        u_ref = ref["u_real"]
        max_err = np.max(np.abs(u_ours - u_ref))
        # control-sequence agreement metric (BASELINE.json: >= 0.99)
        agreement = 1.0 - np.linalg.norm(u_ours - u_ref) / np.linalg.norm(u_ref)
        assert agreement >= 0.999, f"agreement={agreement}, max_err={max_err}"
        np.testing.assert_allclose(np.asarray(log.x_real), ref["x_real"], rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(log.loss), ref["loss"], rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(log.Q_hist), ref["Qa_history"], rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(log.R_hist), ref["Ra_history"], rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(log.qb_hist), ref["qba_history"], rtol=1e-5, atol=1e-8)


class TestGenericPathRuns:
    def test_generic_coupled_adaptation_smoke(self):
        """Generic bilevel path: runs, stays finite, and adapts both θ̄ and θ."""
        system, aug, cfg = _our_setup()
        cfg = TubeMPCConfig(
            N=8, H=6,
            nominal_max_iter=5, aux_max_iter=5,
            tol=1e-3, reg=1e-3, alphas=(1.0, 0.5, 0.0),
            adapt=AdaptConfig(lr=1e-3, momentum=0.9),
            adapt_nominal=True, adapt_ancillary=True,
            coupling="reference",
        )
        raw_nom = RawNominalTheta(
            Q_raw=inv_softplus(jnp.asarray([1.0, 1.0, 0.5], dtype=F64)),
            R_raw=inv_softplus(jnp.asarray([1.0, 1.0], dtype=F64)),
            Qf_raw=inv_softplus(jnp.asarray([100.0] * 3, dtype=F64)),
            qb_raw=inv_softplus(jnp.asarray(1.0, dtype=F64)),
            alpha_raw=jnp.asarray(0.01, dtype=F64),
            gamma_raw=jnp.asarray(0.0, dtype=F64),
            tight_raw=jnp.asarray(0.01, dtype=F64),
        )
        raw_aux = RawAuxTheta(
            Q_raw=inv_softplus(jnp.asarray([1.0, 1.0, 1.0], dtype=F64)),
            R_raw=inv_softplus(jnp.asarray([1.0, 1.0], dtype=F64)),
            Qf_raw=inv_softplus(jnp.asarray([1.0, 1.0, 1.0], dtype=F64)),
            qb_raw=inv_softplus(jnp.asarray(1.0, dtype=F64)),
            alpha_raw=jnp.asarray(0.01, dtype=F64),
            gamma_raw=jnp.asarray(0.0, dtype=F64),
        )
        log, (raw_nom_f, raw_aux_f) = run_generic_closed_loop(
            system, aug, cfg,
            raw_nom_init=raw_nom, raw_aux_init=raw_aux,
            x0=jnp.asarray([0.0, 0.0, np.pi / 4], dtype=F64),
            target=jnp.asarray([10.0, 10.0, np.pi / 4], dtype=F64),
            key=jax.random.PRNGKey(0),
        )
        assert np.all(np.isfinite(np.asarray(log.x_real)))
        assert np.all(np.isfinite(np.asarray(log.loss)))
        # both parameter sets moved (lr is tiny here; any nonzero drift counts)
        assert np.max(np.abs(np.asarray(raw_aux_f.Q_raw) - np.asarray(raw_aux.Q_raw))) > 0
        assert np.max(np.abs(np.asarray(raw_nom_f.Q_raw) - np.asarray(raw_nom.Q_raw))) > 0


# ---------------------------------------------------------------------------
# Generic-path agreement vs the reference run_closed_loop_experiment
# (paper_dubins_mode=False → tube_mpc.py:40-663), including the inner adaptation
# loop adapt_steps>1 (tube_mpc.py:407): repeated (δz → IFT grad → θ update) on the
# FIXED trajectories of the step's solves.
# ---------------------------------------------------------------------------

GN, GH = 10, 6
GEN_EPS = 1e-6  # equal to the reference DBaSConfig default, so the generic path's
                # solve-vs-jacobian eps inconsistency (tube_mpc.py:277 vs 316) vanishes
GEN_ALPHAS = (1.0, 0.5, 0.25, 0.1)  # reference ILQRConfig default ladder (ddp.py:20);
                                    # the generic path never reads the YAML alphas


def _ref_generic_cfg(steps: int, adapt_nominal: bool = False):
    cfg = _ref_cfg()
    cfg["paper_dubins_mode"] = False
    cfg["system"]["horizon_N"] = GN
    cfg["system"]["task_horizon_H"] = GH
    cfg["dbas"]["eps"] = GEN_EPS
    cfg["adaptation"] = {
        "lr_eta": 5e-2, "steps": steps, "momentum": 0.9,
        "adapt_nominal": adapt_nominal, "adapt_ancillary": True,
        "project_params": True,
    }
    return cfg


def _run_ref_generic(steps: int, tmp_path, adapt_nominal: bool = False) -> dict:
    import json

    from reference_harness import cached_oracle, import_reference

    def compute():
        import_reference()
        import torch
        from diff_tube_mpc_strict_pt.core.tube_mpc import run_closed_loop_experiment

        torch.manual_seed(0)
        np.random.seed(0)
        run_dir = str(tmp_path / f"refgen{steps}{'c' if adapt_nominal else ''}")
        run_closed_loop_experiment(_ref_generic_cfg(steps, adapt_nominal),
                                   device=torch.device("cpu"), run_dir=run_dir)
        return {
            name: np.load(f"{run_dir}/{name}.npy")
            for name in ["x_real", "u_real", "x_bar", "u_bar", "b_real", "loss",
                         "Qa_history", "Ra_history", "qba_history"]
        }

    key = "generic_seed0:" + json.dumps(_ref_generic_cfg(steps, adapt_nominal),
                                        sort_keys=True)
    return cached_oracle(key, compute)


def _generic_setup(steps: int, adapt_nominal: bool = False):
    """Build our system/cfg/raw-inits mirroring _ref_generic_cfg exactly."""
    field = CircleField(
        centers=jnp.asarray([list(c) for c in OBS], dtype=F64),
        radii=jnp.ones((len(OBS),), dtype=F64),
    )
    system = make_dubins(DubinsConfig(dt=0.01), obstacles=field,
                         aggregation="smoothmin", beta=BETA, dtype=F64)
    from tube_mpc_tpu.ops.dbas import make_augmented as _mk
    aug = _mk(system, barrier_type="inverse", eps=GEN_EPS)
    cfg = TubeMPCConfig(
        N=GN, H=GH,
        nominal_max_iter=10, aux_max_iter=20,
        tol=1e-6, reg=1e-6, alphas=GEN_ALPHAS,
        adapt=AdaptConfig(lr=5e-2, momentum=0.9, steps=steps, project=True),
        adapt_nominal=adapt_nominal, adapt_ancillary=True,
        coupling="reference",
    )
    # Reference inits raw params with the CONFIG VALUES as raws (tube_mpc.py:106-132):
    # nominal raw = cost_nominal values; aux raw = cost_nominal Q/R/Qf + cost_auxiliary q_b.
    raw_nom = RawNominalTheta(
        Q_raw=jnp.asarray([1.0, 1.0, 0.0], dtype=F64),
        R_raw=jnp.asarray([1.0, 1.0], dtype=F64),
        Qf_raw=jnp.asarray([1000.0] * 3, dtype=F64),
        qb_raw=jnp.asarray(1.0, dtype=F64),
        alpha_raw=jnp.asarray(0.0, dtype=F64),
        gamma_raw=jnp.asarray(0.0, dtype=F64),
        tight_raw=jnp.asarray(0.0, dtype=F64),
    )
    raw_aux = RawAuxTheta(
        Q_raw=jnp.asarray([1.0, 1.0, 0.0], dtype=F64),
        R_raw=jnp.asarray([1.0, 1.0], dtype=F64),
        Qf_raw=jnp.asarray([1000.0] * 3, dtype=F64),
        qb_raw=jnp.asarray(1.0, dtype=F64),
        alpha_raw=jnp.asarray(0.0, dtype=F64),
        gamma_raw=jnp.asarray(0.0, dtype=F64),
    )
    return system, aug, cfg, raw_nom, raw_aux


@pytest.mark.slow
class TestGenericPathAgreement:
    @pytest.mark.parametrize("steps,adapt_nominal", [(1, False), (2, False), (1, True), (2, True)])
    def test_generic_matches_reference(self, steps, adapt_nominal, tmp_path):
        """adapt_nominal=True exercises the coupled bilevel chain: the reference's
        hand-wired g_xref/g_uref → nominal ddp_sensitivity → ift_gradient pipeline
        (tube_mpc.py:505-599) vs our composed custom_vjp chain."""
        ref = _run_ref_generic(steps, tmp_path, adapt_nominal)
        w_seq = jnp.asarray(_recover_disturbances(ref["x_real"], ref["u_real"]), dtype=F64)

        system, aug, cfg, raw_nom, raw_aux = _generic_setup(steps, adapt_nominal)
        log, _ = jax.jit(
            lambda w: run_generic_closed_loop(
                system, aug, cfg,
                raw_nom_init=raw_nom, raw_aux_init=raw_aux,
                x0=jnp.asarray([0.0, 0.0, np.pi / 4], dtype=F64),
                target=jnp.asarray([10.0, 10.0, np.pi / 4], dtype=F64),
                w_seq=w,
            )
        )(w_seq)

        u_ours, u_ref = np.asarray(log.u_real), ref["u_real"]
        agreement = 1.0 - np.linalg.norm(u_ours - u_ref) / np.linalg.norm(u_ref)
        assert agreement >= 0.999, f"steps={steps}: agreement={agreement}"
        np.testing.assert_allclose(np.asarray(log.x_real), ref["x_real"], rtol=1e-6, atol=1e-8)
        # the coupled path moves θ̄, so the nominal trajectory is part of the oracle
        np.testing.assert_allclose(np.asarray(log.x_bar), ref["x_bar"], rtol=1e-6, atol=1e-8)
        # u_bar's ω row sits at an ESSENTIALLY-ZERO optimum (|ω̄| ~ 1e-14..1e-5):
        # sub-1e-6 absolute noise there is solver tie-breaking, not disagreement —
        # x_bar above pins the integrated effect at 1e-8.
        np.testing.assert_allclose(np.asarray(log.u_bar), ref["u_bar"], rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(np.asarray(log.loss), ref["loss"], rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(log.Q_hist), ref["Qa_history"], rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(log.R_hist), ref["Ra_history"], rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(log.qb_hist), ref["qba_history"], rtol=1e-5, atol=1e-8)


@pytest.mark.slow  # whole-loop finite-difference check, ~16s + compile
class TestFullCouplingGradient:
    def test_full_coupling_gradient_matches_fd(self):
        """coupling="full" (exact bilevel gradient incl. the explicit ∂L/∂x̄ term —
        a capability the reference lacks): check the one-step coupled θ̄ gradient
        against central finite differences of the step loss.

        With H=1 and momentum's first update v=g, the post-update raw is
        raw - lr·g, so g is recovered from the final params; FD evaluates loss[0]
        (computed from the INIT params) at perturbed inits with lr=0.
        """
        system, aug, cfg, raw_nom, raw_aux = _generic_setup(steps=1, adapt_nominal=True)
        cfg = TubeMPCConfig(
            N=6, H=1, nominal_max_iter=8, aux_max_iter=8,
            tol=1e-10, reg=1e-6, alphas=GEN_ALPHAS,
            adapt=AdaptConfig(lr=1e-3, momentum=0.9, steps=1, project=False),
            adapt_nominal=True, adapt_ancillary=True, coupling="full",
        )
        x0 = jnp.asarray([0.0, 0.0, np.pi / 4], dtype=F64)
        target = jnp.asarray([10.0, 10.0, np.pi / 4], dtype=F64)
        w_seq = jnp.zeros((1, 3), dtype=F64)

        def run(raw_n, lr):
            c = dataclasses.replace(
                cfg, adapt=AdaptConfig(lr=lr, momentum=0.9, steps=1, project=False))
            log, (raw_nom_f, _) = run_generic_closed_loop(
                system, aug, c,
                raw_nom_init=raw_n, raw_aux_init=raw_aux,
                x0=x0, target=target, w_seq=w_seq,
            )
            return log.loss[0], raw_nom_f

        run_j = jax.jit(run, static_argnums=1)

        lr = 1e-3
        _, raw_f = run_j(raw_nom, lr)
        g_q0 = float((raw_nom.Q_raw[0] - raw_f.Q_raw[0]) / lr)

        eps = 1e-5
        up = raw_nom._replace(Q_raw=raw_nom.Q_raw.at[0].add(eps))
        dn = raw_nom._replace(Q_raw=raw_nom.Q_raw.at[0].add(-eps))
        L_p, _ = run_j(up, 0.0)
        L_m, _ = run_j(dn, 0.0)
        fd = float((L_p - L_m) / (2 * eps))

        assert np.isfinite(g_q0) and np.isfinite(fd)
        assert abs(g_q0 - fd) <= 2e-3 * max(abs(fd), 1.0), f"analytic={g_q0}, fd={fd}"
