"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4: simulated meshes).

The key invariant: population Algorithm-2 sharded over the mesh produces the SAME
shared-θ trajectory as the single-device vmapped run — the pmean over shards must
equal the global mean.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tube_mpc_tpu.ops.costs import CostWeights
from tube_mpc_tpu.ops.dbas import BarrierParams, make_augmented
from tube_mpc_tpu.parallel.mesh import make_mesh
from tube_mpc_tpu.parallel.scenarios import (
    run_population_adaptation,
    tube_verification,
    vmap_paper_closed_loop,
)
from tube_mpc_tpu.systems.dubins import DubinsConfig, make_dubins
from tube_mpc_tpu.systems.obstacles import CircleField, h_min
from tube_mpc_tpu.tube.closed_loop import TubeMPCConfig
from tube_mpc_tpu.tube.params import AdaptConfig, AuxAdapt

F64 = jnp.float64


def _setup(N=6, H=4):
    field = CircleField(
        centers=jnp.asarray([[4.0, 2.0], [2.0, 4.0]], dtype=F64),
        radii=jnp.ones((2,), dtype=F64),
    )
    system = make_dubins(DubinsConfig(dt=0.01), obstacles=field, aggregation="smoothmin", beta=20.0, dtype=F64)
    aug = make_augmented(system, barrier_type="inverse", eps=1e-4)
    cfg = TubeMPCConfig(
        N=N, H=H, nominal_max_iter=4, aux_max_iter=4, tol=1e-3, reg=1e-6,
        alphas=(1.0, 0.5, 0.0), adapt=AdaptConfig(lr=5e-2, momentum=0.9),
    )
    kw = dict(
        w_nominal=CostWeights.create([1.0, 1.0, 0.0], [1.0, 1.0], [1000.0] * 3, 1.0, dtype=F64),
        bp=BarrierParams.create(0.0, 0.0, 0.0, dtype=F64),
        target=jnp.asarray([10.0, 10.0, np.pi / 4], dtype=F64),
    )
    x0 = jnp.asarray([0.0, 0.0, np.pi / 4], dtype=F64)
    return system, aug, cfg, kw, x0


def test_vmapped_independent_scenarios():
    system, aug, cfg, kw, x0 = _setup()
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    logs = vmap_paper_closed_loop(
        system, aug, cfg,
        aux_init=AuxAdapt(Q=jnp.ones(3, dtype=F64), R=jnp.ones(2, dtype=F64), qb=jnp.asarray(1.0, dtype=F64)),
        x0=x0, keys=keys, **kw,
    )
    assert logs.x_real.shape == (4, cfg.H, 3)
    assert np.all(np.isfinite(np.asarray(logs.loss)))
    # different disturbances -> different adapted weights per scenario
    assert not np.allclose(np.asarray(logs.Q_hist[0, -1]), np.asarray(logs.Q_hist[1, -1]))


@pytest.mark.slow  # multi-device population scans, 20-40s; vmapped_independent keeps fast coverage
def test_tube_verification_stats():
    system, aug, cfg, kw, x0 = _setup()
    field_exact = CircleField(
        centers=jnp.asarray([[4.0, 2.0], [2.0, 4.0]], dtype=F64),
        radii=jnp.ones((2,), dtype=F64),
    )
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    logs, stats = tube_verification(
        system, aug, cfg,
        w_aux=CostWeights.create([1.0, 1.0, 1.0], [1.0, 1.0], [1.0] * 3, 1.0, dtype=F64),
        x0=x0, keys=keys, h_exact=lambda x: h_min(x, field_exact), **kw,
    )
    assert stats.deviations.shape == (8, cfg.H)
    assert float(stats.min_safety) > 0.0  # start region is far from obstacles
    assert float(stats.collision_rate) == 0.0
    # fixed weights: no adaptation drift
    np.testing.assert_allclose(np.asarray(logs.Q_hist[:, 0]), np.asarray(logs.Q_hist[:, -1]))


@pytest.mark.slow  # multi-device population scans, 20-40s; vmapped_independent keeps fast coverage
def test_population_adaptation_mesh_matches_single_device():
    system, aug, cfg, kw, x0 = _setup()
    B = 16
    key = jax.random.PRNGKey(2)
    w_seqs = system.sample_disturbance(key, (B, cfg.H), dtype=F64)
    x0_b = jnp.tile(x0, (B, 1))
    aux0 = AuxAdapt(Q=jnp.ones(3, dtype=F64), R=jnp.ones(2, dtype=F64), qb=jnp.asarray(1.0, dtype=F64))

    log_1dev, adapt_1dev = run_population_adaptation(
        system, aug, cfg, aux_init=aux0, x0_batch=x0_b, w_seqs=w_seqs, mesh=None, **kw
    )

    mesh = make_mesh()  # 8 virtual CPU devices
    assert mesh.size == 8
    log_mesh, adapt_mesh = run_population_adaptation(
        system, aug, cfg, aux_init=aux0, x0_batch=x0_b, w_seqs=w_seqs, mesh=mesh, **kw
    )

    np.testing.assert_allclose(np.asarray(log_mesh.loss_mean), np.asarray(log_1dev.loss_mean), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(adapt_mesh.Q), np.asarray(adapt_1dev.Q), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(adapt_mesh.R), np.asarray(adapt_1dev.R), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(adapt_mesh.qb), np.asarray(adapt_1dev.qb), rtol=1e-10)
    # shared θ actually adapted (tiny lr*H here, so any nonzero drift counts)
    assert np.max(np.abs(np.asarray(adapt_mesh.Q) - np.asarray(aux0.Q))) > 0


@pytest.mark.slow  # multi-device population scans, 20-40s; vmapped_independent keeps fast coverage
def test_population_masks_poisoned_scenarios():
    """One blown-up scenario (NaN state) must not poison the shared-theta update:
    per-scenario grads are finite-masked before the (p)mean (scenarios.py)."""
    system, aug, cfg, kw, x0 = _setup()
    B = 8
    w_seqs = system.sample_disturbance(jax.random.PRNGKey(3), (B, cfg.H), dtype=F64)
    x0_b = jnp.tile(x0, (B, 1)).at[3].set(jnp.nan)  # scenario 3 is dead on arrival
    aux0 = AuxAdapt(Q=jnp.ones(3, dtype=F64), R=jnp.ones(2, dtype=F64), qb=jnp.asarray(1.0, dtype=F64))

    log, adapt = run_population_adaptation(
        system, aug, cfg, aux_init=aux0, x0_batch=x0_b, w_seqs=w_seqs, mesh=None, **kw
    )
    assert np.all(np.isfinite(np.asarray(log.loss_mean)))
    assert np.all(np.isfinite(np.asarray(adapt.Q)))
    np.testing.assert_allclose(np.asarray(log.finite_frac), (B - 1) / B)

    # and the healthy-population result equals a run without the poisoned scenario
    keep = jnp.asarray([i for i in range(B) if i != 3])
    log_ref, adapt_ref = run_population_adaptation(
        system, aug, cfg, aux_init=aux0,
        x0_batch=x0_b[keep], w_seqs=w_seqs[keep], mesh=None, **kw
    )
    np.testing.assert_allclose(np.asarray(adapt.Q), np.asarray(adapt_ref.Q), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(log.loss_mean), np.asarray(log_ref.loss_mean), rtol=1e-12)
