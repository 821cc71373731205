"""Shared tiny workload for the multi-process population-adaptation test.

Imported both by the worker processes and by the in-process single-mesh run, so all
sides build bit-identical inputs from the same numpy seed.
"""
import numpy as np

SEED = 17
B, H, N = 8, 3, 6


def make_workload(seed: int):
    import jax.numpy as jnp

    from tube_mpc_tpu.ops.costs import CostWeights
    from tube_mpc_tpu.ops.dbas import BarrierParams, make_augmented
    from tube_mpc_tpu.systems.dubins import DubinsConfig, make_dubins
    from tube_mpc_tpu.systems.obstacles import CircleField
    from tube_mpc_tpu.tube.closed_loop import TubeMPCConfig
    from tube_mpc_tpu.tube.params import AdaptConfig, AuxAdapt

    F64 = jnp.float64
    field = CircleField(
        centers=jnp.asarray([[4.0, 2.0], [2.0, 4.0]], dtype=F64),
        radii=jnp.ones((2,), dtype=F64),
    )
    system = make_dubins(DubinsConfig(dt=0.01), obstacles=field,
                         aggregation="smoothmin", beta=20.0, dtype=F64)
    aug = make_augmented(system, barrier_type="inverse", eps=1e-4)
    cfg = TubeMPCConfig(
        N=N, H=H, nominal_max_iter=3, aux_max_iter=3,
        tol=1e-3, reg=1e-6, alphas=(1.0, 0.5, 0.0),
        adapt=AdaptConfig(lr=5e-2, momentum=0.9),
    )
    w_nominal = CostWeights.create([1.0, 1.0, 0.0], [1.0, 1.0], [100.0] * 3, 1.0, dtype=F64)
    aux_init = AuxAdapt(Q=jnp.ones(3, dtype=F64), R=jnp.ones(2, dtype=F64),
                        qb=jnp.asarray(1.0, dtype=F64))
    bp = BarrierParams.create(0.0, 0.0, 0.0, dtype=F64)
    target = jnp.asarray([10.0, 10.0, np.pi / 4], dtype=F64)

    rng = np.random.default_rng(seed)
    x0_np = np.tile(np.asarray([0.0, 0.0, np.pi / 4]), (B, 1)) + 0.01 * rng.standard_normal((B, 3))
    w_np = 0.04 * (rng.random((B, H, 3)) - 0.5)
    return system, aug, cfg, w_nominal, aux_init, bp, target, x0_np, w_np
