"""Standard experiment presets (the shipped Dubins paper configuration).

Mirrors the wiring of reference ``configs/dubins.yaml:1-85`` + ``tube_mpc.py:666-775``
so benchmarks, entry points, and tests build the exact same problem.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp

from .ops.costs import CostWeights
from .ops.dbas import AugmentedDynamics, BarrierParams, make_augmented
from .systems.base import System
from .systems.dubins import DubinsConfig, make_dubins
from .systems.obstacles import CircleField
from .tube.closed_loop import TubeMPCConfig
from .tube.params import AdaptConfig, AuxAdapt

PAPER_OBSTACLES: Tuple[Tuple[float, float], ...] = (
    (4.0, 2.0), (2.0, 4.0), (4.0, 8.0), (8.0, 4.0), (6.0, 6.0),
)
PAPER_ALPHAS: Tuple[float, ...] = (1.0, 0.5, 0.25, 0.1, 0.05, 0.01, 0.0)


@dataclasses.dataclass(frozen=True)
class DubinsPaperSetup:
    system: System
    aug: AugmentedDynamics
    cfg: TubeMPCConfig
    w_nominal: CostWeights
    aux_init: AuxAdapt
    bp: BarrierParams
    x0: jnp.ndarray
    target: jnp.ndarray
    field: CircleField


def dubins_paper_setup(
    *,
    N: int = 50,
    H: int = 300,
    dtype=jnp.float32,
    beta: float = 20.0,
    eps: float = 1e-4,
    nominal_max_iter: int = 10,
    aux_max_iter: int = 20,
    lr: float = 5e-2,
    momentum: float = 0.9,
    alphas: Tuple[float, ...] = PAPER_ALPHAS,
    obstacle_offset: float = 0.0,
) -> DubinsPaperSetup:
    """The dubins.yaml paper experiment, parameterized by size/dtype.

    obstacle_offset displaces all obstacle centers (the no-excursion control
    variant of the agreement study, tools/agreement_sweep.py --variant farobs).
    """
    field = CircleField(
        centers=jnp.asarray([[c + obstacle_offset for c in o] for o in PAPER_OBSTACLES], dtype=dtype),
        radii=jnp.ones((len(PAPER_OBSTACLES),), dtype=dtype),
    )
    system = make_dubins(
        DubinsConfig(dt=0.01), obstacles=field, aggregation="smoothmin", beta=beta, dtype=dtype
    )
    aug = make_augmented(system, barrier_type="inverse", eps=eps)
    cfg = TubeMPCConfig(
        N=N, H=H,
        nominal_max_iter=nominal_max_iter, aux_max_iter=aux_max_iter,
        tol=1e-3, reg=1e-6, alphas=alphas,
        adapt=AdaptConfig(lr=lr, momentum=momentum),
    )
    return DubinsPaperSetup(
        system=system,
        aug=aug,
        cfg=cfg,
        w_nominal=CostWeights.create([1.0, 1.0, 0.0], [1.0, 1.0], [1000.0] * 3, 1.0, dtype=dtype),
        aux_init=AuxAdapt(
            Q=jnp.ones(3, dtype=dtype), R=jnp.ones(2, dtype=dtype), qb=jnp.asarray(1.0, dtype=dtype)
        ),
        bp=BarrierParams.create(0.0, 0.0, 0.0, dtype=dtype),
        x0=jnp.asarray([0.0, 0.0, math.pi / 4], dtype=dtype),
        target=jnp.asarray([10.0, 10.0, math.pi / 4], dtype=dtype),
        field=field,
    )
