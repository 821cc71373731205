"""Device mesh and sharding helpers for scenario-parallel tube MPC.

The reference is strictly single-process/single-device (SURVEY.md §2b: no DP/TP/PP/
NCCL/MPI anywhere); this subsystem is designed fresh for TPU. The scaling axis of this
workload is SCENARIOS (disturbance realizations × initial states × parameter
candidates) — state dims are 3-13, so tensor/pipeline parallelism is structurally N/A
(documented in SURVEY.md §2b); we shard the scenario batch over all chips (ICI within a
slice, DCN across hosts) and reduce adaptation gradients with psum/pmean.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenario"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = SCENARIO_AXIS) -> Mesh:
    """1-D mesh over (up to) all visible devices.

    Multi-host note: under `jax.distributed.initialize`, jax.devices() spans all hosts
    and this same mesh covers the full slice; the scenario axis then runs across ICI
    within a host-group and DCN between hosts — no code changes needed.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def scenario_sharding(mesh: Mesh, axis_name: str = SCENARIO_AXIS) -> NamedSharding:
    """Shard the leading (scenario) dim; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host bring-up: `jax.distributed.initialize` with env-var fallbacks.

    After this, jax.devices() spans the whole slice and make_mesh()/shard_map code runs
    unchanged across hosts (the scenario axis rides ICI within a host group and DCN
    between hosts). Returns the global device count. On single-host setups this is a
    no-op returning local device count.
    """
    import os

    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return len(jax.devices())
