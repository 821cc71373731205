"""Test harness: force an 8-device virtual CPU mesh and enable x64.

Must run before any jax import (pytest imports conftest first). Multi-chip sharding
tests run on the virtual CPU mesh; numerical agreement tests use float64 to match the
reference's `use_float64: true` configuration.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the remote "axon" TPU backend and
# overrides jax_platforms to "axon,cpu" — which routes every compile through a remote
# HTTP compile helper (slow, and missing CPU custom-calls like LAPACK solves). Tests
# must run on the local 8-device virtual CPU mesh, so override back after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
