"""Worker for the multi-process (simulated multi-host) population-adaptation test.

Launched by tests/test_multiprocess.py as N separate processes, each exposing 4
virtual CPU devices. Brings up the DCN layer via parallel.mesh.init_distributed
(jax.distributed.initialize), builds the GLOBAL 1-D scenario mesh spanning all
processes, shards the scenario batch across it, runs run_population_adaptation
(per-step psum'd adaptation gradients ride the cross-process layer), and saves the
replicated log for the parent test to compare against the single-process result.

    python tests/mp_worker.py <coordinator> <num_procs> <proc_id> <outdir>
"""
import os
import sys

coord, nprocs, pid, outdir = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from tube_mpc_tpu.parallel.mesh import init_distributed  # noqa: E402

n_global = init_distributed(coordinator_address=coord, num_processes=nprocs, process_id=pid)
assert n_global == 4 * nprocs, (n_global, nprocs)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from tests.mp_workload import SEED, make_workload  # noqa: E402
from tube_mpc_tpu.parallel.mesh import make_mesh  # noqa: E402
from tube_mpc_tpu.parallel.scenarios import run_population_adaptation  # noqa: E402

system, aug, cfg, w_nominal, aux_init, bp, target, x0_np, w_np = make_workload(SEED)
B = x0_np.shape[0]
mesh = make_mesh()
axis = mesh.axis_names[0]

rows = B // nprocs
lo, hi = pid * rows, (pid + 1) * rows
x0_g = multihost_utils.host_local_array_to_global_array(x0_np[lo:hi], mesh, P(axis))
w_g = multihost_utils.host_local_array_to_global_array(w_np[lo:hi], mesh, P(axis))

log, final_adapt = run_population_adaptation(
    system, aug, cfg,
    w_nominal=w_nominal, aux_init=aux_init, bp=bp,
    x0_batch=x0_g, target=target, w_seqs=w_g, mesh=mesh,
)
jax.block_until_ready(log)

np.savez(
    os.path.join(outdir, f"proc{pid}.npz"),
    loss_mean=np.asarray(log.loss_mean),
    Q_hist=np.asarray(log.Q_hist),
    R_hist=np.asarray(log.R_hist),
    qb_hist=np.asarray(log.qb_hist),
    finite_frac=np.asarray(log.finite_frac),
    Q_final=np.asarray(final_adapt.Q),
)
print(f"[proc {pid}] done", flush=True)
