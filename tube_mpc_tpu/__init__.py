"""tube_mpc_tpu — a TPU-native differentiable two-layer Tube MPC framework.

Built from scratch in JAX (XLA / Pallas / pjit), functionally matching the PyTorch
reference `lmcggg/differentiable-tube-mpc` (see SURVEY.md for the full component map)
while being batched-first and mesh-shardable.

Layer map (mirrors SURVEY.md §1):
  systems/   dynamics, safety functions, disturbance models        (ref core/systems)
  ops/       barrier (DBaS), costs, small linalg, pallas kernels   (ref core/barrier, cost_derivs, utils)
  solvers/   iLQR/DDP, sensitivity, IFT, custom_vjp wrapper        (ref core/ddp, ift)
  tube/      two-layer orchestration + Algorithm-2 adaptation      (ref core/tube_mpc, params)
  parallel/  mesh/sharding/collectives scenario engine             (new — no ref equivalent)
  utils/     config, checkpoint, profiling, debug, io              (ref run_experiment glue)
"""

__version__ = "1.0.0"
