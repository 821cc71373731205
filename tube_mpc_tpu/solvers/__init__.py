from .diff_ilqr import make_diff_ilqr, make_ift_regrad
from .ift import ift_accumulate, ift_gradient
from .ilqr import ILQRConfig, ilqr_solve
from .ocp import OCP, rollout, total_cost
from .pscan import parallel_affine_rollout, parallel_backward_pass, riccati_value_sweep
from .sensitivity import SensitivityResult, ddp_sensitivity
from .weight_grads import apply_sgd, grads_aux_from_deltas, grads_nominal_from_deltas

__all__ = [
    "ILQRConfig", "ilqr_solve", "OCP", "rollout", "total_cost",
    "SensitivityResult", "ddp_sensitivity", "ift_accumulate", "ift_gradient",
    "make_diff_ilqr", "make_ift_regrad",
    "grads_aux_from_deltas", "grads_nominal_from_deltas", "apply_sgd",
    "parallel_backward_pass", "parallel_affine_rollout", "riccati_value_sweep",
]
