from .closed_loop import (
    ClosedLoopLog,
    TubeMPCConfig,
    run_generic_closed_loop,
    run_nominal_receding,
    run_paper_closed_loop,
)
from .lane_closed_loop import run_paper_closed_loop_lanes
from .lane_interface import make_lane_problem, tube_ilqr_solve_lanes
from .params import AdaptConfig, AuxAdapt, RawAuxTheta, RawNominalTheta, momentum_update
from .problem import AuxTheta, NominalTheta, make_aux_ocp, make_nominal_ocp

__all__ = [
    "ClosedLoopLog", "TubeMPCConfig", "run_paper_closed_loop",
    "run_generic_closed_loop", "run_nominal_receding", "run_paper_closed_loop_lanes",
    "make_lane_problem", "tube_ilqr_solve_lanes",
    "AdaptConfig", "AuxAdapt", "RawAuxTheta", "RawNominalTheta", "momentum_update",
    "AuxTheta", "NominalTheta", "make_aux_ocp", "make_nominal_ocp",
]
