from gpu_se_tpu.control.mpc import MPC, build_prediction_matrices
from gpu_se_tpu.control.scenario_mpc import ScenarioMPC, consensus_consts
from gpu_se_tpu.control.qp import (
    DUAL_INFEASIBLE,
    MAX_ITER_REACHED,
    PRIMAL_INFEASIBLE,
    SOLVED,
    DenseQP,
    QPSettings,
    QPSolution,
)

__all__ = [
    "MPC",
    "ScenarioMPC",
    "consensus_consts",
    "build_prediction_matrices",
    "DenseQP",
    "QPSettings",
    "QPSolution",
    "SOLVED",
    "MAX_ITER_REACHED",
    "PRIMAL_INFEASIBLE",
    "DUAL_INFEASIBLE",
]
