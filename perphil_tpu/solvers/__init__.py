from perphil_tpu.solvers.solver import Solution, solve_dpp, solve_dpp_nonlinear
from perphil_tpu.solvers import parameters

__all__ = ["Solution", "solve_dpp", "solve_dpp_nonlinear", "parameters"]
