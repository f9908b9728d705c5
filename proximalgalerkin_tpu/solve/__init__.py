from .nonlinear import NonlinearProblem
from .newton import NewtonSolver, NewtonResult, SNESSolver
from .lvpp import LVPPSolver, LVPPResult, AlphaScheduler

__all__ = ["NonlinearProblem", "NewtonSolver", "NewtonResult", "SNESSolver",
           "LVPPSolver", "LVPPResult", "AlphaScheduler"]
