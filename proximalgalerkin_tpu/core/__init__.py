from .config import SolverOptions, default_dtype
from .reasons import ConvergedReason
from .logging import rank_print, Monitor

__all__ = ["SolverOptions", "default_dtype", "ConvergedReason", "rank_print", "Monitor"]
