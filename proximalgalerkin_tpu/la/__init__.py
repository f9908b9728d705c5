from .krylov import cg, gmres, bicgstab, minres, KRYLOV
from .direct import lu_solve, LUFactorization
from . import gmg

__all__ = ["cg", "gmres", "bicgstab", "minres", "KRYLOV",
           "lu_solve", "LUFactorization", "gmg"]
