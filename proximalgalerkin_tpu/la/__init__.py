from .krylov import cg, gmres, bicgstab, minres, KRYLOV
from .direct import lu_solve, LUFactorization

__all__ = ["cg", "gmres", "bicgstab", "minres", "KRYLOV",
           "lu_solve", "LUFactorization"]
