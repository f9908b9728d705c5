"""Global configuration: dtypes and the flat, PETSc-style options dictionary.

The reference configures every solver through the PETSc options database
(string-keyed flat dicts, e.g. /root/reference/examples/01_obstacle_problem/
obstacle_pg.py:128-139). We preserve those key names so reference example
configs translate 1:1, but interpret them in our own Newton/Krylov stack.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np


def default_dtype():
    """Default floating dtype for FEM state (f64 unless x64 disabled)."""
    if os.environ.get("PGTPU_DISABLE_X64", "0") == "1":
        return jnp.float32
    return jnp.float64


def index_dtype():
    """Default integer dtype for mesh/dofmap indices."""
    return np.int32


# Recognized option keys, mirroring the PETSc names the reference uses.
_KNOWN_PREFIXES = (
    "snes_",  # Newton options: rtol, atol, max_it, linesearch_type, monitor
    "ksp_",  # Krylov options: type, rtol, atol, max_it, monitor
    "pc_",  # preconditioner options: type, factor_mat_solver_type
    "lvpp_",  # our own: alpha scheme parameters etc.
)


class SolverOptions(dict):
    """Flat string-keyed options dict with PETSc-style names and defaults.

    Examples of keys honored by the solve/ stack:
      snes_rtol, snes_atol, snes_stol, snes_max_it, snes_linesearch_type
      (none|l2|bt), snes_monitor, snes_error_if_not_converged,
      ksp_type (preonly|cg|minres|gmres), ksp_rtol, ksp_atol, ksp_max_it,
      pc_type (none|jacobi|lu|bjacobi|schur), pc_factor_mat_solver_type
      (scipy — the host sparse-LU fallback standing in for MUMPS).
    """

    _DEFAULTS: Mapping[str, Any] = {
        "snes_rtol": 1e-8,
        "snes_atol": 1e-50,
        "snes_stol": 1e-8,
        "snes_max_it": 50,
        "snes_linesearch_type": "none",
        "snes_linesearch_damping": 1.0,
        "snes_error_if_not_converged": False,
        "snes_monitor": False,
        "ksp_type": "preonly",
        "ksp_rtol": 1e-10,
        "ksp_atol": 1e-50,
        "ksp_max_it": 10_000,
        "ksp_error_if_not_converged": False,
        "ksp_monitor": False,
        "pc_type": "lu",
        "pc_factor_mat_solver_type": "scipy",
    }

    def opt(self, key: str, default: Any = None) -> Any:
        if key in self:
            v = self[key]
            # PETSc-style flags pass None to mean "enabled".
            return True if v is None else v
        if default is not None:
            return default
        return self._DEFAULTS.get(key)

    @classmethod
    def with_prefix(cls, options: Mapping[str, Any], prefix: str) -> "SolverOptions":
        """Extract options under a namespacing prefix (PETSc prefixPush model,
        reference src/lvpp/problem.py:97-103)."""
        out = cls()
        for k, v in options.items():
            if k.startswith(prefix):
                out[k[len(prefix):]] = v
            else:
                out.setdefault(k, v)
        return out
