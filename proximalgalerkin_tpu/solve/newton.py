"""Damped Newton with SNES-compatible semantics.

Replaces PETSc SNES as driven by the reference (options at
obstacle_pg.py:128-139, fracture_dolfinx.py:163-180): linesearch
none/l2/bt, rtol/atol/stol convergence tests, SNES converged-reason codes,
and the `commit only on convergence` contract of `SNESSolver.solve`
(src/lvpp/problem.py:114-124) preserved by returning a result object the
caller commits explicitly.

This host-loop driver calls jitted residual/Jacobian kernels and supports
pluggable linear solvers: host sparse LU ("preonly"+"lu", the MUMPS stand-in)
or device Krylov (cg/minres/gmres with Jacobi preconditioning).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..core.config import SolverOptions
from ..core.logging import Monitor, PhaseTimer, rank_print
from ..core.reasons import ConvergedReason, NotConvergedError
from ..la import LUFactorization
from .nonlinear import NonlinearProblem


@dataclass
class NewtonResult:
    x: jnp.ndarray
    reason: ConvergedReason
    iterations: int
    fnorm: float
    fnorm_history: List[float] = field(default_factory=list)

    @property
    def converged(self) -> bool:
        return self.reason.converged


class NewtonSolver:
    def __init__(self, problem: NonlinearProblem,
                 options: Optional[SolverOptions] = None,
                 timer: Optional[PhaseTimer] = None):
        self.problem = problem
        self.options = options if isinstance(options, SolverOptions) \
            else SolverOptions(options or {})
        self.timer = timer or PhaseTimer()

    # ----------------------------------------------------------- linear

    def _solve_linear(self, x, F):
        """Solve J(x) dx = -F. Returns dx."""
        opts = self.options
        ksp = opts.opt("ksp_type")
        pc = opts.opt("pc_type")
        if ksp == "preonly" or pc == "lu":
            with self.timer.phase("linear_solve_lu"):
                A = self.problem.jacobian_scipy(x)
                dx = LUFactorization(A).solve(np.asarray(-F))
            return jnp.asarray(dx, F.dtype)
        step = self.problem.direction_solver(
            ksp, pc, str(opts.opt("mat_type", "ell")))
        with self.timer.phase("linear_solve_krylov"):
            dx = step(x, F, self.problem.coeffs, self.problem.consts,
                      float(opts.opt("ksp_rtol")), float(opts.opt("ksp_atol")),
                      int(opts.opt("ksp_max_it")))
            dx.block_until_ready()
        return dx

    # -------------------------------------------------------- linesearch

    def _linesearch(self, x, dx, fnorm):
        """Returns new x (or None if the linesearch failed)."""
        ls = self.options.opt("snes_linesearch_type")
        damping = float(self.options.opt("snes_linesearch_damping"))
        prob = self.problem
        if ls == "none":
            return x + damping * dx
        if ls == "l2":
            # sample ||F|| on a small grid of step lengths, keep the best
            ts = np.array([1.0, 0.5, 0.25, 0.125, 0.0625]) * damping
            best_x, best_f = None, np.inf
            for t in ts:
                xt = x + t * dx
                fn = float(jnp.linalg.norm(prob.residual(xt)))
                if np.isfinite(fn) and fn < best_f:
                    best_x, best_f = xt, fn
                if fn < fnorm:  # early accept on first improvement
                    break
            if best_x is None or best_f >= fnorm * (1.0 + 1e-12):
                # accept full step anyway (PETSc l2 accepts the minimizer)
                return best_x if best_x is not None else None
            return best_x
        if ls == "bt":
            # Armijo backtracking on 0.5||F||^2
            alpha = 1e-4
            t = damping
            for _ in range(12):
                xt = x + t * dx
                fn = float(jnp.linalg.norm(prob.residual(xt)))
                if np.isfinite(fn) and fn <= (1 - alpha * t) * fnorm:
                    return xt
                t *= 0.5
            return None
        raise ValueError(f"unknown linesearch {ls!r}")

    # ------------------------------------------------------------- solve

    def solve(self, x0) -> NewtonResult:
        opts = self.options
        prob = self.problem
        rtol = float(opts.opt("snes_rtol"))
        atol = float(opts.opt("snes_atol"))
        stol = float(opts.opt("snes_stol"))
        max_it = int(opts.opt("snes_max_it"))
        monitor = Monitor("SNES Function", enabled=bool(opts.opt("snes_monitor")))

        x = prob.set_bc(jnp.asarray(x0, prob.form.dtype))
        with self.timer.phase("residual"):
            F = prob.residual(x)
        fnorm = float(jnp.linalg.norm(F))
        f0 = fnorm
        monitor(0, fnorm)
        history = [fnorm]
        reason = ConvergedReason.ITERATING
        it = 0

        if not np.isfinite(fnorm):
            return NewtonResult(x, ConvergedReason.DIVERGED_FNORM_NAN, 0,
                                fnorm, history)
        if fnorm < atol:
            return NewtonResult(x, ConvergedReason.CONVERGED_FNORM_ABS, 0,
                                fnorm, history)

        while it < max_it:
            dx = self._solve_linear(x, F)
            if not bool(jnp.all(jnp.isfinite(dx))):
                reason = ConvergedReason.DIVERGED_LINEAR_SOLVE
                break
            x_new = self._linesearch(x, dx, fnorm)
            if x_new is None:
                reason = ConvergedReason.DIVERGED_LINE_SEARCH
                break
            it += 1
            x = x_new
            with self.timer.phase("residual"):
                F = prob.residual(x)
            fnorm = float(jnp.linalg.norm(F))
            monitor(it, fnorm)
            history.append(fnorm)
            if not np.isfinite(fnorm):
                reason = ConvergedReason.DIVERGED_FNORM_NAN
                break
            if fnorm < atol:
                reason = ConvergedReason.CONVERGED_FNORM_ABS
                break
            if fnorm <= rtol * f0:
                reason = ConvergedReason.CONVERGED_FNORM_RELATIVE
                break
            snorm = float(jnp.linalg.norm(dx))
            xnorm = float(jnp.linalg.norm(x))
            if snorm < stol * max(xnorm, 1e-300):
                reason = ConvergedReason.CONVERGED_SNORM_RELATIVE
                break
        else:
            reason = ConvergedReason.DIVERGED_MAX_IT
        if reason == ConvergedReason.ITERATING:
            reason = ConvergedReason.DIVERGED_MAX_IT

        if opts.opt("snes_converged_reason"):
            rank_print(f"Nonlinear solve converged due to {reason.name} "
                       f"iterations {it}" if reason.converged else
                       f"Nonlinear solve did not converge due to "
                       f"{reason.name} iterations {it}")
        if (not reason.converged) and opts.opt("snes_error_if_not_converged"):
            raise NotConvergedError(reason)
        return NewtonResult(x, reason, it, fnorm, history)


class SNESSolver:
    """API-compatible analogue of `lvpp.SNESSolver` (problem.py:80-124):
    holds a mutable state vector, solves, and commits only on convergence."""

    def __init__(self, problem: NonlinearProblem, options=None):
        self.problem = problem
        self.newton = NewtonSolver(problem, options)
        self.u = problem.set_bc(jnp.zeros(problem.space.num_dofs,
                                          problem.form.dtype))

    def solve(self):
        res = self.newton.solve(self.u)
        if res.converged:
            self.u = res.x
        return int(res.reason), res.iterations
