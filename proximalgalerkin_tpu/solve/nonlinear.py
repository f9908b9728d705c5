"""Nonlinear problem: couples a VolumeForm with Dirichlet BCs into the
residual/Jacobian operators the Newton solver consumes.

Mirrors the role of `lvpp.SNESProblem` (reference src/lvpp/problem.py:14-77):
BC-consistent residual (F[bc] = x[bc] - g, zero once x satisfies the BC) and
symmetric BC treatment of the Jacobian (zeroed bc rows/columns, identity on
the bc diagonal) — for both the matrix-free action and assembled matrices.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..assembly.assemble import VolumeForm
from ..spaces.space import DirichletBC


class NonlinearProblem:
    def __init__(self, form: VolumeForm, bcs: Sequence[DirichletBC] = (),
                 coeffs: Optional[Mapping] = None,
                 consts: Optional[Mapping] = None):
        self.form = form
        self.space = form.space
        bc_idx, bc_vals = self.space.global_bc_arrays(list(bcs))
        self.bc_idx = jnp.asarray(bc_idx)
        self.bc_vals = jnp.asarray(bc_vals, form.dtype)
        self.coeffs = dict(coeffs or {})
        self.consts = dict(consts or {})
        self._direction_cache = {}

    # -------------------------------------------------------------- data

    def update(self, coeffs: Optional[Mapping] = None,
               consts: Optional[Mapping] = None):
        if coeffs:
            self.coeffs.update(coeffs)
        if consts:
            self.consts.update(consts)

    # ---------------------------------------------------------------- BC

    def set_bc(self, x):
        """Overwrite bc dofs with their prescribed values."""
        return jnp.asarray(x, self.form.dtype).at[self.bc_idx].set(self.bc_vals)

    def zero_bc(self, v):
        return v.at[self.bc_idx].set(0.0)

    # --------------------------------------------------------- operators

    def residual(self, x):
        """BC-consistent residual: interior rows from the form, bc rows
        x[bc] - g (SNES set_bc convention, problem.py:67)."""
        F = self.form.residual(x, self.coeffs, self.consts)
        return F.at[self.bc_idx].set(x[self.bc_idx] - self.bc_vals)

    def jacobian_action(self, x):
        """Returns the matrix-free operator v -> J(x) v with symmetric BC
        handling: J_mod = P J P + (I - P), P zeroing bc entries."""
        coeffs, consts = self.coeffs, self.consts
        form = self.form

        def Av(v):
            w = self.zero_bc(v)
            y = form.jacobian_action(x, w, coeffs, consts)
            y = self.zero_bc(y)
            return y.at[self.bc_idx].add(v[self.bc_idx])

        return Av

    @property
    def ell_matrix(self):
        """Lazily-built ELL operator (pattern on host, data assembled on
        device per Newton step) — the PETSc-AIJ replacement."""
        if not hasattr(self, "_ell"):
            from ..la.ell import EllMatrix, EllPattern
            pattern = EllPattern.build(self.form.local_indices,
                                       self.space.num_dofs,
                                       np.asarray(self.bc_idx))
            self._ell = EllMatrix(pattern, self.form.dtype)
        return self._ell

    def direction_solver(self, ksp: str, pc: str, mat_type: str = "ell"):
        """One fused, jitted Newton-direction kernel per option set:
        (x, F, coeffs, consts, rtol, atol, maxiter) -> dx solving
        J(x) dx = -F entirely on device. mat_type 'ell' assembles the
        Jacobian once into an ELL matrix (cheap SpMV per Krylov iteration);
        'matfree' re-applies the jvp of the residual each iteration.
        Compiled once per shape set — no per-step retracing."""
        key = (ksp, pc, mat_type)
        if key in self._direction_cache:
            return self._direction_cache[key]

        from ..la import krylov as kry
        form = self.form
        bc_idx, bc_vals = self.bc_idx, self.bc_vals
        ell = self.ell_matrix if mat_type == "ell" else None

        def direction(x, F, coeffs, consts, rtol, atol, maxiter, cell_data,
                      ell_arrays):
            if mat_type == "ell":
                Ae = form._element_matrices_core(x, coeffs, consts, cell_data)
                data = ell.assemble(Ae, ell_arrays)

                def Av(v):
                    return ell.spmv(data, v, ell_arrays)
            else:
                def Av(v):
                    w = v.at[bc_idx].set(0.0)
                    f = lambda y: form._jacobian_residual_core(
                        y, coeffs, consts, cell_data)
                    y = jax.jvp(f, (x,), (w,))[1]
                    y = y.at[bc_idx].set(0.0)
                    return y.at[bc_idx].add(v[bc_idx])

            b = -F
            if pc == "jacobi":
                if mat_type == "ell":
                    d = ell.diagonal(data, ell_arrays)
                else:
                    d = form._diagonal_core(x, coeffs, consts, cell_data)
                    d = d.at[bc_idx].set(1.0)
                dinv = jnp.where(jnp.abs(d) > 1e-300, 1.0 / d, 1.0)
            else:
                dinv = jnp.ones_like(b)
            if ksp == "minres":
                return kry.minres(Av, b, tol=rtol, atol=atol, maxiter=maxiter,
                                  Minv_diag=jnp.abs(dinv))
            M = (lambda v: dinv * v) if pc == "jacobi" else None
            if ksp == "cg":
                xs, _ = jax.scipy.sparse.linalg.cg(
                    Av, b, tol=rtol, atol=atol, maxiter=maxiter, M=M)
            elif ksp == "gmres":
                xs, _ = jax.scipy.sparse.linalg.gmres(
                    Av, b, tol=rtol, atol=atol, maxiter=maxiter, M=M,
                    restart=30, solve_method="batched")
            elif ksp == "bicgstab":
                xs, _ = jax.scipy.sparse.linalg.bicgstab(
                    Av, b, tol=rtol, atol=atol, maxiter=maxiter, M=M)
            else:
                raise ValueError(f"unknown ksp_type {ksp!r}")
            return xs

        jitted = jax.jit(direction, static_argnames=("maxiter",))

        def fn(x, F, coeffs, consts, rtol, atol, maxiter):
            return jitted(x, F, coeffs, consts, rtol, atol, maxiter,
                          form.cell_data,
                          ell.arrays if ell is not None else {})

        self._direction_cache[key] = fn
        return fn

    def jacobian_scipy(self, x):
        """Assembled CSR with bc rows/cols zeroed and unit diagonal."""
        import scipy.sparse as sp
        A = self.form.assemble_scipy(x, self.coeffs, self.consts).tolil()
        idx = np.asarray(self.bc_idx)
        if len(idx):
            A[idx, :] = 0.0
            A[:, idx] = 0.0
            A[idx, idx] = 1.0
        return A.tocsr()

    def jacobian_diagonal(self, x):
        d = self.form.jacobian_diagonal(x, self.coeffs, self.consts)
        return d.at[self.bc_idx].set(1.0)
