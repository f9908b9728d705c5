"""Composite problems: a volume form plus facet forms over a shared block
vector — the mixed-dimensional assembly kind="mpi" block problem of the
reference (signorini_dolfinx.py:283-291). Implements the NewtonSolver
problem protocol (set_bc / residual / jacobian_scipy)."""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..assembly.assemble import VolumeForm
from ..assembly.facets import FacetForm
from ..spaces.space import DirichletBC


class CompositeProblem:
    def __init__(self, space_all, vol_form: VolumeForm,
                 facet_forms: Sequence[FacetForm],
                 bcs: Sequence[DirichletBC] = (),
                 coeffs: Optional[Mapping] = None,
                 consts: Optional[Mapping] = None):
        self.space = space_all
        self.form = vol_form           # dtype carrier for NewtonSolver
        self.vol_form = vol_form
        self.facet_forms = list(facet_forms)
        self.n_vol = vol_form.space.num_dofs
        bc_idx, bc_vals = space_all.global_bc_arrays(list(bcs))
        self.bc_idx = jnp.asarray(bc_idx)
        self.bc_vals = jnp.asarray(bc_vals, vol_form.dtype)
        self.coeffs = dict(coeffs or {})        # volume-form coefficients
        self.facet_coeffs = {}                   # facet-form coefficients
        self.consts = dict(consts or {})
        self._direction_cache = {}

    def update(self, coeffs=None, consts=None, facet_coeffs=None):
        if coeffs:
            self.coeffs.update(coeffs)
        if facet_coeffs:
            self.facet_coeffs.update(facet_coeffs)
        if consts:
            self.consts.update(consts)

    def set_bc(self, x):
        return jnp.asarray(x, self.form.dtype).at[self.bc_idx].set(
            self.bc_vals)

    def zero_bc(self, v):
        return v.at[self.bc_idx].set(0.0)

    def residual(self, x):
        x = jnp.asarray(x, self.form.dtype)
        F = jnp.zeros(self.space.num_dofs, self.form.dtype)
        Fv = self.vol_form.residual(x[:self.n_vol], self.coeffs, self.consts)
        F = F.at[:self.n_vol].add(Fv)
        for ff in self.facet_forms:
            F = F + ff.residual(x, self.facet_coeffs, self.consts)
        return F.at[self.bc_idx].set(x[self.bc_idx] - self.bc_vals)

    def jacobian_scipy(self, x):
        import scipy.sparse as sp
        N = self.space.num_dofs
        x = jnp.asarray(x, self.form.dtype)
        Av = self.vol_form.assemble_scipy(x[:self.n_vol], self.coeffs,
                                          self.consts).tocoo()
        rows = [Av.row]
        cols = [Av.col]
        vals = [Av.data]
        for ff in self.facet_forms:
            Ae = np.asarray(ff.element_matrices(x, self.facet_coeffs,
                                                self.consts))
            gi = ff.local_indices
            L = gi.shape[1]
            rows.append(np.repeat(gi, L, axis=1).reshape(-1))
            cols.append(np.tile(gi, (1, L)).reshape(-1))
            vals.append(Ae.reshape(-1))
        A = sp.coo_matrix((np.concatenate(vals),
                           (np.concatenate(rows), np.concatenate(cols))),
                          shape=(N, N)).tolil()
        idx = np.asarray(self.bc_idx)
        if len(idx):
            A[idx, :] = 0.0
            A[:, idx] = 0.0
            A[idx, idx] = 1.0
        return A.tocsr()

    def jacobian_diagonal(self, x):
        A = self.jacobian_scipy(x)
        return jnp.asarray(A.diagonal())

    def jacobian_action(self, x):
        coeffs, consts = self.coeffs, self.consts
        fcoeffs = self.facet_coeffs

        def Av(v):
            w = self.zero_bc(v)
            y = jnp.zeros_like(v)
            f_vol = lambda yv: self.vol_form._jacobian_residual_core(
                yv, coeffs, consts)
            y = y.at[:self.n_vol].add(
                jax.jvp(f_vol, (x[:self.n_vol],), (w[:self.n_vol],))[1])
            for ff in self.facet_forms:
                f_fac = lambda yv: ff._jacobian_residual_core(
                    yv, fcoeffs, consts)
                y = y + jax.jvp(f_fac, (x,), (w,))[1]
            y = self.zero_bc(y)
            return y.at[self.bc_idx].add(v[self.bc_idx])

        return Av
