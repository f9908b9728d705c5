"""Volume-form assembly as batched tensor contractions.

This is the TPU-native replacement for the reference's UFL -> FFCx -> C
kernel -> PETSc assembly pipeline (SURVEY.md layer 4; exercised from
src/lvpp/problem.py:54-77). Design:

  * A problem is defined by a *pointwise* residual function evaluated at
    quadrature points — `jax.jvp`/`jax.jacfwd` of that function replaces
    `ufl.derivative` (symbolic Gateaux derivative) exactly.
  * Field evaluation, physics, and test-function contraction are batched
    einsums over (cells, quadrature points): they map onto the MXU/VPU and
    XLA fuses the elementwise physics into the contractions.
  * The Jacobian never needs to be materialized: its action is the jvp of
    the assembled residual (cost ≈ 2 residuals), feeding matrix-free Krylov.
    Explicit element matrices / scipy CSR are available for the host sparse
    LU fallback (standing in for MUMPS) and for preconditioners.

Residual convention: for test function v of field f,
    F_f(v) = ∫ a0_f · v + a1_f : grad(v) dx
where the user's pointwise function returns {field: (a0, a1)} given
(x, values, gradients, coefficients, coefficient gradients, constants).
"""

from __future__ import annotations

from functools import cached_property, partial
from typing import Callable, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..elements.quadrature import cell_quadrature
from ..spaces.space import FunctionSpace, MixedSpace
from .geometry import cell_geometry


def _canon_val(a, m):
    """Normalize a user value of a field with m components to shape (m,)."""
    a = jnp.asarray(a)
    return a.reshape(m) if a.ndim <= 1 else a


def _canon_grad(a, m, gdim):
    a = jnp.asarray(a)
    return a.reshape(m, gdim)


class VolumeForm:
    """Assembler for ∫ ... dx over all cells of the mesh of a MixedSpace.

    Args:
      space: the mixed function space of the unknowns.
      residual_fn: pointwise residual
          fn(x, u, gu, c, gc, consts) -> {field: (a0, a1 | None)}
        with x (gdim,), u[f] scalar or (m,), gu[f] (gdim,) or (m, gdim);
        coefficient values c[name] and gradients gc[name] analogous (gc[name]
        is None for raw quadrature-point coefficients).
      quadrature_degree: polynomial degree the rule integrates exactly
        (reference uses 6 for the obstacle problem, obstacle_pg.py:106).
      coeff_spaces: {name: FunctionSpace} for FE-function coefficients
        (e.g. the previous LVPP iterate psi_k); other coefficient entries
        passed at call time are treated as raw per-quadrature-point arrays
        of shape (ncells, nq, ...) (the quadrature-element obstacle phi,
        obstacle_pg.py:106-111).
    """

    def __init__(self, space: MixedSpace, residual_fn: Callable,
                 quadrature_degree: int,
                 coeff_spaces: Optional[Mapping[str, object]] = None,
                 dtype=jnp.float64):
        self.space = space
        self.residual_fn = residual_fn
        self.coeff_spaces = dict(coeff_spaces or {})
        self.dtype = dtype
        mesh = space.mesh
        self.mesh = mesh
        self.qpts, self.qw = cell_quadrature(mesh.cell_type, quadrature_degree)
        self.nq = len(self.qw)
        geom = cell_geometry(mesh, self.qpts, self.qw)
        self.xq = jnp.asarray(geom.x, dtype)         # (e, q, gdim)
        self.wdet = jnp.asarray(geom.wdet, dtype)    # (e, q)
        self.G = jnp.asarray(geom.G, dtype)          # (e, q, gdim, tdim)
        self.gdim, self.tdim = mesh.gdim, mesh.tdim

        # basis tables and gather/scatter indices per field
        self.tab: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        self.gather_idx: Dict[str, jnp.ndarray] = {}
        self.field_m: Dict[str, int] = {}
        for name in space.names:
            fs = space.spaces[name]
            self._register(name, fs, space.offsets[name])
        # coefficient spaces may reuse field tables or bring their own
        self.coeff_tab: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        self.coeff_idx: Dict[str, jnp.ndarray] = {}
        self.coeff_m: Dict[str, int] = {}
        for name, fs in self.coeff_spaces.items():
            if isinstance(fs, MixedSpace):
                continue  # handled at call time via its own VolumeForm
            phi, dphi = fs.element.tabulate(self.qpts)
            self.coeff_tab[name] = (jnp.asarray(phi, dtype), jnp.asarray(dphi, dtype))
            m = fs.value_size
            dm = fs.dofmap.astype(np.int64)
            idx = dm[:, :, None] * m + np.arange(m)[None, None, :]
            self.coeff_idx[name] = jnp.asarray(idx.astype(np.int32))
            self.coeff_m[name] = m

    def _register(self, name: str, fs: FunctionSpace, offset: int):
        phi, dphi = fs.element.tabulate(self.qpts)   # (q, i), (q, i, tdim)
        self.tab[name] = (jnp.asarray(phi, self.dtype),
                          jnp.asarray(dphi, self.dtype))
        m = fs.value_size
        dm = fs.dofmap.astype(np.int64)
        idx = offset + dm[:, :, None] * m + np.arange(m)[None, None, :]
        self.gather_idx[name] = jnp.asarray(idx.astype(np.int32))  # (e, i, m)
        self.field_m[name] = m

    # ------------------------------------------------------------ evaluation

    def _eval_field(self, name: str, x: jnp.ndarray):
        """vals (e,q,m), phys grads (e,q,m,gdim) of field `name` from the
        global mixed vector x."""
        phi, dphi = self.tab[name]
        zc = x[self.gather_idx[name]]                # (e, i, m)
        vals = jnp.einsum("qi,eim->eqm", phi, zc)
        rg = jnp.einsum("qit,eim->eqmt", dphi, zc)
        grads = jnp.einsum("eqdt,eqmt->eqmd", self.G, rg)
        return vals, grads

    def _eval_coeff(self, name: str, z: jnp.ndarray):
        phi, dphi = self.coeff_tab[name]
        zc = z[self.coeff_idx[name]]
        vals = jnp.einsum("qi,eim->eqm", phi, zc)
        rg = jnp.einsum("qit,eim->eqmt", dphi, zc)
        grads = jnp.einsum("eqdt,eqmt->eqmd", self.G, rg)
        return vals, grads

    def _prepare_coeffs(self, coeffs: Mapping[str, jnp.ndarray]):
        """Split user coefficients into per-quad-point (vals, grads|None)."""
        cv, cg = {}, {}
        for name, arr in (coeffs or {}).items():
            if name in self.coeff_tab:
                v, g = self._eval_coeff(name, jnp.asarray(arr, self.dtype))
                cv[name], cg[name] = v, g
            else:
                a = jnp.asarray(arr, self.dtype)
                if a.ndim == 2:   # (e, q) scalar coefficient
                    a = a[:, :, None]
                cv[name], cg[name] = a, None
        return cv, cg

    # ------------------------------------------------- pointwise call (user)

    def _user_shapes(self, vals, grads):
        u, gu = {}, {}
        for f, m in self.field_m.items():
            if m == 1:
                u[f] = vals[f][0]
                gu[f] = grads[f][0]
            else:
                u[f] = vals[f]
                gu[f] = grads[f]
        return u, gu

    def _pointwise(self, xq, svals, sgrads, cvals, cgrads, consts):
        """Canonical-shape pointwise residual: inputs svals[f] (m,),
        sgrads[f] (m, gdim); returns canonical (a0 (m,), a1 (m, gdim))."""
        u, gu = self._user_shapes(svals, sgrads)
        c = {k: (v[0] if v.shape == (1,) else v) for k, v in cvals.items()}
        gc = {k: (None if g is None else (g[0] if g.shape[0] == 1 and
                                          self.coeff_m.get(k, 1) == 1 else g))
              for k, g in cgrads.items()}
        out = self.residual_fn(xq, u, gu, c, gc, consts)
        res = {}
        for f, m in self.field_m.items():
            a0, a1 = out.get(f, (None, None))
            a0c = jnp.zeros((m,), self.dtype) if a0 is None else _canon_val(a0, m)
            a1c = (jnp.zeros((m, self.gdim), self.dtype) if a1 is None
                   else _canon_grad(a1, m, self.gdim))
            res[f] = (a0c, a1c)
        return res

    # ---------------------------------------------------------- residual

    @cached_property
    def _residual_jit(self):
        @jax.jit
        def residual(x, coeffs, consts):
            return self._residual_core(x, coeffs, consts)
        return residual

    def _residual_core(self, x, coeffs, consts):
        x = jnp.asarray(x, self.dtype)
        vals, grads = {}, {}
        for f in self.space.names:
            vals[f], grads[f] = self._eval_field(f, x)
        cv, cg = self._prepare_coeffs(coeffs)

        pw = lambda xq, sv, sg, cvq, cgq: self._pointwise(
            xq, sv, sg, cvq, cgq, consts)
        t = jax.vmap(jax.vmap(pw))(self.xq, vals, grads, cv, cg)

        F = jnp.zeros(self.space.num_dofs, self.dtype)
        for f in self.space.names:
            phi, dphi = self.tab[f]
            a0, a1 = t[f]                            # (e,q,m), (e,q,m,gdim)
            wa0 = a0 * self.wdet[:, :, None]
            wa1 = jnp.einsum("eqdt,eqmd->eqmt", self.G,
                             a1 * self.wdet[:, :, None, None])
            r = (jnp.einsum("qi,eqm->eim", phi, wa0)
                 + jnp.einsum("qit,eqmt->eim", dphi, wa1))
            F = F.at[self.gather_idx[f].reshape(-1)].add(r.reshape(-1))
        return F

    def residual(self, x, coeffs=None, consts=None) -> jnp.ndarray:
        return self._residual_jit(x, coeffs or {}, consts or {})

    # ------------------------------------------------- matrix-free Jacobian

    @cached_property
    def _jvp_jit(self):
        @jax.jit
        def action(x, v, coeffs, consts):
            f = lambda y: self._residual_core(y, coeffs, consts)
            return jax.jvp(f, (x,), (v,))[1]
        return action

    def jacobian_action(self, x, v, coeffs=None, consts=None) -> jnp.ndarray:
        """J(x) @ v without materializing J (replaces assemble_matrix+MatMult)."""
        return self._jvp_jit(x, v, coeffs or {}, consts or {})

    # ------------------------------------------------- element matrices

    @cached_property
    def _element_matrices_jit(self):
        @jax.jit
        def elmats(x, coeffs, consts):
            return self._element_matrices_core(x, coeffs, consts)
        return elmats

    def _element_matrices_core(self, x, coeffs, consts):
        """Full mixed element matrices (e, L, L), L = sum_f nl_f * m_f,
        local ordering = fields in space order, each (i, comp) interleaved."""
        x = jnp.asarray(x, self.dtype)
        vals, grads = {}, {}
        for f in self.space.names:
            vals[f], grads[f] = self._eval_field(f, x)
        cv, cg = self._prepare_coeffs(coeffs)

        def pw(xq, sv, sg, cvq, cgq):
            return self._pointwise(xq, sv, sg, cvq, cgq, consts)

        def pw_jac(xq, sv, sg, cvq, cgq):
            return jax.jacfwd(lambda s: pw(xq, s[0], s[1], cvq, cgq))((sv, sg))

        K = jax.vmap(jax.vmap(pw_jac))(self.xq, vals, grads, cv, cg)
        # K[f][0 or 1] -> tuple over (svals, sgrads) -> dict g -> array

        # physical gradients of basis per field
        gphi = {}
        for f in self.space.names:
            phi, dphi = self.tab[f]
            gphi[f] = jnp.einsum("eqdt,qit->eqid", self.G, dphi)

        w = self.wdet
        blocks = []
        for f in self.space.names:
            phif, _ = self.tab[f]
            gpf = gphi[f]
            row = []
            for g in self.space.names:
                phig, _ = self.tab[g]
                gpg = gphi[g]
                (K0, K1) = K[f]          # derivative of (a0_f, a1_f)
                K00 = K0[0][g] * w[:, :, None, None]
                K01 = K0[1][g] * w[:, :, None, None, None]
                K10 = K1[0][g] * w[:, :, None, None, None]
                K11 = K1[1][g] * w[:, :, None, None, None, None]
                t1 = jnp.einsum("qi,eqab,qj->eiajb", phif, K00, phig)
                t2 = jnp.einsum("qi,eqabd,eqjd->eiajb", phif, K01, gpg)
                t3 = jnp.einsum("eqid,eqadb,qj->eiajb", gpf, K10, phig)
                t4 = jnp.einsum("eqid,eqadbc,eqjc->eiajb", gpf, K11, gpg)
                A = t1 + t2 + t3 + t4
                e = A.shape[0]
                nlf, mf = A.shape[1], A.shape[2]
                nlg, mg = A.shape[3], A.shape[4]
                row.append(A.reshape(e, nlf * mf, nlg * mg))
            blocks.append(row)
        ncells = self.mesh.num_cells
        return jnp.concatenate(
            [jnp.concatenate(r, axis=2) for r in blocks], axis=1)

    def element_matrices(self, x, coeffs=None, consts=None) -> jnp.ndarray:
        return self._element_matrices_jit(x, coeffs or {}, consts or {})

    @cached_property
    def local_indices(self) -> np.ndarray:
        """(e, L) global dof for each local mixed slot (field-concatenated)."""
        per = [np.asarray(self.gather_idx[f]).reshape(self.mesh.num_cells, -1)
               for f in self.space.names]
        return np.concatenate(per, axis=1)

    def assemble_scipy(self, x, coeffs=None, consts=None):
        """Assembled CSR matrix on host (the MUMPS-replacement LU path for
        small/medium systems and verification)."""
        import scipy.sparse as sp
        Ae = np.asarray(self.element_matrices(x, coeffs, consts))
        gi = self.local_indices
        L = gi.shape[1]
        rows = np.repeat(gi, L, axis=1).reshape(-1)
        cols = np.tile(gi, (1, L)).reshape(-1)
        N = self.space.num_dofs
        A = sp.coo_matrix((Ae.reshape(-1), (rows, cols)), shape=(N, N))
        return A.tocsr()

    def _diagonal_core(self, x, coeffs, consts):
        """Jacobian diagonal without materializing element matrices —
        O(ncells * nq * m^2 * d^2) memory, the Jacobi-preconditioner path
        for large (1M-DoF) systems."""
        x = jnp.asarray(x, self.dtype)
        vals, grads = {}, {}
        for f in self.space.names:
            vals[f], grads[f] = self._eval_field(f, x)
        cv, cg = self._prepare_coeffs(coeffs)

        def pw_jac(xq, sv, sg, cvq, cgq):
            return jax.jacfwd(lambda s: self._pointwise(
                xq, s[0], s[1], cvq, cgq, consts))((sv, sg))

        K = jax.vmap(jax.vmap(pw_jac))(self.xq, vals, grads, cv, cg)
        w = self.wdet
        out = jnp.zeros(self.space.num_dofs, self.dtype)
        for f in self.space.names:
            phi, dphi = self.tab[f]
            gphi = jnp.einsum("eqdt,qit->eqid", self.G, dphi)
            (K0, K1) = K[f]
            # diagonal (a == b) slices of the f-f block
            K00d = jnp.einsum("eqaa->eqa", K0[0][f])
            K01d = jnp.einsum("eqaad->eqad", K0[1][f])
            K10d = jnp.einsum("eqada->eqad", K1[0][f])
            K11d = jnp.einsum("eqadac->eqadc", K1[1][f])
            t1 = jnp.einsum("qi,qi,eq,eqa->eia", phi, phi, w, K00d)
            t2 = jnp.einsum("qi,eqid,eq,eqad->eia", phi, gphi, w, K01d + K10d)
            t4 = jnp.einsum("eqid,eqadc,eq,eqic->eia", gphi, K11d, w, gphi)
            d = t1 + t2 + t4                         # (e, i, a)
            out = out.at[self.gather_idx[f].reshape(-1)].add(d.reshape(-1))
        return out

    @cached_property
    def _diag_jit(self):
        @jax.jit
        def diag(x, coeffs, consts):
            return self._diagonal_core(x, coeffs, consts)
        return diag

    def jacobian_diagonal(self, x, coeffs=None, consts=None) -> jnp.ndarray:
        """Diagonal of the assembled Jacobian (Jacobi preconditioning)."""
        return self._diag_jit(x, coeffs or {}, consts or {})

    # ------------------------------------------------------- functionals

    def make_functional(self, fn: Callable) -> Callable:
        """Compile a scalar functional ∫ fn(x, u, gu, c, gc, consts) dx —
        the observables of the reference (energy, complementarity,
        feasibility, increments; obstacle_pg.py:145-152)."""

        @jax.jit
        def functional(x, coeffs=None, consts=None):
            xx = jnp.asarray(x, self.dtype)
            vals, grads = {}, {}
            for f in self.space.names:
                vals[f], grads[f] = self._eval_field(f, xx)
            cv, cg = self._prepare_coeffs(coeffs or {})

            def pw(xq, sv, sg, cvq, cgq):
                u, gu = self._user_shapes(sv, sg)
                c = {k: (v[0] if v.shape == (1,) else v) for k, v in cvq.items()}
                gc = {k: (None if g is None else
                          (g[0] if g.shape[0] == 1 and
                           self.coeff_m.get(k, 1) == 1 else g))
                      for k, g in cgq.items()}
                return fn(xq, u, gu, c, gc, consts or {})

            vq = jax.vmap(jax.vmap(pw))(self.xq, vals, grads, cv, cg)
            return jnp.sum(vq * self.wdet)

        return functional

    def interpolate_to_quadrature(self, fn: Callable) -> np.ndarray:
        """Evaluate a host function f(x:(gdim,npts)) at all physical
        quadrature points -> (ncells, nq) array (the quadrature-element
        interpolation of the obstacle, obstacle_pg.py:106-111)."""
        xq = np.asarray(self.xq)
        flat = xq.reshape(-1, self.gdim).T
        return np.asarray(fn(flat)).reshape(xq.shape[0], xq.shape[1])
