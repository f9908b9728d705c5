"""Example 02 — Signorini contact (vector elasticity, boundary latent).

Rebuild of examples/02_signorini/signorini_dolfinx.py: linear elasticity
of a half-disk pressed onto a rigid plane, with the non-penetration
constraint u·n_g <= g on the contact boundary enforced by an exp latent
variable that lives ONLY on the contact facets (the reference's boundary
submesh + cross-mesh blocked assembly, :199-291; here a TraceSpace +
composite volume/facet assembly). Residual (:244-249):

  volume:  alpha sigma(u):eps(v) dx - alpha f.v dx
  ds(contact): -(psi - psi_k)(v.n_g) + (u.n_g + exp(psi) - g) w

with n_g = -e_y the rigid-plane direction, g = x_y - gap. Alpha schemes
constant/linear/doubling (:324-329, default doubling from alpha_0=0.005),
termination on ||u - u_prev||_2 (:337-339), penetration observable
sqrt(int max(u.n_g - g, 0)^2 ds) (:309-314).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..assembly import VolumeForm
from ..assembly.facets import FacetForm
from ..core.config import SolverOptions
from ..core.logging import rank_print
from ..mesh.parametric import create_half_disk
from ..mesh.unstructured import TaggedMesh
from ..solve.composite import CompositeProblem
from ..solve.newton import NewtonSolver
from ..spaces import DirichletBC, FunctionSpace, MixedSpace
from ..spaces.trace import TraceSpace


@dataclass
class SignoriniResult:
    u: np.ndarray            # (n, gdim) displacement at scalar dofs
    psi: np.ndarray
    lvpp_iterations: int
    newton_iterations: List[int]
    penetrations: List[float]
    converged: bool
    von_mises: Optional[np.ndarray] = None   # per-cell (DG0) von Mises


def solve_signorini(
    tagged: Optional[TaggedMesh] = None,
    res: float = 0.04,
    degree: int = 1,
    E: float = 2e4,
    nu: float = 0.3,
    gap: float = 0.02,
    disp: float = -0.10,
    alpha_scheme: str = "doubling",
    alpha_0: float = 0.005,
    alpha_c: float = 1.0,
    max_iterations: int = 25,
    tol: float = 1e-6,
    newton_tol: float = 1e-6,
    newton_max_its: int = 50,
    quadrature_degree: int = 4,
    solver_options: Optional[dict] = None,
    verbose: bool = True,
) -> SignoriniResult:
    """Half-disk pressed down by `disp` onto the plane y = gap... the
    reference's run of record uses degree 2, alpha_0=0.005 doubling, disp
    in {-0.10, -0.15, -0.20} (examples/02_signorini/README.md:28-30)."""
    tagged = tagged if tagged is not None else create_half_disk(res=res)
    mesh = tagged.mesh
    gdim = mesh.gdim
    contact_facets = tagged.facets("contact")
    disp_facets = tagged.facets("displacement")

    Vu = FunctionSpace.create(mesh, degree, value_size=gdim)
    Wpar = FunctionSpace.create(mesh, degree)
    trace = TraceSpace(Wpar, contact_facets)

    space_vol = MixedSpace([("u", Vu)])
    space_all = MixedSpace([("u", Vu), ("psi", trace)])

    mu = E / (2.0 * (1.0 + nu))
    lmbda = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    n_g = np.zeros(gdim)
    n_g[-1] = -1.0
    n_g_j = jnp.asarray(n_g)

    def vol_residual(x, u, gu, c, gc, consts):
        alpha = consts["alpha"]
        eps_u = 0.5 * (gu["u"] + gu["u"].T)
        sigma = 2.0 * mu * eps_u + lmbda * jnp.trace(eps_u) * jnp.eye(gdim)
        return {"u": (None, alpha * sigma)}

    vol_form = VolumeForm(space_vol, vol_residual, quadrature_degree)

    def facet_residual(x, u, gu, c, gc, n, consts):
        g = x[gdim - 1] - gap
        un = jnp.dot(u["u"], n_g_j)
        # overflow-safe exp: inexact (Krylov) Newton directions can
        # overshoot psi transiently; a huge-but-finite residual lets the
        # next step recover where exp(inf) would poison the solve
        psi_c = jnp.minimum(u["psi"], 45.0)
        return {
            "u": -(u["psi"] - c["psi_k"]) * n_g_j,
            # psi-row NEGATED relative to the reference's sign convention
            # (signorini_dolfinx.py:244-249): same zeros, same |F|, same
            # Newton steps, but the facet Jacobian block becomes SYMMETRIC
            # ([[0, -M],[-M, -e^psi M]] instead of [[0,-M],[+M, e^psi M]]),
            # which makes the full saddle system MINRES-admissible
            "psi": -(un + jnp.exp(psi_c) - g),
        }

    # Regularized Jacobian for iterative (Krylov) solves: deep off-contact
    # the latent diagonal -exp(psi) M underflows and the saddle system is
    # numerically singular — exactly the case direct LU pivots through.
    # The reference's own recipe is an eps-mass Jacobian regularization
    # (fracture_dolfinx.py:132-138); eps=1e-8 bounds the block's diagonal
    # while leaving Newton directions accurate to O(eps).
    opts_peek = dict(solver_options or {})
    iterative = opts_peek.get("ksp_type", "preonly") not in ("preonly",) \
        and opts_peek.get("pc_type", "lu") != "lu"

    def facet_jacobian(x, u, gu, c, gc, n, consts):
        out = facet_residual(x, u, gu, c, gc, n, consts)
        out["psi"] = out["psi"] - 1e-8 * u["psi"]
        return out

    facet_form = FacetForm(space_all, contact_facets, facet_residual,
                           quadrature_degree,
                           jacobian_fn=facet_jacobian if iterative else None)

    # Dirichlet: full displacement vector (0, disp) on the flat top (:261-270)
    disp_dofs = Vu.facet_closure_dofs(disp_facets)
    disp_vals = np.zeros(len(disp_dofs))
    disp_vals[np.asarray(disp_dofs) % gdim == gdim - 1] = disp
    bcs = [DirichletBC("u", disp_dofs, disp_vals)]

    problem = CompositeProblem(space_all, vol_form, [facet_form], bcs,
                               coeffs={}, consts={"alpha": jnp.asarray(alpha_0)})

    opts = {"snes_linesearch_type": "none", "snes_rtol": newton_tol,
            "snes_atol": 1e-50, "snes_max_it": newton_max_its,
            "ksp_type": "preonly", "pc_type": "lu"}
    opts.update(solver_options or {})
    newton = NewtonSolver(problem, SolverOptions(opts))

    pen_fn = facet_form.make_functional(
        lambda x, u, gu, c, gc, n, k:
        jnp.maximum(jnp.dot(u["u"], n_g_j) - (x[gdim - 1] - gap), 0.0) ** 2)

    u_sl = space_all.slice_of("u")
    psi_sl = space_all.slice_of("psi")

    # psi_k enters the facet form as a quadrature coefficient: evaluate the
    # trace field at the facet quadrature points
    tab_psi = np.asarray(facet_form.facet_data["tab"]["psi"])
    gidx_psi = np.asarray(facet_form.facet_data["gather_idx"]["psi"])

    def psi_k_quad(x_k):
        zc = np.asarray(x_k)[gidx_psi[:, :, 0]]
        return jnp.asarray(np.einsum("nqi,ni->nq", tab_psi, zc))

    x = jnp.asarray(space_all.zeros())
    x_prev = x
    newton_its: List[int] = []
    penetrations: List[float] = []
    converged = False
    it = 0
    for it in range(1, max_iterations + 1):
        if alpha_scheme == "constant":
            a = alpha_0
        elif alpha_scheme == "linear":
            a = alpha_0 + alpha_c * (it - 1)
        else:
            a = alpha_0 * 2.0 ** (it - 1)
        problem.update(facet_coeffs={"psi_k": psi_k_quad(x_prev)},
                       consts={"alpha": jnp.asarray(a)})
        res_n = newton.solve(x)
        if not res_n.converged:
            rank_print(f"  Newton failed ({res_n.reason.name}); stopping")
            break
        x = res_n.x
        newton_its.append(res_n.iterations)
        pen = float(np.sqrt(max(float(pen_fn(x, problem.facet_coeffs,
                                             problem.consts)), 0.0)))
        penetrations.append(pen)
        diff = float(jnp.linalg.norm(x[u_sl] - x_prev[u_sl]))
        if verbose:
            rank_print(f"it={it} alpha={a:.4g} newton={res_n.iterations} "
                       f"|du|={diff:.3e} penetration={pen:.3e}")
        if diff < tol:
            converged = True
            break
        x_prev = x

    # von Mises stress per cell (reference output, signorini_dolfinx.py:
    # 296-302): s = sigma - tr(sigma)/3 I, vm = sqrt(3/2 s:s)
    vals, grads = vol_form._eval_field("u", x[u_sl], vol_form.cell_data)
    gu = np.asarray(grads).mean(axis=1)            # (e, gdim, gdim)
    eps_c = 0.5 * (gu + np.swapaxes(gu, 1, 2))
    tr = np.trace(eps_c, axis1=1, axis2=2)
    eye = np.eye(gdim)
    sig = 2 * mu * eps_c + lmbda * tr[:, None, None] * eye
    dev = sig - np.trace(sig, axis1=1, axis2=2)[:, None, None] / 3.0 * eye
    vm = np.sqrt(1.5 * np.einsum("eij,eij->e", dev, dev))

    n_scalar = Vu.num_scalar_dofs
    return SignoriniResult(
        u=np.asarray(x[u_sl]).reshape(n_scalar, gdim),
        psi=np.asarray(x[psi_sl]),
        lvpp_iterations=it,
        newton_iterations=newton_its,
        penetrations=penetrations,
        converged=converged,
        von_mises=vm)
