"""Example 04 — four-species multiphase Cahn–Hilliard gradient flow.

Rebuild of examples/04_multiphase/multiphase_dolfinx.py: mixed
(u, z, psi) with each field a 4-vector P1 function (:38-43), simplex
constraint (u_m >= 0, sum_m u_m = 1) via the softmax latent map
u_m = exp(psi_m)/sum exp(psi) (:83-90), implicit Euler stepping (:75-78),
per-step latent warm start psi_i = ln(|u_i| + 1e-7) + 1 (:183-196), and
alpha schemes constant/linear/doubling capped at alpha_max (:203-205).

Residual (Einstein-index forms :64-90), per test field:
  z-row:   alpha<z, y> + eps^2 alpha <grad u, grad y> - 2 alpha <u, y>
           + <psi - psi_old, y> - alpha <1, y>
  u-row:   <u - u_prev, v> - tau <grad z, grad v>
  psi-row: <u - softmax(psi) - eps0 psi, w>
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..assembly import VolumeForm
from ..core.config import SolverOptions
from ..core.logging import rank_print
from ..mesh.generation import unit_square_mesh
from ..mesh.mesh import Mesh
from ..solve import NonlinearProblem
from ..solve.newton import NewtonSolver
from ..spaces import FunctionSpace, MixedSpace

NUM_SPECIES = 4


def _circumradius(mesh: Mesh) -> np.ndarray:
    """Per-cell circumradius (ufl.Circumradius equivalent) for triangles."""
    pts = mesh.points[mesh.cell_vertices]
    a = np.linalg.norm(pts[:, 1] - pts[:, 2], axis=1)
    b = np.linalg.norm(pts[:, 0] - pts[:, 2], axis=1)
    c = np.linalg.norm(pts[:, 0] - pts[:, 1], axis=1)
    s = 0.5 * (a + b + c)
    area = np.sqrt(np.maximum(s * (s - a) * (s - b) * (s - c), 1e-300))
    return a * b * c / (4.0 * area)


def initial_condition(V: FunctionSpace) -> np.ndarray:
    """The reference's three-region initial layout (:92-125): species 0
    everywhere, species 1 in a rectangle, species 2/3 in its lower halves.
    Applied cell-wise (all dofs of cells inside each region)."""
    mesh = V.mesh
    n = V.num_scalar_dofs
    u = np.zeros(n * NUM_SPECIES)
    u[0::NUM_SPECIES] = 1.0

    def cells_where(marker):
        ok = marker(mesh.points.T)
        return np.flatnonzero(np.all(ok[mesh.cell_vertices], axis=1))

    def set_species(cells, species):
        dofs = np.unique(V.dofmap[cells].reshape(-1))
        base = dofs * NUM_SPECIES
        for m in range(NUM_SPECIES):
            u[base + m] = 1.0 if m == species else 0.0

    tol = 1e-14
    rect = cells_where(lambda x: (0.2 - tol <= x[1]) & (x[1] <= 0.75 + tol)
                       & (0.2 - tol <= x[0]) & (x[0] <= 0.8 + tol))
    low_l = cells_where(lambda x: (x[1] <= 0.5 + tol) & (0.2 - tol <= x[1])
                        & (0.2 - tol <= x[0]) & (x[0] <= 0.5 + tol))
    low_r = cells_where(lambda x: (x[1] <= 0.5 + tol) & (0.2 <= x[1] + tol)
                        & (0.5 - tol <= x[0]) & (x[0] <= 0.8 + tol))
    set_species(rect, 1)
    set_species(low_l, 2)
    set_species(low_r, 3)
    return u


@dataclass
class MultiphaseResult:
    u: np.ndarray
    newton_iterations: np.ndarray
    lvpp_iterations: np.ndarray
    mass_history: List[np.ndarray] = field(default_factory=list)


def solve_multiphase(
    N: int = 50,
    M: int = 50,
    primal_degree: int = 1,
    cell_type: str = "triangle",
    alpha_max: float = 50.0,
    alpha_scheme: str = "constant",
    alpha_0: float = 1.0,
    alpha_c: float = 1.0,
    max_iterations: int = 20,
    stopping_tol: float = 1e-5,
    tau0: float = 1e-5,
    T: float = 7e-3,
    solver_options: Optional[dict] = None,
    verbose: bool = True,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 10,
    progress_jsonl: Optional[str] = None,
) -> MultiphaseResult:
    """checkpoint_path: npz snapshot written every checkpoint_every time
    steps and loaded on entry if present, so the 700-step protocol run
    resumes instead of restarting; progress_jsonl appends one JSON line
    per completed implicit-Euler step (incremental record emission)."""
    mesh = unit_square_mesh(N, M, cell_type=cell_type, diagonal="crossed")
    C = FunctionSpace.create(mesh, primal_degree, value_size=NUM_SPECIES)
    space = MixedSpace([("u", C), ("z", C), ("psi", C)])

    eps0 = 1e-9

    def residual(x, u, gu, c, gc, consts):
        alpha, tau = consts["alpha"], consts["tau"]
        eps2 = c["eps"] ** 2
        uu, zz, psi = u["u"], u["z"], u["psi"]
        softmax = jax.nn.softmax(psi)
        a0_z = (alpha * zz - 2.0 * alpha * uu + psi - c["psi_old"]
                - alpha * jnp.ones(NUM_SPECIES))
        a1_z = eps2 * alpha * gu["u"]
        a0_u = uu - c["u_prev"]
        a1_u = -tau * gu["z"]
        a0_psi = uu - softmax - eps0 * psi
        return {"u": (a0_u, a1_u), "z": (a0_z, a1_z), "psi": (a0_psi, None)}

    form = VolumeForm(space, residual, quadrature_degree=2 * primal_degree + 1,
                      coeff_spaces={"u_prev": C, "psi_old": C, "u_old": C})

    def residual_nl(x, u, gu, c, gc, consts):
        """The only non-affine term of `residual`: -softmax(psi) in the
        psi equation. Everything else is linear in x (u_prev/psi_old are
        coefficients, alpha/tau/eps constants), so the Jacobian splits as
        J(x) = J_lin + J_nl(psi) with J_lin constant per (alpha, tau).
        Assembled on a psi-only subspace (12x12 local blocks, verified
        == the [psi,psi] block of the full 36x36 jacfwd to 0.0)."""
        return {"psi": (-jax.nn.softmax(u["psi"]), None)}

    space_psi = MixedSpace([("psi", C)])
    form_nl = VolumeForm(space_psi, residual_nl,
                         quadrature_degree=2 * primal_degree + 1)
    # epsilon = 2h with h = 2*circumradius, a cellwise coefficient (:52-53)
    R = _circumradius(mesh)
    eps_q = np.repeat((4.0 * R)[:, None], form.nq, axis=1)

    problem = NonlinearProblem(
        form, [],
        coeffs={"eps": jnp.asarray(eps_q)},
        consts={"alpha": jnp.asarray(alpha_0), "tau": jnp.asarray(tau0)})

    # Split-Jacobian assembly: the CSR data of the affine part is cached
    # once per (alpha, tau); each refactorization re-differentiates and
    # scatters ONLY the softmax (psi,psi) block — measured ~6 s (full
    # jacfwd + 13M-entry scatter) -> ~0.2 s per Jacobian assembly at 50^2,
    # the 700-step record's second-largest cost after triangular solves.
    _lin_cache: dict = {}

    def _csr_data_override(xx, coeffs, consts):
        from ..native import scatter_add
        key = (float(consts["alpha"]), float(consts["tau"]))
        xx = jnp.asarray(xx)
        x_psi = xx[psi_sl]
        pat = problem.ell_matrix.pattern
        if _lin_cache.get("key") != key:
            x0 = jnp.zeros_like(xx)
            ae_full = np.array(form.element_matrices(x0, coeffs, consts))
            ae_nl0 = np.asarray(form_nl.element_matrices(
                jnp.zeros_like(x_psi), {}, consts))
            nloc = ae_nl0.shape[1]
            ae_full[:, -nloc:, -nloc:] -= ae_nl0
            _lin_cache["lin"] = scatter_add(
                ae_full.reshape(-1).astype(np.float64),
                pat.slot_map.astype(np.int64), pat.nnz)
            ncells, L, _ = ae_full.shape
            _lin_cache["slots_nl"] = np.ascontiguousarray(
                pat.slot_map.reshape(ncells, L, L)[:, -nloc:, -nloc:]
            ).reshape(-1).astype(np.int64)
            _lin_cache["key"] = key
        ae_nl = np.asarray(form_nl.element_matrices(x_psi, {}, consts))
        return _lin_cache["lin"] + scatter_add(
            ae_nl.reshape(-1).astype(np.float64),
            _lin_cache["slots_nl"], pat.nnz)

    problem.csr_data_override = _csr_data_override

    # Device twin of the split (EllSplit, solve/nonlinear.py): the fused
    # btlu Newton assembles J(x) = lin_ell + nl_ell(psi) ON DEVICE with a
    # CLOSED-FORM softmax Jacobian — d(-softmax)_m/dpsi_n =
    # s_m s_n - delta_mn s_m — instead of re-differentiating all 36 local
    # dofs through jvp (measured 3.4 s + 1.3 s scatter per Newton
    # iteration at 50^2 in emulated f64; the closed form is ~10 MFLOP).
    # Slot/lane maps are precomputed on host; nl entries landing on
    # BC-killed slots scatter into a dump lane (multiphase has no BCs,
    # but the machinery stays general).
    def _install_ell_split():
        from ..solve.nonlinear import EllSplit
        pat = problem.ell_matrix.pattern
        ncells = mesh.num_cells
        phi_psi = np.asarray(form.tab["psi"][0])        # (q, i)
        nloc = NUM_SPECIES * phi_psi.shape[1]
        Lf = int(round(np.sqrt(pat.slot_map.size / ncells)))
        slots_nl = np.ascontiguousarray(
            pat.slot_map.reshape(ncells, Lf, Lf)[:, -nloc:, -nloc:]
        ).reshape(-1).astype(np.int64)
        eg = pat.ell_gather.reshape(-1).astype(np.int64)
        live = eg < pat.nnz
        dump = pat.num_dofs * pat.width
        slot_to_pos = np.full(pat.nnz, dump, np.int64)
        slot_to_pos[eg[live]] = np.flatnonzero(live)
        ell_idx = np.where(pat.keep[slots_nl] > 0.0,
                           slot_to_pos[slots_nl], dump).astype(np.int32)
        NK = int(pat.num_dofs) * int(pat.width)

        extra = {"gidx": form.gather_idx["psi"],
                 "phi": jnp.asarray(phi_psi, form.dtype),
                 "wdet": form.wdet,
                 "ell_idx": jnp.asarray(ell_idx)}
        eye = np.eye(NUM_SPECIES)

        def nl_core(x, coeffs, consts, ex):
            zc = x[ex["gidx"]]                           # (e, i, m)
            psi_q = jnp.einsum("qi,eim->eqm", ex["phi"], zc)
            s = jax.nn.softmax(psi_q, axis=-1)
            M = (s[..., :, None] * s[..., None, :]
                 - s[..., :, None] * jnp.asarray(eye, s.dtype))
            Ae = jnp.einsum("eq,qi,qj,eqmn->eimjn", ex["wdet"],
                            ex["phi"], ex["phi"], M)
            flat = Ae.reshape(-1)
            return jnp.zeros((NK + 1,), flat.dtype).at[
                ex["ell_idx"]].add(flat)[:NK].reshape(
                    pat.num_dofs, pat.width)

        _lin_ell_cache: dict = {}

        def lin_data(coeffs, consts):
            key = (float(consts["alpha"]), float(consts["tau"]))
            if _lin_ell_cache.get("key") != key:
                x0 = jnp.zeros(space.num_dofs)
                ae_full = np.array(form.element_matrices(x0, coeffs,
                                                         consts))
                ae_nl0 = np.asarray(form_nl.element_matrices(
                    jnp.zeros(space_psi.num_dofs), {}, consts))
                ae_full[:, -nloc:, -nloc:] -= ae_nl0
                _lin_ell_cache["lin"] = problem.ell_matrix.assemble(
                    jnp.asarray(ae_full))
                _lin_ell_cache["key"] = key
            return _lin_ell_cache["lin"]

        problem.ell_split = EllSplit(nl_core, lin_data, extra)

    # the reference runs snes_type=newtonls with PETSc's default cubic
    # backtracking linesearch (multiphase_dolfinx.py:128); without a
    # linesearch the softmax coupling makes full Newton oscillate
    opts = {"snes_atol": 1e-8, "snes_rtol": 1e-8, "snes_max_it": 25,
            "ksp_type": "preonly", "pc_type": "lu",
            "snes_linesearch_type": "bt"}
    opts.update(solver_options or {})
    if opts.get("snes_fused") and opts.get("pc_type") == "btlu":
        _install_ell_split()
    newton = NewtonSolver(problem, SolverOptions(opts))

    l2_fn = form.make_functional(
        lambda x, u, gu, c, gc, k: jnp.dot(u["u"] - c["u_old"],
                                           u["u"] - c["u_old"]))
    mass_fn = form.make_functional(
        lambda x, u, gu, c, gc, k: jnp.sum(u["u"]))

    u_sl = space.slice_of("u")
    psi_sl = space.slice_of("psi")

    u_prev = jnp.asarray(initial_condition(C))
    x = jnp.asarray(space.zeros())

    num_steps = int(np.ceil(T / tau0))
    newton_its = np.zeros(num_steps, dtype=np.int32)
    lvpp_its = np.zeros(num_steps, dtype=np.int32)
    masses: List[np.ndarray] = []

    start_step = 0
    if checkpoint_path is not None:
        from pathlib import Path
        if Path(checkpoint_path).exists():
            from ..utils.checkpoint import LVPPCheckpoint
            ck = LVPPCheckpoint.load(checkpoint_path)
            u_prev = jnp.asarray(ck.x)
            x = jnp.asarray(ck.x_k)
            start_step = int(ck.step)
            n_done = len(ck.newton_steps)
            newton_its[:n_done] = np.asarray(ck.newton_steps,
                                             dtype=np.int32)[:num_steps]
            lv = ck.observables.get("lvpp", [])
            lvpp_its[:len(lv)] = np.asarray(lv, dtype=np.int32)[:num_steps]
            masses = [np.array([m]) for m in ck.observables.get("mass", [])]
            if verbose:
                rank_print(f"Resuming multiphase at time step {start_step}")

    def _save_ck(j):
        from ..utils.checkpoint import LVPPCheckpoint
        LVPPCheckpoint(
            x=np.asarray(u_prev), x_k=np.asarray(x), iteration=0,
            alpha_prev_raw=1.0, step=j,
            newton_steps=[int(v) for v in newton_its[:j]],
            observables={"lvpp": [float(v) for v in lvpp_its[:j]],
                         "mass": [float(m[0]) for m in masses]},
        ).save(checkpoint_path)

    def _emit(j, i, wall):
        if progress_jsonl is None:
            return
        import json as _json
        with open(progress_jsonl, "a") as f:
            f.write(_json.dumps(
                {"step": j, "newton": int(newton_its[j - 1]),
                 "lvpp": int(i), "mass": float(masses[-1][0]),
                 "wall_s": round(wall, 2)}) + "\n")

    import time as _time
    for j in range(start_step + 1, num_steps + 1):
        _t_step = _time.time()
        if verbose:
            rank_print(f"Step {j}/{num_steps}")
        # latent warm start psi = ln(|u|+1e-7) + 1 (:183-196)
        psi_init = jnp.log(jnp.abs(u_prev) + 1e-7) + 1.0
        x = x.at[u_sl].set(u_prev)
        x = x.at[psi_sl].set(psi_init)
        psi_old = psi_init
        u_old = jnp.zeros_like(u_prev)

        for i in range(1, max_iterations + 1):
            if alpha_scheme == "constant":
                a = alpha_0
            elif alpha_scheme == "linear":
                a = min(alpha_0 + alpha_c * i, alpha_max)
            elif alpha_scheme == "doubling":
                a = min(alpha_0 * 2**i, alpha_max)
            problem.update(
                coeffs={"u_prev": u_prev, "psi_old": psi_old, "u_old": u_old},
                consts={"alpha": jnp.asarray(a)})
            res = newton.solve(x)
            if not res.converged:
                raise RuntimeError(
                    f"Newton diverged at step {j} it {i}: {res.reason.name}")
            x = res.x
            newton_its[j - 1] += res.iterations
            coeffs = dict(problem.coeffs)
            diff = float(np.sqrt(max(float(l2_fn(x, coeffs, {})), 0.0)))
            if verbose:
                rank_print(f"Iteration {i}: alpha={a:.2e} "
                           f"newton={res.iterations} |delta u|={diff:.3e}")
            u_old = x[u_sl]
            psi_old = x[psi_sl]
            if diff < stopping_tol:
                break
        lvpp_its[j - 1] = i
        if verbose:
            import os as _os
            if _os.environ.get("PGTPU_STEP_TIMERS"):
                rank_print("  [timers] " + "; ".join(
                    f"{k} {v:.1f}s/{newton.timer.counts[k]}"
                    for k, v in newton.timer.totals.items()))
                newton.timer.totals.clear()
                newton.timer.counts.clear()
        u_prev = x[u_sl]
        masses.append(np.array(
            [float(mass_fn(x, problem.coeffs, {}))]))
        _emit(j, i, _time.time() - _t_step)
        if checkpoint_path is not None and j % checkpoint_every == 0:
            _save_ck(j)

    return MultiphaseResult(u=np.asarray(u_prev),
                            newton_iterations=newton_its,
                            lvpp_iterations=lvpp_its,
                            mass_history=masses)


def save_npz(result: MultiphaseResult, path, **config):
    """np.savez of iteration counts + run config (reference
    multiphase_dolfinx.py:325-341)."""
    np.savez(path, newton_iterations=result.newton_iterations,
             lvpp_iterations=result.lvpp_iterations,
             u=result.u, **config)
