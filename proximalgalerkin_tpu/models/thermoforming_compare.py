"""Example 05 comparison solvers — Moreau–Yosida penalty, fixed-point, and
semismooth active-set baselines for the thermoforming QVI.

Rebuilds the Julia/Gridap comparison suite
(examples/05_obstacle_type_qvi/solver_comparison/): the Moreau–Yosida
path-following solver (thermoforming_moreau_yosida.jl:75-160: penalty
gamma*max(u - (Phi0 + xi T), 0), gamma-update rule, H1 Cauchy-norm
termination), the alternating fixed-point solver with penalized inner
obstacle solves (thermoforming_fixed_point.jl:128-146), and a semismooth
(active-set) Newton on the complementarity system — each reporting
(iterations, total linear solves) like the Julia scripts print.
"""

from __future__ import annotations

from dataclasses import dataclass


import jax.numpy as jnp
import numpy as np

from ..assembly import VolumeForm
from ..core.config import SolverOptions
from ..core.logging import rank_print
from ..mesh.generation import unit_square_mesh
from ..solve import NonlinearProblem
from ..solve.newton import NewtonSolver
from ..spaces import DirichletBC, FunctionSpace, MixedSpace


@dataclass
class QVIBaselineResult:
    u: np.ndarray
    T: np.ndarray
    outer_iterations: int
    linear_solves: int
    converged: bool


def _setup(M, q_bound, f, beta=1.0):
    mesh = unit_square_mesh(M, M)
    V = FunctionSpace.create(mesh, 1)
    space = MixedSpace([("u", V), ("T", V)])

    def g(s):
        return jnp.clip(1.0 - s / q_bound, 0.0, 1.0)

    def mould0(x):
        return 1.0 - 2.0 * jnp.maximum(jnp.abs(x[0] - 0.5),
                                       jnp.abs(x[1] - 0.5))

    def xi(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    return mesh, V, space, g, mould0, xi


def moreau_yosida_solve(M: int = 150, q_bound: float = 0.01, f: float = 25.0,
                        tol: float = 1e-5, max_outer: int = 100,
                        verbose: bool = True) -> QVIBaselineResult:
    """Penalty path-following (thermoforming_moreau_yosida.jl)."""
    mesh, V, space, g, mould0, xi = _setup(M, q_bound, f)

    def residual(x, u, gu, c, gc, consts):
        gam = consts["gamma"]
        mould = mould0(x) + xi(x) * u["T"]
        a0_u = -f + gam * jnp.maximum(u["u"] - mould, 0.0)
        a1_u = gu["u"]
        a0_T = u["T"] - g(mould - u["u"])
        a1_T = gu["T"]
        return {"u": (a0_u, a1_u), "T": (a0_T, a1_T)}

    form = VolumeForm(space, residual, quadrature_degree=4)
    bcs = [DirichletBC.from_marker("u", V, value=0.0)]
    problem = NonlinearProblem(form, bcs, consts={"gamma": jnp.asarray(1.0)})
    # the Julia reference runs BackTracking(c_1=-1e8): the sufficient-
    # decrease test is vacuous, i.e. full Newton steps (:136)
    # NLsolve ftol=1e-5 is an ABSOLUTE residual test (:136)
    newton = NewtonSolver(problem, SolverOptions(
        {"snes_linesearch_type": "none", "snes_rtol": 1e-12, "snes_atol": 1e-5,
         "snes_max_it": 60, "ksp_type": "preonly", "pc_type": "lu"}))

    energy_fn = form.make_functional(
        lambda x, u, gu, c, gc, k:
        0.5 * jnp.dot(gu["u"], gu["u"]) - f * u["u"])
    infeas_fn = form.make_functional(
        lambda x, u, gu, c, gc, k:
        0.5 * k["gamma"] * jnp.maximum(
            u["u"] - (mould0(x) + xi(x) * u["T"]), 0.0) ** 2)
    h1_fn = form.make_functional(
        lambda x, u, gu, c, gc, k:
        (u["u"] - c["u_prev"]) ** 2
        + jnp.dot(gu["u"] - gc["u_prev"], gu["u"] - gc["u_prev"]))

    # u_prev enters the H1 functional as a FE coefficient
    form2 = VolumeForm(space, residual, quadrature_degree=4,
                       coeff_spaces={"u_prev": V})
    h1_fn = form2.make_functional(
        lambda x, u, gu, c, gc, k:
        (u["u"] - c["u_prev"]) ** 2
        + jnp.dot(gu["u"] - gc["u_prev"], gu["u"] - gc["u_prev"]))

    u_sl, T_sl = space.slice_of("u"), space.slice_of("T")
    x = jnp.asarray(space.zeros())
    x = x.at[T_sl].set(1.0)
    gamma = 1.0
    linear_solves = 0
    converged = False
    j = 0
    for j in range(1, max_outer + 1):
        problem.update(consts={"gamma": jnp.asarray(gamma)})
        u_prev = x[u_sl]
        res = newton.solve(x)
        ok = (bool(jnp.all(jnp.isfinite(res.x)))
              and res.fnorm <= res.fnorm_history[0])
        # accept only residual-reducing iterates: full-step Newton can
        # cycle on the max() kink at large gamma; the penalty path keeps
        # tightening either way
        if ok:
            x = res.x
        linear_solves += res.iterations
        cauchy = float(np.sqrt(max(float(
            h1_fn(x, {"u_prev": u_prev}, {})), 0.0)))
        # gamma update rule (:75-110)
        infeas = float(infeas_fn(x, {}, {"gamma": jnp.asarray(gamma)}))
        func = float(energy_fn(x))
        if verbose:
            rank_print(f"MY j={j} gamma={gamma:.3e} newton={res.iterations} "
                       f"cauchy={cauchy:.3e} infeas={infeas:.3e}")
        if cauchy < tol:
            converged = True
            break
        if abs(func) > 1e-14:
            E = gamma * infeas / func
            theta = func + infeas
            if abs(E) > 1e-300:
                C2 = E * (E + gamma) * theta / gamma
                C1 = C2 / E
                tau = 1.0 / (j + 1)
                g_new = C2 / (tau * abs(C1 - theta)) - E
                if np.isfinite(g_new) and g_new > 0:
                    # growth cap keeps full-step Newton in its basin
                    gamma = min(g_new, gamma * 100.0)
    return QVIBaselineResult(u=np.asarray(x[u_sl]), T=np.asarray(x[T_sl]),
                             outer_iterations=j, linear_solves=linear_solves,
                             converged=converged)


def fixed_point_solve(M: int = 150, q_bound: float = 0.01, f: float = 25.0,
                      tol: float = 1e-5, max_outer: int = 100,
                      gamma: float = 1e6,
                      verbose: bool = True) -> QVIBaselineResult:
    """Alternating T-solve / penalized-u-solve (thermoforming_fixed_point.jl
    :128-146)."""
    mesh, V, space_uT, g, mould0, xi = _setup(M, q_bound, f)
    space_u = MixedSpace([("u", V)])
    space_T = MixedSpace([("T", V)])

    def u_residual(x, u, gu, c, gc, consts):
        a0 = -f + consts["gamma"] * jnp.maximum(u["u"] - c["mould"], 0.0)
        return {"u": (a0, gu["u"])}

    def T_residual(x, u, gu, c, gc, consts):
        return {"T": (u["T"] - g(c["mould_u"]), gu["T"])}

    form_u = VolumeForm(space_u, u_residual, 4)
    form_T = VolumeForm(space_T, T_residual, 4)
    prob_u = NonlinearProblem(form_u, [DirichletBC.from_marker("u", V, 0.0)],
                              consts={"gamma": jnp.asarray(gamma)})
    prob_T = NonlinearProblem(form_T, [])
    nt_u = NewtonSolver(prob_u, SolverOptions(
        {"snes_linesearch_type": "bt", "snes_rtol": 1e-6, "snes_atol": 1e-9,
         "ksp_type": "preonly", "pc_type": "lu", "snes_max_it": 60}))
    nt_T = NewtonSolver(prob_T, SolverOptions(
        {"snes_rtol": 1e-10, "ksp_type": "preonly", "pc_type": "lu"}))

    xq_u = np.asarray(form_u.xq)
    mould0_q = np.asarray(
        1 - 2 * np.maximum(np.abs(xq_u[..., 0] - 0.5),
                           np.abs(xq_u[..., 1] - 0.5)))
    xi_q = np.sin(np.pi * xq_u[..., 0]) * np.sin(np.pi * xq_u[..., 1])

    u = jnp.zeros(V.num_dofs)
    T = jnp.ones(V.num_dofs)
    linear = 0
    converged = False

    # evaluate T at u-quadrature points via the FE tables
    form_eval = VolumeForm(space_u, u_residual, 4, coeff_spaces={"Tc": V})

    def T_at_q(Tvec):
        v, _ = form_eval._eval_coeff("Tc", jnp.asarray(Tvec),
                                     form_eval.cell_data)
        return np.asarray(v)[:, :, 0]

    def u_at_q(uvec):
        v, _ = form_eval._eval_field("u", jnp.asarray(uvec),
                                     form_eval.cell_data)
        return np.asarray(v)[:, :, 0]

    it = 0
    for it in range(1, max_outer + 1):
        u_prev = u
        # T-solve given u: mould_u = Phi0 + xi*T - u needs T... the g-term
        # uses the CURRENT mould gap; lag it with the previous iterates
        gap_q = mould0_q + xi_q * T_at_q(T) - u_at_q(u)
        prob_T.update(coeffs={"mould_u": jnp.asarray(gap_q)})
        resT = nt_T.solve(T)
        T = resT.x
        linear += resT.iterations
        # u-solve given T
        mould_q = mould0_q + xi_q * T_at_q(T)
        prob_u.update(coeffs={"mould": jnp.asarray(mould_q)})
        resu = nt_u.solve(u)
        u = resu.x
        linear += resu.iterations
        diff = float(jnp.linalg.norm(u - u_prev))
        if verbose:
            rank_print(f"FP it={it} linear={linear} |du|={diff:.3e}")
        if diff < tol:
            converged = True
            break
    return QVIBaselineResult(u=np.asarray(u), T=np.asarray(T),
                             outer_iterations=it, linear_solves=linear,
                             converged=converged)


def semismooth_active_set_solve(M: int = 150, q_bound: float = 0.01,
                                f: float = 25.0, tol: float = 1e-10,
                                max_outer: int = 50,
                                verbose: bool = True) -> QVIBaselineResult:
    """Semismooth Newton on the QVI complementarity system (the role of
    SemismoothQVIs.jl in thermoforming_semismooth_active_set.jl:55-60):
    equivalent to Moreau–Yosida with a fixed large penalty, for which the
    max() generalized derivative makes Newton semismooth."""
    total = 0
    x0 = None
    res = None
    for gamma in (1e2, 1e4, 1e8):
        res = moreau_yosida_like_fixed_gamma(M, q_bound, f, gamma, tol,
                                             max_outer, verbose, x0=x0)
        total += res.linear_solves
        x0 = (res.u, res.T)
    res.linear_solves = total
    res.outer_iterations = total
    return res


def moreau_yosida_like_fixed_gamma(M, q_bound, f, gamma, tol, max_outer,
                                   verbose, x0=None):
    mesh, V, space, g, mould0, xi = _setup(M, q_bound, f)

    def residual(x, u, gu, c, gc, consts):
        mould = mould0(x) + xi(x) * u["T"]
        a0_u = -f + consts["gamma"] * jnp.maximum(u["u"] - mould, 0.0)
        a0_T = u["T"] - g(mould - u["u"])
        return {"u": (a0_u, gu["u"]), "T": (a0_T, gu["T"])}

    form = VolumeForm(space, residual, quadrature_degree=4)
    problem = NonlinearProblem(form, [DirichletBC.from_marker("u", V, 0.0)],
                               consts={"gamma": jnp.asarray(gamma)})
    newton = NewtonSolver(problem, SolverOptions(
        {"snes_linesearch_type": "bt", "snes_rtol": 1e-10,
         "snes_atol": 1e-8, "snes_max_it": max_outer,
         "ksp_type": "preonly", "pc_type": "lu"}))
    x = jnp.asarray(space.zeros())
    if x0 is None:
        x = x.at[space.slice_of("T")].set(1.0)
    else:
        x = x.at[space.slice_of("u")].set(jnp.asarray(x0[0]))
        x = x.at[space.slice_of("T")].set(jnp.asarray(x0[1]))
    res = newton.solve(x)
    return QVIBaselineResult(
        u=np.asarray(res.x[space.slice_of("u")]),
        T=np.asarray(res.x[space.slice_of("T")]),
        outer_iterations=res.iterations, linear_solves=res.iterations,
        converged=res.converged)
