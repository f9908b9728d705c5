import sys, pathlib, time, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

out = {}
def rec(name, **kw):
    out[name] = kw
    print(name, kw, flush=True)
    json.dump(out, open("/tmp/results2.json", "w"), default=str)

from proximalgalerkin_tpu.models.multiphase import solve_multiphase
r = solve_multiphase(N=24, M=24, tau0=1e-4, T=5e-4, verbose=False)
rec("multiphase_24x24_dt1e-4_T5e-4", newton=[int(v) for v in r.newton_iterations],
    lvpp=[int(v) for v in r.lvpp_iterations])

from proximalgalerkin_tpu.models.thermoforming import solve_thermoforming
r = solve_thermoforming(M=48, verbose=False)
rec("thermoforming_M48", lvpp=r.lvpp_iterations, newton=r.total_newton, converged=r.converged)

from proximalgalerkin_tpu.models.thermoforming_compare import (
    moreau_yosida_solve, fixed_point_solve, semismooth_active_set_solve)
b = moreau_yosida_solve(M=48, verbose=False, max_outer=15)
rec("thermoforming_MY_M48", outer=b.outer_iterations, solves=b.linear_solves)
b = fixed_point_solve(M=48, verbose=False)
rec("thermoforming_FP_M48", outer=b.outer_iterations, solves=b.linear_solves)
b = semismooth_active_set_solve(M=48, verbose=False)
rec("thermoforming_SS_M48", solves=b.linear_solves, converged=b.converged)

from proximalgalerkin_tpu.models.gradient_constraint import solve_gradient_constraint
prob, r = solve_gradient_constraint(N=48, M=48, primal_degree=2, stopping_tol=1e-8, verbose=False)
rec("gradient_constraint_48x48_P2", lvpp=r.iterations, newton=r.total_newton,
    newton_min=int(min(r.newton_steps)), newton_max=int(max(r.newton_steps)))

from proximalgalerkin_tpu.models.eigenvalue_constraints import solve_eigenvalue_constraints
r = solve_eigenvalue_constraints(N=20, degree=3, quadrature_degree=12, tol=1e-10, verbose=False)
lo, hi = r.eigenvalue_range()
rec("eigenvalue_20x20_P3", lvpp=r.lvpp.iterations, newton=r.lvpp.total_newton,
    eig_min=round(float(lo), 6), eig_max=round(float(hi), 6))

from proximalgalerkin_tpu.models.intersecting import solve_intersecting
r = solve_intersecting(n_cells=1001, verbose=False)
rec("intersecting_1001", lvpp=r.lvpp_iterations, newton=r.newton_iterations,
    converged=r.converged)

from proximalgalerkin_tpu.models.eikonal import solve_eikonal
r = solve_eikonal(ns=48, nt=6, verbose=False)
rec("eikonal_mobius_48x6", lvpp=r.lvpp_iterations, newton=r.total_newton,
    u_max=round(float(r.u.max()), 4))

from proximalgalerkin_tpu.models.monge_ampere import p_refinement_sweep
r = p_refinement_sweep(3, 8, verbose=False)
rec("monge_ampere_p3..8", errors=[float(f"{e:.3e}") for e in r.errors],
    newton=r.newton_its)
print("DONE", flush=True)
