import sys, pathlib, time, json
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

out = {}
def rec(name, **kw):
    out[name] = kw
    print(name, kw, flush=True)

t0=time.time()
from proximalgalerkin_tpu.mesh.unstructured import create_disk_mesh
from proximalgalerkin_tpu.models import solve_obstacle_problem
mesh = create_disk_mesh(0.08)
for order in (1, 2):
    prob, r = solve_obstacle_problem(mesh, polynomial_order=order,
        alpha_scheme="double_exponential", alpha_max=1e2, tol_exit=1e-6, verbose=False)
    rec(f"obstacle_P{order}_disk008", lvpp=r.iterations, newton=r.total_newton,
        dofs=prob.V.num_scalar_dofs, energy=round(r.observables["Energy"][-1], 6))

from proximalgalerkin_tpu.models.obstacle_fd import fd_resolution_sweep
its = fd_resolution_sweep(js=(1,2,3,4,5,6))
rec("obstacle_fd_sweep_N2^j+1_j1..6", newton_totals=its)

from proximalgalerkin_tpu.models.obstacle_spectral import spectral_p_sweep
r = spectral_p_sweep(ps=(8,16,24), verbose=False)
rec("obstacle_spectral", degrees=r.degrees, newton=r.newton_its,
    sup_diffs=[None if np.isnan(e) else round(e,6) for e in r.sup_errors])

from proximalgalerkin_tpu.models.obstacle_qp import compare_all
c = compare_all(create_disk_mesh(0.1), verbose=False)
rec("compare_all_disk01", **{k: int(v) for k, v in c.iterations.items()})

from proximalgalerkin_tpu.models.signorini import solve_signorini
for disp in (-0.10, -0.15, -0.20):
    r = solve_signorini(res=0.04, disp=disp, verbose=False)
    rec(f"signorini_disp{disp}", lvpp=r.lvpp_iterations,
        newton=int(sum(r.newton_iterations)),
        penetration=float(r.penetrations[-1]), converged=r.converged)

from proximalgalerkin_tpu.models.fracture import solve_fracture
r = solve_fracture(max_res=0.1, Tmin=0.0, Tmax=3.0, num_load_steps=31, verbose=False)
rec("fracture_31steps_res01", steps=len(r.load_history), broken=r.broken,
    total_newton=int(sum(r.newton_per_step)), max_damage=round(max(r.max_damage_history),3))

from proximalgalerkin_tpu.models.multiphase import solve_multiphase
r = solve_multiphase(N=30, M=30, tau0=1e-4, T=1e-3, verbose=False)
rec("multiphase_30x30_dt1e-4_T1e-3", newton=[int(v) for v in r.newton_iterations],
    lvpp=[int(v) for v in r.lvpp_iterations])

from proximalgalerkin_tpu.models.thermoforming import solve_thermoforming
r = solve_thermoforming(M=64, verbose=False)
rec("thermoforming_M64", lvpp=r.lvpp_iterations, newton=r.total_newton,
    converged=r.converged)

from proximalgalerkin_tpu.models.thermoforming_compare import (
    moreau_yosida_solve, fixed_point_solve, semismooth_active_set_solve)
b = moreau_yosida_solve(M=64, verbose=False, max_outer=15)
rec("thermoforming_MY_M64", outer=b.outer_iterations, solves=b.linear_solves)
b = fixed_point_solve(M=64, verbose=False)
rec("thermoforming_FP_M64", outer=b.outer_iterations, solves=b.linear_solves)
b = semismooth_active_set_solve(M=64, verbose=False)
rec("thermoforming_SS_M64", solves=b.linear_solves, converged=b.converged)

from proximalgalerkin_tpu.models.gradient_constraint import solve_gradient_constraint
prob, r = solve_gradient_constraint(N=64, M=64, primal_degree=2, stopping_tol=1e-8, verbose=False)
rec("gradient_constraint_64x64_P2", lvpp=r.iterations, newton=r.total_newton,
    newton_min=int(min(r.newton_steps)), newton_max=int(max(r.newton_steps)))

from proximalgalerkin_tpu.models.eigenvalue_constraints import solve_eigenvalue_constraints
r = solve_eigenvalue_constraints(N=24, degree=3, quadrature_degree=12, tol=1e-10, verbose=False)
lo, hi = r.eigenvalue_range()
rec("eigenvalue_24x24_P3", lvpp=r.lvpp.iterations, newton=r.lvpp.total_newton,
    eig_min=round(float(lo),6), eig_max=round(float(hi),6))

from proximalgalerkin_tpu.models.intersecting import solve_intersecting
r = solve_intersecting(n_cells=1001, verbose=False)
rec("intersecting_1001", lvpp=r.lvpp_iterations, newton=r.newton_iterations,
    converged=r.converged)

from proximalgalerkin_tpu.models.eikonal import solve_eikonal
r = solve_eikonal(ns=48, nt=6, verbose=False)
rec("eikonal_mobius_48x6", lvpp=r.lvpp_iterations, newton=r.total_newton,
    u_max=round(float(r.u.max()),4))

from proximalgalerkin_tpu.models.monge_ampere import p_refinement_sweep
r = p_refinement_sweep(3, 8, verbose=False)
rec("monge_ampere_p3..8", errors=[float(f"{e:.3e}") for e in r.errors],
    newton=r.newton_its)

json.dump(out, open("/tmp/results.json", "w"), indent=1, default=str)
print("TOTAL TIME", round(time.time()-t0,1))
