import time, numpy as np, jax, jax.numpy as jnp
from proximalgalerkin_tpu.models.gradient_constraint import setup_gradient_constraint
prob = setup_gradient_constraint(N=32, verbose=False)
p = prob.solver.problem if hasattr(prob.solver, "problem") else prob.solver
from proximalgalerkin_tpu.solve import NonlinearProblem
np_ = prob.solver.problem
form = np_.form
x = jnp.asarray(np_.set_bc(prob.space.zeros()))
print("ncells", form.mesh.num_cells, "nq", form.nq, "ndofs", prob.space.num_dofs, flush=True)
t0=time.time()
F = np_.residual(x); F.block_until_ready()
print("residual ok", round(time.time()-t0,1), flush=True)
t0=time.time()
Ae = form.element_matrices(x, np_.coeffs, np_.consts); Ae.block_until_ready()
print("element matrices ok", Ae.shape, round(time.time()-t0,1), flush=True)
t0=time.time()
ell = np_.ell_matrix
data = ell.assemble(Ae); data.block_until_ready()
print("ell assemble ok", data.shape, round(time.time()-t0,1), flush=True)
t0=time.time()
step = np_.direction_solver("minres", "jacobi", "ell")
dx = step(x, F, np_.coeffs, np_.consts, 1e-10, 1e-12, 20000)
dx.block_until_ready()
print("direction ok", round(time.time()-t0,1), flush=True)
