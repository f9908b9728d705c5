import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
import scipy.sparse.linalg as spla
from proximalgalerkin_tpu.models.thermoforming import solve_thermoforming
# build problem guts by reaching into the module flow: call with max 0 iterations? 
# simpler: replicate setup via the function's internals is messy; instead run 1 LVPP iter with LU to get a state
from proximalgalerkin_tpu.mesh.generation import unit_square_mesh
from proximalgalerkin_tpu.spaces import DirichletBC, FunctionSpace, MixedSpace
from proximalgalerkin_tpu.assembly import VolumeForm
from proximalgalerkin_tpu.solve import NonlinearProblem
M=24; q_bound=0.01; beta=1.0; f=25.0; eps_stab=1e-10
mesh = unit_square_mesh(M,M)
V = FunctionSpace.create(mesh,1)
space = MixedSpace([("u",V),("T",V),("psi",V)])
def g(s): return jnp.clip(1.0 - s/q_bound, 0.0, 1.0)
def mould0(x): return 1.0 - 2.0*jnp.maximum(jnp.abs(x[0]-0.5), jnp.abs(x[1]-0.5))
def xi(x): return jnp.sin(jnp.pi*x[0])*jnp.sin(jnp.pi*x[1])
def residual(x,u,gu,c,gc,consts):
    alpha=consts["alpha"]
    expm = jnp.exp(-jnp.clip(u["psi"],-45.,45.))
    return {"u": (u["psi"]-c["psi_prev"]-alpha*f, alpha*gu["u"]),
            "T": (beta*u["T"]-g(expm), gu["T"]),
            "psi": (u["u"]+expm-(mould0(x)+xi(x)*u["T"]), None)}
def jac_residual(x,u,gu,c,gc,consts):
    out = residual(x,u,gu,c,gc,consts)
    a0_p,_ = out["psi"]
    out["psi"] = (a0_p, -(eps_stab/consts["alpha"])*gu["psi"])
    return out
form = VolumeForm(space, residual, 3, jacobian_fn=jac_residual,
                  coeff_spaces={"psi_prev": V, "u_prev": V})
bcs=[DirichletBC.from_marker("u",V,value=0.0)]
p = NonlinearProblem(form, bcs, consts={"alpha": jnp.asarray(2.0**-6)})
nV = V.num_dofs
p.update(coeffs={"psi_prev": jnp.zeros(nV), "u_prev": jnp.zeros(nV)})
x = jnp.asarray(p.set_bc(space.zeros()))
F = p.residual(x)
A = p.jacobian_scipy(x)
dx_lu = spla.splu(A.tocsc()).solve(np.asarray(-F))
print("lu dir norm", np.linalg.norm(dx_lu))
for ksp in ["bicgstab","gmres"]:
    step = p.direction_solver(ksp, "jacobi", "ell")
    dx = np.asarray(step(x, F, p.coeffs, p.consts, 1e-10, 1e-12, 20000))
    rel = np.linalg.norm(A@dx + np.asarray(F))/np.linalg.norm(np.asarray(F))
    print(f"{ksp}: dir diff {np.linalg.norm(dx-dx_lu)/np.linalg.norm(dx_lu):.2e} true relres {rel:.2e}")
