import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, jax, jax.numpy as jnp, numpy as np
print("devices", jax.devices())
from proximalgalerkin_tpu.mesh import rectangle_mesh
from proximalgalerkin_tpu.models import setup_obstacle_problem

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
t0=time.time()
mesh = rectangle_mesh(n, n, p0=(-1,-1), p1=(1,1))
prob = setup_obstacle_problem(mesh, verbose=False)
p = prob.problem; space = prob.space
x = p.set_bc(space.zeros())
p.update(coeffs={"psi_k": x[space.slice_of("psi")], "u_k": x[space.slice_of("u")]},
         consts={"alpha": jnp.asarray(1.0)})
print("setup", round(time.time()-t0,1), "ndofs", space.num_dofs)

t0=time.time(); F = p.residual(x); F.block_until_ready(); print("residual compile", round(time.time()-t0,1))
t0=time.time()
for _ in range(5): F = p.residual(x)
F.block_until_ready(); print("residual x5", round(time.time()-t0,4))

for maxit in (500, 2000):
    step = p.direction_solver("minres","jacobi","ell")
    t0=time.time(); dx = step(x, F, p.coeffs, p.consts, 1e-8, 0.0, maxit); dx.block_until_ready()
    print(f"ell direction maxit={maxit} compile+run", round(time.time()-t0,1))
    t0=time.time(); dx = step(x, F, p.coeffs, p.consts, 1e-8, 0.0, maxit); dx.block_until_ready()
    print(f"ell direction maxit={maxit} run", round(time.time()-t0,3))
    # true residual of linear solve
    Av = p.jacobian_action(x)
    r = Av(dx) + F
    print("linear rel resid", float(jnp.linalg.norm(r)/jnp.linalg.norm(F)))
