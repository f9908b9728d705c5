import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from proximalgalerkin_tpu.mesh import rectangle_mesh
from proximalgalerkin_tpu.models.obstacle_p1 import P1ObstacleSolver

n = 256
mesh = rectangle_mesh(n, n, p0=(-1,-1), p1=(1,1))
s = P1ObstacleSolver(mesh, cg_max=100, newton_max=1)
N = s.N
u = jnp.zeros(N); psi = jnp.ones(N)
t0=time.time()
y = jax.jit(lambda d, v: s.ell.spmv(d, v))(s.A_data, u + 1.0)
y.block_until_ready(); print("spmv ok", round(time.time()-t0,1), flush=True)
t0=time.time()
out = s._newton(u, psi, jnp.zeros(N), jnp.zeros(N), jnp.asarray(1.0), s.A_data, s.ell.arrays)
out[0].block_until_ready(); print("newton(1,cg100) ok", round(time.time()-t0,1), flush=True)
# now longer cg
s2 = P1ObstacleSolver(mesh, cg_max=2000, newton_max=1)
t0=time.time()
out = s2._newton(u, psi, jnp.zeros(N), jnp.zeros(N), jnp.asarray(1.0), s2.A_data, s2.ell.arrays)
out[0].block_until_ready(); print("newton(1,cg2000) ok", round(time.time()-t0,1), flush=True)
# full newton loop
s3 = P1ObstacleSolver(mesh, cg_max=2000, newton_max=50)
t0=time.time()
out = s3._newton(u, psi, jnp.zeros(N), jnp.zeros(N), jnp.asarray(1.0), s3.A_data, s3.ell.arrays)
out[0].block_until_ready(); print("newton(50,cg2000) ok", round(time.time()-t0,1), "its", int(out[2]), flush=True)
