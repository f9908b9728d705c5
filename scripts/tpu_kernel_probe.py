import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
print("devices", jax.devices(), flush=True)

from proximalgalerkin_tpu.mesh import rectangle_mesh
from proximalgalerkin_tpu.models.obstacle_p1 import P1ObstacleSolver

mesh = rectangle_mesh(16, 16, p0=(-1,-1), p1=(1,1))
s = P1ObstacleSolver(mesh)
ea = s.ell.arrays
N = s.N
u = jnp.zeros(N); psi = jnp.ones(N)

# piece 1: spmv
t0=time.time()
y = jax.jit(lambda d, v: s.ell.spmv(d, v))(s.A_data, u + 1.0)
y.block_until_ready(); print("spmv ok", round(time.time()-t0,1), flush=True)

# piece 2: diagonal
t0=time.time()
dg = jax.jit(lambda d: s.ell.diagonal(d))(s.A_data)
dg.block_until_ready(); print("diag ok", round(time.time()-t0,1), flush=True)

# piece 3: full newton kernel
t0=time.time()
out = s._newton(u, psi, jnp.zeros(N), jnp.zeros(N), jnp.asarray(1.0), s.A_data, ea)
out[0].block_until_ready(); print("newton ok", round(time.time()-t0,1), "its", int(out[2]), flush=True)

# piece 4: full solve at 16
t0=time.time()
res = s.solve(verbose=False)
print("solve ok", round(time.time()-t0,1), "outer", res.outer_iterations, flush=True)
