import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
print("devices", jax.devices(), flush=True)
from proximalgalerkin_tpu.mesh import rectangle_mesh
from proximalgalerkin_tpu.models.obstacle_p1 import P1ObstacleSolver, _cg

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
mesh = rectangle_mesh(n, n, p0=(-1,-1), p1=(1,1))
t0 = time.time()
s = P1ObstacleSolver(mesh, mixed_precision=True)
print("setup", round(time.time()-t0,1), "N", s.N, flush=True)

A32, ea32 = s.A32, s.ea32
Minv = (1.0/jnp.maximum(s.ell.diagonal(s.A_data), 1e-30)).astype(jnp.float32)

@jax.jit
def cg_once(b):
    x, its = _cg(lambda v: s.ell.spmv(A32, v, ea32), b, Minv, 1e-6, 1000)
    return x, its

b = jnp.ones(s.N, jnp.float32)
t0=time.time()
x, its = cg_once(b); x.block_until_ready()
print("cg compile+run", round(time.time()-t0,1), "its", int(its), flush=True)
for rep in range(10):
    t0=time.time()
    x, its = cg_once(b + rep)
    x.block_until_ready()
    print("rep", rep, round(time.time()-t0,3), "its", int(its), flush=True)
