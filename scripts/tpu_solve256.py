import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from proximalgalerkin_tpu.mesh import rectangle_mesh
from proximalgalerkin_tpu.models.obstacle_p1 import P1ObstacleSolver
n = 256
mesh = rectangle_mesh(n, n, p0=(-1,-1), p1=(1,1))
s = P1ObstacleSolver(mesh, cg_max=3000)
t0=time.time()
res = s.solve(verbose=True)
print(n, "solve", round(time.time()-t0,1), "outer", res.outer_iterations,
      "newton", res.newton_its, "conv", res.converged, flush=True)
