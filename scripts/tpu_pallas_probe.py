import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from proximalgalerkin_tpu.mesh import rectangle_mesh
from proximalgalerkin_tpu.models.obstacle_p1 import P1ObstacleSolver
from proximalgalerkin_tpu.ops import dia_spmv_pallas

mesh = rectangle_mesh(1024, 1024, p0=(-1,-1), p1=(1,1))
s = P1ObstacleSolver(mesh, mixed_precision=True)
x32 = jnp.ones(s.N, jnp.float32)
d32 = s.A32

f_xla = jax.jit(lambda d, v: s.dia.spmv(v, d))
f_pl = jax.jit(lambda d, v: dia_spmv_pallas(s.dia.offsets, d, v, block=131072))

for name, f in (("xla", f_xla), ("pallas", f_pl)):
    t0=time.time(); y = f(d32, x32); y.block_until_ready()
    print(name, "compile+run", round(time.time()-t0,2), flush=True)
    t0=time.time()
    for _ in range(50): y = f(d32, x32)
    y.block_until_ready()
    print(name, "50 reps", round(time.time()-t0,4), "->", round((time.time()-t0)/50*1e3,3), "ms/spmv", flush=True)
print("agree:", float(jnp.abs(f_xla(d32,x32)-f_pl(d32,x32)).max()), flush=True)
