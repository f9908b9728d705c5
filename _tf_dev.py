import time, sys
import numpy as np
from proximalgalerkin_tpu.models.thermoforming import solve_thermoforming
ksp = sys.argv[1]; rtol = float(sys.argv[2])
opts = {"ksp_type": ksp, "pc_type": "jacobi", "mat_type": "ell",
        "ksp_rtol": rtol, "ksp_atol": 1e-12, "ksp_max_it": 20000}
t0=time.time()
r = solve_thermoforming(M=24, solver_options=opts, verbose=True)
print(f"{ksp}: lvpp={r.lvpp_iterations} newton={r.total_newton} conv={r.converged} t={round(time.time()-t0,1)}")
r2 = solve_thermoforming(M=24, verbose=True)
print("lu  :", r2.lvpp_iterations, r2.total_newton, r2.converged)
print("u diff", float(np.max(np.abs(r.u - r2.u))))
