import time, numpy as np
from proximalgalerkin_tpu.models.gradient_constraint import solve_gradient_constraint
opts = {"ksp_type":"minres","pc_type":"jacobi","mat_type":"ell",
        "ksp_rtol":1e-10,"ksp_atol":1e-12,"ksp_max_it":40000,"ksp_chunk_it":1000}
t0=time.time()
prob, res = solve_gradient_constraint(N=16, solver_options=opts, verbose=False)
print("minres:", res.iterations, int(sum(res.newton_iterations)), res.converged, round(time.time()-t0,1))
t0=time.time()
prob2, res2 = solve_gradient_constraint(N=16, verbose=False)
print("lu    :", res2.iterations, int(sum(res2.newton_iterations)), res2.converged, round(time.time()-t0,1))
u1 = prob.u(res); u2 = prob2.u(res2)
print("u diff", float(np.max(np.abs(u1-u2))))
