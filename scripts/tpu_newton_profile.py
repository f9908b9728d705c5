"""Per-outer wall-time decomposition of the P1 obstacle MG solve.

The round-3 headline run (1024^2, pc=mg) spends ~36 s but only ~13 s is
explained by measured V(1,1)-PCG iteration cost (28k its x 0.45 ms).
This probe times every outer launch of the production solve and
regresses wall_k ~ a + c*newton_k + b*cg_k over the outer iterations:
b = marginal cost per PCG iteration, c = per-Newton-step overhead
(f64 residuals/SpMVs/refinement), a = per-launch overhead.

Usage: python scripts/tpu_newton_profile.py [n]
"""

import sys
import time

import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from proximalgalerkin_tpu.mesh import rectangle_mesh  # noqa: E402
from proximalgalerkin_tpu.models.obstacle_p1 import P1ObstacleSolver  # noqa: E402

t0 = time.time()
mesh = rectangle_mesh(n, n, p0=(-1.0, -1.0), p1=(1.0, 1.0))
solver = P1ObstacleSolver(mesh, alpha_cap=1e2, outer_tol=1e-8,
                          mixed_precision=True, pc="mg")
print(f"setup {time.time() - t0:.1f}s", flush=True)

N = solver.N
ea = {}
u = jnp.zeros(N)
psi = jnp.ones(N)
psi_k = jnp.zeros(N)
u_prev = jnp.zeros(N)

# warmup compile
out = solver._newton(u, psi, psi_k, u_prev, jnp.asarray(1.0),
                     solver.A_data, ea, solver.A32, solver.ea32)
out[0].block_until_ready()
print("warmup done", flush=True)

alpha, C, r, q = 1.0, 1.0, 1.5, 1.5
rows = []
for k in range(100):
    try:
        alpha = min(max(C * r ** (q ** k) - alpha, C), 1e2)
    except OverflowError:
        alpha = 1e2
    t1 = time.time()
    u, psi, nits, cg_its, inc_dev = solver._newton(
        u, psi, psi_k, u_prev, jnp.asarray(alpha), solver.A_data, ea,
        solver.A32, solver.ea32)
    u.block_until_ready()
    wall = time.time() - t1
    psi_k = psi
    inc = float(inc_dev)
    rows.append((wall, int(nits), int(cg_its)))
    print(f"outer {k + 1:3d} alpha={alpha:8.3g} newton={int(nits):3d} "
          f"cg={int(cg_its):6d} inc={inc:9.3e} wall={wall:7.3f}s",
          flush=True)
    if inc < 1e-8:
        break
    u_prev = u

W = np.array([r_[0] for r_ in rows])
NW = np.array([r_[1] for r_ in rows], float)
CG = np.array([r_[2] for r_ in rows], float)
X = np.stack([np.ones_like(NW), NW, CG], 1)
coef, res, _, _ = np.linalg.lstsq(X, W, rcond=None)
pred = X @ coef
print(f"\ntotal wall {W.sum():.2f}s  newton {NW.sum():.0f}  cg {CG.sum():.0f}")
print(f"fit: per-launch a={coef[0] * 1e3:.1f} ms, per-newton "
      f"c={coef[1] * 1e3:.1f} ms, per-cg-it b={coef[2] * 1e3:.3f} ms")
print(f"explained: launch {coef[0] * len(rows):.2f}s, newton "
      f"{coef[1] * NW.sum():.2f}s, cg {coef[2] * CG.sum():.2f}s, "
      f"resid rms {np.sqrt(np.mean((W - pred) ** 2)):.3f}s")
