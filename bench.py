"""Benchmark: 1M-DoF LVPP obstacle problem — assembly + Newton wall-clock.

Protocol (BASELINE.md north star): P1 mixed (u, psi) obstacle problem on
[-1,1]^2, the reference's FD alpha rule min(max(C r^(q^k) - a, C), 1e2)
(obstacle_finite_difference.jl:78), outer l2-increment tolerance 1e-8.
Solver: the P1 lumped-mass proximal Galerkin fast path — fused jitted
Newton with active/inactive deep-contact splitting and Jacobi-CG on the
SPD Schur complement over an ELL stiffness SpMV (obstacle_p1.py).
The timed section covers ALL assembly + Newton + outer-loop work after
one warm-up call compiles the kernels at bench shapes.

Baseline: the reference's per-Newton-step cost is a CPU sparse direct
factor+solve of the 2N x 2N saddle Jacobian (MUMPS; obstacle_pg.py:
128-139). Stand-in: scipy SuperLU factor+solve of the same saddle matrix
built from our assembled stiffness/mass data, measured once on this host,
cached in BENCH_CPU_BASELINE.json, times the Newton-step count of the run.
Baseline assembly time is NOT counted (conservative, favors the baseline).

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np


def main():
    n = int(os.environ.get("PGTPU_BENCH_N", "1024"))
    tol = float(os.environ.get("PGTPU_BENCH_TOL", "1e-8"))
    repo = Path(__file__).resolve().parent
    sys.path.insert(0, str(repo))

    import jax
    import jax.numpy as jnp
    from proximalgalerkin_tpu.mesh import rectangle_mesh
    from proximalgalerkin_tpu.models.obstacle_p1 import P1ObstacleSolver

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    t0 = time.time()
    mesh = rectangle_mesh(n, n, p0=(-1.0, -1.0), p1=(1.0, 1.0))
    mixed = os.environ.get("PGTPU_BENCH_MIXED", "1") == "1"
    solver = P1ObstacleSolver(mesh, alpha_cap=1e2, outer_tol=tol,
                              mixed_precision=mixed)
    ndofs = 2 * solver.N  # mixed (u, psi) system size
    print(f"# setup {time.time() - t0:.1f}s, primal dofs {solver.N}, "
          f"mixed dofs {ndofs}", file=sys.stderr)

    # warm-up: compile the fused Newton kernel at bench shapes
    t0 = time.time()
    u0 = jnp.zeros(solver.N)
    p0 = jnp.ones(solver.N)
    ea = solver.ell.arrays
    out = solver._newton(
        u0, p0, jnp.zeros(solver.N), jnp.zeros(solver.N), jnp.asarray(1.0),
        solver.A_data, ea,
        solver.A32 if solver.mixed_precision else solver.A_data,
        solver.ea32 if solver.mixed_precision else ea)
    out[0].block_until_ready()
    print(f"# warmup (compile) {time.time() - t0:.1f}s", file=sys.stderr)

    # timed LVPP solve
    t0 = time.time()
    result = solver.solve(verbose=False)
    elapsed = time.time() - t0
    print(f"# outer {result.outer_iterations}, newton {result.newton_its}, "
          f"converged {result.converged}, wall {elapsed:.2f}s",
          file=sys.stderr)

    feas = float((result.u - np.asarray(solver.phi)).min())
    print(f"# final min(u - phi) = {feas:.3e}", file=sys.stderr)

    # CPU sparse-LU baseline per Newton step (cached)
    cache = repo / "BENCH_CPU_BASELINE.json"
    key = f"saddle_n{n}"
    data = json.loads(cache.read_text()) if cache.exists() else {}
    per_step = data.get(key)
    if per_step is None:
        per_step = _cpu_saddle_lu_seconds(solver)
        data[key] = per_step
        cache.write_text(json.dumps(data))
    baseline_total = per_step * max(result.newton_its, 1)
    print(f"# CPU saddle LU baseline: {per_step:.2f}s/step x "
          f"{result.newton_its} = {baseline_total:.1f}s", file=sys.stderr)

    print(json.dumps({
        "metric": f"obstacle_lvpp_{ndofs}dof_wallclock",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(baseline_total / max(elapsed, 1e-9), 3),
    }))


def _cpu_saddle_lu_seconds(solver) -> float:
    """Factor+solve the 2N x 2N saddle Newton matrix once on host CPU."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    N = solver.N
    pat = solver.ell.pattern
    rows = np.repeat(np.arange(N), pat.width)
    cols = np.asarray(pat.ell_cols).reshape(-1)
    vals = np.asarray(solver.A_data).reshape(-1)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(N, N)).tocsr()
    M = sp.diags(np.asarray(solver.M_L))
    D = sp.diags(np.asarray(solver.M_L) * np.exp(-1.0))  # representative
    K = sp.bmat([[A, M], [M, -D]], format="csc")
    t0 = time.time()
    lu = spla.splu(K)
    lu.solve(np.ones(2 * N))
    return time.time() - t0


if __name__ == "__main__":
    main()
