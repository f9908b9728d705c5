"""Benchmark: 1M-DoF LVPP obstacle problem — assembly + Newton wall-clock.

Protocol (BASELINE.md north star): P1 mixed (u, psi) obstacle problem,
double-exponential alpha rule, outer loop to H1-increment tolerance;
measures total assembly + linear-solve + Newton wall-clock on the device
(compile time excluded via warm-up at identical shapes).

Baseline: the reference solves every Newton system with a CPU sparse direct
factorization (MUMPS; obstacle_pg.py:128-139). The stand-in baseline here is
scipy SuperLU factor+solve time per Newton step at the same matrix size,
measured once on this host and cached in BENCH_CPU_BASELINE.json, times the
number of Newton steps the run takes. Only the baseline's linear-solve time
is counted (its assembly is free) — conservative in the TPU's disfavor.

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
    n = int(os.environ.get("PGTPU_BENCH_N", "707"))
    tol = float(os.environ.get("PGTPU_BENCH_TOL", "1e-8"))
    repo = Path(__file__).resolve().parent
    sys.path.insert(0, str(repo))

    import jax
    import jax.numpy as jnp
    from proximalgalerkin_tpu.mesh import rectangle_mesh
    from proximalgalerkin_tpu.models import setup_obstacle_problem
    from proximalgalerkin_tpu.solve.lvpp import AlphaScheduler

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    mesh = rectangle_mesh(n, n, p0=(-1.0, -1.0), p1=(1.0, 1.0))
    prob = setup_obstacle_problem(
        mesh, polynomial_order=1, alpha_scheme="double_exponential",
        alpha_max=1e4, tol_exit=tol, verbose=False,
        solver_options={"snes_rtol": 1e-6, "snes_max_it": 100,
                        "ksp_type": "minres", "pc_type": "jacobi",
                        "mat_type": "ell", "ksp_rtol": 1e-7,
                        "ksp_max_it": 4000})
    p = prob.problem
    space = prob.space
    ndofs = space.num_dofs
    print(f"# ndofs: {ndofs}", file=sys.stderr)

    # ---- warm-up: compile residual + direction kernels at bench shapes
    x = p.set_bc(space.zeros())
    p.update(coeffs={"psi_k": x[space.slice_of("psi")],
                     "u_k": x[space.slice_of("u")]},
             consts={"alpha": jnp.asarray(1.0)})
    t0 = time.time()
    F = p.residual(x)
    F.block_until_ready()
    step = p.direction_solver("minres", "jacobi", "ell")
    dx = step(x, F, p.coeffs, p.consts, 1e-7, 0.0, 4000)
    dx.block_until_ready()
    print(f"# warmup (compile) {time.time() - t0:.1f}s", file=sys.stderr)

    # ---- timed LVPP solve
    t0 = time.time()
    result = prob.solve()
    elapsed = time.time() - t0
    newton_total = result.total_newton
    print(f"# LVPP outer iters: {result.iterations}, Newton: {newton_total}, "
          f"converged: {result.converged}, wall: {elapsed:.2f}s",
          file=sys.stderr)

    # ---- CPU sparse-LU baseline (per Newton-step factor+solve), cached
    cache = repo / "BENCH_CPU_BASELINE.json"
    key = f"n{n}"
    baseline_per_step = None
    if cache.exists():
        data = json.loads(cache.read_text())
        baseline_per_step = data.get(key)
    if baseline_per_step is None:
        baseline_per_step = _measure_cpu_lu(p, x)
        data = json.loads(cache.read_text()) if cache.exists() else {}
        data[key] = baseline_per_step
        cache.write_text(json.dumps(data))
    baseline_total = baseline_per_step * max(newton_total, 1)
    print(f"# CPU LU baseline: {baseline_per_step:.2f}s/step x "
          f"{newton_total} steps = {baseline_total:.1f}s", file=sys.stderr)

    print(json.dumps({
        "metric": "obstacle_1m_dof_lvpp_wallclock",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(baseline_total / elapsed, 3),
    }))


def _measure_cpu_lu(p, x) -> float:
    """Time one scipy SuperLU factor+solve of the Newton matrix (the
    reference's per-Newton-step linear-solve cost on CPU)."""
    import scipy.sparse.linalg as spla
    t0 = time.time()
    A = p.jacobian_scipy(x)
    t_asm = time.time() - t0
    t0 = time.time()
    lu = spla.splu(A.tocsc())
    lu.solve(np.ones(A.shape[0]))
    t_lu = time.time() - t0
    print(f"# cpu baseline measured: assembly {t_asm:.1f}s (excluded), "
          f"LU factor+solve {t_lu:.1f}s", file=sys.stderr)
    return t_lu


if __name__ == "__main__":
    main()
