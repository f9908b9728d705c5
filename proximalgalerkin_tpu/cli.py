"""Command-line interface: every reference example as a subcommand.

The reference ships each example as a standalone argparse program
(obstacle_pg.py:268-331, signorini CLI :54-142, multiphase :245-..., etc.);
here they are subcommands of one entry point with flag names preserved
where the reference defines them:

    python -m proximalgalerkin_tpu <example> [flags]
"""

from __future__ import annotations

import argparse
from pathlib import Path


def _add_obstacle(sub):
    p = sub.add_parser("obstacle", help="Example 01: LVPP obstacle problem")
    p.add_argument("--polynomial_order", "-p", type=int, default=1,
                   choices=[1, 2])
    p.add_argument("--alpha-scheme", dest="alpha_scheme", default="constant",
                   choices=["constant", "double_exponential", "geometric"])
    p.add_argument("--max-iter", "-i", dest="max_iterations", type=int,
                   default=100)
    p.add_argument("--alpha-max", "-a", dest="alpha_max", type=float,
                   default=1e5)
    p.add_argument("--tol", "-t", dest="tol_exit", type=float, default=1e-6)
    p.add_argument("--disk-res", type=float, default=0.1,
                   help="disk mesh resolution (replaces --file-path)")
    p.add_argument("--refinements", type=int, default=0)
    p.add_argument("--output-dir", type=Path, default=Path("output"))
    p.add_argument("--n-devices", dest="n_devices", type=int, default=0,
                   help="run the dof-partitioned distributed LVPP path on "
                        "this many devices (0 = single-device); for CPU "
                        "testing set XLA_FLAGS="
                        "--xla_force_host_platform_device_count=N")


def _run_obstacle(args):
    from .mesh.unstructured import create_disk_mesh, refine_uniform
    from .models import solve_obstacle_problem
    mesh = create_disk_mesh(args.disk_res)
    for _ in range(args.refinements):
        mesh = refine_uniform(mesh)
    if args.n_devices:
        _run_obstacle_distributed(args, mesh)
        return
    prob, result = solve_obstacle_problem(
        mesh, polynomial_order=args.polynomial_order,
        alpha_scheme=args.alpha_scheme,
        maximum_number_of_outer_loop_iterations=args.max_iterations,
        alpha_max=args.alpha_max, tol_exit=args.tol_exit)
    out = args.output_dir
    out.mkdir(parents=True, exist_ok=True)
    ndofs = prob.V.num_scalar_dofs
    result.to_csv(out / f"example_polyorder{args.polynomial_order}_"
                        f"{ndofs}.csv",
                  extra={"Polynomial order": args.polynomial_order,
                         "dofs": ndofs,
                         "Step size rule": args.alpha_scheme})
    if args.polynomial_order == 1:
        from .io import write_vtu
        write_vtu(out / "u.vtu", mesh, point_data={"u": prob.u(result)})
    print(f"LVPP iterations: {result.iterations}  "
          f"Newton total: {result.total_newton}")


def _run_obstacle_distributed(args, mesh):
    """Obstacle LVPP on the dof-partitioned multi-device path, driven by
    the full LVPPSolver (VERDICT r2 item 5: CLI exposure of the
    distributed problem)."""
    import jax
    import numpy as np
    from .models import setup_obstacle_problem
    from .parallel.dofpart import DistributedProblem, DistributedLvppProblem
    from .solve import AlphaScheduler
    from .solve.lvpp import LVPPSolver

    devs = jax.devices()
    if len(devs) < args.n_devices:
        raise SystemExit(
            f"need {args.n_devices} devices, have {len(devs)} "
            f"(set XLA_FLAGS=--xla_force_host_platform_device_count=N "
            f"for CPU testing)")
    prob = setup_obstacle_problem(mesh,
                                  polynomial_order=args.polynomial_order,
                                  verbose=False)
    p_ = prob.problem
    dp = DistributedProblem(p_, devices=devs[:args.n_devices])
    dlp = DistributedLvppProblem(dp)
    dlp.update(coeffs={"phi": dp.scatter_cellq(np.asarray(p_.coeffs["phi"]))})
    result = LVPPSolver(
        dlp,
        newton_options={"snes_rtol": 1e-6, "snes_max_it": 50,
                        "snes_linesearch_type": "none",
                        "ksp_type": "minres", "pc_type": "jacobi",
                        "ksp_rtol": 1e-11, "ksp_max_it": 4000},
        alpha=AlphaScheduler(scheme=args.alpha_scheme
                             if args.alpha_scheme != "constant"
                             else "double_exponential",
                             alpha_max=args.alpha_max),
        prev_coeffs=lambda xs: {"psi_k": dp.field_to_coeff(xs, "psi"),
                                "u_k": dp.field_to_coeff(xs, "u")},
        tol=args.tol_exit, max_iterations=args.max_iterations,
    ).solve(dp.scatter(np.zeros(prob.space.num_dofs)))
    print(f"[distributed x{args.n_devices}] LVPP iterations: "
          f"{result.iterations}  Newton total: {result.total_newton}  "
          f"converged: {result.converged}  per-device dofs {dp.Bsum} "
          f"of {prob.space.num_dofs}")


def _add_simple(sub, name, help_):
    return sub.add_parser(name, help=help_)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="proximalgalerkin_tpu",
        description="TPU-native LVPP solver framework — reference examples")
    parser.add_argument(
        "--platform", default=None, choices=("cpu", "tpu"),
        help="pin the JAX platform before backend init (the axon TPU "
             "plugin ignores the JAX_PLATFORMS env var; use "
             "--platform cpu with XLA_FLAGS="
             "--xla_force_host_platform_device_count=N for multi-device "
             "CPU testing)")
    parser.add_argument(
        "--opt", action="append", metavar="KEY=VALUE", default=[],
        help="solver option passthrough (PETSc-style names, e.g. "
             "--opt ksp_type=minres --opt pc_type=schur); repeatable, "
             "place before the subcommand")
    sub = parser.add_subparsers(dest="cmd", required=True)

    _add_obstacle(sub)

    p = _add_simple(sub, "obstacle-fd", "Example 01 FD variant")
    p.add_argument("-N", type=int, default=65)

    p = _add_simple(sub, "obstacle-spectral", "Example 01 spectral variant")
    p.add_argument("--degrees", type=int, nargs="+",
                   default=[8, 16, 24, 32, 40, 48])
    p.add_argument("--solve-dtype", dest="solve_dtype", default="f64",
                   choices=("f64", "f32_refine"),
                   help="dense Newton factor precision: f32_refine runs "
                        "the LU on the MXU with f64 refinement (device "
                        "p-sweep path)")

    p = _add_simple(sub, "compare-all", "Example 01 five-solver comparison")
    p.add_argument("--disk-res", type=float, default=0.1)
    p.add_argument("--max-iter", type=int, default=500)
    p.add_argument("--tol", type=float, default=1e-4)

    p = _add_simple(sub, "signorini", "Example 02 Signorini contact")
    p.add_argument("--degree", type=int, default=1)
    p.add_argument("--disp", type=float, default=-0.10)
    p.add_argument("--res", type=float, default=0.04)
    p.add_argument("--E", type=float, default=2e4)
    p.add_argument("--nu", type=float, default=0.3)
    p.add_argument("--alpha_scheme", default="doubling",
                   choices=["constant", "linear", "doubling"])
    p.add_argument("--alpha_0", type=float, default=0.005)

    p = _add_simple(sub, "fracture", "Example 03 phase-field fracture")
    p.add_argument("--res", type=float, default=0.05)
    p.add_argument("--Tmin", type=float, default=0.0)
    p.add_argument("--Tmax", type=float, default=5.0)
    p.add_argument("--num-load-steps", type=int, default=1001)
    p.add_argument("--n-devices", dest="n_devices", type=int, default=0,
                   help="run the load continuation dof-partitioned over "
                        "this many devices (the reference's mpirun "
                        "execution of fracture_dolfinx.py)")

    p = _add_simple(sub, "multiphase", "Example 04 Cahn-Hilliard")
    p.add_argument("-N", type=int, default=50)
    p.add_argument("-M", type=int, default=50)
    p.add_argument("--dt", dest="tau0", type=float, default=1e-5)
    p.add_argument("--T", type=float, default=7e-3)
    p.add_argument("--alpha_scheme", default="constant")
    p.add_argument("-s", "--stopping_tol", type=float, default=1e-5)

    p = _add_simple(sub, "thermoforming", "Example 05 QVI")
    p.add_argument("-M", type=int, default=150)
    p.add_argument("--compare", action="store_true",
                   help="also run MY / fixed-point / semismooth baselines")

    p = _add_simple(sub, "gradient-constraint", "Example 06")
    p.add_argument("-N", type=int, default=200)
    p.add_argument("-M", type=int, default=200)
    p.add_argument("--primal_degree", type=int, default=2)
    p.add_argument("--alpha_scheme", default="doubling")
    p.add_argument("--warm_start", action="store_true")
    p.add_argument("-s", "--stopping_tol", type=float, default=1e-8)

    p = _add_simple(sub, "eigenvalue", "Example 07 Landau-de Gennes")
    p.add_argument("-N", type=int, default=100)
    p.add_argument("--degree", type=int, default=3)

    p = _add_simple(sub, "intersecting", "Example 08")
    p.add_argument("--cells", type=int, default=1001)

    p = _add_simple(sub, "eikonal", "Example 09 Mobius eikonal")
    p.add_argument("--ns", type=int, default=48)
    p.add_argument("--nt", type=int, default=6)
    p.add_argument("--geometry", choices=["mobius", "star", "ball"],
                   default="mobius",
                   help="mobius = ex40 run of record; star / ball = the "
                        "ex40p planar-star and solid-ball variants")
    p.add_argument("--res", type=float, default=0.08,
                   help="star-mesh resolution")

    p = _add_simple(sub, "monge-ampere", "Example 10")
    p.add_argument("--kmin", type=int, default=3)
    p.add_argument("--kmax", type=int, default=14)

    p = _add_simple(sub, "bench", "north-star benchmark")
    p.add_argument("-n", type=int, default=1024)

    args = parser.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    def _coerce(v):
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                pass
        return {"true": True, "false": False}.get(v.lower(), v)

    cli_opts = dict(kv.split("=", 1) for kv in args.opt) if args.opt else {}
    cli_opts = {k: _coerce(v) for k, v in cli_opts.items()} or None

    if args.cmd == "obstacle":
        _run_obstacle(args)
    elif args.cmd == "obstacle-fd":
        from .models.obstacle_fd import fd_obstacle_solve
        r = fd_obstacle_solve(args.N, verbose=True)
        print(f"outer {r.outer_iterations} newton {r.newton_its}")
    elif args.cmd == "obstacle-spectral":
        from .models.obstacle_spectral import spectral_p_sweep
        r = spectral_p_sweep(ps=tuple(args.degrees), verbose=True,
                             solve_dtype=args.solve_dtype)
        print("degrees:", r.degrees)
        print("newton:", r.newton_its)
        print("sup diffs:", r.sup_errors)
    elif args.cmd == "compare-all":
        from .mesh.unstructured import create_disk_mesh
        from .models.obstacle_qp import compare_all
        compare_all(create_disk_mesh(args.disk_res), max_iter=args.max_iter,
                    tol=args.tol)
    elif args.cmd == "signorini":
        from .models.signorini import solve_signorini
        r = solve_signorini(res=args.res, degree=args.degree, disp=args.disp,
                            E=args.E, nu=args.nu,
                            alpha_scheme=args.alpha_scheme,
                            alpha_0=args.alpha_0, solver_options=cli_opts)
        print(f"LVPP {r.lvpp_iterations}, Newton {sum(r.newton_iterations)}, "
              f"final penetration {r.penetrations[-1]:.3e}")
    elif args.cmd == "fracture":
        from .models.fracture import solve_fracture
        r = solve_fracture(max_res=args.res, Tmin=args.Tmin, Tmax=args.Tmax,
                           num_load_steps=args.num_load_steps,
                           solver_options=cli_opts,
                           n_devices=args.n_devices or None)
        print(f"steps {len(r.load_history)} broken={r.broken}")
    elif args.cmd == "multiphase":
        from .models.multiphase import solve_multiphase
        r = solve_multiphase(N=args.N, M=args.M, tau0=args.tau0, T=args.T,
                             alpha_scheme=args.alpha_scheme,
                             stopping_tol=args.stopping_tol)
        print("Newton iterations:", r.newton_iterations)
        print("LVPP iterations:", r.lvpp_iterations)
    elif args.cmd == "thermoforming":
        from .models.thermoforming import solve_thermoforming
        r = solve_thermoforming(M=args.M, solver_options=cli_opts)
        print(f"Total LVPP {r.lvpp_iterations}, Newton {r.total_newton}")
        if args.compare:
            from .models.thermoforming_compare import (
                fixed_point_solve, moreau_yosida_solve,
                semismooth_active_set_solve)
            for name, fn in (("Moreau-Yosida", moreau_yosida_solve),
                             ("Fixed-point", fixed_point_solve),
                             ("Semismooth", semismooth_active_set_solve)):
                b = fn(M=args.M, verbose=False)
                print(f"{name}: outer {b.outer_iterations}, "
                      f"linear solves {b.linear_solves}")
    elif args.cmd == "gradient-constraint":
        from .models.gradient_constraint import solve_gradient_constraint
        prob, r = solve_gradient_constraint(
            N=args.N, M=args.M, primal_degree=args.primal_degree,
            alpha_scheme=args.alpha_scheme, warm_start=args.warm_start,
            stopping_tol=args.stopping_tol, solver_options=cli_opts)
        print(f"Number of LVPP iterations {r.iterations}")
        print(f"Total number of Newton iterations: {r.total_newton}")
    elif args.cmd == "eigenvalue":
        from .models.eigenvalue_constraints import solve_eigenvalue_constraints
        r = solve_eigenvalue_constraints(N=args.N, degree=args.degree,
                                 solver_options=cli_opts)
        lo, hi = r.eigenvalue_range()
        print(f"#LVPP {r.lvpp.iterations} #Newton {r.lvpp.total_newton} "
              f"eig range [{lo:.4f}, {hi:.4f}]")
    elif args.cmd == "intersecting":
        from .models.intersecting import solve_intersecting
        r = solve_intersecting(n_cells=args.cells)
        print(f"num_lvpp_iterations={r.lvpp_iterations}")
        print(f"num_newton_iterations={r.newton_iterations}")
    elif args.cmd == "eikonal":
        from .models.eikonal import solve_eikonal
        mesh = None
        if args.geometry == "star":
            from .mesh.unstructured import create_star_mesh
            mesh = create_star_mesh(args.res)
        elif args.geometry == "ball":
            from .mesh.parametric import create_ball_mesh
            mesh = create_ball_mesh(res=max(args.res, 0.15))
        r = solve_eikonal(mesh=mesh, ns=args.ns, nt=args.nt,
                  solver_options=cli_opts)
        print(f"LVPP {r.lvpp_iterations} Newton {r.total_newton}")
    elif args.cmd == "monge-ampere":
        from .models.monge_ampere import p_refinement_sweep
        r = p_refinement_sweep(args.kmin, args.kmax)
        print("Errors", r.errors)
    elif args.cmd == "bench":
        import os
        os.environ["PGTPU_BENCH_N"] = str(args.n)
        import runpy
        runpy.run_path(str(Path(__file__).resolve().parents[1] / "bench.py"),
                       run_name="__main__")


if __name__ == "__main__":
    main()
