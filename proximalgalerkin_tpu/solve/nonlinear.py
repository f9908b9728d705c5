"""Nonlinear problem: couples a VolumeForm with Dirichlet BCs into the
residual/Jacobian operators the Newton solver consumes.

Mirrors the role of `lvpp.SNESProblem` (reference src/lvpp/problem.py:14-77):
BC-consistent residual (F[bc] = x[bc] - g, zero once x satisfies the BC) and
symmetric BC treatment of the Jacobian (zeroed bc rows/columns, identity on
the bc diagonal) — for both the matrix-free action and assembled matrices.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..assembly.assemble import VolumeForm
from ..spaces.space import DirichletBC


def _refined(solve_lo, Av, b, rtol, atol, max_passes, dx0=None):
    """f64 iterative refinement around a lower-precision inner solver.

    solve_lo(r64) must return an approximate f64 solution of A z = r64
    (typically: equilibrate, solve in f32 to ~1e-6, unscale). Passes repeat
    while the TRUE f64 residual ||b - A dx|| still exceeds
    max(rtol*||b||, atol) AND keeps improving by >=10% — replacing the old
    fixed-2-pass scheme, which capped accuracy at ~1e-6 on the protocols
    that need 1e-10 (VERDICT r2 item 1). Non-improving corrections are
    rejected so the best iterate is always returned."""
    bnorm = jnp.linalg.norm(b)
    target = jnp.maximum(rtol * bnorm, atol)
    dx = solve_lo(b) if dx0 is None else dx0
    r = b - Av(dx)
    rn = jnp.linalg.norm(r)
    big = jnp.asarray(jnp.finfo(b.dtype).max, b.dtype)

    def cond(state):
        i, dx, r, rn, rn_prev = state
        return jnp.logical_and(
            jnp.logical_and(i < max_passes, rn > target),
            jnp.logical_and(rn < 0.9 * rn_prev, jnp.isfinite(rn)))

    def body(state):
        i, dx, r, rn, _ = state
        dxn = dx + solve_lo(r)
        rv = b - Av(dxn)
        rnn = jnp.linalg.norm(rv)
        better = rnn < rn
        dx = jnp.where(better, dxn, dx)
        r = jnp.where(better, rv, r)
        return i + 1, dx, r, jnp.minimum(rnn, rn), rn

    _, dx, _, _, _ = jax.lax.while_loop(cond, body, (0, dx, r, rn, big))
    return dx


def _fused_linesearch(linesearch, residual, fsq, x, dx, fnorm, damping):
    """Jittable linesearch shared by the fused Newton solvers
    -> (x_new, ok). Twins of NewtonSolver._linesearch's types:
    'none' (damped), 'l2' (one secant/quadratic fit), 'bt' (Armijo on
    0.5||F||^2 with halving backtracks and the TRUE initslope <J dx, F>
    — the exact-solve slope -||F||^2 overestimates achievable decrease
    once the direction solve saturates near the f64 floor, making Armijo
    unsatisfiable on converged solves)."""
    if linesearch == "none":
        return x + damping * dx, jnp.array(True)
    if linesearch == "l2":
        lam = damping
        f_old = fnorm * fnorm
        f_mid = fsq(x + 0.5 * lam * dx)
        f_new = fsq(x + lam * dx)
        dF = (3.0 * f_new - 4.0 * f_mid + f_old) / lam
        d2F = 4.0 * (f_new - 2.0 * f_mid + f_old) / lam**2
        lam_t = jnp.where(jnp.abs(d2F) > 1e-300,
                          lam - dF / d2F, 0.5 * lam)
        lam_t = jnp.where(
            jnp.logical_and(jnp.isfinite(lam_t), lam_t > 0.0),
            lam_t, 0.5 * lam)
        xn = x + lam_t * dx
        return xn, jnp.isfinite(fsq(xn))
    if linesearch == "bt":
        # Faithful jittable twin of NewtonSolver._linesearch's 'bt'
        # (PETSc linesearchbt.c): Armijo test at the full (damped) step,
        # one quadratic backtrack, then cubic-interpolated backtracks with
        # lambda clamped to [0.1, 0.5]*lambda — NOT plain halving. The
        # host/fused trajectories must agree step-for-step for fused
        # records to reproduce host Newton counts (multiphase 50^2).
        alpha = 1e-4
        max_its = 40
        g0 = 0.5 * fnorm * fnorm
        F0 = residual(x)
        Jdx = jax.jvp(residual, (x,), (dx,))[1]
        islope = jnp.vdot(Jdx, F0)
        islope = jnp.where(
            jnp.logical_and(jnp.isfinite(islope), islope < 0.0),
            islope, -fnorm * fnorm)
        lam0 = damping
        g_full = 0.5 * fsq(x + lam0 * dx)
        ok_full = jnp.logical_and(jnp.isfinite(g_full),
                                  g_full <= g0 + alpha * lam0 * islope)
        # quadratic first backtrack (host lines: denom/lam_t/clamp)
        denom = 2.0 * (g_full - g0 - lam0 * islope)
        lam_q = jnp.where(denom != 0.0,
                          -islope * lam0 * lam0 / denom, 0.5 * lam0)
        lam1 = jnp.minimum(jnp.maximum(lam_q, 0.1 * lam0), 0.5 * lam0)
        minlambda = damping * 1e-12

        def cond(s):
            i, lam, lam_prev, g_prev, ok, fail = s
            live = jnp.logical_not(jnp.logical_or(ok, fail))
            return jnp.logical_and(i < max_its, live)

        def body(s):
            i, lam, lam_prev, g_prev, _, _ = s
            fail = lam < minlambda
            g_lam = 0.5 * fsq(x + lam * dx)
            ok = jnp.logical_and(jnp.isfinite(g_lam),
                                 g_lam <= g0 + alpha * lam * islope)
            # cubic interpolation through (lam, g_lam), (lam_prev, g_prev)
            t1 = g_lam - g0 - lam * islope
            t2 = g_prev - g0 - lam_prev * islope
            dl = lam - lam_prev
            safe_dl = jnp.where(dl == 0.0, 1.0, dl)
            a = (t1 / (lam * lam) - t2 / (lam_prev * lam_prev)) / safe_dl
            bq = (-lam_prev * t1 / (lam * lam)
                  + lam * t2 / (lam_prev * lam_prev)) / safe_dl
            disc = bq * bq - 3.0 * a * islope
            lam_cub = jnp.where(
                a == 0.0,
                jnp.where(bq != 0.0, -islope / (2.0 * bq), 0.5 * lam),
                jnp.where(disc < 0.0, 0.5 * lam,
                          jnp.where(bq <= 0.0,
                                    (-bq + jnp.sqrt(jnp.abs(disc)))
                                    / (3.0 * jnp.where(a == 0.0, 1.0, a)),
                                    -islope / (bq + jnp.sqrt(
                                        jnp.abs(disc))))))
            lam_t = jnp.where(dl == 0.0, 0.5 * lam, lam_cub)
            lam_n = jnp.minimum(jnp.maximum(lam_t, 0.1 * lam), 0.5 * lam)
            keep = jnp.logical_or(ok, fail)
            return (i + 1,
                    jnp.where(keep, lam, lam_n),
                    jnp.where(keep, lam_prev, lam),
                    jnp.where(keep, g_prev, g_lam),
                    ok, fail)

        _, lam, _, _, ok, _ = jax.lax.while_loop(
            cond, body,
            (0, lam1, lam0, g_full, ok_full, jnp.array(False)))
        lam = jnp.where(ok_full, lam0, lam)
        return x + lam * dx, ok
    raise ValueError(f"unknown fused linesearch {linesearch!r}")


class EllSplit:
    """Affine/nonlinear Jacobian split for the fused device Newton — the
    device twin of csr_data_override (see jacobian_scipy below): models
    whose residual is affine except for a small nonlinear block (e.g.
    multiphase's softmax, multiphase_dolfinx.py:83-90) provide

      nl_core(x, coeffs, consts, extra) -> (N, K) ELL delta   [jittable]
      lin_data(coeffs, consts)          -> (N, K) f64 array   [host-cached]
      extra: pytree of device index arrays threaded as RUNTIME args into
             the jitted solve (closure-capturing multi-MB constants embeds
             them in the XLA graph — the EllMatrix.arrays lesson).

    fused_newton_btlu then assembles J(x) = lin + nl(x) per iteration
    instead of re-differentiating all fields through jvp — at multiphase
    50^2 this replaces a 3.4 s emulated-f64 element_matrices + 1.3 s
    scatter per Newton iteration with a ~30 ms closed-form block."""

    def __init__(self, nl_core, lin_data, extra):
        self.nl_core = nl_core
        self.lin_data = lin_data
        self.extra = dict(extra)


class NonlinearProblem:
    def __init__(self, form: VolumeForm, bcs: Sequence[DirichletBC] = (),
                 coeffs: Optional[Mapping] = None,
                 consts: Optional[Mapping] = None):
        self.form = form
        self.space = form.space
        bc_idx, bc_vals = self.space.global_bc_arrays(list(bcs))
        self.bc_idx = jnp.asarray(bc_idx)
        self.bc_vals = jnp.asarray(bc_vals, form.dtype)
        self.coeffs = dict(coeffs or {})
        self.consts = dict(consts or {})
        self._direction_cache = {}

    # -------------------------------------------------------------- data

    def update(self, coeffs: Optional[Mapping] = None,
               consts: Optional[Mapping] = None):
        if coeffs:
            self.coeffs.update(coeffs)
        if consts:
            self.consts.update(consts)

    # ---------------------------------------------------------------- BC

    def set_bc(self, x):
        """Overwrite bc dofs with their prescribed values."""
        return jnp.asarray(x, self.form.dtype).at[self.bc_idx].set(self.bc_vals)

    def zero_bc(self, v):
        return v.at[self.bc_idx].set(0.0)

    # --------------------------------------------------------- operators

    def residual(self, x):
        """BC-consistent residual: interior rows from the form, bc rows
        x[bc] - g (SNES set_bc convention, problem.py:67)."""
        F = self.form.residual(x, self.coeffs, self.consts)
        return F.at[self.bc_idx].set(x[self.bc_idx] - self.bc_vals)

    def jacobian_action(self, x):
        """Returns the matrix-free operator v -> J(x) v with symmetric BC
        handling: J_mod = P J P + (I - P), P zeroing bc entries."""
        coeffs, consts = self.coeffs, self.consts
        form = self.form

        def Av(v):
            w = self.zero_bc(v)
            y = form.jacobian_action(x, w, coeffs, consts)
            y = self.zero_bc(y)
            return y.at[self.bc_idx].add(v[self.bc_idx])

        return Av

    @property
    def ell_matrix(self):
        """Lazily-built ELL operator (pattern on host, data assembled on
        device per Newton step) — the PETSc-AIJ replacement."""
        if not hasattr(self, "_ell"):
            from ..la.ell import EllMatrix, EllPattern
            pattern = EllPattern.build(self.form.local_indices,
                                       self.space.num_dofs,
                                       np.asarray(self.bc_idx))
            self._ell = EllMatrix(pattern, self.form.dtype)
        return self._ell

    def ell_data(self, x):
        """Device-assembled ELL Jacobian data at x (f64, BCs applied) —
        the assembled-operator input of the block-tridiagonal direct
        solver (la/blocktri.py) and of f64 refinement SpMVs."""
        if not hasattr(self, "_ell_data_fn"):
            ell = self.ell_matrix
            form = self.form

            def fn(x, coeffs, consts, cell_data, arrays):
                Ae = form._element_matrices_core(x, coeffs, consts,
                                                 cell_data)
                return ell.assemble(Ae, arrays)

            self._ell_data_fn = jax.jit(fn)
        return self._ell_data_fn(x, self.coeffs, self.consts,
                                 self.form.cell_data, self.ell_matrix.arrays)

    def line_blocking(self):
        """Cached LineBlocking of this problem's ELL pattern (raises
        ValueError when the dof graph is not lattice-structured)."""
        if not hasattr(self, "_line_blocking"):
            from ..la.blocktri import LineBlocking
            dof_nodes, _, node_pts = self.nd_ordering_data()
            self._line_blocking = LineBlocking.build(
                self.ell_matrix.pattern, node_pts[dof_nodes])
        return self._line_blocking

    def direction_solver(self, ksp: str, pc: str, mat_type: str = "ell",
                         schur_field0: Optional[str] = None,
                         precision: str = "double",
                         pc_opts: Optional[Mapping] = None):
        """One fused, jitted Newton-direction kernel per option set:
        (x, F, coeffs, consts, rtol, atol, maxiter) -> dx solving
        J(x) dx = -F entirely on device. mat_type 'ell' assembles the
        Jacobian once into an ELL matrix (cheap SpMV per Krylov iteration);
        'matfree' re-applies the jvp of the residual each iteration.
        pc='schur' (requires 'ell' + 'minres') applies the block-Schur
        preconditioner of la/schur.py with block0 = `schur_field0` (the
        invertible-diagonal block; ex40.cpp:261-281 recipe).
        precision='mixed' (ell+jacobi only) runs the equilibrated inner
        Krylov in NATIVE f32 wrapped in f64 iterative refinement — the
        production TPU path (v5e has no native f64; the emulated-f64
        Krylov loop is ~10x slower and has kernel-faulted on sustained
        runs), generalizing the P1 obstacle solver's proven scheme
        (models/obstacle_p1.py).
        Compiled once per shape set — no per-step retracing."""
        key = (ksp, pc, mat_type, schur_field0, precision,
               tuple(sorted((pc_opts or {}).items())))
        if key in self._direction_cache:
            return self._direction_cache[key]

        direction = self._make_direction_fn(ksp, pc, mat_type, schur_field0,
                                            precision, pc_opts)
        ell = self.ell_matrix if mat_type == "ell" else None

        jitted = jax.jit(direction, static_argnames=("maxiter",))

        def fn(x, F, coeffs, consts, rtol, atol, maxiter, dx0=None):
            return jitted(x, F, coeffs, consts, rtol, atol, maxiter,
                          self.form.cell_data,
                          ell.arrays if ell is not None else {}, dx0)

        self._direction_cache[key] = fn
        return fn

    def _make_direction_fn(self, ksp: str, pc: str, mat_type: str = "ell",
                           schur_field0: Optional[str] = None,
                           precision: str = "double",
                           pc_opts: Optional[Mapping] = None):
        """Pure direction-solve body shared by direction_solver and the
        fused Newton kernel: (x, F, coeffs, consts, rtol, atol, maxiter,
        cell_data, ell_arrays) -> dx with J(x) dx = -F."""
        from ..la import krylov as kry
        form = self.form
        bc_idx, bc_vals = self.bc_idx, self.bc_vals
        ell = self.ell_matrix if mat_type == "ell" else None
        if precision == "mixed" and (mat_type != "ell"
                                     or pc not in ("jacobi", "schur",
                                                   "schur_mg")):
            raise ValueError("precision='mixed' requires mat_type='ell' "
                             "and pc in ('jacobi', 'schur', 'schur_mg')")
        pc_opts = dict(pc_opts or {})

        bt_ctx = None
        if pc == "btlu":
            # fully-traced block-tridiagonal direct direction: assemble ->
            # equilibrate -> factor -> solve + fixed-budget refinement, all
            # inside one XLA program. This is what lets fused_newton run a
            # whole multiphase Newton solve as ONE device dispatch — the
            # round-3 btlu probe lost to the axon tunnel's ~310 ms/dispatch
            # because each refinement pass was several host-driven ops
            # (RESULTS.md multiphase btlu probe).
            if mat_type != "ell":
                raise ValueError("pc='btlu' requires mat_type='ell'")
            blocking = self.line_blocking()
            bt_fdt = "f64" if str(pc_opts.get("pc_factor_dtype", "f32")) \
                in ("f64", "double") else "f32"
            # fit check at the ACTUAL factor itemsize (ADVICE r4)
            bt_streamed = (not blocking.fits_dense(
                8 if bt_fdt == "f64" else 4)
                or bool(pc_opts.get("pc_factor_streamed", False)))
            # materialize the device maps EAGERLY: the lazy caches create
            # jnp constants, and a constant first created inside the fused
            # Newton's while_loop trace leaks its tracer (the mg.py
            # _R_CACHE lesson)
            bt_maps = (blocking.streamed_maps() if bt_streamed
                       else blocking.device_maps())
            bt_rhs = jnp.asarray(blocking.rhs_idx) if bt_streamed else None
            bt_ctx = (blocking, bt_streamed, bt_maps, bt_rhs,
                      int(pc_opts.get("ksp_refine_max", 6)), bt_fdt)

        m0_np = bc1_np = None
        mg_setup = None
        if pc in ("schur", "schur_mg"):
            if mat_type != "ell" or ksp != "minres":
                raise ValueError(f"pc={pc!r} requires mat_type='ell' and "
                                 "ksp='minres'")
            # block0 = the invertible-diagonal block; comma-separated field
            # names cover multi-field latent blocks (eigenvalue constraints'
            # (psi1, psi2) pair)
            f0 = schur_field0 or self.space.names[0]
            f0_names = [n.strip() for n in str(f0).split(",")]
            m0_np = np.zeros(self.space.num_dofs)
            for name in f0_names:
                m0_np[self.space.slice_of(name)] = 1.0
            bc1_np = np.zeros(self.space.num_dofs)
            bci = np.asarray(self.bc_idx)
            bc1_np[bci] = 1.0 - m0_np[bci]
        if pc == "schur_mg":
            # lattice geometry of the (single, scalar) block1 field: its
            # dofs must form a complete 2D lattice (P2 on uniform
            # triangulations, Q_p on uniform quad grids)
            from ..la.gmg import lattice_map, mg_levels_for
            f1_names = [n for n in self.space.names if n not in f0_names]
            if len(f1_names) != 1 or \
                    self.space.spaces[f1_names[0]].value_size != 1:
                raise ValueError("pc='schur_mg' needs exactly one scalar "
                                 "block1 field")
            f1 = f1_names[0]
            fs1 = self.space.spaces[f1]
            perm_loc, grid_shape = lattice_map(fs1.dof_points)
            off1 = self.space.offsets[f1]
            perm_np = off1 + perm_loc
            bc_set = np.zeros(self.space.num_dofs, dtype=bool)
            bc_set[np.asarray(self.bc_idx)] = True
            free_np = (~bc_set[perm_np]).reshape(grid_shape)
            levels = mg_levels_for(min(grid_shape))
            mg_setup = (perm_np, grid_shape, free_np, levels)
        mg_fmasks = []
        if pc == "schur_mg":
            for name in self.space.names:
                fm = np.zeros(self.space.num_dofs)
                fm[self.space.slice_of(name)] = 1.0
                mg_fmasks.append(fm)

        def direction(x, F, coeffs, consts, rtol, atol, maxiter, cell_data,
                      ell_arrays, dx0=None):
            if mat_type == "ell":
                Ae = form._element_matrices_core(x, coeffs, consts, cell_data)
                data = ell.assemble(Ae, ell_arrays)

                def Av(v):
                    return ell.spmv(data, v, ell_arrays)
            else:
                def Av(v):
                    w = v.at[bc_idx].set(0.0)
                    f = lambda y: form._jacobian_residual_core(
                        y, coeffs, consts, cell_data)
                    y = jax.jvp(f, (x,), (w,))[1]
                    y = y.at[bc_idx].set(0.0)
                    return y.at[bc_idx].add(v[bc_idx])

            b = -F
            if pc == "btlu":
                from ..la import blocktri as btm
                blocking, bt_streamed, maps, rhs_idx, passes, bt_fdt = bt_ctx
                nb, bs = blocking.nb, blocking.bs
                if bt_streamed:
                    sm = maps
                    flat_p, s_eq = btm.bt_equilibrate(
                        data, ell_arrays["ell_cols"], bt_fdt)
                    Minv = btm.bt_factor_streamed(flat_p, sm, nb, bs)

                    def solve1(r):
                        return btm.bt_solve_streamed(
                            Minv, flat_p, s_eq, r, rhs_idx, sm, nb, bs)
                else:
                    D, L, U, s_eq = btm.bt_assemble(
                        data, ell_arrays["ell_cols"], maps, nb, bs, bt_fdt)
                    Minv, T = btm.bt_factor(D, L, U)

                    def solve1(r):
                        return btm.bt_solve(Minv, T, L, s_eq, r, maps,
                                            nb, bs)

                bnorm2 = jnp.vdot(b, b)
                stop2 = jnp.maximum(rtol * rtol * bnorm2, atol * atol)
                dx = solve1(b)

                def body(carry, _):
                    dx, done, rn2_prev = carry
                    r = b - Av(dx)
                    rn2 = jnp.vdot(r, r)
                    # stop at tolerance OR at the f32-factor floor
                    # (residual no longer contracting by ~0.7/pass —
                    # _bt_direction's guard, 0.7^2 on the squared norm)
                    done = jnp.logical_or(done, rn2 <= stop2)
                    done = jnp.logical_or(done, rn2 > 0.49 * rn2_prev)
                    e = jax.lax.cond(done,
                                     lambda rr: jnp.zeros_like(rr),
                                     solve1, r)
                    return (dx + e, done, rn2), None

                big = jnp.asarray(jnp.inf, b.dtype)
                (dx, _, _), _ = jax.lax.scan(
                    body, (dx, jnp.asarray(False), big), None,
                    length=passes)
                return dx
            if pc in ("schur", "schur_mg"):
                from ..la.schur import make_schur_pc, make_schur_mg_pc
                schur_kw = dict(
                    cheb_steps=int(pc_opts.get("pc_schur_cheb_steps", 4)),
                    power_iters=int(pc_opts.get("pc_schur_power_iters", 10)),
                    lmin_ratio=float(pc_opts.get("pc_schur_lmin_ratio",
                                                 30.0)))

                def build_pc(d, m0_t, bc1_t):
                    if pc == "schur":
                        return make_schur_pc(ell, d, ell_arrays, m0_t,
                                             bc1_t, **schur_kw)
                    perm_np, grid_shape, free_np, levels = mg_setup
                    return make_schur_mg_pc(
                        ell, d, ell_arrays, m0_t, bc1_t,
                        jnp.asarray(perm_np), grid_shape,
                        jnp.asarray(free_np), levels,
                        nu=int(pc_opts.get("pc_mg_nu", 2)))
                # Symmetric Jacobi equilibration UNDER the Schur PC: the
                # scaled system S A S (S = |diag|^-1/2) has unit-magnitude
                # diagonal, which (a) keeps every Krylov inner product in
                # the TPU's emulated-f64 / native-f32 dynamic range (LVPP
                # rows span ~1e16, memory: tpu-f64-dynamic-range) and
                # (b) hands make_schur_pc a ±1 block0 diagonal, the
                # best-case for its diag(A00)^{-1} approximation.
                d = ell.diagonal(data, ell_arrays)
                if pc == "schur_mg":
                    # per-FIELD scalar scaling only: per-dof equilibration
                    # flattens the P2 vertex/edge diagonal pattern into a
                    # checkerboard coefficient the V-cycle cannot smooth
                    # (see make_schur_mg_pc); a field-constant scale keeps
                    # magnitudes f32-safe while leaving the within-field
                    # operator structure intact.
                    s = jnp.zeros_like(d)
                    for fm in mg_fmasks:
                        fmj = jnp.asarray(fm, form.dtype)
                        cnt = jnp.maximum(jnp.sum(fmj), 1.0)
                        mean_d = jnp.sum(jnp.abs(d) * fmj) / cnt
                        s = s + fmj / jnp.sqrt(jnp.maximum(mean_d, 1e-300))
                    # bc rows stay identity in the scaled system (the +2bc1
                    # Schur correction assumes unit bc diagonal)
                    s = s.at[bc_idx].set(1.0)
                else:
                    s = jnp.where(jnp.abs(d) > 1e-300,
                                  1.0 / jnp.sqrt(jnp.abs(d)), 1.0)
                data_s = s[:, None] * data * s[ell_arrays["ell_cols"]]
                m0 = jnp.asarray(m0_np, form.dtype)
                bc1 = jnp.asarray(bc1_np, form.dtype)

                def Av_s(v):
                    return ell.spmv(data_s, v, ell_arrays)

                if precision == "mixed":
                    # inner MINRES+Schur in native f32 (bounded iterations
                    # by the PC => no f32 recurrence drift accumulation),
                    # wrapped in f64 iterative refinement to protocol
                    # tolerances — the round-3 MUMPS replacement.
                    f32 = jnp.float32
                    data32 = data_s.astype(f32)
                    Minv32 = build_pc(data32, m0.astype(f32),
                                      bc1.astype(f32))

                    def Av32(v):
                        return ell.spmv(data32, v, ell_arrays)

                    def solve_lo(r64):
                        y = kry.minres(Av32, (s * r64).astype(f32),
                                       tol=1e-6, maxiter=maxiter,
                                       Minv=Minv32)
                        return s * y.astype(jnp.float64)

                    return _refined(solve_lo, Av, b, rtol, atol,
                                    int(pc_opts.get("ksp_refine_max", 30)),
                                    dx0=dx0)

                Minv = build_pc(data_s, m0, bc1)
                y0 = None if dx0 is None else dx0 / s
                y = kry.minres(Av_s, s * b, x0=y0, tol=rtol, atol=atol,
                               maxiter=maxiter, Minv=Minv)
                return s * y
            if pc == "jacobi":
                if mat_type == "ell":
                    d = ell.diagonal(data, ell_arrays)
                else:
                    d = form._diagonal_core(x, coeffs, consts, cell_data)
                    d = d.at[bc_idx].set(1.0)
                # Symmetric Jacobi EQUILIBRATION: solve (SAS) y = S b with
                # S = |diag|^{-1/2}, dx = S y. In exact arithmetic this is
                # two-sided Jacobi preconditioning; operationally it also
                # keeps every Krylov inner product O(1)-scaled, which the
                # TPU's emulated f64 requires — LVPP rows span ~alpha*K
                # (up to 2^14/h^2) against e^{psi} mass terms, and the
                # squared terms of unscaled CG/BiCGStab overflow its
                # dynamic range (same failure as models/obstacle_fd.py).
                s = jnp.where(jnp.abs(d) > 1e-300,
                              1.0 / jnp.sqrt(jnp.abs(d)), 1.0)
                sgn = jnp.where(d < 0, -1.0, 1.0)

                def Av_s(v):
                    return s * Av(s * v)

                if precision == "mixed":
                    # Equilibrated inner Krylov in native f32 + f64
                    # iterative refinement (obstacle_p1.py scheme): the
                    # scaled system has unit diagonal and O(1) rows, so
                    # f32 solves to ~1e-6 and 2 refinement passes recover
                    # ~1e-12 directions at native-f32 TPU throughput.
                    f32 = jnp.float32
                    data32 = data.astype(f32)
                    s32 = s.astype(f32)
                    sgn32 = sgn.astype(f32)

                    def Av_s32(v):
                        return s32 * ell.spmv(data32, s32 * v, ell_arrays)

                    inner_tol = 2e-6

                    def solve32(r64):
                        bt = (s * r64).astype(f32)
                        if ksp in ("minres", "cg"):
                            # CG on the scaled SPD/symmetric system; for
                            # indefinite systems minres
                            if ksp == "minres":
                                y = kry.minres(Av_s32, bt, tol=inner_tol,
                                               maxiter=maxiter)
                            else:
                                y, _ = jax.scipy.sparse.linalg.cg(
                                    Av_s32, bt, tol=inner_tol,
                                    maxiter=maxiter)
                        elif ksp == "gmres_d":
                            y = kry.gmres_givens(Av_s32, bt, tol=inner_tol,
                                                 maxiter=maxiter, restart=60)
                        elif ksp == "bicgstab":
                            y, _ = jax.scipy.sparse.linalg.bicgstab(
                                Av_s32, bt, tol=inner_tol, maxiter=maxiter,
                                M=lambda v: sgn32 * v)
                        else:
                            raise ValueError(
                                f"mixed precision: unsupported ksp {ksp!r}")
                        return s * y.astype(jnp.float64)

                    return _refined(solve32, Av, b, rtol, atol,
                                    int(pc_opts.get("ksp_refine_max", 30)),
                                    dx0=dx0)

                bs = s * b
                y0 = None if dx0 is None else dx0 / s
                if ksp == "minres":
                    y = kry.minres(Av_s, bs, x0=y0, tol=rtol, atol=atol,
                                   maxiter=maxiter)
                elif ksp == "cg":
                    y, _ = jax.scipy.sparse.linalg.cg(
                        Av_s, bs, x0=y0, tol=rtol, atol=atol,
                        maxiter=maxiter)
                elif ksp == "gmres":
                    y, _ = jax.scipy.sparse.linalg.gmres(
                        Av_s, bs, x0=y0, tol=rtol, atol=atol,
                        maxiter=maxiter, restart=30, solve_method="batched")
                elif ksp == "gmres_d":
                    # Givens/MGS restarted GMRES (TPU-robust; la/krylov.py)
                    y = kry.gmres_givens(Av_s, bs, x0=y0, tol=rtol,
                                         atol=atol, maxiter=maxiter,
                                         restart=60)
                elif ksp == "bicgstab":
                    # scaled-diagonal sign as preconditioner keeps the
                    # stabilized recurrence well-behaved on saddle systems
                    y, _ = jax.scipy.sparse.linalg.bicgstab(
                        Av_s, bs, x0=y0, tol=rtol, atol=atol,
                        maxiter=maxiter, M=lambda v: sgn * v)
                else:
                    raise ValueError(f"unknown ksp_type {ksp!r}")
                return s * y
            # every branch honors dx0 so ksp_chunk_it warm restarts make
            # progress across chunks (ADVICE r2)
            if ksp == "minres":
                return kry.minres(Av, b, x0=dx0, tol=rtol, atol=atol,
                                  maxiter=maxiter)
            if ksp == "cg":
                xs, _ = jax.scipy.sparse.linalg.cg(
                    Av, b, x0=dx0, tol=rtol, atol=atol, maxiter=maxiter)
            elif ksp == "gmres":
                xs, _ = jax.scipy.sparse.linalg.gmres(
                    Av, b, x0=dx0, tol=rtol, atol=atol, maxiter=maxiter,
                    restart=30, solve_method="batched")
            elif ksp == "gmres_d":
                xs = kry.gmres_givens(Av, b, x0=dx0, tol=rtol, atol=atol,
                                      maxiter=maxiter, restart=60)
            elif ksp == "bicgstab":
                xs, _ = jax.scipy.sparse.linalg.bicgstab(
                    Av, b, x0=dx0, tol=rtol, atol=atol, maxiter=maxiter)
            else:
                raise ValueError(f"unknown ksp_type {ksp!r}")
            return xs

        return direction

    def fused_newton(self, ksp: str, pc: str, mat_type: str = "ell",
                     linesearch: str = "none", max_it: int = 100,
                     ksp_max_it: int = 10_000, schur_field0=None,
                     pc_opts: Optional[Mapping] = None):
        """Whole-solve fused Newton: the complete while_loop (residual ->
        Krylov direction -> linesearch -> update) compiled as ONE XLA
        program — one kernel launch per Newton *solve*, no per-iteration
        host sync (the float(norm) readbacks of the host driver,
        solve/newton.py). SNES semantics preserved: the returned
        (it, fnorm, f0, ls_ok) suffice to reconstruct the converged
        reason on host.

        linesearch: 'none' (damped), 'l2' (one secant/quadratic fit, the
        jittable twin of NewtonSolver's l2), or 'bt' (Armijo on
        0.5||F||^2 with halving backtracks, fixed budget).

        Returns fn(x0, coeffs, consts, rtol, atol, stol, ksp_rtol,
        ksp_atol, damping) -> (x, it, fnorm, f0, ls_ok, sconv).
        """
        key = ("fused", ksp, pc, mat_type, linesearch, max_it, ksp_max_it,
               schur_field0, tuple(sorted((pc_opts or {}).items())))
        if key in self._direction_cache:
            return self._direction_cache[key]

        form = self.form
        bc_idx, bc_vals = self.bc_idx, self.bc_vals
        ell = self.ell_matrix if mat_type == "ell" else None
        direction = self._make_direction_fn(ksp, pc, mat_type, schur_field0,
                                            pc_opts=pc_opts)

        def solve(x0, coeffs, consts, rtol, atol, stol, ksp_rtol, ksp_atol,
                  damping, it_cap, cell_data, ell_arrays):
            def residual(z):
                F = form._residual_core(z, coeffs, consts, cell_data)
                return F.at[bc_idx].set(z[bc_idx] - bc_vals)

            def fsq(z):
                F = residual(z)
                return jnp.vdot(F, F)

            def do_linesearch(x, dx, fnorm):
                """-> (x_new, ok)."""
                return _fused_linesearch(linesearch, residual, fsq,
                                         x, dx, fnorm, damping)

            x = x0.at[bc_idx].set(bc_vals)
            F = residual(x)
            f0 = jnp.linalg.norm(F)

            def cond(s):
                it, x, F, fn, ls_ok, sconv = s
                live = jnp.logical_and(fn > jnp.maximum(rtol * f0, atol),
                                       jnp.isfinite(fn))
                live = jnp.logical_and(live, jnp.logical_not(sconv))
                # it_cap is a RUNTIME bound <= the compiled max_it: the
                # final continuation chunk passes its remaining budget so
                # the total never overshoots snes_max_it (ADVICE r4)
                return jnp.logical_and(
                    jnp.logical_and(it < jnp.minimum(it_cap, max_it), live),
                    ls_ok)

            def body(s):
                it, x, F, fn, _, _ = s
                dx = direction(x, F, coeffs, consts, ksp_rtol, ksp_atol,
                               ksp_max_it, cell_data, ell_arrays)
                xn, ls_ok = do_linesearch(x, dx, fn)
                # SNES stol test (||x_new - x|| < stol ||x_new||) — the
                # host driver converges via CONVERGED_SNORM_RELATIVE and
                # the fused path must agree (ADVICE r2)
                sconv = jnp.linalg.norm(xn - x) < stol * jnp.maximum(
                    jnp.linalg.norm(xn), 1e-300)
                F = residual(xn)
                return it + 1, xn, F, jnp.linalg.norm(F), ls_ok, sconv

            it, x, F, fn, ls_ok, sconv = jax.lax.while_loop(
                cond, body,
                (0, x, F, f0, jnp.array(True), jnp.array(False)))
            return x, it, fn, f0, ls_ok, sconv

        jitted = jax.jit(solve)

        def fn(x0, coeffs=None, consts=None, rtol=1e-8, atol=1e-50,
               stol=0.0, ksp_rtol=1e-10, ksp_atol=0.0, damping=1.0,
               it_cap=None):
            return jitted(jnp.asarray(x0, form.dtype),
                          dict(coeffs if coeffs is not None else self.coeffs),
                          dict(consts if consts is not None else self.consts),
                          jnp.asarray(rtol), jnp.asarray(atol),
                          jnp.asarray(stol), jnp.asarray(ksp_rtol),
                          jnp.asarray(ksp_atol), jnp.asarray(damping),
                          jnp.asarray(max_it if it_cap is None else it_cap,
                                      jnp.int32),
                          form.cell_data,
                          ell.arrays if ell is not None else {})

        self._direction_cache[key] = fn
        return fn

    def fused_newton_btlu(self, linesearch: str = "none", max_it: int = 100,
                          pc_opts: Optional[Mapping] = None):
        """Whole-solve fused Newton with a LAGGED block-tridiagonal direct
        direction — the multiphase-record architecture (VERDICT r3 #4).

        One XLA program runs the complete Newton solve; the factor
        (f64 recursion, f32-cast apply, see la/blocktri.py) is carried in
        the while_loop state AND across solve() calls (returned to the
        caller as device arrays and fed back in), so consecutive solves
        of the LVPP alpha loop reuse it. Each iteration first refines the
        carried factor against the CURRENT assembled Jacobian; only when
        refinement misses ksp tolerance (stale softmax state) does the
        loop refactor — cutting the ~4 s/factor cost at 50^2 from
        once-per-iteration to a handful per time step, and the axon
        tunnel's ~310 ms/dispatch from ~10/direction to ~1/solve.

        Returns fn(x0, coeffs, consts, rtol, atol, stol, ksp_rtol,
        ksp_atol, damping) -> (x, it, fnorm, f0, ls_ok, sconv); the
        factor state lives on fn (fn.reset() clears it,
        fn.last_refactors reports the refactor count of the last call).
        """
        pc_opts = dict(pc_opts or {})
        split = getattr(self, "ell_split", None)
        key = ("fused_btlu", linesearch, max_it, split is not None,
               tuple(sorted((k, str(v)) for k, v in pc_opts.items())))
        if key in self._direction_cache:
            return self._direction_cache[key]

        from ..la import blocktri as btm
        form = self.form
        bc_idx, bc_vals = self.bc_idx, self.bc_vals
        ell = self.ell_matrix
        blocking = self.line_blocking()
        fdt = "f64" if str(pc_opts.get("pc_factor_dtype", "f32")) in (
            "f64", "double") else "f32"
        _algo = str(pc_opts.get("pc_factor_algo", "thomas"))
        if not blocking.fits_dense(8 if fdt == "f64" else 4, _algo):
            raise ValueError("fused lagged btlu requires the dense factor "
                             "layout to fit HBM at the requested factor "
                             "dtype (LineBlocking.fits_dense)")
        maps = blocking.device_maps()  # eager: tracer-leak lesson (mg.py)
        nb, bs = blocking.nb, blocking.bs
        adt = str(pc_opts.get("pc_factor_apply_dtype", "f32"))
        if adt in ("f64", "double") and fdt == "f32":
            raise ValueError("pc_factor_apply_dtype='f64' requires "
                             "pc_factor_dtype='f64' (an f32 factor cannot "
                             "be applied at f64 accuracy)")
        adt_j = jnp.float32 if adt == "f32" or fdt == "f32" \
            else jnp.float64
        passes = int(pc_opts.get("ksp_refine_max", 8))
        algo = str(pc_opts.get("pc_factor_algo", "thomas"))
        biv = str(pc_opts.get("pc_factor_blockinv", "ns"))
        if algo not in ("thomas", "cr"):
            raise ValueError(f"pc_factor_algo must be 'thomas' or 'cr', "
                             f"got {algo!r}")

        if algo == "cr":
            # log-depth batched cyclic-reduction factor (bt_factor_cr):
            # cuts the nb-step sequential Thomas scan (~1.9 s at
            # multiphase 50^2 on the v5e) to ~log2(nb) batched levels
            def factor(data, ell_cols):
                D, L, U, s = btm.bt_assemble(data, ell_cols, maps, nb,
                                             bs, fdt)
                levels, root = btm.bt_factor_cr(D, L, U, biv)
                levels, root = jax.tree.map(
                    lambda a: a.astype(adt_j), (levels, root))
                return (levels, root, s)

            def solve1(fact, r):
                levels, root, s = fact
                return btm.bt_solve_cr(levels, root, s, r,
                                       maps["rhs_idx"], nb, bs)
        else:
            def factor(data, ell_cols):
                D, L, U, s = btm.bt_assemble(data, ell_cols, maps, nb,
                                             bs, fdt)
                Minv, T = btm.bt_factor(D, L, U, biv)
                return (Minv.astype(adt_j), T.astype(adt_j),
                        L.astype(adt_j), s)

            def solve1(fact, r):
                Minv, T, L, s = fact
                return btm.bt_solve(Minv, T, L, s, r, maps, nb, bs)

        def refine(fact, Av, b, stop2):
            """Early-exit f64 refinement of the (possibly stale) factor
            against the CURRENT operator -> (dx, reached_tol). A
            while_loop, not a fixed scan: converged refinements (the
            common case, 2-4 passes) stop paying for the full `passes`
            budget of apply+SpMV rounds — at multiphase-50^2 fused-probe
            scale this halves the per-Newton cost."""
            dx = solve1(fact, b)
            r = b - Av(dx)
            rn2 = jnp.vdot(r, r)
            big = jnp.asarray(jnp.inf, rn2.dtype)

            def cond(c):
                dx, r, rn2, rn2_prev, p = c
                live = jnp.logical_and(rn2 > stop2, jnp.isfinite(rn2))
                # stalled: no longer contracting by ~0.7/pass
                live = jnp.logical_and(live, rn2 <= 0.49 * rn2_prev)
                return jnp.logical_and(p < passes, live)

            def body(c):
                dx, r, rn2, _, p = c
                dx = dx + solve1(fact, r)
                r = b - Av(dx)
                return dx, r, jnp.vdot(r, r), rn2, p + 1

            dx, r, rn2, _, _ = jax.lax.while_loop(
                cond, body, (dx, r, rn2, big, jnp.asarray(0, jnp.int32)))
            return dx, rn2 <= stop2

        def solve(x0, coeffs, consts, rtol, atol, stol, ksp_rtol,
                  ksp_atol, damping, it_cap, cell_data, ell_arrays, fact,
                  valid, lin_data, split_extra):
            def residual(z):
                F = form._residual_core(z, coeffs, consts, cell_data)
                return F.at[bc_idx].set(z[bc_idx] - bc_vals)

            def fsq(z):
                F = residual(z)
                return jnp.vdot(F, F)

            x = x0.at[bc_idx].set(bc_vals)
            F = residual(x)
            f0 = jnp.linalg.norm(F)

            def cond(s):
                it, x, F, fn, ls_ok, sconv, fact, valid, nref = s
                live = jnp.logical_and(fn > jnp.maximum(rtol * f0, atol),
                                       jnp.isfinite(fn))
                live = jnp.logical_and(live, jnp.logical_not(sconv))
                # runtime budget (<= compiled max_it): the continuation
                # tail chunk must not overshoot snes_max_it (ADVICE r4)
                return jnp.logical_and(
                    jnp.logical_and(it < jnp.minimum(it_cap, max_it), live),
                    ls_ok)

            def body(s):
                it, x, F, fn, _, _, fact, valid, nref = s
                if split is None:
                    Ae = form._element_matrices_core(x, coeffs, consts,
                                                     cell_data)
                    data = ell.assemble(Ae, ell_arrays)
                else:
                    data = lin_data + split.nl_core(x, coeffs, consts,
                                                    split_extra)

                def Av(v):
                    return ell.spmv(data, v, ell_arrays)

                b = -F
                bnorm2 = jnp.vdot(b, b)
                stop2 = jnp.maximum(ksp_rtol * ksp_rtol * bnorm2,
                                    ksp_atol * ksp_atol)
                dx0, ok0 = jax.lax.cond(
                    valid,
                    lambda f: refine(f, Av, b, stop2),
                    lambda f: (jnp.zeros_like(b), jnp.asarray(False)),
                    fact)
                need = jnp.logical_not(ok0)
                fact = jax.lax.cond(
                    need, lambda _: factor(data, ell_arrays["ell_cols"]),
                    lambda _: fact, None)
                # fresh factor's best dx is accepted regardless (the host
                # _bt_direction lag contract)
                dx = jax.lax.cond(
                    need, lambda f: refine(f, Av, b, stop2)[0],
                    lambda f: dx0, fact)
                xn, ls_ok = _fused_linesearch(linesearch, residual, fsq,
                                              x, dx, fn, damping)
                sconv = jnp.linalg.norm(xn - x) < stol * jnp.maximum(
                    jnp.linalg.norm(xn), 1e-300)
                F = residual(xn)
                return (it + 1, xn, F, jnp.linalg.norm(F), ls_ok, sconv,
                        fact, jnp.asarray(True), nref + need)

            it, x, F, fn, ls_ok, sconv, fact, valid, nref = \
                jax.lax.while_loop(
                    cond, body,
                    (0, x, F, f0, jnp.array(True), jnp.array(False),
                     fact, valid, jnp.asarray(0, jnp.int32)))
            return x, it, fn, f0, ls_ok, sconv, fact, nref

        jitted = jax.jit(solve, donate_argnums=(12,))

        def fn(x0, coeffs=None, consts=None, rtol=1e-8, atol=1e-50,
               stol=0.0, ksp_rtol=1e-10, ksp_atol=0.0, damping=1.0,
               it_cap=None):
            if fn._fact is None:
                # structural placeholder matching factor()'s pytree
                # (never applied: valid=False routes around it)
                cols = ell.arrays["ell_cols"]
                spec = jax.eval_shape(
                    factor,
                    jax.ShapeDtypeStruct(cols.shape, form.dtype), cols)
                fn._fact = jax.tree.map(
                    lambda t: jnp.zeros(t.shape, t.dtype), spec)
                fn._valid = False
            cc = dict(coeffs if coeffs is not None else self.coeffs)
            kk = dict(consts if consts is not None else self.consts)
            if split is None:
                lin_data = jnp.zeros(())
                split_extra = {}
            else:
                lin_data = split.lin_data(cc, kk)
                split_extra = split.extra
            x, it, fnm, f0, ls_ok, sconv, fact, nref = jitted(
                jnp.asarray(x0, form.dtype), cc, kk,
                jnp.asarray(rtol), jnp.asarray(atol), jnp.asarray(stol),
                jnp.asarray(ksp_rtol), jnp.asarray(ksp_atol),
                jnp.asarray(damping),
                jnp.asarray(max_it if it_cap is None else it_cap,
                            jnp.int32),
                form.cell_data, ell.arrays,
                fn._fact, jnp.asarray(fn._valid), lin_data, split_extra)
            fn._fact = fact
            fn._valid = True
            # one batched readback (individual fetches are each a full
            # tunnel round-trip on axon)
            it, fnm, f0, ls_ok, sconv, nref = jax.device_get(
                (it, fnm, f0, ls_ok, sconv, nref))
            fn.last_refactors = int(nref)
            return x, it, fnm, f0, ls_ok, sconv

        fn._fact = None
        fn._valid = False
        fn.last_refactors = 0

        def reset():
            fn._fact = None
            fn._valid = False

        fn.reset = reset
        self._direction_cache[key] = fn
        return fn

    def jacobian_scipy(self, x):
        """Assembled CSR with bc rows/cols zeroed and unit diagonal.

        Uses the ELL pattern's precomputed sorted-unique (row, col) slots:
        one scatter-add of the element-matrix entries straight into CSR
        data (the COO->CSR sort at 36M nnz cost ~36 s per Newton step at
        the 100^2 deg-3 eigenvalue system; this path is ~1 s)."""
        import scipy.sparse as sp
        from ..native import scatter_add
        ell = self.ell_matrix
        pat = ell.pattern
        # models whose residual is affine except for a small nonlinear term
        # (e.g. multiphase's softmax) can install csr_data_override to
        # produce the unassembled-bc CSR data directly from cached constant
        # data + a scatter of only the nonlinear block — same values,
        # a fraction of the jacfwd + 13M-entry scatter cost
        override = getattr(self, "csr_data_override", None)
        if override is not None:
            data = np.asarray(override(x, self.coeffs, self.consts))
        else:
            Ae = np.asarray(self.form.element_matrices(x, self.coeffs,
                                                       self.consts))
            data = scatter_add(Ae.reshape(-1).astype(np.float64),
                               pat.slot_map.astype(np.int64), pat.nnz)
        data = data * pat.keep + pat.diag_ones
        N = pat.num_dofs
        # slots are sorted by (row, col): build CSR arrays directly
        if not hasattr(self, "_csr_struct"):
            rows = np.repeat(self.form.local_indices,
                             self.form.local_indices.shape[1],
                             axis=1).reshape(-1)
            cols = np.tile(self.form.local_indices,
                           (1, self.form.local_indices.shape[1])).reshape(-1)
            key = rows.astype(np.int64) * N + cols.astype(np.int64)
            uniq = np.unique(key)
            urow = (uniq // N).astype(np.int64)
            ucol = (uniq % N).astype(np.int32)
            indptr = np.zeros(N + 1, dtype=np.int64)
            np.add.at(indptr, urow + 1, 1)
            np.cumsum(indptr, out=indptr)
            self._csr_struct = (ucol, indptr)
        ucol, indptr = self._csr_struct
        return sp.csr_matrix((data, ucol, indptr), shape=(N, N))

    def jacobian_diagonal(self, x):
        d = self.form.jacobian_diagonal(x, self.coeffs, self.consts)
        return d.at[self.bc_idx].set(1.0)

    def nd_ordering_data(self):
        """(dof_nodes, field_of, node_pts) for la/ordering's geometric
        nested dissection: every dof carrying the same physical point
        (across fields and vector components) joins one supernode, the
        granularity at which MUMPS/METIS orders node-block FEM systems."""
        if hasattr(self, "_nd_data"):
            return self._nd_data
        space = self.space
        nd = space.num_dofs
        gdim = space.mesh.gdim
        P = np.zeros((nd, gdim))
        field_of = np.empty(nd, dtype=np.int64)
        for fi, name in enumerate(space.names):
            S = space.spaces[name]
            sl = space.slice_of(name)
            field_of[sl] = fi
            local = np.arange(sl.stop - sl.start)
            P[sl] = S.dof_points[local // max(S.value_size, 1)]
        span = max(float(P.max() - P.min()), 1.0)
        quant = np.round(P / (1e-8 * span)).astype(np.int64)
        _, dof_nodes = np.unique(quant, axis=0, return_inverse=True)
        n_nodes = int(dof_nodes.max()) + 1
        node_pts = np.zeros((n_nodes, gdim))
        node_pts[dof_nodes] = P
        self._nd_data = (dof_nodes.astype(np.int64), field_of, node_pts)
        return self._nd_data
