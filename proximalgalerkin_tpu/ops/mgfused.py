"""Whole-solve fused MG-PCG: the entire inner Krylov solve as ONE Pallas
kernel per chunk, every vector VMEM-resident.

Round-4's verdict item #3b: the north-star obstacle bench runs the
mixed-precision MG-PCG at 110 GB/s of modeled HBM traffic against a
measured 289 GB/s stream peak — each CG iteration streams ~150 MB of
vectors through HBM because every XLA op boundary in the lax.while_loop
body (stencil matvec, V-cycle smooths, transfers, dot products)
round-trips its operands. At the bench size the WHOLE working set is
~60 MB: a 1025^2 f32 grid is 4.2 MB, and the v5e has ~128 MB of VMEM.
This module therefore keeps x, r, p, xb and the full V-cycle hierarchy
resident in VMEM across CG iterations: per chunk of up to `chunk`
iterations there is exactly ONE kernel launch, and the only HBM traffic
is the state round-trip between chunks (~0.7 MB per iteration amortized
vs ~150 MB — a ~200x traffic reduction; past that point the solve is
VPU/MXU-bound, i.e. faster than ANY HBM-streaming implementation could
be).

Algorithm (identical contract to ops/mg.pcg driving the Jacobi-scaled
Schur operator of models/obstacle_p1.newton_kernel's mixed path):

    matvec   S32t(p) = alpha_s * B * K5(B * p) + C * p
    precond  z = sqf * V(sqf * r),   sqf = B * (4*alpha_s + w0)
    V        = V(1,1) cycle, damped-Jacobi smoothing, full-weighting
               restriction / bilinear prolongation (exact transposes),
               24 coarsest-level sweeps

where B = free * diagS^{-1/2} (zero at pinned/boundary/pad dofs), C the
scaled diagonal remainder, w_l the per-level PIN-folded diagonal weights
(w_{l+1} = 4 * FW(w_l), computed by the caller with ops/mg.restrict).
Setting sqf = 0 at pinned rows (vs 1 in the XLA path) confines the
Krylov space to the free dofs exactly — prolongation junk at pinned rows
is annihilated instead of carried along; trajectories match the XLA
path to f32 roundoff.

Grid layout: every level-l vector lives in a (rows_l, cols_l) f32 array
padded up to (8, 128) tiles, domain at [0:m_l, 0:m_l], PAD KEPT ZERO as
an invariant. All level-l pads are >= 1 cell wide, so the 5-point
stencil is pure pltpu.roll's: a roll wraps the opposite edge around, and
the wrapped-in values are the pad zeros — exactly the zero-Dirichlet
exterior (mask_l multiplies each stencil output to keep the invariant).
Restriction/prolongation are banded-R matmuls on the MXU (R X R^T with
the 1-D full-weighting matrix R, zero-padded so pads stay zero; the
transpose pair shares one (Rr, Rc) buffer per level via dot_general, so
P = 4 R^T is EXACT — CG requires a fixed SPD preconditioner and bf16 /
one-pass transfers measurably poison it, cf. ops/mg.restrict).

Reference parity: this accelerates the same Newton direction solve the
reference hands to multicore MUMPS (obstacle_pg.py:128-139) and the FD
variant's sparse direct solve (obstacle_finite_difference.jl:70-111).
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:                                        # pragma: no cover
    _HAVE_PALLAS = False

from .mg import PIN, _levels_for, _restriction_matrix

OMEGA = 0.8
COARSE_SWEEPS = 24
_TINY = 1.1754944e-38          # np.finfo(np.float32).tiny


def _pad_rows(m: int) -> int:
    return -(-m // 8) * 8


def _pad_cols(m: int) -> int:
    return -(-m // 128) * 128


def available() -> bool:
    if not _HAVE_PALLAS or os.environ.get("PGTPU_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:                                    # pragma: no cover
        return False


def _roll(v, shift: int, axis: int):
    """Static-shift roll. Interpret/CPU mode falls back to jnp.roll
    (pltpu.roll has no CPU lowering)."""
    if _HAVE_PALLAS and jax.default_backend() in ("tpu", "axon"):
        n = v.shape[axis]
        return pltpu.roll(v, jnp.int32(shift % n), axis)
    return jnp.roll(v, shift, axis)


def _iota_mask(shape, mdom: int):
    """Domain-interior mask [0:mdom, 0:mdom] as an iota comparison —
    computed in-register at each use instead of held as a (rows, cols)
    f32 VMEM resident (the resident masks pushed the 1025^2 kernel
    864 KB past the 112 MB scoped-vmem limit)."""
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return jnp.logical_and(row < mdom, col < mdom)


def _k5(v, mdom):
    """Masked 5-point stencil {4; -1 N/S/E/W}, zero-Dirichlet exterior.
    Pad-zero invariant on v makes the roll wraparound read zeros; the
    mask re-zeroes the pad ring the stencil output would contaminate.
    mdom=None skips the mask (caller's output multiply annihilates the
    pad anyway, e.g. the B* in the CG matvec)."""
    s = (4.0 * v - _roll(v, 1, 0) - _roll(v, -1, 0)
         - _roll(v, 1, 1) - _roll(v, -1, 1))
    if mdom is None:
        return s
    return jnp.where(_iota_mask(v.shape, mdom), s, 0.0)


class FusedMgCg:
    """Builder: precomputes masks + transfer matrices for an m x m fine
    lattice and exposes solve(...) matching ops/mg.pcg's contract."""

    def __init__(self, m: int, chunk: int = 64, interpret: bool = False,
                 stall_window: int = 16, stall_guard: float = 1e4):
        self.m = m
        self.ms = _levels_for(m)
        self.nlev = len(self.ms)
        self.chunk = chunk
        self.interpret = interpret
        self.stall_window = stall_window
        self.stall_guard = stall_guard
        self.shapes = [(_pad_rows(mm), _pad_cols(mm)) for mm in self.ms]
        # padded 1-D full-weighting matrices, rows (coarse) x cols (fine),
        # plus the column-side factor R^T stored as (fine, coarse) so both
        # restrict (Rr @ X @ Rc) and prolong (Rr^T @ E @ Rc^T via
        # dot_general) share the same buffers
        self.Rr: List[np.ndarray] = []
        self.Rc: List[np.ndarray] = []
        for l in range(self.nlev - 1):
            R = _restriction_matrix(self.ms[l], np.float32)     # (M, m)
            rp_c, cp_c = self.shapes[l + 1]
            rp_f, cp_f = self.shapes[l]
            Rr = np.zeros((rp_c, rp_f), np.float32)
            Rr[:R.shape[0], :R.shape[1]] = R
            Rc = np.zeros((cp_f, cp_c), np.float32)
            Rc[:R.shape[1], :R.shape[0]] = R.T
            self.Rr.append(Rr)
            self.Rc.append(Rc)
        self._solve_jit = jax.jit(self._solve_impl,
                                  static_argnames=("maxiter",))

    # ---------------------------------------------------------- kernel
    def _vcycle(self, r0, alpha_s, ws, Rrs, Rcs):
        """One V(1,1) cycle, fully unrolled over levels; pure jnp values
        (Mosaic keeps temporaries in VMEM/registers)."""
        ms = self.ms

        def smooth(l, x, b, sweeps):
            d = 4.0 * alpha_s + ws[l]
            mk = _iota_mask(x.shape, ms[l])
            for _ in range(sweeps):
                res = b - (alpha_s * _k5(x, ms[l]) + ws[l] * x)
                x = jnp.where(mk, x + OMEGA * res / d, x)
            return x

        def residual(l, x, b):
            return b - (alpha_s * _k5(x, ms[l]) + ws[l] * x)

        # Transfer matmuls must carry f32 precision: Mosaic lowers f32
        # jnp.dot as ONE bf16 MXU pass (measured 3.8e-3 relative error —
        # the asymmetric-preconditioner poison ops/mg.restrict documents)
        # and precision=HIGHEST hangs its compiler. Instead: the R
        # factors are exactly representable in bf16 (entries {0, 1/4,
        # 1/2}), and the f32 operand is split into three bf16 terms
        # covering all 24 significand bits, so each product is an exact
        # bf16 x bf16 MXU pass with f32 accumulation — f32-matmul
        # accuracy at full MXU rate.
        def _split3(v):
            v1 = v.astype(jnp.bfloat16)
            r1 = v - v1.astype(jnp.float32)
            v2 = r1.astype(jnp.bfloat16)
            v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)
            return v1, v2, v3

        def _mm(a_bf, v, dims):
            out = None
            for t in _split3(v):
                y = jax.lax.dot_general(
                    a_bf, t, (dims, ((), ())),
                    preferred_element_type=jnp.float32)
                out = y if out is None else out + y
            return out

        def restrict_(l, v):
            t = _mm(Rrs[l], v, ((1,), (0,)))            # Rr @ v
            # t @ Rc == (Rc^T @ t^T)^T; contract t's axis 1 with Rc's 0
            return _swap_mm(t, Rcs[l])

        def _swap_mm(t, c_bf):
            out = None
            for s in _split3(t):
                y = jax.lax.dot_general(
                    s, c_bf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out = y if out is None else out + y
            return out

        def prolong_(l, e):
            # 4 * Rr^T @ e @ Rc^T through dot_general (no transposes)
            t = _mm(Rrs[l], e, ((0,), (0,)))            # Rr^T @ e
            out = None
            for s in _split3(t):
                y = jax.lax.dot_general(
                    s, Rcs[l], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out = y if out is None else out + y
            return 4.0 * out

        def vc(l, b):
            if l == self.nlev - 1:
                return smooth(l, jnp.zeros_like(b), b, COARSE_SWEEPS)
            x = smooth(l, jnp.zeros_like(b), b, 1)
            r = residual(l, x, b)
            e = vc(l + 1, restrict_(l, r))
            x = x + prolong_(l, e)
            return smooth(l, x, b, 1)

        return vc(0, r0)

    def _kernel(self, use_while: bool, sp_ref, B_ref, C_ref,
                *refs):
        """refs layout: w_0..w_{L-1}, Rr_0..Rr_{L-2}, Rc_0..Rc_{L-2},
        x/r/p/xb input state refs, then the five output refs."""
        L = self.nlev
        ws = [refs[i][:] for i in range(L)]
        Rrs = [refs[L + i][:] for i in range(L - 1)]
        Rcs = [refs[2 * L - 1 + i][:] for i in range(L - 1)]
        # refs[3L-2 : 3L+2] are the INPUT state refs; x/r/p alias the
        # first three output refs (input_output_aliases) — read and
        # write those through the out refs. xb is deliberately
        # ALIAS-FREE: it is read once from its input ref (start-copy
        # into its out ref), because aliasing it alongside x
        # double-donates when the caller's x/xb carries CSE to one
        # buffer, and a (1032, 1152) loop-carried VALUE stalls Mosaic.
        xb_in_ref = refs[3 * L + 1]
        x_ref, r_ref, p_ref, xb_ref, sc_ref = refs[3 * L + 2:]

        alpha_s = sp_ref[0, 0]
        stop = sp_ref[0, 1]
        maxiter = sp_ref[0, 2]
        i0 = sp_ref[0, 3]
        rr_in, rz_in, rrb_in, ib_in, ok_in = (
            sp_ref[0, 4], sp_ref[0, 5], sp_ref[0, 6], sp_ref[0, 7],
            sp_ref[0, 8])
        B = B_ref[:]
        C = C_ref[:]
        sqf = B * (4.0 * alpha_s + ws[0])

        def pc(r):
            return sqf * self._vcycle(sqf * r, alpha_s, ws, Rrs, Rcs)

        def matvec(p):
            # no stencil mask: B is zero at pad/pinned dofs, so the
            # outer B* annihilates the roll-wraparound junk
            return alpha_s * (B * _k5(B * p, None)) + C * p

        # -- first-chunk priming: z0 = pc(b), p0 = z0, rz0 = <r, z0>
        # (pl.when for the ref write; the scalars are recomputed from
        # refs unconditionally — a masked re-reduction, not a branch)
        first = i0 < 0.5

        @pl.when(first)
        def _():
            p_ref[:] = pc(r_ref[:])

        r_now = r_ref[:]
        rr0 = jnp.where(first, jnp.sum(r_now * r_now), rr_in)
        rz0 = jnp.where(first, jnp.sum(r_now * p_ref[:]), rz_in)

        # carried scalars: (k_done, rr, rz, rrb, ib, ok)
        def live_of(c):
            k, rr, rz, rrb, ib, ok = c[:6]
            it = i0 + k
            stalled = jnp.logical_and(
                it - ib > float(self.stall_window),
                rrb < self.stall_guard * stop)
            return jnp.logical_and(
                jnp.logical_and(ok > 0.5, jnp.logical_not(stalled)),
                jnp.logical_and(it < maxiter, rr > stop))

        def body_once(c, live):
            """One masked PCG iteration: `live` gates every state change
            (a dead iteration is the identity), so the same body serves
            the in-kernel while_loop (live == True constant-folds the
            masks away) and the fori fallback."""
            k, rr, rz, rrb, ib, ok = c
            p = p_ref[:]
            Ap = matvec(p)
            pAp = jnp.sum(p * Ap)
            good = jnp.logical_and(
                live, jnp.logical_and(pAp > _TINY, rz > _TINY))
            a = jnp.where(good, rz / jnp.where(good, pAp, 1.0), 0.0)
            x = x_ref[:] + a * p
            r = r_ref[:] - a * Ap
            x_ref[:] = x
            r_ref[:] = r
            z = pc(r)
            rz_new = jnp.where(live, jnp.sum(r * z), rz)
            beta = jnp.where(good, rz_new / jnp.where(good, rz, 1.0), 0.0)
            p_ref[:] = jnp.where(live, z + beta * p, p)
            rr_new = jnp.where(live, jnp.sum(r * r), rr)
            better = jnp.logical_and(live, rr_new < rrb)
            xb_ref[:] = jnp.where(better, x, xb_ref[:])
            rrb = jnp.where(better, rr_new, rrb)
            ib = jnp.where(better, i0 + k + 1.0, ib)
            ok_new = jnp.where(live, jnp.where(good, 1.0, 0.0), ok)
            k_new = jnp.where(live, k + 1.0, k)
            return (k_new, rr_new, rz_new, rrb, ib, ok_new)

        # xb's out ref starts as the previous chunk's best iterate — a
        # start-copy from the (non-donated) input, NOT an alias and NOT
        # a loop-carried vector: a (1032, 1152) value carry stalls the
        # Mosaic compiler, and aliasing xb next to x double-donates when
        # the caller's x/xb carries CSE to one buffer.
        xb_ref[:] = xb_in_ref[:]

        init = (jnp.float32(0.0), rr0, rz0, rrb_in, ib_in, ok_in)
        if use_while:
            def wcond(c):
                return jnp.logical_and(c[0] < float(self.chunk),
                                       live_of(c))
            out = jax.lax.while_loop(
                wcond, lambda c: body_once(c, jnp.bool_(True)), init)
        else:
            def fbody(_, c):
                return body_once(c, live_of(c))
            out = jax.lax.fori_loop(0, self.chunk, fbody, init)
        k, rr, rz, rrb, ib, ok = out
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        vals = [k, rr, rz, rrb, ib, ok]
        sc = jnp.zeros((8, 128), jnp.float32)
        for j, v in enumerate(vals):
            sc = jnp.where(jnp.logical_and(row == 0, col == j),
                           v, sc)
        sc_ref[:] = sc

    # ------------------------------------------------------ entry point
    def _call_chunk(self, use_while, sp, B2, C2, whier, x, r, p, xb):
        # bf16 carriers: every entry is in {0, 1/4, 1/2} — exact
        Rrs = [jnp.asarray(r_, jnp.bfloat16) for r_ in self.Rr]
        Rcs = [jnp.asarray(c_, jnp.bfloat16) for c_ in self.Rc]
        operands = ([sp, B2, C2] + list(whier) + Rrs + Rcs
                    + [x, r, p, xb])
        T = len(operands)
        kw = {}
        if _HAVE_PALLAS and not self.interpret:
            kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024)
        # x64 must be off while TRACING the pallas_call (i64 literals in
        # index maps / iotas fail Mosaic legalization — same scoped
        # disable as ops/pallas_cg). All operands are already f32.
        from contextlib import nullcontext
        ctx = nullcontext if self.interpret else (
            lambda: jax.enable_x64(False))
        with ctx():
            return self._pallas(operands, T, kw)

    def _pallas(self, operands, T, kw):
        use_while = _IN_KERNEL_WHILE
        mshape = self.shapes[0]
        vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            partial(self._kernel, use_while),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [vspec() for _ in range(T - 1)],
            out_specs=[vspec()] * 5,
            out_shape=[
                jax.ShapeDtypeStruct(mshape, jnp.float32),   # x
                jax.ShapeDtypeStruct(mshape, jnp.float32),   # r
                jax.ShapeDtypeStruct(mshape, jnp.float32),   # p
                jax.ShapeDtypeStruct(mshape, jnp.float32),   # xb
                jax.ShapeDtypeStruct((8, 128), jnp.float32),  # scalars
            ],
            input_output_aliases={T - 4: 0, T - 3: 1, T - 2: 2},
            interpret=self.interpret,
            **kw,
        )(*operands)
        return out

    def _solve_impl(self, b2, B2, C2, whier, alpha_s, tol, maxiter):
        """b2/B2/C2: (rows0, cols0) padded f32; whier: tuple of padded
        per-level w arrays; returns (xb_2d, its)."""
        bnorm2 = jnp.sum(b2 * b2)
        stop = (tol * tol * bnorm2).astype(jnp.float32)
        # x / xb / p / r must be DISTINCT buffers: each is donated to its
        # own kernel output (input_output_aliases), and two carries
        # sharing one buffer (x = xb) let XLA CSE them into a single
        # donation — measured on-chip at 1025^2 as xb coming back as a
        # fresh zero buffer while the CG itself converged normally.
        x = jnp.zeros_like(b2)
        r = b2 + jnp.zeros_like(b2)
        p = jnp.zeros_like(b2)
        xb = jnp.zeros_like(b2)
        use_while = _IN_KERNEL_WHILE

        def sp_of(i0, rr, rz, rrb, ib, ok):
            return jnp.stack([alpha_s.astype(jnp.float32), stop,
                              jnp.float32(maxiter), i0, rr, rz, rrb, ib,
                              ok]).reshape(1, 9)

        def cond(st):
            i0, x, r, p, xb, rr, rz, rrb, ib, ok = st
            # rr<0 sentinel: first chunk not yet run
            notdone = jnp.logical_or(i0 < 0.5, jnp.logical_and(
                jnp.logical_and(ok > 0.5, rr > stop), i0 < maxiter))
            # stall exit mirrored at chunk granularity
            stalled = jnp.logical_and(
                i0 - ib > float(self.stall_window),
                rrb < self.stall_guard * stop)
            return jnp.logical_and(notdone, jnp.logical_not(stalled))

        def body(st):
            i0, x, r, p, xb, rr, rz, rrb, ib, ok = st
            sp = sp_of(i0, rr, rz, rrb, ib, ok)
            x, r, p, xb, sc = self._call_chunk(
                use_while, sp, B2, C2, whier, x, r, p, xb)
            k = sc[0, 0]
            return (i0 + k, x, r, p, xb, sc[0, 1], sc[0, 2], sc[0, 3],
                    sc[0, 4], sc[0, 5])

        st = (jnp.float32(0.0), x, r, p, xb, bnorm2, jnp.float32(1.0),
              bnorm2, jnp.float32(0.0), jnp.float32(1.0))
        st = jax.lax.while_loop(cond, body, st)
        its = st[0]
        xb = st[4]
        return xb, its.astype(jnp.int32)

    def solve(self, b2, B2, C2, whier, alpha_s, tol, maxiter):
        return self._solve_jit(b2, B2, C2, tuple(whier),
                               jnp.asarray(alpha_s, jnp.float32),
                               jnp.asarray(tol, jnp.float32),
                               maxiter=int(maxiter))


# Loop style inside the kernel: lax.while_loop when Mosaic supports it
# (zero dead iterations), else masked fori_loop. Toggled by probe result
# via env; default fori+cond (always lowers).
_IN_KERNEL_WHILE = os.environ.get("PGTPU_MGFUSED_WHILE", "0") == "1"


def pad_to_grid(v, m: int):
    """(m*m,) f32 -> padded (rows, cols) with zero pad."""
    rp, cp = _pad_rows(m), _pad_cols(m)
    g = v.reshape(m, m)
    return jnp.pad(g, ((0, rp - m), (0, cp - m)))


def unpad_from_grid(g, m: int):
    return g[:m, :m].reshape(-1)
