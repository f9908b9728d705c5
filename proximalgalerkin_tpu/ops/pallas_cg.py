"""Fused DIA-CG: the whole CG iteration as two Pallas kernels.

Round-2 roofline analysis (RESULTS.md): the north-star obstacle solve is
dominated by the f32 inner CG on a 7-diagonal DIA operator, and each
iteration issues ~12 separate sub-10 MB XLA ops inside a lax.while_loop —
latency-bound at 10-31% of v5e HBM bandwidth. This module fuses each
iteration into TWO pallas_call launches:

  K1 (p-update + SpMV + partial dot):
      p <- r + beta * p        (computed over an extended row window, so
                                the halo values the SpMV needs are
                                recomputed in-register, never re-read)
      Ap <- S p                (static-offset diagonal shifts, no gathers)
      partial pAp per block
  K2 (axpy pair + partial dot):
      x <- x + a p;  r <- r - a Ap;  partial r.r

Layout: every vector lives as ((J+2)*BR, 128) f32 — J data blocks plus
one zero block of padding top and bottom, so K1's halo window (max DIA
offset, a few rows) stays in bounds and all BlockSpec offsets are whole
blocks. K1 writes p into a FRESH buffer (not aliased): the sequential
grid would otherwise let block i+1's halo read block i's already-updated
rows. K2 is purely elementwise, so x and r alias in place (pad blocks
carry zeros through). Scalars (alpha, beta) arrive via SMEM; per-block
dot partials are summed at the XLA level where the CG scalar recurrence
and the while_loop live.

Callers fall back to the XLA path when available() is False
(PGTPU_PALLAS=0 or a non-TPU backend).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:                                        # pragma: no cover
    _HAVE_PALLAS = False

LANES = 128
BR = 512          # block rows: 512*128 = 65,536 elements = 256 KB f32


def _corner_block(val, dtype):
    """(8, LANES) block with `val` at [0, 0], zeros elsewhere — Mosaic
    rejects scalar stores to VMEM, so partial dots are written as whole
    vector blocks built from a mask."""
    row = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    mask = jnp.logical_and(row == 0, col == 0)
    return jnp.where(mask, val.astype(dtype), jnp.zeros((8, LANES), dtype))


def _halo_rows(offsets) -> int:
    """Halo row count, rounded up to a multiple of 8: the manual HBM->VMEM
    DMA starts at row i*BR - halo, and the TPU runtime faults on DMA row
    offsets that are not sublane (8-row) aligned (bisected on-chip: halo=2
    kernel-faults, halo=8 runs)."""
    m = max(abs(int(o)) for o in offsets)
    h = -(-m // LANES) + 1
    return -(-h // 8) * 8


def _shift_window(x_ext, t: int, s: int, br: int):
    """(br,128) window of the flat vector starting at flat offset
    t*128 + s within x_ext: window[a,b] = x_ext_flat[(t+a)*128 + s + b].

    Lane shifts (s != 0) are a rotate+select rather than an unaligned
    concatenate: Mosaic lowers pltpu.roll to tpu.dynamic_rotate but
    crashes on lane-concatenating slices with unaligned offsets."""
    if s == 0:
        return x_ext[t:t + br, :]
    shift = jnp.asarray(LANES - s, jnp.int32)  # i32: x64 literals break Mosaic
    y0 = pltpu.roll(x_ext[t:t + br, :], shift, 1)
    y1 = pltpu.roll(x_ext[t + 1:t + br + 1, :], shift, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 1)
    return jnp.where(col < LANES - s, y0, y1)


def available() -> bool:
    if not _HAVE_PALLAS or os.environ.get("PGTPU_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:                                    # pragma: no cover
        return False


def make_fused_dia_cg(offsets: Tuple[int, ...], n: int, dtype=jnp.float32,
                      interpret: bool = False):
    """Build fused_cg(data2d, b, tol, maxiter, stall_guard, stall_window)
    for a fixed DIA pattern; data2d is (ndiags, N). Returns (x, its) with
    the same contract as models/obstacle_p1._cg (identity preconditioner
    — the caller equilibrates — plus best-iterate tracking and the
    noise-floor stall exit). Returns None if the pattern is unsupported.
    """
    if not _HAVE_PALLAS:
        return None
    offsets = tuple(int(o) for o in offsets)
    halo = _halo_rows(offsets)
    if halo >= BR:
        return None                      # offsets wider than a block
    rows = -(-n // LANES)
    J = -(-rows // BR)
    P = (J + 2) * BR                     # padded rows (zero block each end)
    n_pad = J * BR * LANES
    nd = len(offsets)

    def k1_kernel(beta_ref, p_hbm, r_hbm, d_ref, pout_ref, ap_ref,
                  dot_ref, scratch_p, scratch_r, sem_p, sem_r):
        i = pl.program_id(0)
        center = jnp.logical_and(i >= 1, i <= J)

        @pl.when(center)
        def _():
            beta = beta_ref[0, 0]
            base = i * BR - halo
            cp = pltpu.make_async_copy(
                p_hbm.at[pl.ds(base, BR + 2 * halo), :], scratch_p, sem_p)
            cr = pltpu.make_async_copy(
                r_hbm.at[pl.ds(base, BR + 2 * halo), :], scratch_r, sem_r)
            cp.start()
            cr.start()
            cp.wait()
            cr.wait()
            pext = scratch_r[:] + beta * scratch_p[:]
            y = jnp.zeros((BR, LANES), pext.dtype)
            for k, off in enumerate(offsets):
                t, s = divmod(halo * LANES + off, LANES)
                y = y + d_ref[k] * _shift_window(pext, t, s, BR)
            pown = pext[halo:halo + BR, :]
            pout_ref[:] = pown
            ap_ref[:] = y
            dot_ref[:] = _corner_block(jnp.sum(pown * y), dot_ref.dtype)

        @pl.when(jnp.logical_not(center))
        def _():
            pout_ref[:] = jnp.zeros((BR, LANES), pout_ref.dtype)
            ap_ref[:] = jnp.zeros((BR, LANES), ap_ref.dtype)
            dot_ref[:] = jnp.zeros((8, LANES), dot_ref.dtype)

    def k2_kernel(a_ref, x_ref, r_ref, p_ref, ap_ref, xo_ref, ro_ref,
                  rr_ref):
        a = a_ref[0, 0]
        x = x_ref[:] + a * p_ref[:]
        r = r_ref[:] - a * ap_ref[:]
        xo_ref[:] = x
        ro_ref[:] = r
        rr_ref[:] = _corner_block(jnp.sum(r * r), rr_ref.dtype)

    vblock = lambda: pl.BlockSpec((BR, LANES), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)

    # x64 must be off while tracing the pallas_call: the package enables it
    # globally, and i64 BlockSpec index maps fail Mosaic legalization
    # ("func.return (i64, i64)"). All operands are f32, so the scoped
    # disable changes only the index-map/iota trace dtypes. For the f64
    # interpret-mode golden (CPU CI) the scope must stay x64-on.
    from contextlib import nullcontext
    _x32 = jnp.dtype(dtype).itemsize <= 4
    _trace_ctx = (lambda: jax.enable_x64(False)) if _x32 else nullcontext

    def k1_call(beta, p_pad, r_pad, dpack):
        with _trace_ctx():
            return _k1_call(beta, p_pad, r_pad, dpack)

    def _k1_call(beta, p_pad, r_pad, dpack):
        return pl.pallas_call(
            k1_kernel,
            grid=(J + 2,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((nd, BR, LANES),
                             lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[vblock(), vblock(),
                       pl.BlockSpec((8, LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((P, LANES), dtype),
                jax.ShapeDtypeStruct((P, LANES), dtype),
                jax.ShapeDtypeStruct(((J + 2) * 8, LANES), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((BR + 2 * halo, LANES), dtype),
                pltpu.VMEM((BR + 2 * halo, LANES), dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(jnp.asarray([[beta]], dtype), p_pad, r_pad, dpack)

    def k2_call(a, x, r_pad, p_pad, ap):
        with _trace_ctx():
            return _k2_call(a, x, r_pad, p_pad, ap)

    def _k2_call(a, x, r_pad, p_pad, ap):
        return pl.pallas_call(
            k2_kernel,
            grid=(J + 2,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      vblock(), vblock(), vblock(), vblock()],
            out_specs=[vblock(), vblock(),
                       pl.BlockSpec((8, LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((P, LANES), dtype),
                jax.ShapeDtypeStruct((P, LANES), dtype),
                jax.ShapeDtypeStruct(((J + 2) * 8, LANES), dtype),
            ],
            input_output_aliases={1: 0, 2: 1},
            interpret=interpret,
        )(jnp.asarray([[a]], dtype), x, r_pad, p_pad, ap)

    def pack_vec(v):
        flat = jnp.zeros(n_pad, dtype).at[:n].set(v.astype(dtype))
        body = flat.reshape(J * BR, LANES)
        z = jnp.zeros((BR, LANES), dtype)
        return jnp.concatenate([z, body, z], axis=0)

    def pack_data(data2d):
        d = jnp.zeros((nd, n_pad), dtype)
        d = d.at[:, :data2d.shape[1]].set(data2d.astype(dtype))
        d = d.reshape(nd, J * BR, LANES)
        z = jnp.zeros((nd, BR, LANES), dtype)
        return jnp.concatenate([z, d, z], axis=1)

    tiny = jnp.asarray(np.finfo(np.dtype(dtype)).tiny, dtype)

    def fused_cg(data2d, b, tol, maxiter, stall_guard=1e4,
                 stall_window=128):
        dpack = pack_data(data2d)
        r_pad = pack_vec(b)
        p_pad = jnp.zeros_like(r_pad)
        x = jnp.zeros_like(r_pad)
        xb = x
        rr = jnp.sum(r_pad * r_pad)
        bnorm2 = rr
        stop = (tol * tol * bnorm2).astype(dtype)
        sguard = jnp.asarray(stall_guard, dtype)

        def cond(st):
            i, x, xb, r_pad, p_pad, rr, rz, ok, rrb, ib = st
            stalled = jnp.logical_and(i - ib > stall_window,
                                      rrb < sguard * stop)
            return jnp.logical_and(
                jnp.logical_and(ok, jnp.logical_not(stalled)),
                jnp.logical_and(i < maxiter, rr > stop))

        def body(st):
            i, x, xb, r_pad, p_pad, rr, rz, ok, rrb, ib = st
            beta = jnp.where(i == 0, jnp.asarray(0.0, dtype), rr / rz)
            p_pad, ap, pd = k1_call(beta, p_pad, r_pad, dpack)
            pAp = jnp.sum(pd)
            good = jnp.logical_and(pAp > tiny, rr > tiny)
            a = jnp.where(good, rr / jnp.where(good, pAp, 1.0),
                          jnp.asarray(0.0, dtype))
            rr_old = rr
            x, r_pad, rrd = k2_call(a, x, r_pad, p_pad, ap)
            rr_new = jnp.sum(rrd)
            better = rr_new < rrb
            xb = jnp.where(better, x, xb)
            rrb = jnp.where(better, rr_new, rrb)
            ib = jnp.where(better, i + 1, ib)
            return (i + 1, x, xb, r_pad, p_pad, rr_new, rr_old, good,
                    rrb, ib)

        st = (0, x, xb, r_pad, p_pad, rr, jnp.asarray(1.0, dtype),
              jnp.asarray(True), bnorm2, 0)
        out = jax.lax.while_loop(cond, body, st)
        xb, its = out[2], out[0]
        return xb[BR:-BR].reshape(-1)[:n], its

    return fused_cg
