"""Device-resident block-tridiagonal LDL (block-Thomas) direct solver.

The TPU-native sparse-direct replacement for MUMPS on *lattice-structured*
problems — which is every reference full-protocol example (gradient
constraint 200^2, eigenvalue 100^2, thermoforming 150^2, multiphase 50^2;
the reference solves each Newton system with `pc_factor_mat_solver_type:
mumps`, e.g. examples/01_obstacle_problem/obstacle_pg.py:131).

Idea: order dofs by mesh lines (quantized coordinate levels). FEM coupling
only reaches `span` lines, so grouping `span` lines per block makes the
(equilibrated) Jacobian block-TRIDIAGONAL with dense (bs, bs) blocks:

    A = [[D0, U0          ],
         [L0, D1, U1      ],
         [    L1, D2, ... ]]

Block-Thomas factorization/solve is then a `lax.scan` of dense (bs, bs)
matmuls + inverses — pure MXU work. Measured on the v5e at gradient-200^2
scale (nb=201, bs=1204): factor < 0.1 s, solve ~86 ms — versus 68 min of
1-core host SuperLU in the round-2 record.

Numerics: the LVPP saddle Jacobians are symmetric quasi-definite after
Jacobi equilibration (latent block negative definite, primal block positive
definite), for which unpivoted block LDL^T is strongly factorizable
(Vanderbei); each block inverse still uses partially-pivoted LU inside
`jnp.linalg.inv`. The factor runs in NATIVE f32 (no emulated-f64 device
loops — the axon runtime kernel-faults on those, RESULTS.md) and reaches
f64 direction accuracy through iterative refinement driven by the host
Newton loop (solve/newton.py _bt_direction), which the measured f32
backward error (~1e-4 relative) contracts to 1e-13 in 2-3 passes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _block_inv(M, algo: str = "ns"):
    """Dense block inverse in the factor dtype.

    f32 (and any dtype on CPU): LAPACK/XLA LU inverse directly. f64 on
    the TPU: the LuDecomposition custom call is f32-only, so two
    strategies exist:

    'ns' (default): f32 inverse + three Newton-Schulz steps
    X <- X (2I - M X) in (emulated-)f64 matmuls. Converges when the f32
    inverse has SOME digits — true for the multiphase saturated-softmax
    blocks (cond ~5e10 but DIAGONAL ill-conditioning: tiny,
    accurately-computed pivots give rho(I - M X0) << 1), false once the
    equilibrated block cond passes ~1/eps_f32^2 with CROSS-SCALE coupling
    (deep-contact obstacle saddles: off-diagonal u-psi entries ~1e8 after
    equilibration, cond ~1e16 — measured NaN at alpha 16 on the 101k-dof
    unstructured record where CPU f64 LAPACK sails through).

    'schur': recursive unpivoted block-Schur elimination in emulated-f64
    matmuls — REAL f64 Gaussian elimination depth. The LVPP blocks (and
    their nested Schur complements) are symmetric quasi-definite, for
    which unpivoted block elimination is strongly factorizable
    (Vanderbei), so no pivoting is needed at any level; leaves are
    symmetrically re-equilibrated (their cross-scale entries become O(1)
    locally) and inverted by the 'ns' scheme. ~3-5x the 'ns' cost."""
    if M.dtype != jnp.float64 or jax.default_backend() == "cpu":
        return jnp.linalg.inv(M)
    if algo == "schur":
        return _block_inv_schur(M)
    return _block_inv_ns(M)


def _block_inv_ns(M):
    X = jnp.linalg.inv(M.astype(jnp.float32)).astype(jnp.float64)
    eye2 = 2.0 * jnp.eye(M.shape[-1], dtype=jnp.float64)
    for _ in range(3):
        X = X @ (eye2 - M @ X)
    return X


def _block_inv_schur(M, leaf: int = 128):
    """inv(M) by recursive 2x2 block elimination (see _block_inv 'schur').
    Supports leading batch dims. Leaf blocks are scaled to unit row
    inf-norm symmetrically before the f32+NS inverse: T M T with
    T = diag(1/sqrt(rownorm)) — inv(M) = T inv(TMT) T."""
    n = M.shape[-1]
    if n <= leaf:
        t = 1.0 / jnp.sqrt(jnp.maximum(
            jnp.max(jnp.abs(M), axis=-1), 1e-300))
        Ms = t[..., :, None] * M * t[..., None, :]
        Xs = _block_inv_ns(Ms)
        return t[..., :, None] * Xs * t[..., None, :]
    k = n // 2
    A = M[..., :k, :k]
    B = M[..., :k, k:]
    C = M[..., k:, :k]
    D = M[..., k:, k:]
    Ai = _block_inv_schur(A, leaf)
    CAi = C @ Ai
    S = D - CAi @ B
    Si = _block_inv_schur(S, leaf)
    AiB = Ai @ B
    tl = Ai + AiB @ (Si @ CAi)
    tr = -AiB @ Si
    bl = -Si @ CAi
    top = jnp.concatenate([tl, tr], axis=-1)
    bot = jnp.concatenate([bl, Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _check_apply_dtype(dtype: str, apply_dtype: Optional[str]):
    """Reject the unsupported f32-factor / f64-apply request loudly
    (ADVICE r4: the downcast-only condition silently returned f32):
    apply_dtype only ever CASTS A FACTOR DOWN for cheap applies — an f32
    factor carries no f64 accuracy to recover."""
    if apply_dtype in ("f64", "double") and dtype not in ("f64", "double"):
        raise ValueError("pc_factor_apply_dtype='f64' requires "
                         "pc_factor_dtype='f64' (an f32 factor cannot be "
                         "applied at f64 accuracy)")


def _line_ids(points: np.ndarray, axis: int) -> np.ndarray:
    """Rank of each dof's quantized coordinate level along `axis`."""
    c = points[:, axis]
    span = max(float(c.max() - c.min()), 1.0)
    q = np.round(c / (1e-9 * span)).astype(np.int64)
    levels = np.unique(q)
    return np.searchsorted(levels, q)


def _graph_level_blocks(pattern) -> Optional[np.ndarray]:
    """BFS level-set blocking of the dof GRAPH — the unstructured-mesh
    generalization of coordinate lines (VERDICT r4 missing #2: btlu
    covered every lattice protocol but nothing meshed; MUMPS doesn't
    care, examples/01_obstacle_problem/obstacle_pg.py:131).

    Property used: an (undirected) graph edge connects nodes whose BFS
    levels differ by AT MOST one, so ordering dofs by BFS level makes
    the matrix exactly block-tridiagonal with one level per block — the
    same structure the lattice path gets from coordinate lines, at
    bs = max level width (~ the mesh's cross-section, O(sqrt(N)) in 2D).
    The root is chosen pseudo-peripherally (repeated farthest-node BFS,
    the RCM heuristic — la/ordering.py territory) to minimize the level
    count's dual, the max width. Returns the (N,) block id per dof, or
    None when the graph degenerates (fewer than 3 levels)."""
    import scipy.sparse as sp
    N, K = pattern.ell_cols.shape
    rows = np.repeat(np.arange(N, dtype=np.int64), K)
    cols = pattern.ell_cols.astype(np.int64).reshape(-1)
    ones = np.ones(len(cols), np.int8)
    A = sp.coo_matrix((ones, (rows, cols)), shape=(N, N)).tocsr()
    A = (A + A.T).tocsr()
    lev = bfs_level_sets(A)
    if lev is None or int(lev.max()) + 1 < 3:
        return None
    return lev


def bfs_level_sets(A) -> Optional[np.ndarray]:
    """Pseudo-peripheral BFS levels of a symmetric CSR adjacency ->
    (N,) level id per node; unreached (isolated) nodes get level 0.
    Shared by _graph_level_blocks and the distributed per-subdomain
    blocking (parallel/dofpart.py asm_btlu)."""
    N = A.shape[0]

    def bfs(start):
        lev = np.full(N, -1, np.int64)
        lev[start] = 0
        frontier = np.asarray([start], np.int64)
        d = 0
        while frontier.size:
            d += 1
            nbrs = np.unique(A[frontier].indices)
            frontier = nbrs[lev[nbrs] < 0]
            lev[frontier] = d
        return lev

    # start from a max-degree node: node 0 can be ISOLATED (e.g. an
    # untouched far-halo dof of the distributed ext graphs), and a BFS
    # started there never leaves it — the pseudo-peripheral iteration
    # then collapses every level to 0 (measured: nb=1, bs=ext_total on
    # the 96^2 distributed subdomains, i.e. a full dense factor)
    deg = np.diff(A.indptr)
    lev = bfs(int(np.argmax(deg)))
    best = None
    for _ in range(3):   # pseudo-peripheral iterations
        reached = lev >= 0
        start = int(np.argmax(np.where(reached, lev, -1)))
        lev = bfs(start)
        w = np.bincount(lev[lev >= 0])
        key = (int(w.max()), -int(lev.max()))
        if best is None or key < best[0]:
            best = (key, lev.copy())
    lev = best[1]
    # unreached dofs (disconnected: pure-diagonal rows) couple to nothing
    # — any block is valid; level 0 keeps the count balanced least-worst
    lev[lev < 0] = 0
    return lev


@dataclass(frozen=True)
class LineBlocking:
    """Host-precomputed block-tridiagonal structure for one ELL pattern.

    nb, bs:    number of blocks / padded block size
    rhs_idx:   (N,) position of dof r in the flat (nb*bs,) block vector
    tgt_d/l/u: (N*K,) flat scatter target of each ELL slot into the dense
               D (nb,bs,bs) / L,U (nb-1,bs,bs) tensors; out-of-range
               (dropped) for slots that belong to another tensor
    pad_idx:   flat D-diagonal positions of padding dofs (get 1.0)
    """

    nb: int
    bs: int
    rhs_idx: np.ndarray
    tgt_d: np.ndarray
    tgt_l: np.ndarray
    tgt_u: np.ndarray
    pad_idx: np.ndarray
    dense_ok: bool = True
    max_bytes: float = 11e9

    def fits_dense(self, itemsize: int = 4, algo: str = "thomas") -> bool:
        """HBM fit of the dense factor path at the ACTUAL factor
        itemsize (pc_factor_dtype='f64' doubles it — ADVICE r4: the
        build-time dense_ok hard-coded 4 bytes and could approve
        configurations that OOM at runtime). Thomas keeps ~5 (nb,bs,bs)
        tensors live (D,L,U + Minv,T); cyclic reduction peaks much
        higher — 2^ceil(log2 nb)-padded D/L/U inputs, ~5 accumulated
        level stacks, AND the level-0 batched Newton-Schulz inverse
        transients: measured on the v5e, CR f64 at nb=51/bs=1212
        (9-mult estimate 5.4 GB) RESOURCE_EXHAUSTED a 16 GB chip while
        Thomas f64 (3.0 GB) ran — hence the 16x multiplier."""
        mult = 16.0 if algo == "cr" else 5.0
        return mult * self.nb * self.bs * self.bs * itemsize \
            <= self.max_bytes

    def fits_streamed(self, itemsize: int = 4) -> bool:
        """Streamed live set: the Minv stack + ~6 (bs,bs) transients."""
        return (self.nb + 6.0) * self.bs * self.bs * itemsize \
            <= self.max_bytes

    @classmethod
    def build(cls, pattern, points: np.ndarray,
              max_bytes: float = 11e9) -> "LineBlocking":
        """pattern: la/ell.EllPattern; points: (N, gdim) dof coordinates.

        Chooses the coordinate axis that minimizes the padded block size,
        groups `span` lines per block (span = max coupling distance in
        lines), and precomputes the ELL-slot -> dense-block scatter maps.
        Raises ValueError when the dof graph is not line-structured enough
        (callers fall back to another solver). When the DENSE factor
        tensors (5 live (nb,bs,bs) arrays) exceed max_bytes but the
        STREAMED variant (one Minv tensor + per-step transients,
        bt_factor_streamed) fits, a LineBlocking with dense_ok=False is
        returned instead of raising — the eigenvalue 100^2 case
        (nb=101, bs=3612: 26 GB dense vs ~5.7 GB streamed on 16 GB HBM).
        """
        N, K = pattern.ell_cols.shape
        ell_cols = pattern.ell_cols.astype(np.int64)
        rows = np.repeat(np.arange(N, dtype=np.int64), K)
        cols = ell_cols.reshape(-1)

        best = None
        for axis in range(points.shape[1]):
            line = _line_ids(points, axis)
            span = int(np.abs(line[rows] - line[cols]).max())
            if span == 0:
                continue
            nlines = int(line.max()) + 1
            g = span
            blk = line // g
            nb = int(blk.max()) + 1
            if nb < 3:
                continue
            bs = int(np.bincount(blk, minlength=nb).max())
            if best is None or bs < best[0]:
                best = (bs, nb, blk, span)
        # Unstructured candidate: BFS level sets of the dof graph (every
        # graph is "line-structured" in its BFS levels). Considered
        # whenever coordinate lines fail OR pad poorly (boundary-snapped
        # points fragment the coordinate levels — measured on the res
        # 0.012 disk: coordinate nb=41/bs=2418 vs graph nb=194/bs=402,
        # 46x cheaper factor). Selection by dense-factor footprint
        # nb*bs^2, which also orders factor FLOPs (nb*bs^3 at fixed N)
        # and keeps true lattices on their optimal coordinate lines.
        if best is None or best[0] * best[1] > 1.25 * N:
            lev = _graph_level_blocks(pattern)
            if lev is not None:
                nb_g = int(lev.max()) + 1
                bs_g = int(np.bincount(lev, minlength=nb_g).max())
                if nb_g >= 3 and (best is None or nb_g * bs_g * bs_g
                                  < best[1] * best[0] * best[0]):
                    best = (bs_g, nb_g, lev, 1)
        if best is None:
            raise ValueError("dof graph is not line-structured")
        bs, nb, blk, span = best
        dense_ok = 5.0 * nb * bs * bs * 4 <= max_bytes
        # streamed live set: the Minv stack + ~6 (bs,bs) transients
        if not dense_ok and (nb + 6.0) * bs * bs * 4 > max_bytes:
            raise ValueError(
                f"block-tridiagonal factors too large even streamed: "
                f"nb={nb} bs={bs} "
                f"(~{(nb + 6) * bs * bs * 4 / 1e9:.1f} GB)")

        # position of each dof inside its block (stable order within block)
        order = np.lexsort((np.arange(N), blk))
        loc = np.empty(N, dtype=np.int64)
        loc[order] = np.arange(N) - np.concatenate(
            [[0], np.cumsum(np.bincount(blk, minlength=nb))])[blk[order]]
        rhs_idx = blk * bs + loc

        br, bc = blk[rows], blk[cols]
        i, j = loc[rows], loc[cols]
        drop_d = nb * bs * bs
        drop_lu = (nb - 1) * bs * bs
        tgt_d = np.where(br == bc, br * bs * bs + i * bs + j, drop_d)
        # L[k] = A[block k+1, block k]; U[k] = A[block k, block k+1]
        tgt_l = np.where(br == bc + 1, bc * bs * bs + i * bs + j, drop_lu)
        tgt_u = np.where(bc == br + 1, br * bs * bs + i * bs + j, drop_lu)
        # ELL PADDING slots carry the row's diagonal column (la/ell.py:
        # ell_gather pads with slot nnz) — they must scatter to the DROP
        # position, not alias the true diagonal: bt_assemble scatter-SETs
        # (each live slot owns a unique dense position) and a 0-valued
        # padding write could otherwise clobber the diagonal entry
        pad_slots = pattern.ell_gather.reshape(-1) >= pattern.nnz
        tgt_d[pad_slots] = drop_d
        tgt_l[pad_slots] = drop_lu
        tgt_u[pad_slots] = drop_lu
        beyond = np.abs(br - bc) > 1
        if beyond.any():
            raise ValueError("coupling beyond adjacent blocks")

        counts = np.bincount(blk, minlength=nb)
        pad = []
        for k in range(nb):
            pad.extend(k * bs * bs + p * bs + p
                       for p in range(counts[k], bs))
        return cls(nb=nb, bs=bs, rhs_idx=rhs_idx.astype(np.int32),
                   tgt_d=tgt_d.astype(np.int32),
                   tgt_l=tgt_l.astype(np.int32),
                   tgt_u=tgt_u.astype(np.int32),
                   pad_idx=np.asarray(pad, dtype=np.int32),
                   dense_ok=bool(dense_ok),
                   max_bytes=float(max_bytes))

    def device_maps(self):
        """Index arrays as a pytree of device arrays (pass as jit args)."""
        if not hasattr(self, "_maps"):
            object.__setattr__(self, "_maps", {
                "rhs_idx": jnp.asarray(self.rhs_idx),
                "tgt_d": jnp.asarray(self.tgt_d),
                "tgt_l": jnp.asarray(self.tgt_l),
                "tgt_u": jnp.asarray(self.tgt_u),
                "pad_idx": jnp.asarray(self.pad_idx),
            })
        return self._maps

    def streamed_maps(self) -> dict:
        """Per-block padded COO maps for the STREAMED factor/apply
        (bt_factor_streamed / bt_apply_streamed): instead of materializing
        dense (nb,bs,bs) D/L/U tensors, each scan step scatters only ITS
        block's ELL entries, so the live set is the Minv stack plus a few
        (bs,bs) transients. Padding convention: src = NK (gathers the
        appended zero of flat_p), i = bs (scatter-dropped), j = 0.

        Keys (device arrays): d_src/d_tgt (nb, Pd) with d_tgt in
        [0, bs*bs]; pad (nb, bs) per-block diagonal fill positions;
        l_src/l_i/l_j and u_src/u_i/u_j (nb-1, P*).
        """
        if hasattr(self, "_smaps"):
            return self._smaps
        nb, bs = self.nb, self.bs
        bsq = bs * bs
        NK = len(self.tgt_d)

        def group(tgt_flat, nblocks, pad_loc):
            sel = np.flatnonzero(tgt_flat < nblocks * bsq)
            blk = tgt_flat[sel].astype(np.int64) // bsq
            loc = tgt_flat[sel].astype(np.int64) % bsq
            order = np.argsort(blk, kind="stable")
            blk, loc, src = blk[order], loc[order], sel[order]
            counts = np.bincount(blk, minlength=nblocks)
            P = max(int(counts.max()), 1)
            starts = np.concatenate([[0], np.cumsum(counts)])
            src_pad = np.full((nblocks, P), NK, np.int64)
            loc_pad = np.full((nblocks, P), pad_loc, np.int64)
            pos = np.arange(len(blk)) - starts[blk]
            src_pad[blk, pos] = src
            loc_pad[blk, pos] = loc
            return src_pad, loc_pad

        d_src, d_tgt = group(self.tgt_d.astype(np.int64), nb, bsq)
        l_src, l_tgt = group(self.tgt_l.astype(np.int64), nb - 1, bsq)
        u_src, u_tgt = group(self.tgt_u.astype(np.int64), nb - 1, bsq)
        # per-block diagonal fill of padding dofs: (nb, bs), drop slot bsq
        pad = np.full((nb, bs), bsq, np.int64)
        pidx = self.pad_idx.astype(np.int64)
        pblk, ploc = pidx // bsq, pidx % bsq
        for k in range(nb):
            lk = ploc[pblk == k]
            pad[k, :len(lk)] = lk
        sm = {
            "d_src": jnp.asarray(d_src), "d_tgt": jnp.asarray(d_tgt),
            "pad": jnp.asarray(pad),
            "l_src": jnp.asarray(l_src),
            "l_i": jnp.asarray(l_tgt // bs), "l_j": jnp.asarray(l_tgt % bs),
            "u_src": jnp.asarray(u_src),
            "u_i": jnp.asarray(u_tgt // bs), "u_j": jnp.asarray(u_tgt % bs),
        }
        object.__setattr__(self, "_smaps", sm)
        return sm


@partial(jax.jit, static_argnames=("nb", "bs", "dtype"))
def bt_assemble(ell_data, ell_cols, maps, nb: int, bs: int,
                dtype: str = "f32"):
    """Equilibrate ELL data, cast to the factor dtype, scatter into dense
    (D, L, U) blocks.

    Returns (D, L, U, s) with s the f64 symmetric scale (|diag|^-1/2):
    the factored system is S A S, so directions are dx = s * solve(s * b).

    dtype: 'f32' (default; refinement recovers f64 accuracy) or 'f64' for
    systems whose equilibrated condition number exceeds ~1/eps_f32 — the
    multiphase softmax Jacobian saturates its psi block to ~eps0=1e-9 and
    the f32 factor stops being a contraction (refinement diverges); MUMPS
    in the reference is always f64 (multiphase_dolfinx.py petsc options).
    """
    fdt = jnp.float32 if dtype == "f32" else jnp.float64
    row = jnp.arange(ell_data.shape[0])[:, None]
    diag = jnp.sum(jnp.where(ell_cols == row, ell_data, 0.0), axis=1)
    s = jnp.where(jnp.abs(diag) > 1e-300,
                  1.0 / jnp.sqrt(jnp.abs(diag)), 1.0)
    data_s = (s[:, None] * ell_data * s[ell_cols]).astype(fdt)
    flat = data_s.reshape(-1)
    # scatter-SET, not add: each live ELL slot owns a distinct dense
    # position (ELL columns are unique per row), and set skips the
    # read-modify-write ordering scatter-add pays — measured 3.0 s -> a
    # few hundred ms for the f64 assemble at multiphase-50^2 scale
    D = jnp.zeros(nb * bs * bs, fdt).at[maps["tgt_d"]].set(
        flat, mode="drop")
    D = D.at[maps["pad_idx"]].set(1.0, mode="drop")
    L = jnp.zeros((nb - 1) * bs * bs, fdt).at[maps["tgt_l"]].set(
        flat, mode="drop")
    U = jnp.zeros((nb - 1) * bs * bs, fdt).at[maps["tgt_u"]].set(
        flat, mode="drop")
    return (D.reshape(nb, bs, bs), L.reshape(nb - 1, bs, bs),
            U.reshape(nb - 1, bs, bs), s)


@partial(jax.jit, static_argnames=("blockinv",))
def bt_factor(D, L, U, blockinv: str = "ns"):
    """Block-Thomas factorization: returns (Minv, T) with
    M_k = D_k - L_{k-1} Minv_{k-1} U_{k-1} (Schur recursion) and
    T_k = Minv_k U_k.

    All matmuls are pinned to true-f32 precision: the TPU MXU default
    (one bf16 pass, ~3 decimal digits) injects ~0.4% relative error into
    every block product, which the nb-deep Schur recursion amplifies until
    the factor is useless as a refinement preconditioner (measured at
    gradient 200^2 on the v5e: relres 62 after one apply, refinement
    diverging x15/pass; with HIGHEST precision the chip matches the CPU
    factor bit-for-purpose, relres 3e-11 in 4 passes)."""
    with jax.default_matmul_precision("highest"):
        def step(Minv_prev, ops):
            Dk, Lk, Uk_prev = ops
            T_prev = Minv_prev @ Uk_prev
            Minv = _block_inv(Dk - Lk @ T_prev, blockinv)
            return Minv, (Minv, T_prev)

        Minv0 = _block_inv(D[0], blockinv)
        _, (Minv_rest, T) = jax.lax.scan(step, Minv0, (D[1:], L, U))
        return jnp.concatenate([Minv0[None], Minv_rest], axis=0), T


@jax.jit
def bt_apply(Minv, T, L, b_blocks):
    """Forward/back substitution for one flat rhs laid out as (nb, bs).
    Matmul precision pinned for the same reason as bt_factor."""
    with jax.default_matmul_precision("highest"):
        def fwd(y_prev, ops):
            Lk, Minv_prev, bk = ops
            y = bk - Lk @ (Minv_prev @ y_prev)
            return y, y

        y0 = b_blocks[0]
        _, y_rest = jax.lax.scan(fwd, y0, (L, Minv[:-1], b_blocks[1:]))
        y = jnp.concatenate([y0[None], y_rest], axis=0)

        def bwd(x_next, ops):
            Minv_k, Tk, yk = ops
            xk = Minv_k @ yk - Tk @ x_next
            return xk, xk

        xK = Minv[-1] @ y[-1]
        _, x_rest = jax.lax.scan(bwd, xK, (Minv[:-1], T, y[:-1]),
                                 reverse=True)
        return jnp.concatenate([x_rest, xK[None]], axis=0)


@partial(jax.jit, static_argnames=("nb", "bs"))
def bt_solve(Minv, T, L, s, b64, maps, nb: int, bs: int):
    """f64 rhs -> f64 direction through the factors (one refinement-free
    pass; the factor dtype — f32 default, f64 for ill-conditioned systems
    — is inferred from Minv)."""
    fdt = Minv.dtype
    bb = jnp.zeros(nb * bs, fdt).at[maps["rhs_idx"]].set(
        (s * b64).astype(fdt))
    xb = bt_apply(Minv, T, L, bb.reshape(nb, bs)).reshape(-1)
    return s * xb[maps["rhs_idx"]].astype(b64.dtype)


class BlockTriFactorization:
    """One assembled+factored system: solve(b64)->dx64, all device.

    apply_dtype='f32' with dtype='f64' is the production multiphase
    combination: the FACTOR recursion needs f64 (f32 Schur-complement
    error compounds through nb nested inversions until refinement
    diverges at the record's conditioning) but the APPLY does not — the
    f32-cast factors still contract refinement ~300x/pass (measured at
    50^2 on the v5e: relres 3e-5 -> 2e-12 in 4 passes) at 30 ms/apply vs
    160 ms for the emulated-f64 apply and 4 s for a refactor."""

    def __init__(self, blocking: LineBlocking, ell, data64, arrays,
                 dtype: str = "f32", apply_dtype: Optional[str] = None,
                 blockinv: str = "ns"):
        _check_apply_dtype(dtype, apply_dtype)
        maps = blocking.device_maps()
        D, L, U, s = bt_assemble(data64, arrays["ell_cols"], maps,
                                 blocking.nb, blocking.bs, dtype)
        self.Minv, self.T = bt_factor(D, L, U, blockinv)
        self.L = L
        if (apply_dtype or dtype) == "f32" and dtype != "f32":
            self.Minv = self.Minv.astype(jnp.float32)
            self.T = self.T.astype(jnp.float32)
            self.L = self.L.astype(jnp.float32)
        self.s = s
        self._maps = maps
        self._nb, self._bs = blocking.nb, blocking.bs

    def solve(self, b):
        b64 = jnp.asarray(b)
        return bt_solve(self.Minv, self.T, self.L, self.s, b64,
                        self._maps, self._nb, self._bs)


# ----------------------------------------- cyclic-reduction variant (CR)

def _cr_pad(D, L, U):
    """Pad a (nb, bs, bs) block-tridiagonal system to n = 2^m - 1 blocks
    with decoupled identity blocks (D=I, L=U=0) so every cyclic-reduction
    level halves exactly. Returns (D, L, U) padded."""
    nb, bs = D.shape[0], D.shape[1]
    m = int(np.ceil(np.log2(nb + 1)))
    n = 2 ** m - 1
    if n == nb:
        return D, L, U
    eye = jnp.broadcast_to(jnp.eye(bs, dtype=D.dtype), (n - nb, bs, bs))
    Z = jnp.zeros((n - nb,) + L.shape[1:], L.dtype)
    return (jnp.concatenate([D, eye]), jnp.concatenate([L, Z]),
            jnp.concatenate([U, Z]))


@partial(jax.jit, static_argnames=("blockinv",))
def bt_factor_cr(D, L, U, blockinv: str = "ns"):
    """Block CYCLIC REDUCTION factorization — the log-depth, batched-MXU
    alternative to the sequential block-Thomas scan (bt_factor).

    Thomas runs nb dependent steps (each one block inverse + two (bs,bs)
    matmuls): at multiphase-50^2 scale (nb=51, bs=1212) the f64 factor
    measures 1.0 s on the v5e (records/mp_device_components.log). CR
    eliminates all even-indexed blocks at once per level: ceil(log2 nb)
    levels of ONE batched inverse + six batched matmuls each, ~2.7x the
    FLOPs but 8x fewer dependent steps, all MXU-shaped. CAVEAT (measured
    round 5): the f64 CR live set (padded inputs + level stacks + the
    batched Newton-Schulz inverse transients) RESOURCE_EXHAUSTED the
    16 GB v5e at that same size while Thomas ran — LineBlocking.
    fits_dense charges CR 16x nb bs^2 for this reason, and the
    multiphase device record uses Thomas
    (records/rec_multiphase_50_device.jsonl). Same unpivoted
    block-elimination numerics as Thomas: CR is a symmetric permutation
    of the elimination order, so Vanderbei's strong-factorizability of
    the equilibrated quasi-definite LVPP Jacobians still applies, and
    f64 accuracy is reached by the same iterative refinement.

    Per level (0-based, odd rows kept; L[k] = A[k+1,k], U[k] = A[k,k+1]):
        D'_r = D_{2r+1} - L_{2r} Dinv_{2r} U_{2r}
                        - U_{2r+1} Dinv_{2r+2} L_{2r+1}
        L'_r = -L_{2r+2} Dinv_{2r+2} L_{2r+1}
        U'_r = -U_{2r+1} Dinv_{2r+2} U_{2r+2}

    Returns (levels, root): levels a tuple of per-level
    (Dinv_e, G_l, G_r, Lr, Ul) stacks with G_l = L_{2r} Dinv_{2r},
    G_r = U_{2r+1} Dinv_{2r+2}; root the (1, bs, bs) inverse of the last
    remaining block."""
    with jax.default_matmul_precision("highest"):
        D, L, U = _cr_pad(D, L, U)
        n = D.shape[0]
        levels = []
        while n > 1:
            Dinv_e = _block_inv(D[0::2], blockinv)
            Do = D[1::2]
            Ll, Lr = L[0::2], L[1::2]
            Ul, Ur = U[0::2], U[1::2]
            G_l = Ll @ Dinv_e[:-1]
            G_r = Ur @ Dinv_e[1:]
            D = Do - G_l @ Ul - G_r @ Lr
            L = -(G_l[1:] @ Lr[:-1])
            U = -(G_r[:-1] @ Ul[1:])
            levels.append((Dinv_e, G_l, G_r, Lr, Ul))
            n //= 2
        return tuple(levels), _block_inv(D, blockinv)


@jax.jit
def bt_apply_cr(levels, root, b_blocks):
    """Solve through the CR factors: log-depth rhs reduction, root solve,
    log-depth back-substitution. b_blocks is (nb, bs) in the UNPADDED
    block layout; padding blocks (decoupled identities) get zero rhs."""
    mv = partial(jnp.einsum, "rij,rj->ri")
    with jax.default_matmul_precision("highest"):
        n = 2 * levels[0][0].shape[0] - 1
        nb = b_blocks.shape[0]
        b = jnp.zeros((n,) + b_blocks.shape[1:], b_blocks.dtype)
        b = b.at[:nb].set(b_blocks)
        stack = []
        for (Dinv_e, G_l, G_r, Lr, Ul) in levels:
            be = b[0::2]
            stack.append(be)
            b = b[1::2] - mv(G_l, be[:-1]) - mv(G_r, be[1:])
        x = mv(root, b)
        for (Dinv_e, G_l, G_r, Lr, Ul), be in zip(reversed(levels),
                                                  reversed(stack)):
            t = be.at[1:].add(-mv(Lr, x)).at[:-1].add(-mv(Ul, x))
            xe = mv(Dinv_e, t)
            xn = jnp.zeros((2 * x.shape[0] + 1,) + x.shape[1:], x.dtype)
            x = xn.at[0::2].set(xe).at[1::2].set(x)
        return x[:nb]


@partial(jax.jit, static_argnames=("nb", "bs"))
def bt_solve_cr(levels, root, s, b64, rhs_idx, nb: int, bs: int):
    """f64 rhs -> direction through the CR factors (one pass; factor
    dtype inferred from the level tensors), mirroring bt_solve."""
    fdt = root.dtype
    bb = jnp.zeros(nb * bs, fdt).at[rhs_idx].set((s * b64).astype(fdt))
    xb = bt_apply_cr(levels, root, bb.reshape(nb, bs)).reshape(-1)
    return s * xb[rhs_idx].astype(b64.dtype)


def _cr_cast(levels, root, dt):
    cast = lambda t: jax.tree.map(lambda a: a.astype(dt), t)
    return cast(levels), root.astype(dt)


class CRBlockTriFactorization:
    """Cyclic-reduction assembled+factored system — same
    solve(b64)->dx64 interface and dtype contract as
    BlockTriFactorization, selected via pc_factor_algo='cr'."""

    def __init__(self, blocking: LineBlocking, ell, data64, arrays,
                 dtype: str = "f32", apply_dtype: Optional[str] = None,
                 blockinv: str = "ns"):
        _check_apply_dtype(dtype, apply_dtype)
        maps = blocking.device_maps()
        D, L, U, s = bt_assemble(data64, arrays["ell_cols"], maps,
                                 blocking.nb, blocking.bs, dtype)
        self.levels, self.root = bt_factor_cr(D, L, U, blockinv)
        if (apply_dtype or dtype) == "f32" and dtype != "f32":
            self.levels, self.root = _cr_cast(self.levels, self.root,
                                              jnp.float32)
        self.s = s
        self._rhs_idx = maps["rhs_idx"]
        self._nb, self._bs = blocking.nb, blocking.bs

    def solve(self, b):
        b64 = jnp.asarray(b)
        return bt_solve_cr(self.levels, self.root, self.s, b64,
                           self._rhs_idx, self._nb, self._bs)


# ----------------------------------------------------- streamed variant

@partial(jax.jit, static_argnames=("dtype",))
def bt_equilibrate(ell_data, ell_cols, dtype: str = "f32"):
    """Symmetric Jacobi equilibration -> (flat_p, s): flat_p is the
    (N*K+1,) scaled ELL data in the factor dtype with an appended zero
    (the gather target of padded map slots), s the f64 scale as in
    bt_assemble."""
    fdt = jnp.float32 if dtype == "f32" else jnp.float64
    row = jnp.arange(ell_data.shape[0])[:, None]
    diag = jnp.sum(jnp.where(ell_cols == row, ell_data, 0.0), axis=1)
    s = jnp.where(jnp.abs(diag) > 1e-300,
                  1.0 / jnp.sqrt(jnp.abs(diag)), 1.0)
    data_s = (s[:, None] * ell_data * s[ell_cols]).astype(fdt)
    flat_p = jnp.concatenate(
        [data_s.reshape(-1), jnp.zeros((1,), fdt)])
    return flat_p, s


@partial(jax.jit, static_argnames=("nb", "bs", "blockinv"))
def bt_factor_streamed(flat_p, sm, nb: int, bs: int,
                       blockinv: str = "ns"):
    """Memory-lean block-Thomas factor: only the (nb, bs, bs) Minv stack
    is materialized; D/L/U blocks are scattered from the ELL data inside
    each scan step and never stored. Live set ~ (nb + 6) bs^2 f32 vs the
    dense path's 5 nb bs^2 — the difference between 26 GB and 5.7 GB at
    eigenvalue-100^2 scale (nb=101, bs=3612), i.e. between host-LU
    fallback and an all-device record on a 16 GB v5e. Matmul precision
    pinned for the same MXU-bf16 reason as bt_factor."""
    bsq = bs * bs

    def dense(src, tgt, pad=None):
        # scatter-SET: each live slot owns a unique in-block position
        # (ELL padding is pre-routed to the drop slot by LineBlocking)
        M = jnp.zeros(bsq, flat_p.dtype).at[tgt].set(flat_p[src],
                                                     mode="drop")
        if pad is not None:
            M = M.at[pad].set(1.0, mode="drop")
        return M.reshape(bs, bs)

    with jax.default_matmul_precision("highest"):
        M0 = dense(sm["d_src"][0], sm["d_tgt"][0], sm["pad"][0])
        Minv0 = _block_inv(M0, blockinv)

        def step(Minv_prev, xs):
            d_src, d_tgt, padk, l_src, l_i, l_j, u_src, u_i, u_j = xs
            Dk = dense(d_src, d_tgt, padk)
            Lk = dense(l_src, l_i * bs + l_j)
            Ukm1 = dense(u_src, u_i * bs + u_j)
            T_prev = Minv_prev @ Ukm1
            Minv = _block_inv(Dk - Lk @ T_prev, blockinv)
            return Minv, Minv

        xs = (sm["d_src"][1:], sm["d_tgt"][1:], sm["pad"][1:],
              sm["l_src"], sm["l_i"], sm["l_j"],
              sm["u_src"], sm["u_i"], sm["u_j"])
        _, Minv_rest = jax.lax.scan(step, Minv0, xs)
        return jnp.concatenate([Minv0[None], Minv_rest], axis=0)


@jax.jit
def bt_apply_streamed(Minv, flat_p, sm, b_blocks):
    """Forward/back substitution with sparse L/U actions reconstructed
    from the ELL data per step (nothing dense stored beyond Minv):
      fwd: y_k = b_k - L_{k-1} (Minv_{k-1} y_{k-1})
      bwd: x_k = Minv_k (y_k - U_k x_{k+1})
    """
    bs = Minv.shape[1]

    def spcoo(src, i, j, v):
        return jnp.zeros(bs, flat_p.dtype).at[i].add(
            flat_p[src] * v[j], mode="drop")

    with jax.default_matmul_precision("highest"):
        def fwd(y_prev, xs):
            Minv_prev, l_src, l_i, l_j, bk = xs
            t = Minv_prev @ y_prev
            y = bk - spcoo(l_src, l_i, l_j, t)
            return y, y

        y0 = b_blocks[0]
        _, y_rest = jax.lax.scan(
            fwd, y0, (Minv[:-1], sm["l_src"], sm["l_i"], sm["l_j"],
                      b_blocks[1:]))
        y = jnp.concatenate([y0[None], y_rest], axis=0)

        def bwd(x_next, xs):
            Minv_k, u_src, u_i, u_j, yk = xs
            xk = Minv_k @ (yk - spcoo(u_src, u_i, u_j, x_next))
            return xk, xk

        xK = Minv[-1] @ y[-1]
        _, x_rest = jax.lax.scan(
            bwd, xK, (Minv[:-1], sm["u_src"], sm["u_i"], sm["u_j"],
                      y[:-1]), reverse=True)
        return jnp.concatenate([x_rest, xK[None]], axis=0)


@partial(jax.jit, static_argnames=("nb", "bs"))
def bt_solve_streamed(Minv, flat_p, s, b64, rhs_idx, sm, nb: int, bs: int):
    fdt = flat_p.dtype
    bb = jnp.zeros(nb * bs, fdt).at[rhs_idx].set(
        (s * b64).astype(fdt))
    xb = bt_apply_streamed(Minv, flat_p, sm, bb.reshape(nb, bs)).reshape(-1)
    return s * xb[rhs_idx].astype(b64.dtype)


class StreamedBlockTriFactorization:
    """Memory-lean assembled+factored system (see bt_factor_streamed):
    same solve(b64)->dx64 interface as BlockTriFactorization."""

    def __init__(self, blocking: LineBlocking, ell, data64, arrays,
                 dtype: str = "f32", apply_dtype: Optional[str] = None,
                 blockinv: str = "ns"):
        _check_apply_dtype(dtype, apply_dtype)
        self._sm = blocking.streamed_maps()
        self.flat_p, self.s = bt_equilibrate(data64, arrays["ell_cols"],
                                             dtype)
        self.Minv = bt_factor_streamed(self.flat_p, self._sm,
                                       blocking.nb, blocking.bs, blockinv)
        if (apply_dtype or dtype) == "f32" and dtype != "f32":
            # see BlockTriFactorization: f64 factor, f32 apply
            self.Minv = self.Minv.astype(jnp.float32)
            self.flat_p = self.flat_p.astype(jnp.float32)
        # only rhs_idx — device_maps() would ship the 3 full-nnz dense
        # scatter maps the streamed path exists to avoid
        self._rhs_idx = jnp.asarray(blocking.rhs_idx)
        self._nb, self._bs = blocking.nb, blocking.bs

    def solve(self, b):
        b64 = jnp.asarray(b)
        return bt_solve_streamed(self.Minv, self.flat_p, self.s, b64,
                                 self._rhs_idx, self._sm,
                                 self._nb, self._bs)
