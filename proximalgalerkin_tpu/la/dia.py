"""DIA (diagonal) sparse storage — the gather-free TPU SpMV.

XLA's generic gather on TPU makes ELL SpMV latency-bound (~600x off
memory bandwidth). For matrices whose nonzeros live on a small set of
diagonals — structured meshes, or any mesh after bandwidth-reducing dof
ordering — DIA storage turns SpMV into a handful of statically-shifted
fused multiply-adds: no gathers at all, pure VPU streaming at HBM
bandwidth. This is the production Krylov operator for the bench path.

y[i] = sum_d data[d, i] * x[i + off[d]]   (zero-padded at the ends)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass
class DiaMatrix:
    """offsets: static python ints (compiled into the kernel); data packed
    (ndiags, N)."""

    offsets: Tuple[int, ...]
    data: jnp.ndarray            # (ndiags, N)
    n: int

    @classmethod
    def from_csr_arrays(cls, rows: np.ndarray, cols: np.ndarray,
                        vals: np.ndarray, n: int,
                        max_diags: int = 64) -> Optional["DiaMatrix"]:
        """Build DIA from COO/CSR triplets; returns None if the pattern
        needs more than max_diags distinct diagonals (caller falls back
        to ELL)."""
        deltas = cols.astype(np.int64) - rows.astype(np.int64)
        offs = np.unique(deltas)
        if len(offs) > max_diags:
            return None
        data = np.zeros((len(offs), n))
        d_idx = np.searchsorted(offs, deltas)
        # accumulate duplicates (COO semantics) — fancy-index assignment is
        # last-write-wins and silently dropped repeated entries (e.g. ELL
        # (row,row,0) padding zeroing the stored diagonal)
        np.add.at(data, (d_idx, rows), vals)
        return cls(offsets=tuple(int(o) for o in offs),
                   data=jnp.asarray(data), n=int(n))

    def spmv(self, x: jnp.ndarray, data: Optional[jnp.ndarray] = None
             ) -> jnp.ndarray:
        """Gather-free SpMV: static shifts + FMA per diagonal."""
        d = self.data if data is None else data
        y = jnp.zeros_like(x)
        for i, off in enumerate(self.offsets):
            if off == 0:
                y = y + d[i] * x
            elif off > 0:
                # x[i + off]: shift left, zero tail
                xs = jnp.concatenate([x[off:], jnp.zeros((off,), x.dtype)])
                y = y + d[i] * xs
            else:
                k = -off
                xs = jnp.concatenate([jnp.zeros((k,), x.dtype), x[:-k]])
                y = y + d[i] * xs
        return y

    def diagonal(self, data: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = self.data if data is None else data
        i = self.offsets.index(0)
        return d[i]

    def astype(self, dtype) -> "DiaMatrix":
        return DiaMatrix(self.offsets, self.data.astype(dtype), self.n)
