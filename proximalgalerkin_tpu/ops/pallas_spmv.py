"""Pallas TPU kernel for the DIA (diagonal) SpMV — the framework's hot op.

The XLA path (la/dia.py) lowers the diagonal SpMV to shifts + FMAs that
XLA fuses well; this Pallas kernel performs y = A x in a single
VMEM-resident pass over row blocks: each grid step DMAs one x window
(block + halo on each side, overlapping windows that BlockSpec tiling
cannot express) from HBM into VMEM scratch, streams the block's diagonal
data through VMEM, and emits the y block — one HBM read of x/data, one
write of y, no intermediates.

Offsets are compile-time constants (they come from the mesh numbering), so
every shift inside the kernel is a static slice.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dia_kernel(offsets: Tuple[int, ...], halo: int, block: int,
                x_hbm, data_ref, out_ref, xwin, sem):
    i = pl.program_id(0)
    # overlapping window [i*block, i*block + block + 2*halo) of the
    # halo-padded x — manual DMA because BlockSpec tiles cannot overlap
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * block, block + 2 * halo)], xwin, sem)
    dma.start()
    dma.wait()
    acc = jnp.zeros((block,), data_ref.dtype)
    for d, off in enumerate(offsets):
        acc = acc + data_ref[d, :] * xwin[pl.ds(halo + off, block)]
    out_ref[:] = acc


def dia_spmv_pallas(offsets: Sequence[int], data: jnp.ndarray,
                    x: jnp.ndarray, block: int = 65536,
                    interpret: bool = False) -> jnp.ndarray:
    """y = A x for a DIA matrix. data: (ndiag, N); x: (N,).

    Note: validated in interpret mode and kept as the Pallas reference
    implementation; the axon remote Mosaic toolchain in this image rejects
    1D-tiled dynamic slices inside the kernel, so production solves use
    the XLA lowering in la/dia.py (identical math, already fused).
    """
    offsets = tuple(int(o) for o in offsets)
    n = x.shape[0]
    halo = max(max(abs(o) for o in offsets), 1)
    # Mosaic requires 1D DMA slice shapes aligned to the 1024-element
    # tiling; round the halo so block + 2*halo stays aligned
    halo = ((halo + 511) // 512) * 512
    block = min(block, max(1024, -(-n // 1024) * 1024))
    nblocks = -(-n // block)
    npad = nblocks * block
    xp = jnp.pad(x, (halo, npad - n + halo))
    dp = jnp.pad(data, ((0, 0), (0, npad - n)))

    kernel = partial(_dia_kernel, offsets, halo, block)
    y = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # x stays in HBM
            pl.BlockSpec((len(offsets), block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad,), data.dtype),
        scratch_shapes=[
            pltpu.VMEM((block + 2 * halo,), data.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, dp)
    return y[:n]
