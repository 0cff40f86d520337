"""Block-sparse (BCSR) SpMM Pallas kernel for the graph shift ``y = x @ S``.

TPU-first design rationale: TPUs have no gather-scatter SpMM unit — the MXU
is a 128x128 dense systolic array. The speed-of-light way to exploit graph
sparsity is therefore *block* sparsity: tile S into 128x128 blocks, keep
only nonzero blocks (after a locality-preserving node ordering most blocks
of a sparse graph are empty), and stream the surviving blocks through the
MXU, accumulating per output block-column. Per-chip roofline for this
kernel is the MXU matmul roofline on the nonzero blocks; edges/s follows as
(nnz edges) / time.

This replaces the reference's dense ``torch.matmul(x, S)`` inner loop
(graphML.py:158-161) which is O(N^2) regardless of sparsity.

Layout: blocks sorted by block-column so that all contributions to one
output column tile are adjacent in the grid's innermost dimension — the
kernel then revisits the same output block consecutively (the canonical
Pallas accumulation pattern) and zeroes it on first touch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ZERO_TOL = 1e-9


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def dense_to_bcsr(S: np.ndarray, block_size: int = 128):
    """Host-side: tile a dense N x N matrix into nonzero (bs x bs) blocks.

    Returns (blocks (nnzb, bs, bs), block_row (nnzb,), block_col (nnzb,)),
    sorted by (block_col, block_row). N is zero-padded up to a multiple of
    block_size.
    """
    N = S.shape[0]
    assert S.shape == (N, N)
    bs = block_size
    nb = _cdiv(N, bs)
    Np = nb * bs
    Sp = np.zeros((Np, Np), dtype=S.dtype)
    Sp[:N, :N] = S
    tiles = Sp.reshape(nb, bs, nb, bs).transpose(0, 2, 1, 3)  # (nb, nb, bs, bs)
    nz = np.abs(tiles).sum(axis=(2, 3)) > ZERO_TOL
    rows, cols = np.nonzero(nz)
    order = np.lexsort((rows, cols))  # sort by col, then row
    rows, cols = rows[order], cols[order]
    if len(rows) == 0:  # keep at least one (zero) block for static shapes
        rows = np.array([0])
        cols = np.array([0])
    blocks = tiles[rows, cols]
    return blocks.astype(np.float32), rows.astype(np.int32), cols.astype(np.int32)


def dense_to_bcsr_with_pattern(S: np.ndarray, block_size: int,
                               block_row: np.ndarray, block_col: np.ndarray):
    """Extract the blocks of S at an externally fixed (row, col) pattern."""
    N = S.shape[0]
    bs = block_size
    nb = _cdiv(N, bs)
    Sp = np.zeros((nb * bs, nb * bs), dtype=S.dtype)
    Sp[:N, :N] = S
    tiles = Sp.reshape(nb, bs, nb, bs).transpose(0, 2, 1, 3)
    return tiles[block_row, block_col].astype(np.float32)


def _make_bcsr_kernel(precision):
    def _bcsr_kernel(brow_ref, bcol_ref, x_ref, blk_ref, o_ref):
        """One (row-tile i, nonzero-block j) grid step:
        o[i, col(j)] += x[i, row(j)] @ blk[j]."""
        j = pl.program_id(1)
        # First nonzero block of this output column? Zero the accumulator.
        is_first = jnp.where(j == 0, True,
                             bcol_ref[j] != bcol_ref[jnp.maximum(j - 1, 0)])

        @pl.when(is_first)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.dot(x_ref[:], blk_ref[0],
                            preferred_element_type=o_ref.dtype,
                            precision=precision)
    return _bcsr_kernel


@functools.partial(jax.jit, static_argnames=("n_cols", "block_size",
                                             "row_tile", "interpret",
                                             "precision"))
def bcsr_matmul(x: jnp.ndarray, blocks: jnp.ndarray, block_row: jnp.ndarray,
                block_col: jnp.ndarray, *, n_cols: int,
                block_size: int = 128, row_tile: int = 256,
                interpret: bool = False,
                precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Compute ``y = x @ S`` with S in BCSR layout.

    x : (R, N) dense signals (rows = flattened batch*features).
    blocks : (nnzb, bs, bs); block_row/block_col : (nnzb,) int32 sorted by col.
    n_cols : true N (output trimmed back to it).
    """
    R, N = x.shape
    bs = block_size
    nnzb = blocks.shape[0]
    nb = _cdiv(n_cols, bs)
    Np = nb * bs
    Rp = _cdiv(max(R, 8), row_tile) * row_tile
    xp = jnp.zeros((Rp, Np), x.dtype).at[:R, :N].set(x)

    grid = (Rp // row_tile, nnzb)

    out = pl.pallas_call(
        _make_bcsr_kernel(precision),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((row_tile, bs),
                             lambda i, j, br, bc: (i, br[j])),
                pl.BlockSpec((1, bs, bs),
                             lambda i, j, br, bc: (j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((row_tile, bs),
                                   lambda i, j, br, bc: (i, bc[j])),
        ),
        out_shape=jax.ShapeDtypeStruct((Rp, Np), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * nnzb * bs * bs,
            bytes_accessed=(Rp * Np * 2 + nnzb * bs * bs) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_row, block_col, xp, blocks)
    # Columns with no nonzero block are never written; mask them to zero.
    touched = jnp.zeros((nb,), bool).at[block_col].set(True)
    out = jnp.where(jnp.repeat(touched, bs)[None, :], out, 0)
    return out[:R, :n_cols]


def dense_matmul_reference(x: jnp.ndarray, S: jnp.ndarray) -> jnp.ndarray:
    """Dense oracle for the same contraction (y = x @ S)."""
    return x @ S
