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

Layout: blocks sorted by block-column so each output column owns a
contiguous block segment (scalar-prefetched offsets). The kernel grid is
(row tiles x output columns), both parallel; each step streams its
column's segment through the MXU with double-buffered manual DMA (the x
tile for a block is chosen by the block's row id — data-dependent, so
not expressible as a BlockSpec index map) and writes once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ZERO_TOL = 1e-9

# BCSR pipeline depth: DMA slots in flight per (row-tile, column) step
NBUF = 4


def _resolve_precision(precision, dtype):
    """None = auto: true-f32 MXU passes for f32 io, native bf16 passes for
    bf16 io (HIGHEST on bf16 inputs would force multi-pass upcasting)."""
    if precision is not None:
        return precision
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


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
    import os
    from graph_neural_networks_tpu.utils import native
    if native.available() and not os.environ.get("GNT_NO_NATIVE"):
        return native.bcsr_extract(np.asarray(S, np.float32), bs)
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


def _make_bcsr_kernel(bs: int, rt: int, precision):
    def kernel(col_start_ref, brow_ref, x_hbm, blk_hbm, o_ref,
               acc, xbuf, bbuf, x_sem, b_sem):
        """One (row-tile i, output block-column j) grid step: stream this
        column's nonzero blocks [col_start[j], col_start[j+1]) through the
        MXU with double-buffered manual DMA (x tile chosen by the block's
        row id — data-dependent, hence not expressible as a BlockSpec
        index map), accumulate in f32 VMEM, single-shot write. Both grid
        axes are parallel: no output revisit, no serialization."""
        i = pl.program_id(0)
        j = pl.program_id(1)
        k0 = col_start_ref[j]
        k1 = col_start_ref[j + 1]

        def dma_x(slot, k):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * rt, rt), pl.ds(brow_ref[k] * bs, bs)],
                xbuf.at[slot], x_sem.at[slot])

        def dma_b(slot, k):
            return pltpu.make_async_copy(blk_hbm.at[k], bbuf.at[slot],
                                         b_sem.at[slot])  # (bs, bs) slice

        acc[:] = jnp.zeros_like(acc)

        # NBUF-deep pipeline: keep NBUF-1 block fetches in flight so DMA
        # latency hides behind the (rt x bs) @ (bs x bs) MXU dots.
        for d in range(NBUF - 1):
            @pl.when(k0 + d < k1)
            def _(d=d):
                dma_x(d, k0 + d).start()
                dma_b(d, k0 + d).start()

        def body(k, _):
            slot = jax.lax.rem(k - k0, NBUF)

            @pl.when(k + NBUF - 1 < k1)
            def _():
                nxt = jax.lax.rem(slot + NBUF - 1, NBUF)
                dma_x(nxt, k + NBUF - 1).start()
                dma_b(nxt, k + NBUF - 1).start()

            dma_x(slot, k).wait()
            dma_b(slot, k).wait()
            acc[:] += jnp.dot(xbuf[slot], bbuf[slot],
                              preferred_element_type=jnp.float32,
                              precision=precision)
            return 0

        jax.lax.fori_loop(k0, k1, body, 0)
        o_ref[:] = acc[:].astype(o_ref.dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("n_cols", "block_size",
                                             "row_tile", "interpret",
                                             "precision"))
def bcsr_matmul(x: jnp.ndarray, blocks: jnp.ndarray, block_row: jnp.ndarray,
                block_col: jnp.ndarray, *, n_cols: int,
                block_size: int = 128, row_tile: int = 512,
                interpret: bool = False,
                precision=None) -> jnp.ndarray:
    """Compute ``y = x @ S`` with S in BCSR layout.

    x : (R, N) dense signals (rows = flattened batch*features).
    blocks : (nnzb, bs, bs); block_row/block_col : (nnzb,) int32 sorted by col.
    n_cols : output column count (may differ from N — S is then the
    rectangular (N x n_cols) column slice used by the sharded scattered
    shift; block_row indexes x's block-columns, block_col the output's).

    Grid = (row tiles, output block-columns), both parallel; each step
    walks its column's block segment (scalar-prefetched offsets) with
    double-buffered DMA. Empty columns write zeros — no masking pass.
    """
    precision = _resolve_precision(precision, x.dtype)
    R, N = x.shape
    bs = block_size
    nnzb = blocks.shape[0]
    nb = _cdiv(n_cols, bs)
    Np = nb * bs
    nb_in = _cdiv(N, bs)
    Np_in = nb_in * bs               # x padded to ITS OWN block grid
    Rp = _cdiv(max(R, 8), row_tile) * row_tile
    xp = jnp.zeros((Rp, Np_in), x.dtype).at[:R, :N].set(x)
    # first block index of each column segment (blocks sorted by col)
    col_start = jnp.searchsorted(block_col, jnp.arange(nb + 1)) \
        .astype(jnp.int32)

    out = pl.pallas_call(
        _make_bcsr_kernel(bs, row_tile, precision),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Rp // row_tile, nb),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((row_tile, bs),
                                   lambda i, j, cs, br: (i, j)),
            scratch_shapes=[
                pltpu.VMEM((row_tile, bs), jnp.float32),
                pltpu.VMEM((NBUF, row_tile, bs), x.dtype),
                pltpu.VMEM((NBUF, bs, bs), blocks.dtype),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Rp, Np), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * nnzb * bs * bs,
            bytes_accessed=(Rp * (Np + Np_in) + nnzb * bs * bs)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(col_start, block_row, xp, blocks)
    return out[:R, :n_cols]


def dense_matmul_reference(x: jnp.ndarray, S: jnp.ndarray) -> jnp.ndarray:
    """Dense oracle for the same contraction (y = x @ S)."""
    return x @ S


# ---------------------------------------------------------------------------
# Differentiable band shift (custom VJP): d/dx (x @ S) pullback = g @ S^T,
# which is another band matmul with the transposed slab — so the backward
# pass runs on the same Pallas kernel and training works end-to-end on the
# sparse path. S itself is treated as structure (non-differentiable), like
# the reference's GSO.
# ---------------------------------------------------------------------------

def auto_col_tile(n_cols: int, block_size: int = 128) -> int:
    """Largest col_tile in {4, 2, 1} dividing the block count (avoids a
    per-call device pad of the slab). Multi-column tiles share their
    overlapping x window reads — measured on v5e this lifts the band
    kernel from 72% to 81% of roofline at R=512 and from 92% to ~peak
    at R=2048 (experiments/tpu_r2_fusedreg.py)."""
    nb = _cdiv(n_cols, block_size)
    for c in (4, 2):
        if nb % c == 0:
            return c
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def band_shift(x, s_band, s_band_t, n_cols, w, block_size=128,
               row_tile=256):
    return band_matmul(x, s_band, n_cols=n_cols, w=w, block_size=block_size,
                       row_tile=row_tile,
                       col_tile=auto_col_tile(n_cols, block_size))


def _band_shift_fwd(x, s_band, s_band_t, n_cols, w, block_size, row_tile):
    y = band_matmul(x, s_band, n_cols=n_cols, w=w, block_size=block_size,
                    row_tile=row_tile,
                    col_tile=auto_col_tile(n_cols, block_size))
    return y, s_band_t


def _band_shift_bwd(n_cols, w, block_size, row_tile, s_band_t, g):
    dx = band_matmul(g, s_band_t, n_cols=n_cols, w=w, block_size=block_size,
                     row_tile=row_tile,
                     col_tile=auto_col_tile(n_cols, block_size))
    return dx, None, None


band_shift.defvjp(_band_shift_fwd, _band_shift_bwd)


def bcsr_transpose(blocks: np.ndarray, rows: np.ndarray, cols: np.ndarray):
    """Host-side transpose of a BCSR layout: swap row/col ids, transpose
    each tile, re-sort by (col, row)."""
    t_rows = np.asarray(cols)
    t_cols = np.asarray(rows)
    t_blocks = np.ascontiguousarray(np.swapaxes(np.asarray(blocks), 1, 2))
    order = np.lexsort((t_rows, t_cols))
    return (t_blocks[order], t_rows[order].astype(np.int32),
            t_cols[order].astype(np.int32))


def auto_row_tile(n_rows: int) -> int:
    """Row tile matched to the row count: bigger tiles amortize block
    re-reads across row tiles (v5e: rt=1024 is 86% vs 79% at R=2048) but
    must not exceed R (padding would be dead work: rt=1024 at R=512 runs
    at half speed)."""
    for rt in (1024, 512, 256):
        if n_rows >= rt:
            return rt
    return 256


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def bcsr_shift(x, blocks, brow, bcol, blocks_t, brow_t, bcol_t,
               n_cols, block_size=128):
    """Differentiable BCSR SpMM (cotangent = shift by S^T; S is structure,
    non-differentiable — same contract as band_shift)."""
    return bcsr_matmul(x, blocks, brow, bcol, n_cols=n_cols,
                       block_size=block_size,
                       row_tile=auto_row_tile(x.shape[0]))


def _bcsr_shift_fwd(x, blocks, brow, bcol, blocks_t, brow_t, bcol_t,
                    n_cols, block_size):
    y = bcsr_matmul(x, blocks, brow, bcol, n_cols=n_cols,
                    block_size=block_size,
                    row_tile=auto_row_tile(x.shape[0]))
    return y, (blocks_t, brow_t, bcol_t)


def _bcsr_shift_bwd(n_cols, block_size, res, g):
    blocks_t, brow_t, bcol_t = res
    dx = bcsr_matmul(g, blocks_t, brow_t, bcol_t, n_cols=n_cols,
                     block_size=block_size,
                     row_tile=auto_row_tile(g.shape[0]))
    return dx, None, None, None, None, None, None


bcsr_shift.defvjp(_bcsr_shift_fwd, _bcsr_shift_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def bcsr_shift_rect(x, blocks, brow, bcol, blocks_t, brow_t, bcol_t,
                    n_cols_out, n_cols_in, block_size=128):
    """Differentiable RECTANGULAR BCSR SpMM: x (R, n_cols_in) -> y
    (R, n_cols_out); block_row indexes x's block-columns, block_col the
    output's. The transposed layout (for the VJP's g @ S^T, which maps
    back to n_cols_in) is passed explicitly, as in bcsr_shift. This is
    the shard-local contraction of the scattered-graph sharded shift
    (parallel.shift.sharded_gshift_bcsr): each shard owns the (n_cols_in
    x n_cols_out) column-slice of the global GSO."""
    return bcsr_matmul(x, blocks, brow, bcol, n_cols=n_cols_out,
                       block_size=block_size,
                       row_tile=auto_row_tile(x.shape[0]))


def _bcsr_shift_rect_fwd(x, blocks, brow, bcol, blocks_t, brow_t, bcol_t,
                         n_cols_out, n_cols_in, block_size):
    y = bcsr_matmul(x, blocks, brow, bcol, n_cols=n_cols_out,
                    block_size=block_size,
                    row_tile=auto_row_tile(x.shape[0]))
    return y, (blocks_t, brow_t, bcol_t)


def _bcsr_shift_rect_bwd(n_cols_out, n_cols_in, block_size, res, g):
    blocks_t, brow_t, bcol_t = res
    dx = bcsr_matmul(g, blocks_t, brow_t, bcol_t, n_cols=n_cols_in,
                     block_size=block_size,
                     row_tile=auto_row_tile(g.shape[0]))
    return dx, None, None, None, None, None, None


bcsr_shift_rect.defvjp(_bcsr_shift_rect_fwd, _bcsr_shift_rect_bwd)


def bcsr_gather_scatter(x, blocks, brow, bcol, n_cols_out,
                        block_size=128):
    """Plain-JAX O(nnzb) reference for the rectangular BCSR SpMM (no
    Pallas): gather x's block-columns by brow, per-block matmul,
    scatter-add into output block-columns by bcol. Differentiable and
    backend-agnostic — the CPU-mesh path of the sharded scattered
    shift; padding blocks (zero data) contribute nothing."""
    R, Nin = x.shape
    bs = block_size
    xg = x.reshape(R, Nin // bs, bs)[:, brow]          # (R, nnzb, bs)
    contrib = jnp.einsum("rkb,kbc->rkc", xg, blocks)
    nb_out = _cdiv(n_cols_out, bs)
    y = jnp.zeros((R, nb_out, bs), x.dtype).at[:, bcol].add(contrib)
    return y.reshape(R, nb_out * bs)[:, :n_cols_out]


# ---------------------------------------------------------------------------
# Fused K-tap band shift register
# ---------------------------------------------------------------------------
# Computes the whole LSIGF shift register [x, xS, xS^2, ..., xS^{K-1}] in ONE
# kernel: the running signal stays in VMEM between shifts (no z HBM round
# trips), the band slab streams through a double-buffered DMA pipeline, and
# each tap's result is DMA'd out asynchronously. This removes the K-1
# kernel-launch + HBM-bounce overheads of chaining band_matmul.

def _make_fused_kernel(K: int, w: int, bs: int, nb: int, rt: int,
                       precision):
    W = 2 * w + 1
    Np = nb * bs
    wbs = w * bs

    def kernel(s_hbm, x_hbm, o_hbm, zbuf, sbuf, s_sem, io_sem):
        i = pl.program_id(0)

        def dma_s(slot, j):
            return pltpu.make_async_copy(s_hbm.at[j], sbuf.at[slot],
                                         s_sem.at[slot])

        # bring in this row tile of x -> zbuf[0] center; zero the halo pads
        zbuf[0, :, :] = jnp.zeros_like(zbuf[0])
        zbuf[1, :, :] = jnp.zeros_like(zbuf[1])
        cp_in = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * rt, rt), :],
            zbuf.at[0, :, pl.ds(wbs, Np)], io_sem.at[0])
        cp_in.start()
        cp_in.wait()
        # tap 0 output = x itself
        cp0 = pltpu.make_async_copy(
            zbuf.at[0, :, pl.ds(wbs, Np)],
            o_hbm.at[0, pl.ds(i * rt, rt), :], io_sem.at[0])
        cp0.start()
        cp0.wait()

        for k in range(1, K):
            cur, nxt = (k - 1) % 2, k % 2
            dma_s(0, 0).start()

            def col(j, _):
                slot = j % 2

                @pl.when(j + 1 < nb)
                def _():
                    dma_s((j + 1) % 2, j + 1).start()
                dma_s(slot, j).wait()
                acc = jnp.dot(
                    zbuf[cur, :, pl.ds(j * bs, bs)], sbuf[slot, :bs, :],
                    preferred_element_type=jnp.float32, precision=precision)
                for kk in range(1, W):
                    acc += jnp.dot(
                        zbuf[cur, :, pl.ds((j + kk) * bs, bs)],
                        sbuf[slot, kk * bs:(kk + 1) * bs, :],
                        preferred_element_type=jnp.float32,
                        precision=precision)
                # io dtype buffer (bf16 io halves VMEM + HBM traffic);
                # accumulation above is always f32 on the MXU
                zbuf[nxt, :, pl.ds(wbs + j * bs, bs)] = acc.astype(zbuf.dtype)
                return 0

            jax.lax.fori_loop(0, nb, col, 0)
            cp_out = pltpu.make_async_copy(
                zbuf.at[nxt, :, pl.ds(wbs, Np)],
                o_hbm.at[k, pl.ds(i * rt, rt), :], io_sem.at[1])
            cp_out.start()
            cp_out.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("n_cols", "w", "n_taps",
                                             "block_size", "row_tile",
                                             "interpret", "precision"))
def band_shift_register(x: jnp.ndarray, s_band: jnp.ndarray, *, n_taps: int,
                        n_cols: int, w: int, block_size: int = 128,
                        row_tile: int = 256, interpret: bool = False,
                        precision=None) -> jnp.ndarray:
    """All K taps in one kernel: returns (K, R, N) = [x, xS, ..., xS^{K-1}].

    x: (R, N); s_band as dense_to_band. Requires n_taps >= 1.
    """
    precision = _resolve_precision(precision, x.dtype)
    R, N = x.shape
    bs = block_size
    nb = _cdiv(n_cols, bs)
    Np = nb * bs
    rt = row_tile
    Rp = _cdiv(max(R, 8), rt) * rt
    xp = x if (Rp, Np) == (R, N) else \
        jnp.zeros((Rp, Np), x.dtype).at[:R, :N].set(x)
    W = 2 * w + 1

    out = pl.pallas_call(
        _make_fused_kernel(n_taps, w, bs, nb, rt, precision),
        grid=(Rp // rt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_taps, Rp, Np), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rt, Np + 2 * w * bs), x.dtype),
            pltpu.VMEM((2, W * bs, bs), s_band.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(s_band, xp)
    return out[:, :R, :n_cols]


# Row-count crossover between the fused register (wins while dispatch/
# DMA-bound) and the chained multi-column band kernel (saturates the MXU
# at large R). Measured on v5e: fused 88% vs chained 82% at R=512, but
# chained 97% vs fused 94% at R=1024 and ~peak vs 84% at R=2048
# (experiments/tpu_r2_fusedreg.py, experiments/bench_sweep.json).
REGISTER_MAX_ROWS = 512


def register_vmem_bytes(n_cols: int, w: int, block_size: int = 128,
                        row_tile: int = 256, itemsize: int = 4) -> int:
    """VMEM footprint of band_shift_register's scratch buffers: the fused
    kernel keeps the whole (row_tile x padded-N-with-halo) signal stripe
    resident, so it only applies when this fits (~<12 MiB of the 16 MiB
    VMEM); callers fall back to chained band_shift above that."""
    bs = block_size
    Np = _cdiv(n_cols, bs) * bs
    zbuf = 2 * row_tile * (Np + 2 * w * bs) * itemsize
    sbuf = 2 * (2 * w + 1) * bs * bs * itemsize
    return zbuf + sbuf


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def band_register(x, s_band, s_band_t, n_taps, n_cols, w, block_size=128,
                  row_tile=256):
    """Differentiable fused K-tap shift register: (R, N) -> (K, R, N) =
    [x, xS, ..., xS^{K-1}] in ONE Pallas launch (signal stays in VMEM
    between taps). Backward: dx = g_0 + (g_1 + (g_2 + ...) S^T) S^T — a
    Horner chain of K-1 band matmuls with the transposed slab. S is
    structure (non-differentiable), same contract as band_shift."""
    return band_shift_register(x, s_band, n_taps=n_taps, n_cols=n_cols, w=w,
                               block_size=block_size, row_tile=row_tile)


def _band_register_fwd(x, s_band, s_band_t, n_taps, n_cols, w, block_size,
                       row_tile):
    y = band_shift_register(x, s_band, n_taps=n_taps, n_cols=n_cols, w=w,
                            block_size=block_size, row_tile=row_tile)
    return y, s_band_t


def _band_register_bwd(n_taps, n_cols, w, block_size, row_tile, s_band_t, g):
    ct = auto_col_tile(n_cols, block_size)
    dx = g[n_taps - 1]
    for k in range(n_taps - 2, -1, -1):
        dx = band_matmul(dx, s_band_t, n_cols=n_cols, w=w,
                         block_size=block_size, row_tile=row_tile,
                         col_tile=ct) + g[k]
    return dx, None, None


band_register.defvjp(_band_register_fwd, _band_register_bwd)


# ---------------------------------------------------------------------------
# Band SpMM: the fast path for banded (post-RCM) graphs
# ---------------------------------------------------------------------------
# After a locality-preserving node ordering (parallel.partition), real-world
# graph GSOs are banded: S[n, m] = 0 for |n - m| > bandwidth. The band kernel
# exploits this with NO revisit/accumulation: each grid step computes one
# output block column as a sum of (2w+1) dense (rt x bs) @ (bs x bs) MXU
# matmuls against the stored band slab — single-shot write, fully parallel
# grid, O(bandwidth * N) memory instead of O(N^2).

def dense_to_band(S: np.ndarray, block_size: int = 128):
    """Host-side: extract the block band of S.

    Returns (s_band (nb, (2w+1)*bs, bs), w). Fails if S has nonzeros
    outside the detected block band? No — w is chosen to cover ALL
    nonzeros (worst-case w = nb-1 degenerates to dense).
    """
    N = S.shape[0]
    bs = block_size
    import os
    from graph_neural_networks_tpu.utils import native
    if native.available() and not os.environ.get("GNT_NO_NATIVE"):
        # pass 1 (w=0) just probes the block bandwidth; pass 2 extracts
        S32 = np.asarray(S, np.float32)
        _, w = native.band_extract(S32, bs, 0)
        s_band, _ = native.band_extract(S32, bs, w)
        return s_band, w
    nb = _cdiv(N, bs)
    Np = nb * bs
    Sp = np.zeros((Np, Np), dtype=np.float32)
    Sp[:N, :N] = S
    tiles = Sp.reshape(nb, bs, nb, bs).transpose(0, 2, 1, 3)
    nz = np.abs(tiles).sum(axis=(2, 3)) > ZERO_TOL
    rows, cols = np.nonzero(nz)
    w = int(np.abs(rows - cols).max()) if len(rows) else 0
    s_band = np.zeros((nb, (2 * w + 1) * bs, bs), dtype=np.float32)
    for j in range(nb):
        for k, i in enumerate(range(j - w, j + w + 1)):
            if 0 <= i < nb:
                s_band[j, k * bs:(k + 1) * bs] = tiles[i, j]
    return s_band, w


def dense_to_band_at(S: np.ndarray, block_size: int, w: int) -> np.ndarray:
    """Extract the band slab at a FIXED block bandwidth w (drops any
    nonzeros outside; callers must pick w >= the true bandwidth)."""
    import os
    from graph_neural_networks_tpu.utils import native
    if native.available() and not os.environ.get("GNT_NO_NATIVE"):
        slab, _ = native.band_extract(np.asarray(S, np.float32), block_size, w)
        return slab
    N = S.shape[0]
    bs = block_size
    nb = _cdiv(N, bs)
    Np = nb * bs
    Sp = np.zeros((Np, Np), dtype=np.float32)
    Sp[:N, :N] = S
    tiles = Sp.reshape(nb, bs, nb, bs).transpose(0, 2, 1, 3)
    s_band = np.zeros((nb, (2 * w + 1) * bs, bs), dtype=np.float32)
    for j in range(nb):
        for k, i in enumerate(range(j - w, j + w + 1)):
            if 0 <= i < nb:
                s_band[j, k * bs:(k + 1) * bs] = tiles[i, j]
    return s_band


def _make_band_kernel(w: int, bs: int, C: int, precision):
    W = 2 * w + 1

    def kernel(*refs):
        x_refs = refs[:2 * w + C]
        s_ref, o_ref = refs[2 * w + C], refs[2 * w + C + 1]
        # accumulate in f32 regardless of io dtype (the MXU requires a
        # 32-bit accumulator; also preserves bf16-input accuracy)
        for c in range(C):
            acc = jnp.dot(x_refs[c][:], s_ref[c, :bs, :],
                          preferred_element_type=jnp.float32,
                          precision=precision)
            for k in range(1, W):
                acc += jnp.dot(x_refs[c + k][:],
                               s_ref[c, k * bs:(k + 1) * bs, :],
                               preferred_element_type=jnp.float32,
                               precision=precision)
            o_ref[:, c * bs:(c + 1) * bs] = acc.astype(o_ref.dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("n_cols", "w", "block_size",
                                             "row_tile", "col_tile",
                                             "interpret", "precision"))
def band_matmul(x: jnp.ndarray, s_band: jnp.ndarray, *, n_cols: int, w: int,
                block_size: int = 128, row_tile: int = 256,
                col_tile: int = 1, interpret: bool = False,
                precision=None) -> jnp.ndarray:
    """y = x @ S for block-banded S in dense_to_band layout.

    x: (R, N); s_band: (nb, (2w+1)*bs, bs). Out-of-range window blocks are
    clamped to block 0 — harmless because their band rows are zero.
    col_tile=C computes C adjacent output block-columns per grid step; the
    C column windows share their overlapping x tiles (2w+C tile reads for
    C columns instead of C*(2w+1)), cutting HBM traffic on the re-read
    signal — the win at small R where the kernel is dispatch/DMA-bound.
    """
    precision = _resolve_precision(precision, x.dtype)
    R, N = x.shape
    bs = block_size
    C = col_tile
    nb = _cdiv(n_cols, bs)
    nbp = _cdiv(nb, C) * C
    if nbp != nb:
        s_band = jnp.pad(s_band, ((0, nbp - nb), (0, 0), (0, 0)))
    Np = nb * bs
    Rp = _cdiv(max(R, 8), row_tile) * row_tile
    if (Rp, Np) == (R, N):
        xp = x  # aligned: no pad copy between chained shifts
    else:
        xp = jnp.zeros((Rp, Np), x.dtype).at[:R, :N].set(x)

    def make_index_map(t):
        def index_map(i, j):
            return (i, jnp.clip(j * C + t - w, 0, nb - 1))
        return index_map

    out = pl.pallas_call(
        _make_band_kernel(w, bs, C, precision),
        grid=(Rp // row_tile, nbp // C),
        in_specs=[pl.BlockSpec((row_tile, bs), make_index_map(t))
                  for t in range(2 * w + C)]
        + [pl.BlockSpec((C, (2 * w + 1) * bs, bs), lambda i, j: (j, 0, 0))],
        out_specs=pl.BlockSpec((row_tile, C * bs), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Rp, nbp * bs), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * nbp * (2 * w + 1) * bs * bs,
            bytes_accessed=(Rp * Np * 2
                            + nb * (2 * w + 1) * bs * bs) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*([xp] * (2 * w + C) + [s_band]))
    return out[:R, :n_cols]
