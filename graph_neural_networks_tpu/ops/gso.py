"""The Graph Shift Operator container and the shift primitive.

The reference carries the GSO as a dense ``E x N x N`` torch tensor and
multiplies it into signals with ``torch.matmul`` (graphML.py:159 etc.).
Here the GSO is a pytree ``Gso`` with two device layouts:

  * ``dense``  -- (E, N, N) array; shifts are batched MXU matmuls. This is
    the fast path for the reference-scale graphs (N ~ 1e2..1e3), where a
    dense tile fits comfortably in VMEM and the MXU is the speed of light.
  * ``bcsr``   -- 128x128 block-sparse layout (only nonzero blocks stored,
    sorted by block-column) consumed by the Pallas kernel in
    :mod:`graph_neural_networks_tpu.ops.spmm`. This is the scaling path for
    large graphs, where most blocks are empty after a locality-preserving
    node ordering.

The shift convention matches the reference's LSIGF (graphML.py:83-176):
signals are row vectors per node, so one shift is ``y = x @ S_e``, i.e.
``y[..., m] = sum_n x[..., n] * S[e, n, m]``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from graph_neural_networks_tpu.ops import spmm

ZERO_TOL = 1e-9


@struct.dataclass
class Gso:
    """Device-ready graph shift operator (pytree).

    Attributes
    ----------
    S : (E, N, N) dense GSO, always present (source of truth for small
        graphs and for structure queries).
    blocks, block_row, block_col : optional BCSR layout of each edge
        feature's GSO, sorted by block column: ``blocks[e]`` is
        (nnzb, bs, bs); row/col are (nnzb,) int32 block coordinates.
    n : true number of nodes (static; N may be padded inside bcsr).
    mode : 'dense' | 'bcsr' (static) — which layout `gshift` uses.
    """

    S: Optional[jnp.ndarray]
    blocks: Optional[jnp.ndarray] = None
    block_row: Optional[jnp.ndarray] = None
    block_col: Optional[jnp.ndarray] = None
    s_band: Optional[jnp.ndarray] = None      # (E, nb, (2w+1)*bs, bs)
    s_band_t: Optional[jnp.ndarray] = None    # transposed slab (for VJP)
    blocks_t: Optional[jnp.ndarray] = None    # transposed BCSR (for VJP)
    block_row_t: Optional[jnp.ndarray] = None
    block_col_t: Optional[jnp.ndarray] = None
    band_w: int = struct.field(pytree_node=False, default=0)
    n: int = struct.field(pytree_node=False, default=0)
    n_edge_features: int = struct.field(pytree_node=False, default=1)
    block_size: int = struct.field(pytree_node=False, default=128)
    mode: str = struct.field(pytree_node=False, default="dense")
    # 'highest' = true f32 (reference parity); 'default' = bf16 MXU passes
    # (the TPU-native training norm, ~1.6x faster shifts)
    precision: str = struct.field(pytree_node=False, default="highest")

    @property
    def N(self) -> int:
        return self.n

    @property
    def E(self) -> int:
        return self.n_edge_features


def _normalize_dense(S) -> np.ndarray:
    S = np.asarray(S)
    if S.ndim == 2:
        S = S[None]
    assert S.ndim == 3 and S.shape[1] == S.shape[2], S.shape
    return S


def as_gso(S, mode: str = "dense", block_size: int = 128,
           dtype=jnp.float32, precision: str = "highest",
           keep_dense: bool = True) -> Gso:
    """Build a :class:`Gso` from a dense numpy/jax array (N x N or E x N x N).

    precision: 'highest' (true f32, reference parity) or 'default' (bf16
    MXU passes — the TPU-native training norm, ~1.6x faster shifts).
    keep_dense=False drops the dense (E,N,N) device copy for the sparse
    modes — shifts never touch it; only fallback paths that genuinely
    need dense structure (jarma, dense attention, dense edge gates) do,
    and they raise a clear error instead.
    """
    if isinstance(S, Gso):
        return S
    S = _normalize_dense(np.asarray(S, dtype=np.float64))
    E, N, _ = S.shape
    dev = (jnp.asarray(S, dtype=dtype)
           if keep_dense or mode == "dense" else None)
    if mode == "dense":
        return Gso(S=dev, n=N, n_edge_features=E, mode="dense",
                   precision=precision)
    if mode == "band":
        # banded Pallas path (post-RCM graphs); differentiable via the
        # transposed slab (spmm.band_shift custom VJP)
        slabs, slabs_t, w_max = [], [], 0
        for e in range(E):
            _, w_e = spmm.dense_to_band(S[e], block_size)
            w_max = max(w_max, w_e)
        for e in range(E):
            sb, _ = spmm.dense_to_band(S[e], block_size)
            sbt, _ = spmm.dense_to_band(S[e].T, block_size)
            # re-extract at the common w so all edge features share a slab
            # shape
            if sb.shape[1] != (2 * w_max + 1) * block_size:
                sb = spmm.dense_to_band_at(S[e], block_size, w_max)
                sbt = spmm.dense_to_band_at(S[e].T, block_size, w_max)
            slabs.append(sb)
            slabs_t.append(sbt)
        return Gso(S=dev, s_band=jnp.asarray(np.stack(slabs), dtype),
                   s_band_t=jnp.asarray(np.stack(slabs_t), dtype),
                   band_w=w_max, n=N, n_edge_features=E,
                   block_size=block_size, mode="band", precision=precision)
    assert mode == "bcsr"
    blocks, brow, bcol = [], None, None
    for e in range(E):
        b, r, c = spmm.dense_to_bcsr(S[e], block_size)
        blocks.append(b)
        if brow is None:
            brow, bcol = r, c
        else:
            # all edge features share a sparsity pattern in the reference's
            # construction; if not, fall back to the union pattern
            if not (len(r) == len(brow) and np.array_equal(r, brow)
                    and np.array_equal(c, bcol)):
                b2, r2, c2 = spmm.dense_to_bcsr(
                    np.abs(S).sum(0), block_size)
                pattern = (r2, c2)
                blocks = [spmm.dense_to_bcsr_with_pattern(
                    S[ee], block_size, *pattern) for ee in range(E)]
                brow, bcol = r2, c2
                break
    blocks = np.stack(blocks)
    tr = [spmm.bcsr_transpose(blocks[e], brow, bcol) for e in range(E)]
    return Gso(
        S=dev,
        blocks=jnp.asarray(blocks, dtype=dtype),
        block_row=jnp.asarray(brow, dtype=np.int32),
        block_col=jnp.asarray(bcol, dtype=np.int32),
        blocks_t=jnp.asarray(np.stack([t[0] for t in tr]), dtype=dtype),
        block_row_t=jnp.asarray(tr[0][1], dtype=np.int32),
        block_col_t=jnp.asarray(tr[0][2], dtype=np.int32),
        n=N, n_edge_features=E, block_size=block_size, mode="bcsr")


def dense(gso) -> jnp.ndarray:
    """The (E, N, N) dense GSO array of `gso` (accepts raw arrays, Gso,
    and shift-duck-typed objects exposing .S)."""
    if isinstance(gso, Gso):
        assert gso.S is not None, (
            "this Gso was built with keep_dense=False; the requested "
            "operation needs the dense (E,N,N) GSO — rebuild with "
            "keep_dense=True or use a sparse-capable path")
        return gso.S
    if not isinstance(gso, (jnp.ndarray, np.ndarray)) and hasattr(gso, "S"):
        return jnp.asarray(gso.S)
    S = jnp.asarray(gso)
    return S[None] if S.ndim == 2 else S


def gshift(gso, x: jnp.ndarray) -> jnp.ndarray:
    """One graph shift: ``y[..., e, g, m] = sum_n x[..., e, g, n] S[e,n,m]``.

    x: (..., E, G, N) with E matching the GSO's edge features.
    This is the hot SpMM the whole framework lowers to
    (reference hot loop: graphML.py:158-161).

    Accepts: a raw dense array, a Gso (dense or bcsr layout), or any
    object exposing a ``shift(x)`` method (e.g. parallel.ShardedGso for
    multi-chip node-sharded execution with halo exchange).
    """
    if not isinstance(gso, (Gso, jnp.ndarray, np.ndarray)) \
            and hasattr(gso, "shift"):
        return gso.shift(x)
    if hasattr(gso, "s_val") and hasattr(gso, "row"):
        # COO edge-list container (ops.attention_sparse.EdgeList): O(nnz)
        # gather/segment-sum shift — the CSR/COO mode of SURVEY §2.9.
        # y[..., e, g, m] = sum over edges (n -> m) of x[..., e, g, n] *
        # s_val[e, edge]; broadcast s_val over the G axis.
        msg = gso.s_val[:, None, :] * x[..., gso.row]      # (..., E, G, nnz)
        agg = jax.ops.segment_sum(jnp.moveaxis(msg, -1, 0), gso.col,
                                  num_segments=gso.n_nodes)
        return jnp.moveaxis(agg, 0, -1)
    if not isinstance(gso, Gso) or gso.mode == "dense":
        S = dense(gso)
        prec = None
        if isinstance(gso, Gso) and gso.precision == "highest":
            prec = jax.lax.Precision.HIGHEST
        return jnp.einsum("...egn,enm->...egm", x, S, precision=prec)
    if gso.mode == "band":
        E = gso.n_edge_features
        shp = x.shape
        N = shp[-1]
        xg = jnp.moveaxis(x, -3, 0).reshape(E, -1, N)
        outs = [
            spmm.band_shift(xg[e], gso.s_band[e], gso.s_band_t[e], N,
                            gso.band_w, gso.block_size)
            for e in range(E)
        ]
        y = jnp.stack(outs).reshape((E,) + shp[:-3] + shp[-2:-1] + (N,))
        return jnp.moveaxis(y, 0, -3)
    # bcsr path: flatten everything but (E, N) into rows
    E = gso.n_edge_features
    shp = x.shape
    N = shp[-1]
    xg = jnp.moveaxis(x, -3, 0).reshape(E, -1, N)  # (E, R, N)
    outs = [
        spmm.bcsr_shift(xg[e], gso.blocks[e], gso.block_row, gso.block_col,
                        gso.blocks_t[e], gso.block_row_t, gso.block_col_t,
                        N, gso.block_size)
        for e in range(E)
    ]
    y = jnp.stack(outs)  # (E, R, N)
    y = y.reshape((E,) + shp[:-3] + shp[-2:-1] + (N,))
    return jnp.moveaxis(y, 0, -3)


def gshift_register(gso, x: jnp.ndarray, K: int) -> jnp.ndarray:
    """The K-tap shift register [x, xS, ..., xS^{K-1}] stacked on a new
    axis: (B, E, G, N) -> (B, E, K, G, N).

    This is the LSIGF hot loop (reference graphML.py:158-161). On the
    'band' layout with f32/bf16 signals it runs the FUSED Pallas register
    kernel — one launch for all K taps, signal resident in VMEM between
    shifts (no K-1 HBM round-trips) — whenever the row stripe fits VMEM
    (spmm.register_vmem_bytes) and the row count is below the measured
    crossover (spmm.REGISTER_MAX_ROWS). Everywhere else it falls back to
    K-1 chained :func:`gshift` calls.
    """
    if K == 1:
        return x[:, :, None]
    # Fused wins while the kernel is dispatch/DMA-bound (small row count:
    # 88% vs 81% of roofline at R=512 on v5e); past the crossover the
    # chained multi-column kernel's fully parallel grid saturates the MXU
    # (~peak at R=2048) and fusing would lose (84%). Numbers:
    # experiments/tpu_r2_fusedreg.py.
    rows = x.shape[0] * x.shape[2] if x.ndim == 4 else 0
    # f32 only: at bf16 the chained multi-column kernel's halved HBM
    # traffic + fully parallel grid beats the register's sequential
    # column loop even at R=512 (1807 vs 1610 G edges/s on v5e,
    # experiments/tpu_r2_bf16reg.py).
    fused = (
        isinstance(gso, Gso) and gso.mode == "band"
        and x.dtype == jnp.float32
        and x.ndim == 4 and gso.s_band.dtype == x.dtype
        and rows <= spmm.REGISTER_MAX_ROWS
        and spmm.register_vmem_bytes(gso.n, gso.band_w, gso.block_size,
                                     256, x.dtype.itemsize) <= 12 * 2 ** 20
    )
    if fused:
        E = gso.n_edge_features
        B, E_, G, N = x.shape
        assert E_ == E
        xg = jnp.moveaxis(x, 1, 0).reshape(E, B * G, N)
        outs = [
            spmm.band_register(xg[e], gso.s_band[e], gso.s_band_t[e], K, N,
                               gso.band_w, gso.block_size)
            for e in range(E)
        ]
        z = jnp.stack(outs).reshape(E, K, B, G, N)
        return jnp.transpose(z, (2, 0, 1, 3, 4))
    zs = [x]
    for _ in range(1, K):
        x = gshift(gso, x)
        zs.append(x)
    return jnp.stack(zs, axis=2)
