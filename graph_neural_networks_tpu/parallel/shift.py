"""Sharded graph-shift (SpMM) paths and data-parallel training utilities.

TPU-native ways to run ``y = x @ S`` across a device mesh, with S stored
as **sharded band slabs** (parallel.partition) — never as a dense
``E x N x N`` array:

  1. GSPMD: annotate x with NamedShardings and let XLA insert the
     collectives (the zero-effort baseline — see make_dp_train_step).
  2. ``sharded_gshift_ring``: halo exchange — valid when the ordered
     graph is banded (GraphPartition.is_ring). Two ICI ``ppermute``s move
     only ``w * inner_bs`` boundary nodes per neighbor; each shard then
     contracts its halo-extended signal against its local band slab.
     Volume moved is O(halo), memory is O(N * bandwidth / P) per chip.
  3. ``sharded_gshift_allgather``: fallback for non-banded partitions —
     one ICI all-gather of the node axis, then the same local slab
     contraction (the slab degenerates toward dense as w grows, but it
     stays sharded across chips).

Both shard_map paths are pure JAX (ppermute/all_gather + windowed block
einsum), so they are differentiable end-to-end: training through a
ShardedGso needs no custom VJP.

Signals follow the gshift convention: x (..., E, G, N_padded) with the
node axis LAST and padded/ordered by the GraphPartition. Any number of
leading dims is supported (flattened internally) — recurrent 5-D
(B, T, E, G, N) signals work.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from graph_neural_networks_tpu.parallel.partition import GraphPartition


def _sq_slabs(part: GraphPartition):
    """Per-shard SQUARE local band slabs + boundary-correction blocks
    for the Pallas shard-local path.

    Round-3 embedded the local (nbl x nbl+2w)-block contraction into a
    square (nbl+2w)-block band matmul by padding w zero output block-
    columns per side — 2w dead block-columns of executed math plus a
    halo-extension concat per shift (+47% at n_parts=1,
    bench_shardmap_tpu r3). Instead: run the Pallas kernel on the
    UNEXTENDED local block with the halo-referencing slab entries
    zeroed (band_matmul clamps out-of-range window blocks to block 0,
    so those entries must be zero), and add the halo terms as O(w^2)
    small block einsums fed directly by the ppermuted halos.

    Returns (s_sq, s_sq_t, lo, hi):
      s_sq / s_sq_t: (P, E, nbl, (2w+1)*ibs, ibs) band_matmul layout,
        entries with j+k-w outside [0, nbl) zeroed (s_sq_t is the
        transposed band for band_shift's VJP);
      lo: (P, E, w, w, ibs, ibs) — lo[j, lb] multiplies from_left
        block lb into output block j (= slab[j, lb-j], j <= lb < w);
      hi: (P, E, w, w, ibs, ibs) — hi[j_rel, rb] multiplies from_right
        block rb into output block nbl-w+j_rel
        (= slab[nbl-w+j_rel, 2w-j_rel+rb], rb <= j_rel).

    Requires nbl >= w (the ring contract; callers gate use_pallas).
    """
    import numpy as np
    Pn, E, nbl, W, ibs, _ = part.slabs.shape
    w = part.w
    s_sq = np.array(part.slabs, np.float32, copy=True)
    for j in range(nbl):
        for k in range(W):
            if not 0 <= j + k - w < nbl:
                s_sq[:, :, j, k] = 0.0
    s_sq_t = np.zeros_like(s_sq)
    for j in range(nbl):
        for k in range(W):
            src = j + k - w
            if 0 <= src < nbl:
                s_sq_t[:, :, j, k] = np.swapaxes(
                    s_sq[:, :, src, 2 * w - k], -1, -2)
    lo = np.zeros((Pn, E, w, w, ibs, ibs), np.float32)
    hi = np.zeros((Pn, E, w, w, ibs, ibs), np.float32)
    for j in range(min(w, nbl)):
        for lb in range(j, w):
            lo[:, :, j, lb] = part.slabs[:, :, j, lb - j]
    for j_rel in range(w):
        j = nbl - w + j_rel
        if j < 0:
            continue
        for rb in range(j_rel + 1):
            hi[:, :, j_rel, rb] = part.slabs[:, :, j, 2 * w - j_rel + rb]
    shape = (Pn, E, nbl, W * ibs, ibs)
    return s_sq.reshape(shape), s_sq_t.reshape(shape), lo, hi


def _pallas_local_contract(x_blk, from_left, from_right, s_sq, s_sq_t,
                           lo, hi, w, ibs, nbl):
    """Shard-local band contraction on the Pallas kernel (TPU fast
    path): square local band_shift on the UNEXTENDED block + boundary-
    correction einsums on the halos. x_blk: (L, E, G, nbl*ibs);
    from_left/from_right: (L, E, G, w*ibs), or None when the shard
    boundary carries no in-range edges (lo/hi identically zero — the
    corrections and the halo exchange are then skipped entirely).
    Differentiable via band_shift's custom VJP (corrections are plain
    einsums)."""
    from graph_neural_networks_tpu.ops import spmm
    L, E, G, n_loc = x_blk.shape
    outs = []
    for e in range(E):
        xe = x_blk[:, e].reshape(L * G, n_loc)
        ye = spmm.band_shift(xe, s_sq[e], s_sq_t[e], n_loc, w, ibs)
        outs.append(ye.reshape(L, G, n_loc))
    y = jnp.stack(outs, axis=1)                  # L, E, G, nbl*ibs
    if w and from_left is not None:
        fl = from_left.reshape(L, E, G, w, ibs)
        fr = from_right.reshape(L, E, G, w, ibs)
        cl = jnp.einsum("legbn,ejbnm->legjm", fl, lo) \
            .reshape(L, E, G, w * ibs)
        ch = jnp.einsum("legbn,ejbnm->legjm", fr, hi) \
            .reshape(L, E, G, w * ibs)
        pad = [(0, 0)] * 3
        y = (y + jnp.pad(cl, pad + [(0, (nbl - w) * ibs)])
             + jnp.pad(ch, pad + [((nbl - w) * ibs, 0)]))
    return y


def _band_contract(x_ext: jnp.ndarray, slab: jnp.ndarray) -> jnp.ndarray:
    """Local windowed band contraction.

    x_ext: (L, E, G, (nbl + 2w) * ibs) halo-extended signal block;
    slab:  (E, nbl, 2w+1, ibs, ibs) band slab (slab[e, j, k] multiplies
    input inner-block j+k). Returns (L, E, G, nbl * ibs).
    """
    E, nbl, W, ibs, _ = slab.shape
    L, E_, G, _ = x_ext.shape
    xb = x_ext.reshape(L, E, G, nbl + W - 1, ibs)
    # windows: (L, E, G, nbl, W, ibs); window k of output block j is input
    # block j + k
    win = jnp.stack([jax.lax.slice_in_dim(xb, k, k + nbl, axis=3)
                     for k in range(W)], axis=4)
    y = jnp.einsum("legjkn,ejknm->legjm", win, slab)
    return y.reshape(L, E, G, nbl * ibs)


def _with_flat_leading(shift4):
    """Wrap a rank-4 (L, E, G, N) shift to accept (..., E, G, N)."""
    def shift(x):
        lead = x.shape[:-3]
        xf = x.reshape((-1,) + x.shape[-3:])
        y = shift4(xf)
        return y.reshape(lead + y.shape[-3:])
    return shift


def sharded_gshift_ring(mesh: Mesh, part: GraphPartition,
                        axis: str = "graph",
                        data_axis: str | None = None) -> Callable:
    """Halo-exchange shift: two ppermutes moving only the w*inner_bs
    boundary nodes, plus the local band-slab contraction.
    Requires part.is_ring (band fits within one neighbor shard).
    data_axis: optionally shard the flattened leading (batch) dim too."""
    assert part.is_ring, (
        f"band half-width w={part.w} inner blocks exceeds the shard width "
        f"(nbl={part.nbl}); use sharded_gshift_allgather or more "
        "aggressive reordering")
    n_dev = mesh.shape[axis]
    assert n_dev == part.n_parts, (n_dev, part.n_parts)
    halo = part.halo
    # non-circular perms: ppermute zero-fills missing sources, which is
    # exactly the boundary condition (no nodes beyond the ends)
    fwd = [(i, i + 1) for i in range(n_dev - 1)]
    bwd = [(i + 1, i) for i in range(n_dev - 1)]

    w, nbl, ibs = part.w, part.nbl, part.inner_bs
    # shard-local compute path: the Pallas band kernel on TPU (128-tiles),
    # the windowed block einsum elsewhere (CPU mesh tests, odd tile sizes)
    use_pallas = (mesh.devices.flat[0].platform == "tpu" and ibs == 128
                  and halo > 0 and nbl >= w)
    has_boundary = True
    if use_pallas:
        sq = _sq_slabs(part)
        # no in-range cross-shard edges anywhere (always at n_parts=1;
        # common after RCM at small P): the halo exchange and the
        # corrections are provably zero — skip both
        has_boundary = bool(sq[2].any() or sq[3].any())
        slab_args = tuple(jnp.asarray(a) for a in sq)
        slab_specs = (P(axis, None, None, None, None),
                      P(axis, None, None, None, None),
                      P(axis, None, None, None, None, None),
                      P(axis, None, None, None, None, None))
    else:
        slab_args = (jnp.asarray(part.slabs),)
        slab_specs = (P(axis, None, None, None, None, None),)

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(data_axis, None, None, axis),) + slab_specs,
        out_specs=P(data_axis, None, None, axis))
    def _shift(x_blk, *slabs_blk):
        # x_blk: (L, E, G, bs)
        if halo == 0:
            return _band_contract(x_blk, slabs_blk[0][0])
        if use_pallas:
            s_sq, s_sq_t, lo, hi = (a[0] for a in slabs_blk)
            if not has_boundary:
                return _pallas_local_contract(
                    x_blk, None, None, s_sq, s_sq_t, None, None,
                    w, ibs, nbl)
        from_left = jax.lax.ppermute(x_blk[..., -halo:], axis, fwd)
        from_right = jax.lax.ppermute(x_blk[..., :halo], axis, bwd)
        if use_pallas:
            return _pallas_local_contract(x_blk, from_left, from_right,
                                          s_sq, s_sq_t, lo, hi,
                                          w, ibs, nbl)
        slab = slabs_blk[0][0]
        if nbl <= 2 * w:
            x_ext = jnp.concatenate([from_left, x_blk, from_right], axis=-1)
            return _band_contract(x_ext, slab)
        # Overlap halo exchange with compute: interior output blocks
        # [w, nbl-w) read only local x, so their contraction carries no
        # data dependency on the ppermutes — XLA's latency-hiding
        # scheduler runs it while the halos are in flight. Only the w
        # boundary blocks at each end wait for their neighbor.
        y_int = _band_contract(x_blk, slab[:, w:nbl - w])
        x_lo = jnp.concatenate(
            [from_left, x_blk[..., :2 * w * ibs]], axis=-1)
        y_lo = _band_contract(x_lo, slab[:, :w])
        x_hi = jnp.concatenate(
            [x_blk[..., -(2 * w) * ibs:], from_right], axis=-1)
        y_hi = _band_contract(x_hi, slab[:, nbl - w:])
        return jnp.concatenate([y_lo, y_int, y_hi], axis=-1)

    return _with_flat_leading(lambda xf: _shift(xf, *slab_args))


def sharded_gshift_allgather(mesh: Mesh, part: GraphPartition,
                             axis: str = "graph",
                             data_axis: str | None = None) -> Callable:
    """All-gather fallback: gather the node axis, slice this shard's
    halo-extended window, contract against the local band slab. Exact for
    any bandwidth; the slab stays sharded across chips."""
    n_dev = mesh.shape[axis]
    assert n_dev == part.n_parts, (n_dev, part.n_parts)
    halo = part.halo
    bs = part.block_size
    w, nbl, ibs = part.w, part.nbl, part.inner_bs
    use_pallas = (mesh.devices.flat[0].platform == "tpu" and ibs == 128
                  and halo > 0 and nbl >= w)
    if use_pallas:
        slab_args = tuple(jnp.asarray(a) for a in _sq_slabs(part))
        slab_specs = (P(axis, None, None, None, None),
                      P(axis, None, None, None, None),
                      P(axis, None, None, None, None, None),
                      P(axis, None, None, None, None, None))
    else:
        slab_args = (jnp.asarray(part.slabs),)
        slab_specs = (P(axis, None, None, None, None, None),)

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(data_axis, None, None, axis),) + slab_specs,
        out_specs=P(data_axis, None, None, axis))
    def _shift(x_blk, *slabs_blk):
        x_full = jax.lax.all_gather(x_blk, axis, axis=-1, tiled=True)
        xp = jnp.pad(x_full, [(0, 0)] * 3 + [(halo, halo)])
        d = jax.lax.axis_index(axis)
        x_ext = jax.lax.dynamic_slice_in_dim(
            xp, d * bs, bs + 2 * halo, axis=-1)
        if use_pallas:
            s_sq, s_sq_t, lo, hi = (a[0] for a in slabs_blk)
            return _pallas_local_contract(
                x_ext[..., halo:halo + bs], x_ext[..., :halo],
                x_ext[..., halo + bs:], s_sq, s_sq_t, lo, hi,
                w, ibs, nbl)
        return _band_contract(x_ext, slabs_blk[0][0])

    return _with_flat_leading(lambda xf: _shift(xf, *slab_args))


def make_dp_train_step(step_fn: Callable, mesh: Mesh,
                       batch_argnums=(2, 3)) -> Callable:
    """Data-parallel wrapper: jit `step_fn(params, opt_state, x, y, ...)`
    with params/opt_state replicated and batch args sharded on 'data'.
    XLA inserts the gradient psum (GSPMD)."""
    repl = NamedSharding(mesh, P())

    def wrapper(params, opt_state, *batch):
        def put(i, a):
            if i in [b - 2 for b in batch_argnums]:
                spec = [None] * a.ndim
                spec[0] = "data"
                return jax.device_put(a, NamedSharding(mesh, P(*spec)))
            return a
        batch = tuple(put(i, jnp.asarray(a)) for i, a in enumerate(batch))
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        return jax.jit(step_fn)(params, opt_state, *batch)
    return wrapper


def sharded_gshift_bcsr(mesh: Mesh, part, axis: str = "graph",
                        data_axis: str | None = None) -> Callable:
    """Sharded shift for SCATTERED graphs (parallel.partition
    .BcsrPartition): one all-gather of the node axis, then each shard
    contracts against the BCSR blocks of ITS column slice of S —
    per-shard GSO memory O(nnzb/P * ibs^2), independent of the graph's
    bandwidth (the band slab degenerates dense when the RCM bandwidth
    ~ N; SURVEY.md §2.9 "CSR/COO with edge partitioning per chip").
    Differentiable: the local contraction is ops.spmm.bcsr_shift_rect
    (custom VJP via the transposed layout) on TPU with 128-tiles, or
    the plain-JAX gather/scatter reference elsewhere; the all-gather's
    adjoint (psum-scatter of dx) comes from autodiff of shard_map."""
    from graph_neural_networks_tpu.ops import spmm
    from graph_neural_networks_tpu.parallel.partition import BcsrPartition
    assert isinstance(part, BcsrPartition), type(part)
    n_dev = mesh.shape[axis]
    assert n_dev == part.n_parts, (n_dev, part.n_parts)
    bs, ibs = part.block_size, part.inner_bs
    Np = part.n_padded
    use_pallas = (mesh.devices.flat[0].platform == "tpu" and ibs == 128)
    args = (jnp.asarray(part.blocks), jnp.asarray(part.brow),
            jnp.asarray(part.bcol), jnp.asarray(part.blocks_t),
            jnp.asarray(part.brow_t), jnp.asarray(part.bcol_t))
    specs = tuple(P(axis, *([None] * (a.ndim - 1))) for a in args)

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(data_axis, None, None, axis),) + specs,
        out_specs=P(data_axis, None, None, axis))
    def _shift(x_blk, blocks, brow, bcol, blocks_t, brow_t, bcol_t):
        # x_blk: (L, E, G, bs) -> gather the full node axis
        x_full = jax.lax.all_gather(x_blk, axis, axis=-1, tiled=True)
        L, E, G, _ = x_full.shape
        outs = []
        for e in range(E):
            xe = x_full[:, e].reshape(L * G, Np)
            if use_pallas:
                ye = spmm.bcsr_shift_rect(
                    xe, blocks[0, e], brow[0, e], bcol[0, e],
                    blocks_t[0, e], brow_t[0, e], bcol_t[0, e],
                    bs, Np, ibs)
            else:
                ye = spmm.bcsr_gather_scatter(
                    xe, blocks[0, e], brow[0, e], bcol[0, e], bs, ibs)
            outs.append(ye.reshape(L, G, bs))
        return jnp.stack(outs, axis=1)

    return _with_flat_leading(lambda xf: _shift(xf, *args))
