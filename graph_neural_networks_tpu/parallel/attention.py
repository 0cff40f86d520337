"""Node-sharded banded attention (GAT family) over a device mesh.

Extends the band-attention modes (ops.attention_band) to graph-sharded
execution: each shard owns a contiguous block of (RCM-ordered) nodes and
stores only its band slab (parallel.partition). One attention
application is three ring steps inside a single shard_map:

  1. halo-exchange the score projections and signal (w*ibs boundary
     nodes per neighbor, like the sharded shift),
  2. per-shard softmax stats over each OWN row's full column window
     (rows never straddle the halo: w <= nbl), then exchange the stats
     halo so neighbor rows' denominators are exact,
  3. windowed alpha recompute + aggregation for the shard's own output
     columns.

Everything inside the shard_map is plain differentiable JAX (ppermute +
windowed einsums + exp), so training gradients — including the softmax
normalization terms that couple rows across shards — come from autodiff
through the exchanges; no custom VJP is needed for correctness. Memory
per chip is O(N * bandwidth / P): the coefficient tensor exists only
shard-locally. (A Pallas flash variant of the shard-local step is a
planned optimization; the XLA windowed form is already dense-tile math.)

Orientation and masking match the reference exactly (graphML.py:713,
807): e_ij = LeakyReLU(a2.Wx_i + a1.Wx_j), softmax over row i's window,
y at column m aggregates alpha-weighted rows, mask arithmetic
``e*mask - (1-mask)*1e12`` then ``alpha*mask``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from graph_neural_networks_tpu.parallel.partition import GraphPartition

INFINITE = 1e12


def _row_col_masks(part: GraphPartition):
    """Host-side 0/1 support masks of S+I in both window layouts.

    mask_col[jb, k] = support block (rows jb+k-w, cols jb)   (ext rows)
    mask_row[ib, k] = support block (rows ib, cols ib+k-w)   (ext cols)
    Shapes: (P, nbl, W, ibs, ibs) each. The identity covers only real
    nodes (padded rows stay fully masked -> zero output, like the
    reference's N-node S+I).
    """
    ibs, nbl, w = part.inner_bs, part.nbl, part.w
    W = 2 * w + 1
    total_nb = part.n_parts * nbl
    mc = np.zeros((total_nb, W, ibs, ibs), np.float32)
    mr = np.zeros((total_nb, W, ibs, ibs), np.float32)
    for csr in part.S_csr:
        coo = csr.tocoo()
        r, c = coo.row, coo.col
        keep = np.abs(coo.data) > 1e-9
        r, c = r[keep], c[keep]
        br, bc = r // ibs, c // ibs
        if len(r):
            np.add.at(mc, (bc, br - bc + w, r % ibs, c % ibs), 1.0)
            np.add.at(mr, (br, bc - br + w, r % ibs, c % ibs), 1.0)
    diag = np.arange(part.n_orig)
    bd = diag // ibs
    np.add.at(mc, (bd, w, diag % ibs, diag % ibs), 1.0)
    np.add.at(mr, (bd, w, diag % ibs, diag % ibs), 1.0)
    shape = (part.n_parts, nbl, W, ibs, ibs)
    return ((mc > 0).astype(np.float32).reshape(shape),
            (mr > 0).astype(np.float32).reshape(shape))


def _row_slabs(part: GraphPartition):
    """Host-side S in ROW window layout, (P, E, nbl, W, ibs, ibs):
    out[p, e, i, k] = S_e[rows of block i, cols of block i+k-w] with
    GLOBAL column indexing — boundary rows' windows reach into neighbor
    shards' columns (zero beyond the global ends). The flash backward
    kernel consumes this."""
    ibs, nbl, w = part.inner_bs, part.nbl, part.w
    W = 2 * w + 1
    total_nb = part.n_parts * nbl
    E = len(part.S_csr)
    sr = np.zeros((E, total_nb, W, ibs, ibs), np.float32)
    for e, csr in enumerate(part.S_csr):
        coo = csr.tocoo()
        keep = np.abs(coo.data) > 1e-9
        r, c, v = coo.row[keep], coo.col[keep], coo.data[keep]
        br, bc = r // ibs, c // ibs
        np.add.at(sr[e], (br, bc - br + w, r % ibs, c % ibs), v)
    return sr.reshape(E, part.n_parts, nbl, W, ibs, ibs) \
        .transpose(1, 0, 2, 3, 4, 5)


def _win(blocks, n_out, W, axis):
    """Windowed stack: out[..., j, k, ...] = blocks[..., j+k, ...] for
    j in [0, n_out), k in [0, W) along `axis` (block axis)."""
    slices = [jax.lax.slice_in_dim(blocks, k, k + n_out, axis=axis)
              for k in range(W)]
    return jnp.stack(slices, axis=axis + 1)


class ShardedBandAttention:
    """Sharded attention operator bound to a mesh + GraphPartition.

    Exposes one method, :meth:`apply`, computing
    ``y = v @ (S_e * alpha_e(a1x, a2x))`` (or alpha alone, the GCAT
    shift) for signals sharded on the node axis. Higher-level GAT /
    GCAT / EV-attention entry points live in
    :func:`sharded_graph_attention` etc.
    """

    def __init__(self, mesh: Mesh, part: GraphPartition,
                 axis: str = "graph", data_axis: Optional[str] = None,
                 local_flash: Optional[bool] = None):
        assert part.is_ring, (
            f"sharded attention needs the ring property (w={part.w} <= "
            f"nbl={part.nbl}); re-partition with a locality order")
        self.mesh = mesh
        self.part = part
        self.axis = axis
        self.data_axis = data_axis
        # keep host numpy (NOT jnp): the operator may be constructed
        # lazily inside a jit trace (ShardedGso.band_attention), where
        # jnp constants would be tracers and leak across traces; numpy
        # becomes a fresh trace constant at each apply() instead.
        mc, mr = _row_col_masks(part)
        self.mask_col = mc                    # (P, nbl, W, ibs, ibs)
        self.mask_row = mr
        self.slabs = np.asarray(part.slabs)   # (P, E, nbl, W, ibs, ibs)
        # shard-local step: fused flash kernels on TPU (alpha never
        # materialized), the windowed XLA einsums elsewhere;
        # local_flash=True forces the kernels (interpret-mode on CPU,
        # for tests), False forces the XLA path.
        if local_flash is None:
            import os
            platform = mesh.devices.flat[0].platform
            local_flash = (platform == "tpu"
                           and part.inner_bs % 128 == 0
                           and not os.environ.get("GNT_NO_FLASH"))
        self.use_flash = bool(local_flash)
        self.slab_row = _row_slabs(part) if self.use_flash else None
        self._fns = {}

    # -- the sharded apply ------------------------------------------------
    def _make(self, with_s: bool, e: int, dp: bool):
        part, axis = self.part, self.axis
        w, nbl, ibs = part.w, part.nbl, part.inner_bs
        W = 2 * w + 1
        halo = part.halo
        n_dev = self.mesh.shape[axis]
        fwd = [(i, i + 1) for i in range(n_dev - 1)]
        bwd = [(i + 1, i) for i in range(n_dev - 1)]
        data_axis = self.data_axis if dp else None

        def halo_ext(t):
            """(..., bs) -> (..., bs + 2*halo) with ring halos (zeros at
            the global ends)."""
            if halo == 0:
                return t
            left = jax.lax.ppermute(t[..., -halo:], axis, fwd)
            right = jax.lax.ppermute(t[..., :halo], axis, bwd)
            return jnp.concatenate([left, t, right], axis=-1)

        @functools.partial(
            shard_map, mesh=self.mesh, check_vma=False,
            in_specs=(P(data_axis, axis), P(data_axis, axis),
                      P(data_axis, None, axis),
                      P(axis, None, None, None, None),
                      P(axis, None, None, None, None),
                      P(axis, None, None, None, None)),
            out_specs=P(data_axis, None, axis))
        def _apply(a1_blk, a2_blk, v_blk, slab_blk, mcol_blk, mrow_blk):
            # shapes per shard: a1/a2 (Q, bs), v (Q, F, bs),
            # slab/mcol/mrow (1, nbl, W, ibs, ibs)
            slab = slab_blk[0]
            mcol = mcol_blk[0]
            mrow = mrow_blk[0]
            Q = a1_blk.shape[0]
            F = v_blk.shape[1]

            a1_ext = halo_ext(a1_blk).reshape(Q, nbl + 2 * w, ibs)
            a2_ext = halo_ext(a2_blk).reshape(Q, nbl + 2 * w, ibs)
            v_ext = halo_ext(v_blk).reshape(Q, F, nbl + 2 * w, ibs)
            a1b = a1_blk.reshape(Q, nbl, ibs)
            a2b = a2_blk.reshape(Q, nbl, ibs)

            # 1. stats for OWN rows over their full column window
            a1w = _win(a1_ext, nbl, W, axis=1)        # Q, nbl, W, ibs
            e_own = jax.nn.leaky_relu(
                a2b[:, :, None, :, None] + a1w[:, :, :, None, :],
                negative_slope=0.2)
            e_own = e_own * mrow - (1.0 - mrow) * INFINITE
            mx = jnp.max(e_own, axis=(2, 4))          # Q, nbl, ibs
            sm = jnp.sum(jnp.exp(e_own - mx[:, :, None, :, None]),
                         axis=(2, 4))

            # 2. exchange the stats halo (neighbors' denominators exact)
            mx_ext = halo_ext(mx.reshape(Q, nbl * ibs)) \
                .reshape(Q, nbl + 2 * w, ibs)
            sm_ext = halo_ext(sm.reshape(Q, nbl * ibs)) \
                .reshape(Q, nbl + 2 * w, ibs)

            # 3. alpha + aggregation for OWN output columns
            a2w = _win(a2_ext, nbl, W, axis=1)        # rows j+k (ext)
            mxw = _win(mx_ext, nbl, W, axis=1)
            smw = _win(sm_ext, nbl, W, axis=1)
            vw = _win(v_ext, nbl, W, axis=2)          # Q, F, nbl, W, ibs
            e_col = jax.nn.leaky_relu(
                a2w[:, :, :, :, None] + a1b[:, :, None, None, :],
                negative_slope=0.2)                    # Q, nbl, W, p, q
            e_col = e_col * mcol - (1.0 - mcol) * INFINITE
            # smw is zero-filled beyond the global ends (ppermute boundary)
            # where mcol is zero anyway — guard the division so masked
            # cells are 0, not 0/0
            al = jnp.exp(e_col - mxw[:, :, :, :, None]) \
                / jnp.maximum(smw[:, :, :, :, None], 1e-30) * mcol
            coeff = al * slab[None] if with_s else al
            y = jnp.einsum("qfjkp,qjkpc->qfjc", vw, coeff)
            return y.reshape(Q, F, nbl * ibs)

        return _apply

    # -- the sharded apply, flash shard-local step ------------------------
    def _make_flash(self, with_s: bool, dp: bool):
        """Same exchange schedule as :meth:`_make`, but the shard-local
        stats / aggregation / backward run the fused flash kernels
        (ops.attention_flash ext-layout calls) under a custom VJP — the
        coefficient tensor never exists, not even shard-locally. The
        backward halo-exchanges the cotangent and halo-folds the d_a1x
        window partials (the transpose of halo_ext)."""
        from graph_neural_networks_tpu.ops import attention_flash as af
        part, axis = self.part, self.axis
        w, nbl, ibs = part.w, part.nbl, part.inner_bs
        W = 2 * w + 1
        halo = part.halo
        n_dev = self.mesh.shape[axis]
        fwd = [(i, i + 1) for i in range(n_dev - 1)]
        bwd = [(i + 1, i) for i in range(n_dev - 1)]
        data_axis = self.data_axis if dp else None
        interpret = self.mesh.devices.flat[0].platform != "tpu"
        slope = 0.2

        def halo_ext(t):
            if halo == 0:
                return t
            left = jax.lax.ppermute(t[..., -halo:], axis, fwd)
            right = jax.lax.ppermute(t[..., :halo], axis, bwd)
            return jnp.concatenate([left, t, right], axis=-1)

        def halo_fold(t_ext):
            """Transpose of halo_ext: fold the ext edges back onto the
            neighbors that own them."""
            if halo == 0:
                return t_ext
            left, mid, right = (t_ext[..., :halo], t_ext[..., halo:-halo],
                                t_ext[..., -halo:])
            from_right = jax.lax.ppermute(left, axis, bwd)
            from_left = jax.lax.ppermute(right, axis, fwd)
            return (mid.at[..., -halo:].add(from_right)
                       .at[..., :halo].add(from_left))

        def _fwd_impl(a1, a2, v, slab_col, mcol, mrow):
            Q = a1.shape[0]
            a1_ext = halo_ext(a1)
            a2_ext = halo_ext(a2)
            v_ext = halo_ext(v)
            mx, sm = af._stats_ext_call(a1_ext, a2, mrow, w, ibs, slope,
                                        interpret)
            mxf = mx.reshape(Q, nbl * ibs)
            smf = sm.reshape(Q, nbl * ibs)
            mx_ext = halo_ext(mxf)
            sm_ext = halo_ext(smf)
            y = af._apply_ext_call(a1, a2_ext, v_ext, mx_ext, sm_ext,
                                   slab_col, mcol, w, ibs, with_s, slope,
                                   interpret)
            return y, (a1_ext, mxf, smf)

        @jax.custom_vjp
        def local(a1, a2, v, slab_col, slab_row, mcol, mrow):
            return _fwd_impl(a1, a2, v, slab_col, mcol, mrow)[0]

        def local_fwd(a1, a2, v, slab_col, slab_row, mcol, mrow):
            y, (a1_ext, mxf, smf) = _fwd_impl(a1, a2, v, slab_col, mcol,
                                              mrow)
            return y, (a1_ext, a2, v, mxf, smf, slab_col, slab_row, mrow,
                       mcol)

        def local_bwd(res, dy):
            a1_ext, a2, v, mxf, smf, slab_col, slab_row, mrow, mcol = res
            Q = a2.shape[0]
            dy_ext = halo_ext(dy)
            da2, da1p, dv = af._bwd_ext_call(
                a1_ext, a2, v, mxf, smf, slab_row, mrow, dy_ext, w, ibs,
                with_s, slope, interpret)
            # fold the window partials into ext columns (block j+k), then
            # halo-fold the out-of-shard columns back to their owners
            da1_ext = jnp.zeros((Q, nbl + 2 * w, ibs), jnp.float32)
            for k in range(W):
                da1_ext = da1_ext.at[:, k:k + nbl].add(da1p[:, :, k])
            da1 = halo_fold(da1_ext.reshape(Q, (nbl + 2 * w) * ibs))
            return (da1.astype(a2.dtype), da2.astype(a2.dtype),
                    dv.astype(v.dtype), jnp.zeros_like(slab_col),
                    jnp.zeros_like(slab_row), jnp.zeros_like(mcol),
                    jnp.zeros_like(mrow))

        local.defvjp(local_fwd, local_bwd)

        @functools.partial(
            shard_map, mesh=self.mesh, check_vma=False,
            in_specs=(P(data_axis, axis), P(data_axis, axis),
                      P(data_axis, None, axis),
                      P(axis, None, None, None, None),
                      P(axis, None, None, None, None),
                      P(axis, None, None, None, None),
                      P(axis, None, None, None, None)),
            out_specs=P(data_axis, None, axis))
        def _apply(a1_blk, a2_blk, v_blk, slab_blk, slabr_blk, mcol_blk,
                   mrow_blk):
            return local(a1_blk, a2_blk, v_blk, slab_blk[0], slabr_blk[0],
                         mcol_blk[0], mrow_blk[0])

        return _apply

    def apply(self, a1x, a2x, v, e: int = 0, with_s: bool = True):
        """One sharded attention application.

        a1x, a2x: (Q, Np); v: (Q, F, Np) — node axis last, ordered/padded
        by the partition (Np = part.n_padded), Q = folded batch*heads.
        Returns (Q, F, Np). e selects the edge feature's slab.
        """
        Q = a1x.shape[0]
        n_data = self.mesh.shape[self.data_axis] if self.data_axis else 1
        dp = bool(self.data_axis) and Q % n_data == 0
        key = (with_s, dp)
        if key not in self._fns:
            self._fns[key] = (self._make_flash(with_s, dp) if self.use_flash
                              else self._make(with_s, e, dp))
        if self.use_flash:
            F = v.shape[1]
            Fp = -(-F // 8) * 8          # sublane multiple for the kernels
            vp = v if Fp == F else jnp.pad(v, ((0, 0), (0, Fp - F), (0, 0)))
            y = self._fns[key](a1x, a2x, vp, self.slabs[:, e],
                               self.slab_row[:, e], self.mask_col,
                               self.mask_row)
            return y[:, :F]
        return self._fns[key](a1x, a2x, v, self.slabs[:, e],
                              self.mask_col, self.mask_row)


# ---------------------------------------------------------------------------
# GAT-family entry points on sharded signals
# ---------------------------------------------------------------------------

def _projections(x, a, W_p):
    F = W_p.shape[2]
    Wx = jnp.einsum("pefg,bgn->bpefn", W_p, x)
    a1, a2 = a[..., :F], a[..., F:]
    a1Wx = jnp.einsum("pef,bpefn->bpen", a1, Wx)
    a2Wx = jnp.einsum("pef,bpefn->bpen", a2, Wx)
    return Wx, a1Wx, a2Wx


def sharded_graph_attention(x, a, W_p, sattn: ShardedBandAttention,
                            n_out: Optional[int] = None):
    """Sharded GAT layer: y = sum_e Wx (S_e * alpha_e). x: (B, G, Np)
    ordered/padded by the partition; returns (B, P, F, n_out or Np)."""
    B, G, Np = x.shape
    Ph, E, F, _ = W_p.shape
    Wx, a1Wx, a2Wx = _projections(x, a, W_p)
    a1q = a1Wx.reshape(B * Ph, E, Np)
    a2q = a2Wx.reshape(B * Ph, E, Np)
    vq = Wx.reshape(B * Ph, E, F, Np)
    y = None
    for e in range(E):
        ye = sattn.apply(a1q[:, e], a2q[:, e], vq[:, e], e=e, with_s=True)
        y = ye if y is None else y + ye
    y = y.reshape(B, Ph, F, Np)
    return y if n_out is None else y[..., :n_out]


def sharded_gat_lsigf(h, x, a, W_p, sattn: ShardedBandAttention,
                      b=None):
    """Sharded GCAT: K-tap LSIGF over alpha (shift = alpha alone,
    reference graphML.py:876-879). h: (E,K) -> (B, P, F, Np)."""
    E, K = h.shape
    Ph, _, F, G = W_p.shape
    B, _, Np = x.shape
    _, a1Wx, a2Wx = _projections(x, a, W_p)
    a1q = a1Wx.reshape(B * Ph, E, Np)
    a2q = a2Wx.reshape(B * Ph, E, Np)
    W_taps = jnp.transpose(W_p, (0, 3, 1, 2)).reshape(Ph, F, E, 1, G)
    hW = h[None, None, :, :, None] * W_taps          # P,F,E,K,G
    xe = jnp.broadcast_to(x[:, None, None], (B, Ph, E, G, Np))
    xe = xe.reshape(B * Ph, E, G, Np)
    zs = [xe]
    for _ in range(1, K):
        xe = jnp.stack([
            sattn.apply(a1q[:, e], a2q[:, e], xe[:, e], e=e, with_s=False)
            for e in range(E)], axis=1)
        zs.append(xe)
    z = jnp.stack(zs, axis=2).reshape(B, Ph, E, K, G, Np)
    y = jnp.einsum("bpekgn,pfekg->bpfn", z, hW)
    return y if b is None else y + b


def sharded_gat_evgf(x, a, W_p, sattn: ShardedBandAttention, b=None):
    """Sharded attention edge-variant filter (per-hop attention,
    cumulative product; reference graphML.py:897-969).
    a: (P,K,E,2F), W_p: (P,K,E,F,G) -> (B, P, F, Np)."""
    Ph, K, E, F, G = W_p.shape
    B, _, Np = x.shape

    def coeffs(k):
        _, a1Wx, a2Wx = _projections(x, a[:, k], W_p[:, k])
        return (a1Wx.reshape(B * Ph, E, Np), a2Wx.reshape(B * Ph, E, Np))

    def apply_all(a1q, a2q, v):
        return jnp.stack([
            sattn.apply(a1q[:, e], a2q[:, e], v[:, e], e=e, with_s=True)
            for e in range(E)], axis=1)

    a1q, a2q = coeffs(0)
    v = jnp.einsum("pefg,bgn->bpefn", W_p[:, 0], x)
    v = apply_all(a1q, a2q, v.reshape(B * Ph, E, F, Np))
    y = v
    for k in range(1, K):
        a1q, a2q = coeffs(k)
        v = apply_all(a1q, a2q, v)
        y = y + v
    y = jnp.sum(y, axis=1).reshape(B, Ph, F, Np)
    return y if b is None else y + b
