"""Flash banded attention: fused Pallas SDDMM + row-softmax + aggregation.

The XLA band attention (ops.attention_band) materializes the coefficient
tensor ``alpha_col (B,P,E,nb,W,ibs,ibs)`` in HBM — O(B*P*E*N*bandwidth)
bytes (0.7 GB at N=16k, B=8, P=2). This module computes the same math
flash-attention style: scores are *recomputed* on (ibs x ibs) tiles in
VMEM in every pass and alpha never exists in HBM. Three Pallas kernels:

  * stats    — per row-block: masked-score rowmax and exp-rowsum over the
               row's whole column window (the softmax denominators).
  * apply    — per output column-block: re-derive alpha tile-by-tile from
               (a1x, a2x, stats), multiply the band slab (or not: GCAT
               shifts with alpha alone), aggregate v with MXU dots.
  * backward — per row-block: the standard flash backward (recompute
               alpha, dcoeff = v^T dy, softmax VJP with the per-row
               inner product, LeakyReLU chain) emitting d_a2x, window
               partials of d_a1x (folded in XLA), and dv.

Orientation matches the reference (graphML.py:713, 807): score
e_ij = LeakyReLU(a2.Wx_i + a1.Wx_j), softmax over each ROW i's column
window, output at column m aggregates alpha-weighted rows. Masking
reproduces the reference arithmetic exactly: e*mask - (1-mask)*1e12,
then alpha*mask. S is structure (non-differentiable), like band_shift.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INFINITE = 1e12  # reference's additive -inf (graphML.py:73)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _diag_win(t, w):
    """(..., nb, W, p, q) -> out[r, k] = t[r + k - w, k] (zeros beyond)."""
    nb = t.shape[-4]
    pad = [(0, 0)] * (t.ndim - 4) + [(w, w), (0, 0), (0, 0), (0, 0)]
    tp = jnp.pad(t, pad)
    cols = [jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(tp, k, k + nb, axis=-4), k, k + 1, axis=-3)
        for k in range(t.shape[-3])]
    return jnp.concatenate(cols, axis=-3)


class BandAux(NamedTuple):
    """Static band-structure operands of flash_apply (non-differentiable).

    slab_col : (nb, W, ibs, ibs) — slab_col[j, k] = S[rows j+k-w, cols j]
    slab_row : (nb, W, ibs, ibs) — slab_row[i, k] = S[rows i, cols i+k-w]
    mask_col / mask_row : same layouts, support of S+I as 0/1 floats.
    """
    slab_col: jnp.ndarray
    slab_row: jnp.ndarray
    mask_col: jnp.ndarray
    mask_row: jnp.ndarray


def make_support(slab5: jnp.ndarray, w: int, dtype=jnp.float32):
    """S+I support shared across edge features, column layout: 0/1
    (nb, W, ibs, ibs) from the (E, nb, W, ibs, ibs) slab."""
    ibs = slab5.shape[3]
    sup = jnp.abs(slab5).sum(0) > 1e-9
    eye = jnp.eye(ibs, dtype=bool)
    sup = sup.at[:, w].set(sup[:, w] | eye[None])
    return sup.astype(dtype)


def make_aux(slab5_e: jnp.ndarray, support: jnp.ndarray, w: int) -> BandAux:
    """Build BandAux for ONE edge feature's slab (nb, W, ibs, ibs);
    `support` from :func:`make_support`."""
    slab_row = _diag_win(jnp.flip(slab5_e, axis=-3), w)
    mask_row = _diag_win(jnp.flip(support, axis=-3), w)
    return BandAux(slab5_e, slab_row, support, mask_row)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _make_stats_kernel(W, slope):
    def kernel(*refs):
        a2_ref = refs[0]
        a1_refs = refs[1:1 + W]
        mrow_ref = refs[1 + W]
        mx_ref, sm_ref = refs[2 + W], refs[3 + W]
        a2 = a2_ref[0, 0, 0].astype(jnp.float32)
        es = []
        for k in range(W):
            m = mrow_ref[0, k].astype(jnp.float32)
            pre = a2[:, None] + a1_refs[k][0, 0, 0][None, :].astype(jnp.float32)
            e = jax.nn.leaky_relu(pre, negative_slope=slope)
            es.append(e * m - (1.0 - m) * INFINITE)
        E = jnp.concatenate(es, axis=-1)                 # (ibs, W*ibs)
        mx = jnp.max(E, axis=-1)
        sm = jnp.sum(jnp.exp(E - mx[:, None]), axis=-1)
        mx_ref[0, 0, 0] = mx
        sm_ref[0, 0, 0] = sm
    return kernel


def _make_apply_kernel(W, with_s, slope):
    def kernel(*refs):
        v_refs = refs[:W]
        a2_refs = refs[W:2 * W]
        mx_refs = refs[2 * W:3 * W]
        sm_refs = refs[3 * W:4 * W]
        a1_ref = refs[4 * W]
        slab_ref = refs[4 * W + 1]
        mcol_ref = refs[4 * W + 2]
        o_ref = refs[4 * W + 3]
        a1 = a1_ref[0, 0, 0].astype(jnp.float32)
        acc = None
        for k in range(W):
            m = mcol_ref[0, k].astype(jnp.float32)       # (ibs_p, ibs_q)
            pre = (a2_refs[k][0, 0, 0].astype(jnp.float32)[:, None]
                   + a1[None, :])
            e = jax.nn.leaky_relu(pre, negative_slope=slope)
            e = e * m - (1.0 - m) * INFINITE
            al = jnp.exp(e - mx_refs[k][0, 0, 0].astype(jnp.float32)[:, None])
            # guard: zero-filled stats beyond the global graph ends (the
            # sharded ext layout's ppermute boundary) would give 0/0 under
            # an all-zero mask; masked cells must be 0, not NaN
            sm = jnp.maximum(sm_refs[k][0, 0, 0].astype(jnp.float32), 1e-30)
            al = al / sm[:, None] * m
            coeff = al * slab_ref[0, k].astype(jnp.float32) if with_s else al
            d = jnp.dot(v_refs[k][0].astype(jnp.float32), coeff,
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        o_ref[0] = acc.astype(o_ref.dtype)
    return kernel


def _make_bwd_kernel(W, ibs, with_s, slope):
    def kernel(*refs):
        dy_refs = refs[:W]
        a1_refs = refs[W:2 * W]
        v_ref = refs[2 * W]
        a2_ref = refs[2 * W + 1]
        slabr_ref = refs[2 * W + 2]
        mrow_ref = refs[2 * W + 3]
        mx_ref, sm_ref = refs[2 * W + 4], refs[2 * W + 5]
        da2_ref, da1p_ref, dv_ref = refs[2 * W + 6:2 * W + 9]

        a2 = a2_ref[0, 0, 0].astype(jnp.float32)
        mx = mx_ref[0, 0, 0].astype(jnp.float32)
        sm = sm_ref[0, 0, 0].astype(jnp.float32)
        vT = v_ref[0].astype(jnp.float32).T              # (ibs_p, F)

        # pass 1: delta_p = sum_{k,q} alpha * dalpha (softmax VJP inner
        # product), recomputing alpha per tile
        als, dals, pres, ms = [], [], [], []
        delta = jnp.zeros((ibs,), jnp.float32)
        for k in range(W):
            m = mrow_ref[0, k].astype(jnp.float32)
            pre = a2[:, None] + a1_refs[k][0, 0, 0][None, :].astype(jnp.float32)
            e = jax.nn.leaky_relu(pre, negative_slope=slope)
            e = e * m - (1.0 - m) * INFINITE
            al = jnp.exp(e - mx[:, None]) / sm[:, None] * m
            dy = dy_refs[k][0].astype(jnp.float32)       # (F, ibs_q)
            dco = jnp.dot(vT, dy, preferred_element_type=jnp.float32)
            sk = slabr_ref[0, k].astype(jnp.float32)
            dal = dco * sk if with_s else dco
            delta = delta + jnp.sum(al * dal, axis=-1)
            als.append(al)
            dals.append(dal)
            pres.append(pre)
            ms.append(m)

        # pass 2: de_pre and the three outputs
        da2 = jnp.zeros((ibs,), jnp.float32)
        dv = None
        for k in range(W):
            al, dal, pre, m = als[k], dals[k], pres[k], ms[k]
            de = al * (dal - delta[:, None])
            dpre = de * m * jnp.where(pre > 0, 1.0, slope)
            da2 = da2 + jnp.sum(dpre, axis=-1)
            da1p_ref[0, 0, k] = jnp.sum(dpre, axis=0).astype(da1p_ref.dtype)
            coeff = al * slabr_ref[0, k].astype(jnp.float32) if with_s else al
            dy = dy_refs[k][0].astype(jnp.float32)
            d = jnp.dot(dy, coeff.T, preferred_element_type=jnp.float32)
            dv = d if dv is None else dv + d
        da2_ref[0, 0, 0] = da2.astype(da2_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)
    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _win3(k, w, nb):
    def index_map(q, j):
        return (q, 0, jnp.clip(j + k - w, 0, nb - 1))
    return index_map


def _winb(k, w, nb):
    def index_map(q, j):
        return (q, jnp.clip(j + k - w, 0, nb - 1), 0, 0)
    return index_map


def _stats_call(a1x, a2x, mask_row, w, ibs, slope, interpret):
    Q, Np = a1x.shape
    nb = Np // ibs
    W = 2 * w + 1
    a1b = a1x.reshape(Q, nb, 1, ibs)
    a2b = a2x.reshape(Q, nb, 1, ibs)
    return pl.pallas_call(
        _make_stats_kernel(W, slope),
        grid=(Q, nb),
        in_specs=[pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0))]
        + [pl.BlockSpec((1, 1, 1, ibs), _winb(k, w, nb)) for k in range(W)]
        + [pl.BlockSpec((1, W, ibs, ibs), lambda q, j: (j, 0, 0, 0))],
        out_specs=[pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0)),
                   pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((Q, nb, 1, ibs), jnp.float32),
                   jax.ShapeDtypeStruct((Q, nb, 1, ibs), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(a2b, *([a1b] * W), mask_row)


def _apply_call(a1x, a2x, v, rowmax, rowsum, slab_col, mask_col, w, ibs,
                with_s, slope, interpret):
    Q, F, Np = v.shape
    nb = Np // ibs
    W = 2 * w + 1
    a1b = a1x.reshape(Q, nb, 1, ibs)
    a2b = a2x.reshape(Q, nb, 1, ibs)
    return pl.pallas_call(
        _make_apply_kernel(W, with_s, slope),
        grid=(Q, nb),
        in_specs=[pl.BlockSpec((1, F, ibs), _win3(k, w, nb))
                  for k in range(W)]
        + [pl.BlockSpec((1, 1, 1, ibs), _winb(k, w, nb)) for k in range(W)]
        + [pl.BlockSpec((1, 1, 1, ibs), _winb(k, w, nb)) for k in range(W)]
        + [pl.BlockSpec((1, 1, 1, ibs), _winb(k, w, nb)) for k in range(W)]
        + [pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0)),
           pl.BlockSpec((1, W, ibs, ibs), lambda q, j: (j, 0, 0, 0)),
           pl.BlockSpec((1, W, ibs, ibs), lambda q, j: (j, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, F, ibs), lambda q, j: (q, 0, j)),
        out_shape=jax.ShapeDtypeStruct((Q, F, Np), v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*([v] * W), *([a2b] * W), *([rowmax] * W), *([rowsum] * W),
      a1b, slab_col, mask_col)


def _bwd_call(a1x, a2x, v, rowmax, rowsum, slab_row, mask_row, g, w, ibs,
              with_s, slope, interpret):
    Q, F, Np = v.shape
    nb = Np // ibs
    W = 2 * w + 1
    a1b = a1x.reshape(Q, nb, 1, ibs)
    a2b = a2x.reshape(Q, nb, 1, ibs)
    da2, da1p, dv = pl.pallas_call(
        _make_bwd_kernel(W, ibs, with_s, slope),
        grid=(Q, nb),
        in_specs=[pl.BlockSpec((1, F, ibs), _win3(k, w, nb))
                  for k in range(W)]
        + [pl.BlockSpec((1, 1, 1, ibs), _winb(k, w, nb)) for k in range(W)]
        + [pl.BlockSpec((1, F, ibs), lambda q, j: (q, 0, j)),
           pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0)),
           pl.BlockSpec((1, W, ibs, ibs), lambda q, j: (j, 0, 0, 0)),
           pl.BlockSpec((1, W, ibs, ibs), lambda q, j: (j, 0, 0, 0)),
           pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0)),
           pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0))],
        out_specs=[pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0)),
                   pl.BlockSpec((1, 1, W, ibs), lambda q, j: (q, j, 0, 0)),
                   pl.BlockSpec((1, F, ibs), lambda q, j: (q, 0, j))],
        out_shape=[jax.ShapeDtypeStruct((Q, nb, 1, ibs), jnp.float32),
                   jax.ShapeDtypeStruct((Q, nb, W, ibs), jnp.float32),
                   jax.ShapeDtypeStruct((Q, F, Np), v.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*([g] * W), *([a1b] * W), v, a2b, slab_row, mask_row, rowmax, rowsum)
    # fold the window partials: d_a1x[c] = sum_k da1p[c + w - k, k]
    dpp = jnp.pad(da1p, ((0, 0), (w, w), (0, 0), (0, 0)))
    da1 = sum(jax.lax.slice_in_dim(dpp, 2 * w - k, 2 * w - k + nb,
                                   axis=1)[:, :, k]
              for k in range(W))                         # (Q, nb, ibs)
    return da2.reshape(Q, Np), da1.reshape(Q, Np), dv


# ---------------------------------------------------------------------------
# Ext-layout calls (shard-local step of parallel.attention: halo'd inputs
# carry w extra blocks per side, so the window maps are plain offsets
# j+k into the ext arrays instead of the clipped single-array windows)
# ---------------------------------------------------------------------------

def _ext4(k):
    return lambda q, j: (q, j + k, 0, 0)


def _ext3(k):
    return lambda q, j: (q, 0, j + k)


def _stats_ext_call(a1_ext, a2x, mask_row, w, ibs, slope, interpret):
    """Row softmax stats for the shard's OWN rows; a1_ext (Q, Np+2*w*ibs)
    halo-extended, a2x (Q, Np) own, mask_row (nbl, W, ibs, ibs) global-
    column layout. Returns mx, sm as (Q, nbl, 1, ibs) f32."""
    Q, Np = a2x.shape
    nbl = Np // ibs
    W = 2 * w + 1
    a1b = a1_ext.reshape(Q, nbl + 2 * w, 1, ibs)
    a2b = a2x.reshape(Q, nbl, 1, ibs)
    return pl.pallas_call(
        _make_stats_kernel(W, slope),
        grid=(Q, nbl),
        in_specs=[pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0))]
        + [pl.BlockSpec((1, 1, 1, ibs), _ext4(k)) for k in range(W)]
        + [pl.BlockSpec((1, W, ibs, ibs), lambda q, j: (j, 0, 0, 0))],
        out_specs=[pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0)),
                   pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((Q, nbl, 1, ibs), jnp.float32),
                   jax.ShapeDtypeStruct((Q, nbl, 1, ibs), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(a2b, *([a1b] * W), mask_row)


def _apply_ext_call(a1x, a2_ext, v_ext, mx_ext, sm_ext, slab_col, mask_col,
                    w, ibs, with_s, slope, interpret):
    """Alpha recompute + aggregation for the shard's OWN output columns.
    a1x (Q, Np) own; a2_ext/mx_ext/sm_ext (Q, Np+2*w*ibs) and v_ext
    (Q, F, Np+2*w*ibs) halo-extended rows; slab_col/mask_col
    (nbl, W, ibs, ibs). Returns (Q, F, Np)."""
    Q, F, _ = v_ext.shape
    Np = a1x.shape[1]
    nbl = Np // ibs
    W = 2 * w + 1
    a1b = a1x.reshape(Q, nbl, 1, ibs)
    a2b = a2_ext.reshape(Q, nbl + 2 * w, 1, ibs)
    mxb = mx_ext.reshape(Q, nbl + 2 * w, 1, ibs)
    smb = sm_ext.reshape(Q, nbl + 2 * w, 1, ibs)
    return pl.pallas_call(
        _make_apply_kernel(W, with_s, slope),
        grid=(Q, nbl),
        in_specs=[pl.BlockSpec((1, F, ibs), _ext3(k)) for k in range(W)]
        + [pl.BlockSpec((1, 1, 1, ibs), _ext4(k)) for k in range(W)]
        + [pl.BlockSpec((1, 1, 1, ibs), _ext4(k)) for k in range(W)]
        + [pl.BlockSpec((1, 1, 1, ibs), _ext4(k)) for k in range(W)]
        + [pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0)),
           pl.BlockSpec((1, W, ibs, ibs), lambda q, j: (j, 0, 0, 0)),
           pl.BlockSpec((1, W, ibs, ibs), lambda q, j: (j, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, F, ibs), lambda q, j: (q, 0, j)),
        out_shape=jax.ShapeDtypeStruct((Q, F, Np), v_ext.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*([v_ext] * W), *([a2b] * W), *([mxb] * W), *([smb] * W),
      a1b, slab_col, mask_col)


def _bwd_ext_call(a1_ext, a2x, v, mx, sm, slab_row, mask_row, g_ext,
                  w, ibs, with_s, slope, interpret):
    """Flash backward for the shard's OWN rows. g_ext (Q, F, Np+2*w*ibs)
    halo-extended cotangent; v/a2x/mx/sm own rows; slab_row/mask_row
    (nbl, W, ibs, ibs) global-column row layout. Returns da2 (Q, Np),
    da1p window partials (Q, nbl, W, ibs) in EXT column coords
    (column block = j + k), dv (Q, F, Np)."""
    Q, F, Np = v.shape
    nbl = Np // ibs
    W = 2 * w + 1
    a1b = a1_ext.reshape(Q, nbl + 2 * w, 1, ibs)
    a2b = a2x.reshape(Q, nbl, 1, ibs)
    mxb = mx.reshape(Q, nbl, 1, ibs)
    smb = sm.reshape(Q, nbl, 1, ibs)
    da2, da1p, dv = pl.pallas_call(
        _make_bwd_kernel(W, ibs, with_s, slope),
        grid=(Q, nbl),
        in_specs=[pl.BlockSpec((1, F, ibs), _ext3(k)) for k in range(W)]
        + [pl.BlockSpec((1, 1, 1, ibs), _ext4(k)) for k in range(W)]
        + [pl.BlockSpec((1, F, ibs), lambda q, j: (q, 0, j)),
           pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0)),
           pl.BlockSpec((1, W, ibs, ibs), lambda q, j: (j, 0, 0, 0)),
           pl.BlockSpec((1, W, ibs, ibs), lambda q, j: (j, 0, 0, 0)),
           pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0)),
           pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0))],
        out_specs=[pl.BlockSpec((1, 1, 1, ibs), lambda q, j: (q, j, 0, 0)),
                   pl.BlockSpec((1, 1, W, ibs), lambda q, j: (q, j, 0, 0)),
                   pl.BlockSpec((1, F, ibs), lambda q, j: (q, 0, j))],
        out_shape=[jax.ShapeDtypeStruct((Q, nbl, 1, ibs), jnp.float32),
                   jax.ShapeDtypeStruct((Q, nbl, W, ibs), jnp.float32),
                   jax.ShapeDtypeStruct((Q, F, Np), v.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*([g_ext] * W), *([a1b] * W), v, a2b, slab_row, mask_row, mxb, smb)
    return da2.reshape(Q, Np), da1p, dv


# ---------------------------------------------------------------------------
# Differentiable primitive
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def flash_apply(a1x, a2x, v, aux: BandAux, w: int, ibs: int,
                with_s: bool = True, interpret: bool = False,
                slope: float = 0.2):
    """y = v @ (S * alpha(a1x, a2x)) on the band, alpha never materialized.

    a1x, a2x: (Q, Np) score projections (Np = nb*ibs, zero-padded);
    v: (Q, F, Np) signals (F padded to a sublane multiple);
    aux: BandAux band structure; with_s=False shifts with alpha alone
    (the GCAT convention, reference graphML.py:876-879).
    Returns (Q, F, Np). Differentiable in a1x, a2x, v (S is structure).
    """
    rowmax, rowsum = _stats_call(a1x, a2x, aux.mask_row, w, ibs, slope,
                                 interpret)
    return _apply_call(a1x, a2x, v, rowmax, rowsum, aux.slab_col,
                       aux.mask_col, w, ibs, with_s, slope, interpret)


def _flash_fwd(a1x, a2x, v, aux, w, ibs, with_s, interpret, slope):
    rowmax, rowsum = _stats_call(a1x, a2x, aux.mask_row, w, ibs, slope,
                                 interpret)
    y = _apply_call(a1x, a2x, v, rowmax, rowsum, aux.slab_col, aux.mask_col,
                    w, ibs, with_s, slope, interpret)
    return y, (a1x, a2x, v, rowmax, rowsum, aux)


def _flash_bwd(w, ibs, with_s, interpret, slope, res, g):
    a1x, a2x, v, rowmax, rowsum, aux = res
    da2, da1, dv = _bwd_call(a1x, a2x, v, rowmax, rowsum, aux.slab_row,
                             aux.mask_row, g, w, ibs, with_s, slope,
                             interpret)
    # S is structure: zero cotangent (DCE'd by XLA since aux is constant)
    return (da1.astype(a1x.dtype), da2.astype(a2x.dtype), dv,
            jax.tree.map(jnp.zeros_like, aux))


flash_apply.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# GAT-family entry points (flash counterparts of ops.attention_band)
# ---------------------------------------------------------------------------

def _pad_rows(t, mult=8):
    F = t.shape[-2]
    Fp = _cdiv(F, mult) * mult
    if Fp == F:
        return t
    return jnp.pad(t, [(0, 0)] * (t.ndim - 2) + [(0, Fp - F), (0, 0)])


def _projections(x, a, W_p):
    """Wx (B,P,E,F,N), a1Wx/a2Wx (B,P,E,N) from x (B,G,N)."""
    F = W_p.shape[2]
    Wx = jnp.einsum("pefg,bgn->bpefn", W_p, x)
    a1, a2 = a[..., :F], a[..., F:]
    a1Wx = jnp.einsum("pef,bpefn->bpen", a1, Wx)
    a2Wx = jnp.einsum("pef,bpefn->bpen", a2, Wx)
    return Wx, a1Wx, a2Wx


def _auxes(slab5, w):
    """Per-edge-feature BandAux list (shared S+I support)."""
    support = make_support(slab5, w, slab5.dtype)
    return [make_aux(slab5[e], support, w) for e in range(slab5.shape[0])]


def graph_attention_band_flash(x, a, W_p, slab5, w, n_out=None,
                               negative_slope: float = 0.2,
                               interpret: bool = False):
    """Flash GAT layer: y = sum_e Wx (S_e * alpha_e). Matches
    attention_band.graph_attention_band. Returns (B, P, F, N)."""
    B, G, N = x.shape
    P, E, F, _ = W_p.shape
    nb, ibs = slab5.shape[1], slab5.shape[3]
    Np = nb * ibs
    Wx, a1Wx, a2Wx = _projections(x, a, W_p)
    pad = [(0, 0)] * 3 + [(0, Np - N)]
    a1p = jnp.pad(a1Wx, pad).reshape(B * P, E, Np)
    a2p = jnp.pad(a2Wx, pad).reshape(B * P, E, Np)
    vp = _pad_rows(jnp.pad(Wx, [(0, 0)] * 4 + [(0, Np - N)]))
    Fp = vp.shape[-2]
    vp = vp.reshape(B * P, E, Fp, Np)
    auxes = _auxes(slab5, w)
    y = None
    for e in range(E):
        ye = flash_apply(a1p[:, e], a2p[:, e], vp[:, e], auxes[e], w, ibs,
                         True, interpret, negative_slope)
        y = ye if y is None else y + ye
    y = y.reshape(B, P, Fp, Np)[:, :, :F]
    n = N if n_out is None else n_out
    return y[..., :n]


def gat_lsigf_band_flash(h, x, a, W_p, slab5, w, b=None,
                         negative_slope: float = 0.2,
                         interpret: bool = False):
    """Flash GCAT: K-tap LSIGF over alpha (shift = alpha alone).
    Matches attention_band.gat_lsigf_band. h: (E,K) -> (B,P,F,N)."""
    E, K = h.shape
    P, _, F, G = W_p.shape
    B, _, N = x.shape
    nb, ibs = slab5.shape[1], slab5.shape[3]
    Np = nb * ibs
    _, a1Wx, a2Wx = _projections(x, a, W_p)
    pad = [(0, 0)] * 3 + [(0, Np - N)]
    a1p = jnp.pad(a1Wx, pad).reshape(B * P, E, Np)
    a2p = jnp.pad(a2Wx, pad).reshape(B * P, E, Np)
    auxes = _auxes(slab5, w)
    W_taps = jnp.transpose(W_p, (0, 3, 1, 2)).reshape(P, F, E, 1, G)
    hW = h[None, None, :, :, None] * W_taps              # P,F,E,K,G
    Gp = _cdiv(G, 8) * 8
    xe = jnp.pad(x, [(0, 0), (0, Gp - G), (0, Np - N)])  # B,Gp,Np
    xe = jnp.broadcast_to(xe[:, None, None], (B, P, E, Gp, Np))
    xe = xe.reshape(B * P, E, Gp, Np)
    zs = [xe]
    for _ in range(1, K):
        xe = jnp.stack([
            flash_apply(a1p[:, e], a2p[:, e], xe[:, e], auxes[e], w, ibs,
                        False, interpret, negative_slope)
            for e in range(E)], axis=1)
        zs.append(xe)
    z = jnp.stack(zs, axis=2)                            # BP,E,K,Gp,Np
    z = z.reshape(B, P, E, K, Gp, Np)[..., :G, :N]
    y = jnp.einsum("bpekgn,pfekg->bpfn", z, hW)
    return y if b is None else y + b


def gat_evgf_band_flash(x, a, W_p, slab5, w, b=None,
                        negative_slope: float = 0.2,
                        interpret: bool = False):
    """Flash banded attention EVGF (per-hop attention, cumulative product).
    Matches attention_band.gat_evgf_band. a: (P,K,E,2F), W_p: (P,K,E,F,G)
    -> (B,P,F,N)."""
    P, K, E, F, G = W_p.shape
    B, _, N = x.shape
    nb, ibs = slab5.shape[1], slab5.shape[3]
    Np = nb * ibs
    auxes = _auxes(slab5, w)
    Fp = _cdiv(F, 8) * 8

    def coeffs(k):
        _, a1Wx, a2Wx = _projections(x, a[:, k], W_p[:, k])
        pad = [(0, 0)] * 3 + [(0, Np - N)]
        return (jnp.pad(a1Wx, pad).reshape(B * P, E, Np),
                jnp.pad(a2Wx, pad).reshape(B * P, E, Np))

    def apply_all(a1p, a2p, v):
        return jnp.stack([
            flash_apply(a1p[:, e], a2p[:, e], v[:, e], auxes[e], w, ibs,
                        True, interpret, negative_slope)
            for e in range(E)], axis=1)

    a1p, a2p = coeffs(0)
    v = jnp.einsum("pefg,bgn->bpefn", W_p[:, 0], x)
    v = _pad_rows(jnp.pad(v, [(0, 0)] * 4 + [(0, Np - N)]))
    v = v.reshape(B * P, E, Fp, Np)
    v = apply_all(a1p, a2p, v)
    y = v
    for k in range(1, K):
        a1p, a2p = coeffs(k)
        v = apply_all(a1p, a2p, v)
        y = y + v
    y = jnp.sum(y, axis=1).reshape(B, P, Fp, Np)[:, :, :F, :N]
    return y if b is None else y + b
