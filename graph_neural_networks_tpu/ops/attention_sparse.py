"""Edge-list attention: SDDMM + segment softmax, O(E) memory.

The dense attention path (ops.filters.attention_gso) materializes the
B x P x E x N x N coefficient tensor — the reference's central memory
pathology for GAT at scale (SURVEY.md §2.9, graphML.py:640-737). This
module computes the same coefficients on the edge list, and provides the
edge-list versions of every attention functional (GAT aggregation, GCAT
K-tap filtering, per-hop edge-variant attention), so the whole GAT layer
family can run in O(E) via ``attentionMode='edge'`` on the architectures.

Orientation note (matches the reference exactly, graphML.py:713, 807):
score on edge (i row, j col) is e_ij = LeakyReLU(a2.Wx_i + a1.Wx_j),
softmax normalizes over each ROW i's edges, and the layer output at
node m aggregates over rows: y_m = sum_i s_im alpha_im Wx_i (the
row-vector right-multiplication `Wx @ (S * alpha)`).

Pure-JAX segment ops (XLA scatter/gather) — numerically identical to the
dense path on the S+I support.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from graph_neural_networks_tpu.ops import gso as gso_lib


@struct.dataclass
class EdgeList:
    """COO support of S+I (self-loops added, reference graphML.py:692),
    sorted by row. row/col: (nnz,) int32; s_val: (E, nnz) = S[e, row, col]
    (0 on added self-loops unless S had them). A jit-friendly pytree:
    n_nodes is static, so an EdgeList can ride inside architecture ctx."""
    row: jnp.ndarray
    col: jnp.ndarray
    s_val: jnp.ndarray
    n_nodes: int = struct.field(pytree_node=False, default=0)

    @property
    def n(self) -> int:
        """GSO duck-type surface (models.layers._gso_n)."""
        return self.n_nodes

    @property
    def n_edge_features(self) -> int:
        return self.s_val.shape[0]


def build_edge_list(S) -> EdgeList:
    """Host-side: extract the S+I support as a row-sorted COO edge list."""
    S = np.asarray(gso_lib.dense(S))
    E, N, _ = S.shape
    support = (np.abs(S).sum(0) + np.eye(N)) > 1e-9
    row, col = np.nonzero(support)         # sorted by row
    s_val = S[:, row, col]                 # (E, nnz)
    return EdgeList(jnp.asarray(row, jnp.int32), jnp.asarray(col, jnp.int32),
                    jnp.asarray(s_val, jnp.float32), N)


def edge_shift(v: jnp.ndarray, coeff: jnp.ndarray,
               edges: EdgeList) -> jnp.ndarray:
    """Edge-weighted graph shift: y[..., m] = sum_i v[..., i] c[..., (i,m)].

    v: (..., D, N) node values, coeff: (..., nnz) per-edge weights with
    matching leading dims; the message on edge k flows row[k] -> col[k].
    """
    msg = coeff[..., None, :] * v[..., edges.row]       # (..., D, nnz)
    agg = jax.ops.segment_sum(jnp.moveaxis(msg, -1, 0), edges.col,
                              num_segments=edges.n_nodes)
    return jnp.moveaxis(agg, 0, -1)


def attention_coefficients_edges(x, a, W, edges: EdgeList,
                                 negative_slope: float = 0.2):
    """Per-edge attention coefficients alpha (B, P, E, nnz) — the sparse
    equivalent of filters.attention_gso (same math on the S+I support);
    alpha on edge k equals the dense alpha[row[k], col[k]]."""
    P = a.shape[0]
    F = W.shape[2]
    Wx = jnp.einsum("pefg,bgn->bpefn", W, x)
    a1, a2 = a[..., :F], a[..., F:]
    a1Wx = jnp.einsum("pef,bpefn->bpen", a1, Wx)   # pairs with the column j
    a2Wx = jnp.einsum("pef,bpefn->bpen", a2, Wx)   # pairs with the row i
    # SDDMM: scores only on edges
    e = jax.nn.leaky_relu(a2Wx[..., edges.row] + a1Wx[..., edges.col],
                          negative_slope=negative_slope)  # B x P x E x nnz
    # segment softmax over each row's outgoing edges
    n = edges.n_nodes
    e_max = jax.ops.segment_max(jnp.moveaxis(e, -1, 0), edges.row,
                                num_segments=n)           # n x B x P x E
    e_exp = jnp.exp(e - jnp.moveaxis(e_max, 0, -1)[..., edges.row])
    denom = jax.ops.segment_sum(jnp.moveaxis(e_exp, -1, 0), edges.row,
                                num_segments=n)
    alpha = e_exp / jnp.moveaxis(denom, 0, -1)[..., edges.row]
    return alpha, Wx


def graph_attention_edges(x, a, W, edges: EdgeList,
                          negative_slope: float = 0.2):
    """GAT layer output via edge-list aggregation: the sparse equivalent of
    filters.graph_attention — y[..., m] = sum_i s_im alpha_im Wx_i
    (aggregation at the column per the reference's Wx @ (S * alpha)).
    Returns (B, P, F, N)."""
    alpha, Wx = attention_coefficients_edges(x, a, W, edges, negative_slope)
    y = edge_shift(Wx, edges.s_val[None, None] * alpha, edges)
    return jnp.sum(y, axis=2)              # sum over edge features E


def gat_lsigf_edges(h, x, a, W, edges: EdgeList, b=None,
                    negative_slope: float = 0.2):
    """K-tap LSIGF over the learned attention coefficients (GCAT), edge-
    list version of filters.gat_lsigf — the shift operator is alpha
    itself (reference graphML.py:876-879), never materialized as N x N.
    h: (E,K), x: (B,G,N), a: (P,E,2F), W: (P,E,F,G) -> y: (B,P,F,N)."""
    E, K = h.shape
    P, _, F, G = W.shape
    B, _, N = x.shape
    alpha, _ = attention_coefficients_edges(x, a, W, edges, negative_slope)
    # Same tap-layout quirk as the dense path (see filters.gat_lsigf for
    # the rationale; reference graphML.py:863-865).
    W_taps = jnp.transpose(W, (0, 3, 1, 2)).reshape(P, F, E, 1, G)
    hW = h[None, None, :, :, None] * W_taps               # P x F x E x K x G
    xe = jnp.broadcast_to(x[:, None, None], (B, P, E, G, N))
    zs = [xe]
    for _ in range(1, K):
        xe = edge_shift(xe, alpha, edges)
        zs.append(xe)
    z = jnp.stack(zs, axis=3)                             # B,P,E,K,G,N
    y = jnp.einsum("bpekgn,pfekg->bpfn", z, hW)
    return y if b is None else y + b


def gat_evgf_edges(x, a, W, edges: EdgeList, b=None,
                   negative_slope: float = 0.2):
    """Edge-variant filter where each hop's matrix is its own attention
    mechanism, edge-list version of filters.gat_evgf (reference
    graphML.py:897-969). a: (P,K,E,2F), W: (P,K,E,F,G) -> y: (B,P,F,N)."""
    P, K, E, F, G = W.shape
    alpha0, _ = attention_coefficients_edges(x, a[:, 0], W[:, 0], edges,
                                             negative_slope)
    W0x = jnp.einsum("pefg,bgn->bpefn", W[:, 0], x)
    sw = edges.s_val[None, None]
    W0x = edge_shift(W0x, sw * alpha0, edges)
    y = W0x
    for k in range(1, K):
        alpha_k, _ = attention_coefficients_edges(x, a[:, k], W[:, k], edges,
                                                  negative_slope)
        W0x = edge_shift(W0x, sw * alpha_k, edges)
        y = y + W0x
    y = jnp.sum(y, axis=2)
    return y if b is None else y + b
