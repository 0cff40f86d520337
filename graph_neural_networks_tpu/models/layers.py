"""Parameterized graph layers (flax.linen).

Behavior-compatible re-designs of the reference nn.Modules in
``alegnn/utils/graphML.py:1535-4209``. Differences by design:

  * No mutable ``addGSO`` protocol: the GSO (and any structure derived from
    it — neighbor tables, sparsity masks, eigenbases) is passed to
    ``__call__`` as explicit arrays, so one parameter set can run on any
    graph (the reference's changeGSO transferability contract, for free).
  * Structure tables are host-precomputed once (utils.graph) and traced as
    constants; the compute path is pure XLA.
  * All layers keep the reference's zero-pad/slice selection-pooling
    contract (pad x from Nin to N, filter, slice back; graphML.py:2125-2144)
    and its exact parameter shapes + uniform init ranges, so checkpoints
    are shape-compatible and activations are comparable layer by layer.

Signals: x is (B, F, N) (or (B, T, F, N) time-varying).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from graph_neural_networks_tpu.ops import filters
from graph_neural_networks_tpu.ops import gso as gso_lib


def _uniform(stdv: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)
    return init


def _uniform_range(lo: float, hi: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, lo, hi)
    return init


def _gso_n(S) -> int:
    if isinstance(S, gso_lib.Gso):
        return S.n
    n = getattr(S, "n", None)  # duck-typed GSOs (parallel.ShardedGso)
    if isinstance(n, int):
        return n
    return S.shape[-1]


def _pad_slice(fn):
    """Apply `fn` under the zero-pad/slice contract: pad last axis of x up
    to the GSO's N, run, slice back to the input's node count."""
    def wrapped(x, N):
        n_in = x.shape[-1]
        if n_in < N:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, N - n_in)]
            x = jnp.pad(x, pad)
        y = fn(x)
        if n_in < N:
            y = y[..., :n_in]
        return y
    return wrapped


# ===========================================================================
# Filtering layers
# ===========================================================================

class GraphFilter(nn.Module):
    """LSIGF layer (the graph-convolution workhorse).

    Params: weight (F,E,K,G), bias (F,1). Reference: graphML.py:2036-2155.
    """
    in_features: int
    out_features: int
    filter_taps: int
    edge_features: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, S):
        G, F, K, E = (self.in_features, self.out_features, self.filter_taps,
                      self.edge_features)
        stdv = 1.0 / np.sqrt(G * K)
        w = self.param("weight", _uniform(stdv), (F, E, K, G))
        b = (self.param("bias", _uniform(stdv), (F, 1))
             if self.use_bias else None)
        return _pad_slice(lambda xp: filters.lsigf(w, S, xp, b))(x, _gso_n(S))


class SpectralGF(nn.Module):
    """Spectral-domain LSI filter with optional spline interpolation.

    Params: weight (F,E,G,M). Call with the precomputed eigenbasis V/VH
    (E,N,N) and, when M < N, the spline kernel (E,N,M) built from the
    eigenvalues (utils.graph.spline_basis). Reference: graphML.py:2157-2315.
    """
    in_features: int
    out_features: int
    n_coeffs: int  # M
    edge_features: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, V, VH, spline_kernel=None):
        G, F, M, E = (self.in_features, self.out_features, self.n_coeffs,
                      self.edge_features)
        N = V.shape[-1]
        stdv = 1.0 / np.sqrt(G * M)
        w = self.param("weight", _uniform(stdv), (F, E, G, M))
        b = (self.param("bias", _uniform(stdv), (F, 1))
             if self.use_bias else None)
        if M == N:
            h = w
        else:
            assert spline_kernel is not None
            h = jnp.einsum("enm,fegm->fegn", spline_kernel, w)
        return _pad_slice(lambda xp: filters.spectral_gf(h, V, VH, xp, b))(x, N)


class NodeVariantGF(nn.Module):
    """Hybrid node-variant filter: M independent per-node taps, others copy
    their nearest selected node's tap (copy_nodes from
    utils.graph.nv_copy_nodes). Params: weight (F,E,K,G,M).
    Reference: graphML.py:2317-2509.
    """
    in_features: int
    out_features: int
    shift_taps: int   # K
    node_taps: int    # M
    edge_features: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, S, copy_nodes):
        G, F, K, M, E = (self.in_features, self.out_features, self.shift_taps,
                         self.node_taps, self.edge_features)
        stdv = 1.0 / np.sqrt(G * K * M)
        w = self.param("weight", _uniform(stdv), (F, E, K, G, M))
        b = (self.param("bias", _uniform(stdv), (F, 1))
             if self.use_bias else None)
        h = w[..., copy_nodes]  # F x E x K x G x N
        return _pad_slice(lambda xp: filters.nvgf(h, S, xp, b))(x, _gso_n(S))


class EdgeVariantGF(nn.Module):
    """(Hybrid) edge-variant filter via masked full matrices.

    Params: weightEV (F,E,K,G,N,N) masked by the graph sparsity pattern
    (+identity at k=0); when M < N also weightLSI (F,E,K,G) for the LSI
    part over non-selected nodes. Masks from utils.graph.ev_sparsity_pattern.
    Reference: graphML.py:2511-2712.
    """
    in_features: int
    out_features: int
    shift_taps: int
    selected_nodes: int  # M
    n_nodes: int         # N (param shapes depend on it)
    edge_features: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, S, identity_mask, shift_mask):
        G, F, K, M, N, E = (self.in_features, self.out_features,
                            self.shift_taps, self.selected_nodes,
                            self.n_nodes, self.edge_features)
        stdv = 1.0 / np.sqrt(G * K * N)
        if isinstance(shift_mask, (tuple, list)):
            # edge-list parameterization: weights live on the support edges
            # (O(nnz) params instead of O(N^2); SURVEY §7). identity_mask
            # is the (E, N) hybrid diagonal; shift_mask = (row, col,
            # valid (E, nnz)).
            row, col, valid = shift_mask
            b = (self.param("bias", _uniform(stdv), (F, 1))
                 if self.use_bias else None)
            w0 = self.param("weightEV0", _uniform(stdv), (F, E, G, N)) \
                * identity_mask[None, :, None, :]
            wk = None
            if K > 1:
                nnz = row.shape[0]
                wk = self.param("weightEVk", _uniform(stdv),
                                (F, E, K - 1, G, nnz)) \
                    * valid[None, :, None, None, :]

            def run_e(xp):
                u = filters.evgf_edges(w0, wk, row, col, xp, b)
                if M < N:
                    wLSI = self.param("weightLSI", _uniform(stdv),
                                      (F, E, K, G))
                    u = u + filters.lsigf(wLSI, S, xp, b)
                return u
            return _pad_slice(run_e)(x, N)
        wEV = self.param("weightEV", _uniform(stdv), (F, E, K, G, N, N))
        b = (self.param("bias", _uniform(stdv), (F, 1))
             if self.use_bias else None)
        # mask: identity at k=0, graph support for k>=1 (hybrid-masked)
        mask = jnp.concatenate(
            [identity_mask[None, :, None, None],
             jnp.broadcast_to(shift_mask[None, :, None, None],
                              (1, E, K - 1, 1, N, N))] if K > 1 else
            [identity_mask[None, :, None, None]], axis=2)
        Phi = wEV * mask

        def run(xp):
            u = filters.evgf(Phi, xp, b)
            if M < N:
                wLSI = self.param("weightLSI", _uniform(stdv), (F, E, K, G))
                u = u + filters.lsigf(wLSI, S, xp, b)
            return u
        return _pad_slice(run, )(x, N)


class GraphFilterARMA(nn.Module):
    """ARMA rational filter layer (Jacobi iterations).

    Params: inverseWeight/directWeight (F,E,P,G), filterWeight (F,E,K,G);
    inverseWeight initialized off (1+1/stdv, 1+2/stdv) to keep Sbar
    invertible. Reference: graphML.py:2714-2847.
    """
    in_features: int
    out_features: int
    denominator_taps: int  # P
    residue_taps: int      # K
    edge_features: int = 1
    use_bias: bool = True
    t_max: int = 5

    @nn.compact
    def __call__(self, x, S):
        G, F, P, K, E = (self.in_features, self.out_features,
                         self.denominator_taps, self.residue_taps,
                         self.edge_features)
        stdv = 1.0 / np.sqrt(G * P)
        psi = self.param("inverseWeight",
                         _uniform_range(1 + 1 / stdv, 1 + 2 / stdv),
                         (F, E, P, G))
        varphi = self.param("directWeight", _uniform(stdv), (F, E, P, G))
        phi = self.param("filterWeight", _uniform(stdv), (F, E, K, G))
        b = (self.param("bias", _uniform(stdv), (F, 1))
             if self.use_bias else None)
        return _pad_slice(
            lambda xp: filters.jarma(psi, varphi, phi, S, xp, b,
                                     t_max=self.t_max))(x, _gso_n(S))


# ===========================================================================
# Attention layers
# ===========================================================================

def _heads_out(y, nonlinearity, concatenate):
    """Multi-head output: concat (nonlinearity first) or average heads
    (reference graphML.py:2950-2963)."""
    B, P, F, N = y.shape
    if concatenate:
        y = nonlinearity(y)
        return y.transpose(0, 3, 1, 2).reshape(B, N, P * F).transpose(0, 2, 1)
    return nonlinearity(jnp.mean(y, axis=1))


class GraphAttentional(nn.Module):
    """GAT layer. Params: mixer (K,E,2F), weight (K,E,F,G) with K = heads.
    Reference: graphML.py:2849-2977."""
    in_features: int
    out_features: int
    attention_heads: int
    edge_features: int = 1
    nonlinearity: Callable = jax.nn.relu
    concatenate: bool = True

    @nn.compact
    def __call__(self, x, S):
        G, F, K, E = (self.in_features, self.out_features,
                      self.attention_heads, self.edge_features)
        stdv = 1.0 / np.sqrt(G * K)
        mixer = self.param("mixer", _uniform(stdv), (K, E, 2 * F))
        weight = self.param("weight", _uniform(stdv), (K, E, F, G))

        def run(xp):
            y = filters.graph_attention(xp, mixer, weight, S)
            return _heads_out(y, self.nonlinearity, self.concatenate)
        return _pad_slice(run)(x, _gso_n(S))


class GraphFilterAttentional(nn.Module):
    """GCAT layer: K-tap LSIGF over the learned attention GSO.
    Params: mixer (P,E,2F), weight (P,E,F,G), filterWeight (E,K).
    Reference: graphML.py:2979-3124."""
    in_features: int
    out_features: int
    filter_taps: int
    attention_heads: int
    edge_features: int = 1
    use_bias: bool = True
    nonlinearity: Callable = jax.nn.relu
    concatenate: bool = True

    @nn.compact
    def __call__(self, x, S):
        G, F, K, P, E = (self.in_features, self.out_features,
                         self.filter_taps, self.attention_heads,
                         self.edge_features)
        stdv = 1.0 / np.sqrt(G * P)
        mixer = self.param("mixer", _uniform(stdv), (P, E, 2 * F))
        weight = self.param("weight", _uniform(stdv), (P, E, F, G))
        filter_weight = self.param("filterWeight", _uniform(stdv), (E, K))
        b = (self.param("bias", _uniform(stdv), (F, 1))
             if self.use_bias else None)

        def run(xp):
            y = filters.gat_lsigf(filter_weight, xp, mixer, weight, S, b)
            return _heads_out(y, self.nonlinearity, self.concatenate)
        return _pad_slice(run)(x, _gso_n(S))


class EdgeVariantAttentional(nn.Module):
    """Edge-variant filter parameterized by per-hop attention mechanisms.
    Params: mixer (P,K,E,2F), weight (P,K,E,F,G).
    Reference: graphML.py:3126-3270. (The reference's concatenate path
    reshapes with K*F — a latent P/K mix-up; we use the correct P*F.)"""
    in_features: int
    out_features: int
    filter_taps: int
    attention_heads: int
    edge_features: int = 1
    use_bias: bool = True
    nonlinearity: Callable = jax.nn.relu
    concatenate: bool = True

    @nn.compact
    def __call__(self, x, S):
        G, F, K, P, E = (self.in_features, self.out_features,
                         self.filter_taps, self.attention_heads,
                         self.edge_features)
        stdv = 1.0 / np.sqrt(G * K)
        mixer = self.param("mixer", _uniform(stdv), (P, K, E, 2 * F))
        weight = self.param("weight", _uniform(stdv), (P, K, E, F, G))
        b = (self.param("bias", _uniform(stdv), (F, 1))
             if self.use_bias else None)

        def run(xp):
            y = filters.gat_evgf(xp, mixer, weight, S, b)
            return _heads_out(y, self.nonlinearity, self.concatenate)
        return _pad_slice(run)(x, _gso_n(S))


# ===========================================================================
# Time-varying (delayed batch) layers
# ===========================================================================

class GraphFilterDB(nn.Module):
    """Delayed time-varying graph filter; GSO is (B,T,E,N,N) per call.
    Params as GraphFilter. Reference: graphML.py:3278-3393."""
    in_features: int
    out_features: int
    filter_taps: int
    edge_features: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, S):
        G, F, K, E = (self.in_features, self.out_features, self.filter_taps,
                      self.edge_features)
        stdv = 1.0 / np.sqrt(G * K)
        w = self.param("weight", _uniform(stdv), (F, E, K, G))
        b = (self.param("bias", _uniform(stdv), (F, 1))
             if self.use_bias else None)
        return filters.lsigf_db(w, S, x, b)


class HiddenStateDB(nn.Module):
    """GRNN hidden-state layer on a time-varying batch GSO.
    Params: aWeights (H,E,K,F), bWeights (H,E,K,H), x/zBias (H,1).
    Returns (z, z_T). Reference: graphML.py:3395-3538."""
    signal_features: int
    hidden_features: int
    filter_taps: int
    nonlinearity: Callable = jnp.tanh
    edge_features: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, z0, S):
        F, H, K, E = (self.signal_features, self.hidden_features,
                      self.filter_taps, self.edge_features)
        stdv = 1.0 / np.sqrt(F * K)
        a = self.param("aWeights", _uniform(stdv), (H, E, K, F))
        bt = self.param("bWeights", _uniform(stdv), (H, E, K, H))
        xb = self.param("xBias", _uniform(stdv), (H, 1)) if self.use_bias else None
        zb = self.param("zBias", _uniform(stdv), (H, 1)) if self.use_bias else None
        z = filters.grnn_db(a, bt, S, x, z0, self.nonlinearity,
                            x_bias=xb, z_bias=zb)
        return z, z[:, -1:]


class HiddenState(nn.Module):
    """Static-GSO GRNN hidden-state layer (ungated GatedGRNN).
    Reference: graphML.py:3540-3681."""
    signal_features: int
    hidden_features: int
    filter_taps: int
    nonlinearity: Callable = jnp.tanh
    edge_features: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, z0, S):
        F, H, K, E = (self.signal_features, self.hidden_features,
                      self.filter_taps, self.edge_features)
        stdv = 1.0 / np.sqrt(F * K)
        a = self.param("aWeights", _uniform(stdv), (H, E, K, F))
        bt = self.param("bWeights", _uniform(stdv), (H, E, K, H))
        xb = self.param("xBias", _uniform(stdv), (H, 1)) if self.use_bias else None
        zb = self.param("zBias", _uniform(stdv), (H, 1)) if self.use_bias else None
        z = filters.gated_grnn(a, bt, S, x, z0, self.nonlinearity,
                               x_bias=xb, z_bias=zb)
        return z, z[:, -1:]


class _GatedHiddenStateBase(nn.Module):
    """Common scaffolding for the {time,node,edge}-gated hidden states:
    main a/b taps + two internal ungated gate GRNNs whose outputs are mapped
    to gates by a mode-specific head. Reference: graphML.py:3683-4209.

    Divergence from the reference (documented): the reference creates its
    gate heads inside addGSO *after* the optimizer collected parameters, so
    they silently never train (SURVEY.md §2.3); here they are proper params.
    """
    signal_features: int
    hidden_features: int
    filter_taps: int
    nonlinearity: Callable = jnp.tanh
    edge_features: int = 1
    use_bias: bool = True

    def _main_taps(self):
        F, H, K, E = (self.signal_features, self.hidden_features,
                      self.filter_taps, self.edge_features)
        stdv = 1.0 / np.sqrt(F * K)
        a = self.param("aWeights", _uniform(stdv), (H, E, K, F))
        bt = self.param("bWeights", _uniform(stdv), (H, E, K, H))
        xb = self.param("xBias", _uniform(stdv), (H, 1)) if self.use_bias else None
        zb = self.param("zBias", _uniform(stdv), (H, 1)) if self.use_bias else None
        return a, bt, xb, zb

    def _gate_states(self, x, z0, S):
        zhat, _ = HiddenState(self.signal_features, self.hidden_features,
                              self.filter_taps, use_bias=self.use_bias,
                              name="inputGateGRNN")(x, z0, S)
        zcheck, _ = HiddenState(self.signal_features, self.hidden_features,
                                self.filter_taps, use_bias=self.use_bias,
                                name="forgetGateGRNN")(x, z0, S)
        return zhat, zcheck


class TimeGatedHiddenState(_GatedHiddenStateBase):
    """Scalar-per-(b,t) gates: q = sigmoid(Dense(flatten(z_gate))).
    Reference: graphML.py:3683-3855."""

    @nn.compact
    def __call__(self, x, z0, S):
        B, T, _, N = x.shape
        H = self.hidden_features
        a, bt, xb, zb = self._main_taps()
        zhat, zcheck = self._gate_states(x, z0, S)
        q_hat = jax.nn.sigmoid(
            nn.Dense(1, use_bias=self.use_bias, name="inputGateFC")(
                zhat.reshape(B, T, H * N)))[:, :, None]      # B x T x 1 x 1
        q_check = jax.nn.sigmoid(
            nn.Dense(1, use_bias=self.use_bias, name="forgetGateFC")(
                zcheck.reshape(B, T, H * N)))[:, :, None]
        z = filters.gated_grnn(a, bt, S, x, z0, self.nonlinearity,
                               q_hat=q_hat, q_check=q_check,
                               x_bias=xb, z_bias=zb)
        return z, z[:, -1:]


class NodeGatedHiddenState(_GatedHiddenStateBase):
    """Per-node gates: q = sigmoid(GraphFilter(H->1)(z_gate)).
    Reference: graphML.py:3857-4031."""

    @nn.compact
    def __call__(self, x, z0, S):
        B, T, _, N = x.shape
        H = self.hidden_features
        a, bt, xb, zb = self._main_taps()
        zhat, zcheck = self._gate_states(x, z0, S)
        q_hat = jax.nn.sigmoid(
            GraphFilter(H, 1, self.filter_taps, use_bias=self.use_bias,
                        name="inputGateGraphFilter")(
                zhat.reshape(B * T, H, N), S)).reshape(B, T, 1, N)
        q_check = jax.nn.sigmoid(
            GraphFilter(H, 1, self.filter_taps, use_bias=self.use_bias,
                        name="forgetGateGraphFilter")(
                zcheck.reshape(B * T, H, N), S)).reshape(B, T, 1, N)
        z = filters.gated_grnn(a, bt, S, x, z0, self.nonlinearity,
                               q_hat=q_hat, q_check=q_check,
                               x_bias=xb, z_bias=zb)
        return z, z[:, -1:]


class EdgeGatedHiddenState(_GatedHiddenStateBase):
    """Per-edge gates: q = attention GSO of a single-head GAT over the gate
    state (gates the GSO itself inside the filter).
    Reference: graphML.py:4033-4209."""

    @nn.compact
    def __call__(self, x, z0, S):
        B, T, _, N = x.shape
        H = self.hidden_features
        E = self.edge_features
        a, bt, xb, zb = self._main_taps()
        zhat, zcheck = self._gate_states(x, z0, S)
        stdv = 1.0 / np.sqrt(H * 1)
        mixer_i = self.param("inputGateMixer", _uniform(stdv), (1, E, 2))
        weight_i = self.param("inputGateWeight", _uniform(stdv), (1, E, 1, H))
        mixer_f = self.param("forgetGateMixer", _uniform(stdv), (1, E, 2))
        weight_f = self.param("forgetGateWeight", _uniform(stdv), (1, E, 1, H))
        from graph_neural_networks_tpu.ops import attention_sparse as asp
        if isinstance(S, asp.EdgeList):
            # O(nnz) gates: attention coefficients on the support edges
            # only, consumed by the per-edge gated SpMM in gated_grnn
            q_hat, _ = asp.attention_coefficients_edges(
                zhat.reshape(B * T, H, N), mixer_i, weight_i, S)
            q_check, _ = asp.attention_coefficients_edges(
                zcheck.reshape(B * T, H, N), mixer_f, weight_f, S)
            q_hat = q_hat[:, 0, 0].reshape(B, T, 1, -1)
            q_check = q_check[:, 0, 0].reshape(B, T, 1, -1)
            z = filters.gated_grnn(a, bt, S, x, z0, self.nonlinearity,
                                   q_hat=q_hat, q_check=q_check,
                                   x_bias=xb, z_bias=zb, edge_gated=True)
            return z, z[:, -1:]
        q_hat = filters.attention_gso(
            zhat.reshape(B * T, H, N), mixer_i, weight_i, S)[:, 0, 0]
        q_check = filters.attention_gso(
            zcheck.reshape(B * T, H, N), mixer_f, weight_f, S)[:, 0, 0]
        q_hat = q_hat.reshape(B, T, 1, N, N)
        q_check = q_check.reshape(B, T, 1, N, N)
        z = filters.gated_grnn(a, bt, S, x, z0, self.nonlinearity,
                               q_hat=q_hat, q_check=q_check,
                               x_bias=xb, z_bias=zb)
        return z, z[:, -1:]


# ===========================================================================
# Local activations
# ===========================================================================

class MaxLocalActivation(nn.Module):
    """Localized max activation: weighted sum of k-hop neighborhood maxima,
    k = 0..K. Params: weight (1, K+1). Neighbor tables nbh[k] (N, max_k)
    are host-precomputed (self-padded, so pads are max-neutral).
    Reference: graphML.py:1535-1684."""
    n_hops: int  # K

    @nn.compact
    def __call__(self, x, nbh_tables: Sequence[jnp.ndarray]):
        K = self.n_hops
        assert len(nbh_tables) == K
        stdv = 1.0 / np.sqrt(K)
        w = self.param("weight", _uniform(stdv), (1, K + 1))
        feats = [x]
        for k in range(K):
            gathered = x[..., nbh_tables[k]]          # B x F x N x max_k
            feats.append(jnp.max(gathered, axis=-1))
        xK = jnp.stack(feats, axis=-1)                # B x F x N x (K+1)
        return jnp.einsum("bfnk,k->bfn", xK, w[0])


class MedianLocalActivation(nn.Module):
    """Localized median activation. The reference computes exact per-node
    medians with a python loop (graphML.py:1772-1798); here we gather the
    self-padded table, mask pads to +inf, sort, and pick the lower median
    at index (count-1)//2 — identical values, one fused XLA program.
    Params: weight (1, K+1)."""
    n_hops: int

    @nn.compact
    def __call__(self, x, nbh_tables: Sequence[jnp.ndarray],
                 nbh_counts: Sequence[jnp.ndarray]):
        K = self.n_hops
        stdv = 1.0 / np.sqrt(K)
        w = self.param("weight", _uniform(stdv), (1, K + 1))
        feats = [x]
        for k in range(K):
            tbl = nbh_tables[k]                       # N x max_k (self-padded)
            counts = nbh_counts[k]                    # N
            gathered = x[..., tbl]                    # B x F x N x max_k
            slot = jnp.arange(tbl.shape[1])
            valid = slot[None, :] < counts[:, None]   # N x max_k
            masked = jnp.where(valid, gathered, jnp.inf)
            srt = jnp.sort(masked, axis=-1)
            med_idx = (counts - 1) // 2               # lower median
            med = jnp.take_along_axis(
                srt, jnp.broadcast_to(med_idx[:, None],
                                      tbl.shape)[None, None], axis=-1)[..., 0]
            feats.append(med)
        xK = jnp.stack(feats, axis=-1)
        return jnp.einsum("bfnk,k->bfn", xK, w[0])


class NoActivation(nn.Module):
    """Identity with the activation interface (graphML.py:1816-1842)."""

    @nn.compact
    def __call__(self, x, *_, **__):
        return x


# ===========================================================================
# Pooling
# ===========================================================================

class NoPool(nn.Module):
    """Identity with the pooling interface (graphML.py:1850-1888)."""
    n_input_nodes: int
    n_output_nodes: int
    n_hops: int = 0

    @nn.compact
    def __call__(self, x, nbh_table=None):
        return x


class MaxPoolLocal(nn.Module):
    """Selection pooling: gather each kept node's nHops-neighborhood
    (restricted to kept nodes) and take the max. nbh_table is the
    host-precomputed (nOut, max_nbr) self-padded table.
    Reference: graphML.py:1890-2028."""
    n_input_nodes: int
    n_output_nodes: int
    n_hops: int

    @nn.compact
    def __call__(self, x, nbh_table):
        assert x.shape[-1] == self.n_input_nodes
        gathered = x[..., nbh_table]                  # B x F x nOut x max_nbr
        return jnp.max(gathered, axis=-1)
