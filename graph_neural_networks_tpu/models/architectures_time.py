"""Time-varying architectures: GSO passed per forward call as (B,T,E,N,N)
with unit-delay information propagation. Re-designs of the reference's
``alegnn/modules/architecturesTime.py`` (LocalGNN_DB :33-272,
GraphRecurrentNN_DB :273-528, AggregationGNN_DB :529-782).

These are the decentralized-controller models (flocking): at time t a node
only uses information that has had time to arrive over the graph, so every
k-th filter tap applies k time-delayed shifts (ops.filters.lsigf_db).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from graph_neural_networks_tpu.models import layers as gll
from graph_neural_networks_tpu.models.architectures import (
    MLP, _as_tuple, resolve_activation)
from graph_neural_networks_tpu.ops import filters

__all__ = ["LocalGNN_DB", "GraphRecurrentNN_DB", "AggregationGNN_DB"]


def _normalize_S(S):
    if isinstance(S, filters.ell_lib.EllGso):
        return S                  # O(N·deg) padded-neighbor layout
    S = jnp.asarray(S, jnp.float32)
    if S.ndim == 4:               # B x T x N x N -> add E
        S = S[:, :, None]
    assert S.ndim == 5
    return S


class _LocalDBCore(nn.Module):
    """(GraphFilterDB -> sigma) x L + per-node readout."""
    dims: tuple
    taps: tuple
    sigma: Callable
    readout_dims: tuple
    use_bias: bool
    edge_features: int

    @nn.compact
    def __call__(self, x, S):
        L = len(self.taps)
        for l in range(L):
            x = gll.GraphFilterDB(self.dims[l], self.dims[l + 1],
                                  self.taps[l], self.edge_features,
                                  self.use_bias)(x, S)
            x = self.sigma(x)
        y_gfl = x
        y = x.transpose(0, 1, 3, 2)
        y = MLP(self.readout_dims, self.sigma, self.use_bias,
                name="Readout")(y)
        return y.transpose(0, 1, 3, 2), y_gfl


class _TimeArchBase:
    def apply(self, params, x, S, **kw):
        return self.split_forward(params, x, S, **kw)[0]

    def __call__(self, params, x, S, **kw):
        return self.apply(params, x, S, **kw)

    def single_node_forward(self, params, x, S, nodes, **kw):
        y = self.apply(params, x, S, **kw)            # B x T x dim x N
        B = y.shape[0]
        if isinstance(nodes, int):
            nodes = [nodes] * B
        idx = jnp.asarray([int(n) for n in nodes])
        return y[jnp.arange(B), :, :, idx]

    def parameter_count(self, params) -> int:
        return sum(p.size for p in jax.tree_util.tree_leaves(params))


class LocalGNN_DB(_TimeArchBase):
    """Stack of delayed graph filters + per-node readout; forward(x, S).
    Reference: architecturesTime.py:33-272."""

    def __init__(self, dimNodeSignals, nFilterTaps, bias, nonlinearity,
                 dimReadout, dimEdgeFeatures):
        assert len(dimNodeSignals) == len(nFilterTaps) + 1
        self.E = dimEdgeFeatures
        self.F = list(dimNodeSignals)
        self.core = _LocalDBCore(
            dims=_as_tuple(dimNodeSignals), taps=_as_tuple(nFilterTaps),
            sigma=resolve_activation(nonlinearity),
            readout_dims=_as_tuple(dimReadout), use_bias=bias,
            edge_features=dimEdgeFeatures)
        # finite causal memory: the last output depends on at most
        # sum(K_l - 1) + 1 past steps (chained delayed taps)
        self.causal_window = sum(k - 1 for k in nFilterTaps) + 1
        self._jit_apply = jax.jit(self.core.apply)

    def init(self, key, N: int = 8, T: int = 3):
        x = jnp.zeros((1, T, self.F[0], N))
        S = jnp.zeros((1, T, self.E, N, N))
        return self.core.init(key, x, S)

    def split_forward(self, params, x, S):
        return self._jit_apply(params, jnp.asarray(x, jnp.float32),
                               _normalize_S(S))


class _GRNNDBCore(nn.Module):
    hidden: int
    dim_in: int
    dim_out: int
    taps: tuple
    sigma_hidden: Callable
    rho_output: Callable
    sigma_readout: Callable
    readout_dims: tuple
    use_bias: bool
    edge_features: int

    @nn.compact
    def __call__(self, x, z0, S):
        z, _ = gll.HiddenStateDB(self.dim_in, self.hidden, self.taps[0],
                                 nonlinearity=self.sigma_hidden,
                                 edge_features=self.edge_features,
                                 use_bias=self.use_bias,
                                 name="hiddenState")(x, z0, S)
        y = gll.GraphFilterDB(self.hidden, self.dim_out, self.taps[1],
                              self.edge_features, self.use_bias,
                              name="outputState")(z, S)
        y_out = self.rho_output(y)
        y = y_out.transpose(0, 1, 3, 2)
        y = MLP(self.readout_dims, self.sigma_readout, self.use_bias,
                name="Readout")(y)
        return y.transpose(0, 1, 3, 2), y_out


class GraphRecurrentNN_DB(_TimeArchBase):
    """GRNN over a time-varying batch GSO; z0 ~ N(0,1) per forward.
    Reference: architecturesTime.py:273-528."""

    def __init__(self, dimInputSignals, dimOutputSignals, dimHiddenSignals,
                 nFilterTaps, bias, nonlinearityHidden, nonlinearityOutput,
                 nonlinearityReadout, dimReadout, dimEdgeFeatures):
        self.E = dimEdgeFeatures
        self.F = dimInputSignals
        self.H = dimHiddenSignals
        self.core = _GRNNDBCore(
            hidden=dimHiddenSignals, dim_in=dimInputSignals,
            dim_out=dimOutputSignals, taps=_as_tuple(nFilterTaps),
            sigma_hidden=resolve_activation(nonlinearityHidden),
            rho_output=resolve_activation(nonlinearityOutput),
            sigma_readout=resolve_activation(nonlinearityReadout),
            readout_dims=_as_tuple(dimReadout), use_bias=bias,
            edge_features=dimEdgeFeatures)
        self._jit_apply = jax.jit(self.core.apply)

    def init(self, key, N: int = 8, T: int = 3):
        x = jnp.zeros((1, T, self.F, N))
        z0 = jnp.zeros((1, self.H, N))
        S = jnp.zeros((1, T, self.E, N, N))
        return self.core.init(key, x, z0, S)

    def split_forward(self, params, x, S, rng=None, z0=None):
        x = jnp.asarray(x, jnp.float32)
        S = _normalize_S(S)
        B, T, _, N = x.shape
        if z0 is None:
            rng = jax.random.PRNGKey(0) if rng is None else rng
            z0 = jax.random.normal(rng, (B, self.H, N))
        return self._jit_apply(params, x, z0, S)


class _AggDBCore(nn.Module):
    """Delayed aggregation sequence + Conv1d stack + per-node readout.
    Reference: architecturesTime.py:690-782."""
    dims: tuple
    taps: tuple
    n_seq: tuple
    alpha: tuple
    sigma: Callable
    readout_dims: tuple
    use_bias: bool
    edge_features: int
    n_exchanges: int

    @nn.compact
    def __call__(self, x, S):
        B, T, F0, N = x.shape
        E = self.edge_features
        if isinstance(S, filters.ell_lib.EllGso):
            # node-major throughout (the TPU-fast ELL gather layout);
            # the layer's own consumption order is node-major anyway
            xe = jnp.broadcast_to(
                jnp.swapaxes(x, -1, -2)[..., None, :], (B, T, N, E, F0))
            zs = [xe]
            for _ in range(1, self.n_exchanges + 1):
                xe = jnp.concatenate(
                    [jnp.zeros_like(xe[:, :1]), xe[:, :-1]], axis=1)
                xe = S.db_shift_rows(xe)
                zs.append(xe)
            z = jnp.stack(zs, axis=3)      # B x T x N x (nExch+1) x E x F
            z = jnp.sum(z, axis=4)         # B x T x N x (nExch+1) x F
            z = jnp.swapaxes(z, -1, -2)    # B x T x N x F x (nExch+1)
        else:
            xe = jnp.broadcast_to(x[:, :, None], (B, T, E, F0, N))
            zs = [xe]
            for _ in range(1, self.n_exchanges + 1):
                xe = jnp.concatenate(
                    [jnp.zeros_like(xe[:, :1]), xe[:, :-1]], axis=1)
                xe = filters.db_graph_shift(xe, S)
                zs.append(xe)
            z = jnp.stack(zs, axis=2)      # B x T x (nExch+1) x E x F x N
            z = jnp.sum(z, axis=3)         # B x T x (nExch+1) x F x N
            z = z.transpose(0, 1, 4, 3, 2)  # B x T x N x F x (nExch+1)
        z = z.reshape(B * T * N, F0, self.n_exchanges + 1)
        for l in range(len(self.taps)):
            z = z.transpose(0, 2, 1)
            z = nn.Conv(self.dims[l + 1], (self.taps[l],), padding="VALID",
                        use_bias=self.use_bias,
                        kernel_init=nn.initializers.variance_scaling(
                            1 / 3, "fan_in", "uniform"))(z)
            z = z.transpose(0, 2, 1)
            z = self.sigma(z)
            if self.alpha[l] > 1:
                Lw = z.shape[-1]
                keep = (Lw // self.alpha[l]) * self.alpha[l]
                z = jnp.max(z[..., :keep].reshape(z.shape[0], z.shape[1],
                                                  keep // self.alpha[l],
                                                  self.alpha[l]), axis=-1)
        y = z.reshape(B * T * N, self.dims[-1] * self.n_seq[-1])
        y = MLP(self.readout_dims, self.sigma, self.use_bias,
                name="Readout")(y)
        y = y.reshape(B, T, N, -1).transpose(0, 1, 3, 2)
        return y, y


class AggregationGNN_DB(_TimeArchBase):
    """Aggregation GNN on delayed sequences, built in-forward (the GSO
    changes every step). Reference: architecturesTime.py:529-782."""

    def __init__(self, dimFeatures, nFilterTaps, bias, nonlinearity,
                 poolingFunction, poolingSize, dimReadout, dimEdgeFeatures,
                 nExchanges):
        assert len(dimFeatures) == len(nFilterTaps) + 1
        self.E = dimEdgeFeatures
        self.F = list(dimFeatures)
        self.n_exchanges = nExchanges
        L = len(nFilterTaps)
        n_seq = [nExchanges + 1]
        for l in range(L):
            out_conv = n_seq[l] - (nFilterTaps[l] - 1)
            n_seq.append(int((out_conv - (poolingSize[l] - 1) - 1)
                             / poolingSize[l] + 1))
        self.core = _AggDBCore(
            dims=_as_tuple(dimFeatures), taps=_as_tuple(nFilterTaps),
            n_seq=tuple(n_seq), alpha=_as_tuple(poolingSize),
            sigma=resolve_activation(nonlinearity),
            readout_dims=_as_tuple(dimReadout), use_bias=bias,
            edge_features=dimEdgeFeatures, n_exchanges=nExchanges)
        self.causal_window = nExchanges + 1
        self._jit_apply = jax.jit(self.core.apply)

    def init(self, key, N: int = 8, T: int = 3):
        x = jnp.zeros((1, T, self.F[0], N))
        S = jnp.zeros((1, T, self.E, N, N))
        return self.core.init(key, x, S)

    def split_forward(self, params, x, S):
        return self._jit_apply(params, jnp.asarray(x, jnp.float32),
                               _normalize_S(S))
