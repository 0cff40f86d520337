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
    S = jnp.asarray(S)
    if S.dtype not in (jnp.bfloat16, jnp.float16, jnp.float32):
        S = S.astype(jnp.float32)
    if S.ndim == 4:               # B x T x N x N -> add E
        S = S[:, :, None]
    assert S.ndim == 5
    return S


def _as_compute(x):
    """f64/int inputs compute in f32; bf16/f16 inputs are preserved
    (mixed-precision training casts batches before the forward)."""
    x = jnp.asarray(x)
    if x.dtype not in (jnp.bfloat16, jnp.float16, jnp.float32):
        x = x.astype(jnp.float32)
    return x


# -- step-mode pieces (closed-loop rollouts) --------------------------------
#
# The DB family is causal by construction: every tap chain is the
# recurrence z_k(t) = S(t)·z_{k-1}(t-1). A closed-loop rollout therefore
# never needs to re-run the filter over a history window — it can carry
# the (K-1)-deep node-major registers across environment steps and do ONE
# graph shift per step (the TPU gather is row-latency bound and flat in
# row width, so this is ~window/1 fewer gathered rows than the windowed
# re-forward). rollout_init/rollout_step below are exact: step outputs
# equal apply() on the full (zero-padded) history at each t.
# Replaces: reference computeTrajectory's full re-forward per step
# (dataTools.py:3166-3340 calling architecturesTime.py:205).

# the register recurrence itself lives in ops.filters (shared with the
# scan formulation of lsigf_db, so the two implementations cannot
# drift); rollout_step = ONE wide shift of rollout_payload(state) +
# rollout_step_shifted (the post-shift math), so the grid env's fused
# window pass can supply the shifted payload directly
_step_shift_rows = filters.step_shift_rows


def _readout_apply(p, z, sigma):
    """Per-node readout MLP on node-major z (..., F), reading the
    TorchDense_i kernels from the flax param subtree (nonlinearity
    between layers, never after the last — architectures.MLP)."""
    i = 0
    while f"TorchDense_{i}" in p:
        dp = p[f"TorchDense_{i}"]
        if i > 0:
            z = sigma(z)
        z = z @ dp["kernel"]
        if "bias" in dp:
            z = z + dp["bias"]
        i += 1
    return z


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
        self.taps = list(nFilterTaps)
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
        return self._jit_apply(params, _as_compute(x), _normalize_S(S))

    # -- step mode (closed-loop rollouts) -----------------------------------
    def rollout_init(self, params, B: int, N: int, rng=None,
                     dtype=jnp.float32):
        """Zeroed per-layer tap registers — equivalent to an all-zero
        history, i.e. the window rollout's left padding."""
        del params, rng
        return tuple(jnp.zeros((B, N, self.E, k - 1, g), dtype)
                     for k, g in zip(self.taps, self.F[:-1]))

    @property
    def payload_width(self) -> int:
        """Feature width of rollout_payload (excl. the E axis)."""
        return sum((k - 1) * g for k, g in zip(self.taps, self.F[:-1]))

    def rollout_payload(self, state):
        """Node-major concat (B,N,E,P) of every register the next step
        must shift by S_t (P = sum_l (K_l-1)·G_l). All layers shift by
        the SAME per-step GSO, so one wide shift (or the grid env's
        fused window pass carrying this as a table payload) replaces
        the per-layer shifts exactly."""
        B, N, E = state[0].shape[:3]
        return jnp.concatenate(
            [s.reshape(B, N, E, -1) for s in state], axis=-1)

    def rollout_step_shifted(self, params, state, x_t, shifted):
        """rollout_step given the ALREADY-shifted payload
        (S_t @ rollout_payload(state), same (B,N,E,P) layout) — the
        interface the fused grid environment feeds."""
        p = params["params"]
        h = jnp.swapaxes(jnp.asarray(x_t, jnp.float32), -1, -2)
        B, N, E = state[0].shape[:3]
        shifted = shifted.reshape(B, N, E, -1)
        new_state = []
        off = 0
        for l in range(len(self.taps)):
            lp = p[f"GraphFilterDB_{l}"]
            K, G = self.taps[l], self.F[l]
            wl = (K - 1) * G
            sl = shifted[..., off:off + wl].reshape(B, N, E, K - 1, G)
            off += wl
            reg, y = filters.tap_register_combine(
                lp["weight"], lp.get("bias"), sl, h)
            new_state.append(reg)
            h = self.core.sigma(y)
        z = _readout_apply(p["Readout"], h, self.core.sigma)
        return tuple(new_state), jnp.swapaxes(z, -1, -2)

    def rollout_step(self, params, state, x_t, S_t):
        """One causal step: (state', y_t (B,dimReadout[-1],N)) with y_t
        exactly equal to apply() on the full history at time t.
        x_t: (B,F0,N); S_t: EllGso with leading (B,) or dense
        (B,N,N)/(B,E,N,N). All layer registers are shifted in ONE wide
        node-major shift (bit-exact vs per-layer shifts — per-feature
        math is independent), then combined per layer."""
        pay = self.rollout_payload(state)
        shifted = (_step_shift_rows(pay, S_t) if pay.shape[-1]
                   else pay)
        return self.rollout_step_shifted(params, state, x_t, shifted)


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
        self.taps = list(nFilterTaps)
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
        x = _as_compute(x)
        S = _normalize_S(S)
        B, T, _, N = x.shape
        if z0 is None:
            rng = jax.random.PRNGKey(0) if rng is None else rng
            z0 = jax.random.normal(rng, (B, self.H, N), x.dtype)
        return self._jit_apply(params, x, z0, S)

    # -- step mode (closed-loop rollouts) -----------------------------------
    def rollout_init(self, params, B: int, N: int, rng=None,
                     dtype=jnp.float32):
        """Initial recurrent state: z0 ~ N(0,1) (PRNGKey(0) when rng is
        None — matching split_forward's default so step-mode rollouts
        reproduce the windowless host loop), zeroed tap registers."""
        del params
        Ka, Kb = self.taps
        rng = jax.random.PRNGKey(0) if rng is None else rng
        z0 = jax.random.normal(rng, (B, self.H, N), dtype)
        return (jnp.zeros((B, N, self.E, Ka - 1, self.F), dtype),
                jnp.swapaxes(z0, -1, -2),
                jnp.zeros((B, N, self.E, Ka - 1, self.H), dtype),
                jnp.zeros((B, N, self.E, Kb - 1, self.H), dtype))

    @property
    def payload_width(self) -> int:
        """Feature width of rollout_payload (excl. the E axis)."""
        Ka, Kb = self.taps
        return (Ka - 1) * (self.F + self.H) + (Kb - 1) * self.H

    def rollout_payload(self, state):
        """Node-major concat (B,N,E,P) of the three registers the next
        step shifts by S_t: the input filter's x taps, the hidden
        recurrence's delayed-z tail, and the output filter's z taps
        (P = (Ka-1)(F+H) + (Kb-1)H)."""
        xa_reg, _, z_tail, zo_reg = state
        B, N, E = xa_reg.shape[:3]
        return jnp.concatenate(
            [xa_reg.reshape(B, N, E, -1), z_tail.reshape(B, N, E, -1),
             zo_reg.reshape(B, N, E, -1)], axis=-1)

    def rollout_step_shifted(self, params, state, x_t, shifted):
        """rollout_step given S_t @ rollout_payload(state)."""
        p = params["params"]
        xa_reg, z_prev, z_tail, zo_reg = state
        B, N, E = xa_reg.shape[:3]
        Ka, Kb = self.taps
        F, H = self.F, self.H
        shifted = shifted.reshape(B, N, E, -1)
        o1 = (Ka - 1) * F
        o2 = o1 + (Ka - 1) * H
        sa = shifted[..., :o1].reshape(B, N, E, Ka - 1, F)
        sz = shifted[..., o1:o2].reshape(B, N, E, Ka - 1, H)
        so = shifted[..., o2:].reshape(B, N, E, Kb - 1, H)
        hp = p["hiddenState"]
        x_nm = jnp.swapaxes(jnp.asarray(x_t, jnp.float32), -1, -2)
        xa_reg, ax = filters.tap_register_combine(
            hp["aWeights"], hp.get("xBias"), sa, x_nm)
        z0b = jnp.broadcast_to(z_prev[:, :, None, None],
                               (B, N, E, 1, H))
        reg_b = (jnp.concatenate([z0b, sz], axis=-2) if Ka > 1
                 else z0b)
        bz = jnp.einsum("bnekj,hekj->bnh", reg_b, hp["bWeights"])
        if "zBias" in hp:
            bz = bz + jnp.reshape(hp["zBias"], (-1,))
        z_t = self.core.sigma_hidden(ax + bz)
        op = p["outputState"]
        zo_reg, y = filters.tap_register_combine(
            op["weight"], op.get("bias"), so, z_t)
        y_out = self.core.rho_output(y)
        z = _readout_apply(p["Readout"], y_out, self.core.sigma_readout)
        new_state = (xa_reg, z_t, reg_b[..., : Ka - 1, :], zo_reg)
        return new_state, jnp.swapaxes(z, -1, -2)

    def rollout_step(self, params, state, x_t, S_t):
        """One recurrent step; exact vs apply() on the full history
        (the GRNN has infinite memory, so unlike the finite-window
        models there IS no exact windowed form — step mode is both the
        fast and the correct closed-loop semantics). The three
        registers shift in ONE wide node-major shift (bit-exact vs
        separate shifts)."""
        pay = self.rollout_payload(state)
        shifted = (_step_shift_rows(pay, S_t) if pay.shape[-1]
                   else pay)
        return self.rollout_step_shifted(params, state, x_t, shifted)


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
        return self._jit_apply(params, _as_compute(x), _normalize_S(S))

    # -- step mode (closed-loop rollouts) -----------------------------------
    def rollout_init(self, params, B: int, N: int, rng=None,
                     dtype=jnp.float32):
        """Zeroed delayed-aggregation register (z_{0..nExch-1}(t-1))."""
        del params, rng
        return jnp.zeros((B, N, self.E, self.n_exchanges, self.F[0]),
                         dtype)

    @property
    def payload_width(self) -> int:
        """Feature width of rollout_payload (excl. the E axis)."""
        return self.n_exchanges * self.F[0]

    def rollout_payload(self, state):
        """Node-major (B,N,E,P) delayed-aggregation register the next
        step shifts by S_t (P = nExchanges·F0)."""
        B, N, E = state.shape[:3]
        return state.reshape(B, N, E, -1)

    def rollout_step(self, params, state, x_t, S_t):
        """One causal step of the delayed aggregation sequence + conv
        stack; exact vs apply() on the full history at time t."""
        pay = self.rollout_payload(state)
        shifted = (_step_shift_rows(pay, S_t) if pay.shape[-1]
                   else pay)
        return self.rollout_step_shifted(params, state, x_t, shifted)

    def rollout_step_shifted(self, params, state, x_t, shifted):
        """rollout_step given S_t @ rollout_payload(state)."""
        p = params["params"]
        B, _, N = x_t.shape
        F0, nE = self.F[0], self.n_exchanges
        x_nm = jnp.swapaxes(jnp.asarray(x_t, jnp.float32), -1, -2)
        x0 = jnp.broadcast_to(x_nm[:, :, None, None], (B, N, self.E, 1, F0))
        if nE > 0:
            shifted = shifted.reshape(B, N, self.E, nE, F0)
            seq = jnp.concatenate([x0, shifted], axis=-2)
        else:
            seq = x0
        new_state = seq[..., :nE, :]
        z = jnp.sum(seq, axis=2)                  # (B,N,nE+1,F0)
        z = jnp.swapaxes(z, -1, -2)               # (B,N,F0,nE+1)
        z = z.reshape(B * N, F0, nE + 1)
        for l, k in enumerate(self.core.taps):
            cp = p[f"Conv_{l}"]
            ker = cp["kernel"]                    # (k, in, out)
            zl = jnp.swapaxes(z, -1, -2)          # (BN, L, F)
            Lout = zl.shape[1] - k + 1
            y = sum(zl[:, dk:dk + Lout, :] @ ker[dk] for dk in range(k))
            if "bias" in cp:
                y = y + cp["bias"]
            z = jnp.swapaxes(y, -1, -2)           # (BN, F', Lout)
            z = self.core.sigma(z)
            a = self.core.alpha[l]
            if a > 1:
                Lw = z.shape[-1]
                keep = (Lw // a) * a
                z = jnp.max(z[..., :keep].reshape(z.shape[0], z.shape[1],
                                                  keep // a, a), axis=-1)
        y = z.reshape(B * N, self.core.dims[-1] * self.core.n_seq[-1])
        y = _readout_apply(p["Readout"], y, self.core.sigma)
        return new_state, y.reshape(B, N, -1).transpose(0, 2, 1)
