"""The architecture zoo (static-GSO): 16 classes mirroring the reference's
``alegnn/modules/architectures.py`` capability surface, re-designed as
functional JAX programs.

Design vs the reference:
  * Constructors keep the reference's kwarg names (dimNodeSignals,
    nFilterTaps, ...; architectures.py:166-180 etc.) so a reference user can
    move their model dicts over unchanged.
  * Each architecture is a thin host-side wrapper that (1) orders the nodes
    (permutation registry — no eval(); the reference's
    eval('Utils.graphTools...') stale-path bug is not replicated), (2)
    precomputes every structure table (neighborhoods, masks, eigenbases,
    aggregation matrices) once on the host, and (3) owns a jitted flax core
    whose inputs are (params, x, ctx) with ctx a pytree of device arrays —
    so `changeGSO` is just "rebuild ctx", no module surgery
    (architectures.py:322-420), and one compiled program serves any graph
    of the same size.
  * splitForward / forward / singleNodeForward contracts preserved
    (architectures.py:422-461, 1117-1170).

Signals x: (B, F0, N). Nonlinearities/pooling are passed as callables or
registry strings ('relu', 'tanh', 'MaxPoolLocal', 'NoPool', ...).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from graph_neural_networks_tpu.models import layers as gll
from graph_neural_networks_tpu.ops import gso as gso_lib
from graph_neural_networks_tpu.utils import graph as gt

__all__ = [
    "SelectionGNN", "LocalActivationGNN", "LocalGNN", "SpectralGNN",
    "NodeVariantGNN", "EdgeVariantGNN", "LocalEdgeNet", "ARMAfilterGNN",
    "LocalARMA", "AggregationGNN", "MultiNodeAggregationGNN",
    "GraphAttentionNetwork", "GraphConvolutionAttentionNetwork",
    "EdgeVariantAttention", "GraphRecurrentNN", "GatedGraphRecurrentNN",
    "resolve_activation", "TorchDense", "MLP",
]


# ---------------------------------------------------------------------------
# Registries and small shared modules
# ---------------------------------------------------------------------------

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "leaky_relu": jax.nn.leaky_relu,
    "abs": jnp.abs,
    "identity": (lambda x: x),
    "none": (lambda x: x),
}


def resolve_activation(f) -> Callable:
    """Accept a callable or a registry name ('relu', 'tanh', ...)."""
    if callable(f):
        return f
    if isinstance(f, str) and f.lower() in _ACTIVATIONS:
        return _ACTIVATIONS[f.lower()]
    raise ValueError(f"unknown nonlinearity: {f!r}")


def _resolve_pool(rho) -> str:
    if rho is None:
        return "NoPool"
    if isinstance(rho, str):
        assert rho in ("NoPool", "MaxPoolLocal"), rho
        return rho
    if rho is gll.NoPool:
        return "NoPool"
    if rho is gll.MaxPoolLocal:
        return "MaxPoolLocal"
    raise ValueError(f"unknown pooling function: {rho!r}")


class TorchDense(nn.Module):
    """Linear layer with torch.nn.Linear's default init (uniform
    +-1/sqrt(fan_in)) so parameter statistics match the reference MLPs."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)
        kernel = self.param("kernel", init, (fan_in, self.features))
        y = x @ kernel
        if self.use_bias:
            y = y + self.param("bias", init, (self.features,))
        return y


class MLP(nn.Module):
    """Dense stack with the reference's convention: nonlinearity *between*
    layers, never after the last (architectures.py:307-318)."""
    dims: tuple
    sigma: Callable
    use_bias: bool = True

    @nn.compact
    def __call__(self, y):
        for i, d in enumerate(self.dims):
            if i > 0:
                y = self.sigma(y)
            y = TorchDense(d, self.use_bias)(y)
        return y


def _normalize_gso(GSO) -> np.ndarray:
    GSO = np.asarray(GSO, dtype=np.float64)
    if GSO.ndim == 2:
        GSO = GSO[None]
    assert GSO.ndim == 3 and GSO.shape[1] == GSO.shape[2]
    return GSO


def _as_tuple(x):
    return tuple(int(v) for v in x)


# ---------------------------------------------------------------------------
# The shared convolutional core: (filter -> activation -> pooling) x L + readout
# ---------------------------------------------------------------------------

class _ConvCore(nn.Module):
    """One compiled program covering every "stack of graph-filter layers +
    readout" architecture; the `filter_kind` field selects the layer family
    and ctx carries the matching structure arrays."""
    filter_kind: str           # graph_filter|spectral|node_variant|
    #                            edge_variant|arma|gat|gcat|ev_attention
    dims: tuple                # F, length L+1
    taps: tuple                # K per layer (heads for gat)
    taps2: tuple               # second per-layer int: M / P / heads, or ()
    n_nodes: tuple             # N per layer boundary, length L+1
    sigma: Callable
    act_kind: str = "pointwise"   # pointwise|max_local|median_local
    act_hops: tuple = ()
    pool_kind: str = "max_local"  # max_local|no_pool|coarsen
    readout_dims: tuple = ()
    readout_kind: str = "mlp"     # mlp|per_node|none
    use_bias: bool = True
    edge_features: int = 1
    t_max: int = 5
    coarsening: bool = False
    pool_alpha: tuple = ()        # per-layer coarsening pooling sizes

    def _filter(self, l: int, x, ctx):
        F, K, E, bias = self.dims, self.taps, self.edge_features, self.use_bias
        S = ctx["S"][l] if self.coarsening else ctx["S"]
        kind = self.filter_kind
        if kind == "graph_filter":
            return gll.GraphFilter(F[l], F[l + 1], K[l], E, bias)(x, S)
        if kind == "spectral":
            spline = ctx["spline"][l] if ctx.get("spline") is not None else None
            return gll.SpectralGF(F[l], F[l + 1], K[l], E, bias)(
                x, ctx["V"], ctx["VH"], spline)
        if kind == "node_variant":
            return gll.NodeVariantGF(F[l], F[l + 1], K[l], self.taps2[l], E,
                                     bias)(x, S, ctx["copy_nodes"][l])
        if kind == "edge_variant":
            return gll.EdgeVariantGF(F[l], F[l + 1], K[l], self.taps2[l],
                                     self.n_nodes[0], E, bias)(
                x, S, ctx["ev_identity"], ctx["ev_pattern"][l])
        if kind == "arma":
            return gll.GraphFilterARMA(F[l], F[l + 1], self.taps2[l], K[l], E,
                                       bias, self.t_max)(x, S)
        # attention family: feature growth by head concat, last layer averages
        L = len(self.taps)
        heads = self.taps if kind == "gat" else self.taps2
        g_in = F[l] if l == 0 else F[l] * heads[l - 1]
        concat = (l < L - 1)
        if kind == "gat":
            return gll.GraphAttentional(g_in, F[l + 1], heads[l], E,
                                        self.sigma, concat)(x, S)
        if kind == "gcat":
            return gll.GraphFilterAttentional(g_in, F[l + 1], K[l], heads[l],
                                              E, bias, self.sigma, concat)(x, S)
        if kind == "ev_attention":
            return gll.EdgeVariantAttentional(g_in, F[l + 1], K[l], heads[l],
                                              E, bias, self.sigma, concat)(x, S)
        raise ValueError(self.filter_kind)

    def _activation(self, l: int, x, ctx):
        if self.filter_kind in ("gat", "gcat", "ev_attention"):
            return x  # nonlinearity applied inside the attention layer
        if self.act_kind == "pointwise":
            return self.sigma(x)
        if self.act_kind == "max_local":
            return gll.MaxLocalActivation(self.act_hops[l])(
                x, ctx["act_nbh"][l])
        if self.act_kind == "median_local":
            return gll.MedianLocalActivation(self.act_hops[l])(
                x, ctx["act_nbh"][l], ctx["act_cnt"][l])
        raise ValueError(self.act_kind)

    def _pool(self, l: int, x, ctx):
        if self.pool_kind == "no_pool":
            return x
        if self.pool_kind == "coarsen":
            B, F, N = x.shape
            # per-layer pooling size over the binary-tree node order; a
            # power of 2 consumes log2(alpha) coarsening levels at once
            # (nested groups are consecutive, so one max over alpha nodes
            # equals log2(alpha) pairwise poolings)
            alpha = self.pool_alpha[l] if self.pool_alpha else 2
            if alpha <= 1:
                return x
            return jnp.max(x.reshape(B, F, N // alpha, alpha), axis=-1)
        n_in, n_out = self.n_nodes[l], self.n_nodes[l + 1]
        if n_in == n_out and ctx["pool_nbh"][l] is None:
            return x
        return gll.MaxPoolLocal(n_in, n_out, 0)(x, ctx["pool_nbh"][l])

    @nn.compact
    def __call__(self, x, ctx):
        L = len(self.taps)
        # node reordering (and coarsening zero-pad) by precomputed index map:
        # map[j] = source node for slot j, or -1 for a fake (zero) node.
        idx = ctx["order_map"]
        x = jnp.where(idx >= 0, x[:, :, jnp.clip(idx, 0)], 0.0)
        for l in range(L):
            x = self._filter(l, x, ctx)
            x = self._activation(l, x, ctx)
            x = self._pool(l, x, ctx)
        y_gfl = x
        if self.readout_kind == "mlp":
            B = x.shape[0]
            y = x.reshape(B, self.dims[-1] * x.shape[-1])
            y = MLP(self.readout_dims, self.sigma, self.use_bias)(y)
        elif self.readout_kind == "per_node":
            y = x.transpose(0, 2, 1)                   # B x N x F
            y = MLP(self.readout_dims, self.sigma, self.use_bias)(y)
            y = y.transpose(0, 2, 1)                   # B x dimReadout x N
        else:
            y = x
        return y, y_gfl


# ---------------------------------------------------------------------------
# Wrapper base
# ---------------------------------------------------------------------------

class _ArchBase:
    """Host-side architecture wrapper: owns the core module, the ctx pytree,
    the node order, and the jitted apply."""

    core: nn.Module
    ctx: dict
    order: list

    def _finalize(self, input_shape):
        self._input_shape = tuple(input_shape)
        self._jit_apply = jax.jit(
            lambda params, x, ctx: self.core.apply(params, x, ctx))

    # -- parameter init ----------------------------------------------------
    def init(self, key):
        dummy = jnp.zeros((1,) + self._input_shape, jnp.float32)
        return self.core.init(key, dummy, self.ctx)

    # -- forward contracts -------------------------------------------------
    def _ctx_for_dtype(self, dtype):
        """ctx with floating leaves cast to the compute dtype (memoized):
        bf16 mixed precision needs the GSO in bf16 too, or the shift
        einsums silently promote back to f32."""
        if dtype == jnp.float32:
            return self.ctx
        cache = getattr(self, "_ctx_cast", None)
        if cache is None:
            cache = self._ctx_cast = {}
        if dtype not in cache:
            cache[dtype] = jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if (hasattr(a, "dtype")
                    and jnp.issubdtype(a.dtype, jnp.floating)) else a,
                self.ctx)
        return cache[dtype]

    def split_forward(self, params, x):
        x = jnp.asarray(x)
        if x.dtype not in (jnp.bfloat16, jnp.float16, jnp.float32):
            x = x.astype(jnp.float32)   # f64/int inputs: compute in f32
        return self._jit_apply(params, x, self._ctx_for_dtype(x.dtype))

    def apply(self, params, x):
        return self.split_forward(params, x)[0]

    def __call__(self, params, x):
        return self.apply(params, x)

    def single_node_forward(self, params, x, nodes):
        """Output at specific (original-id) nodes, one per batch element
        (reference architectures.py:1117-1170)."""
        y = self.apply(params, x)                      # B x dim x N
        B = y.shape[0]
        if isinstance(nodes, int):
            nodes = [nodes] * B
        order = list(self.order)
        perm_nodes = jnp.asarray([order.index(int(n)) for n in nodes])
        return y[jnp.arange(B), :, perm_nodes]

    # -- misc --------------------------------------------------------------
    def parameter_count(self, params) -> int:
        return sum(p.size for p in jax.tree_util.tree_leaves(params))

    def shard(self, mesh, n_parts: int, order: str = "none",
              data_axis: Optional[str] = None):
        """Run this architecture's graph shifts node-sharded over `mesh`'s
        'graph' axis: swaps ctx['S'] for a parallel.ShardedGso backed by a
        sparse band-slab partition (never a dense N x N on device).

        order: 'none' keeps this architecture's own node ordering (exact
        parity with the dense forward; halo ring only if that ordering is
        already banded). 'rcm' composes a locality-preserving reorder into
        the model — the scaling path — allowed only when no structure
        table depends on node positions (identity pooling, pointwise
        activations); selection pooling is position-semantic in the
        reference (graphML.py:2003-2019) so reordering would change it.
        data_axis: also shard the batch dim over this mesh axis (hybrid
        data x graph parallelism).
        """
        from graph_neural_networks_tpu import parallel as par
        assert not getattr(self, "coarsening", False), \
            "coarsening uses per-level GSOs; shard() supports the flat path"
        S_np = getattr(self, "_S_np", None)
        assert S_np is not None, "architecture was not built with _S_np"
        part = par.partition_nodes(S_np, n_parts, order=order)
        self.ctx = dict(self.ctx)
        self._ctx_cast = {}
        if order != "none":
            core = self.core
            assert "order_map" in self.ctx, \
                "order='rcm' needs an input gather map (use order='none' " \
                "for architectures without one, e.g. GRNNs)"
            assert getattr(core, "pool_kind", "no_pool") == "no_pool" or all(
                t is None for t in self.ctx.get("pool_nbh", ())), \
                "order='rcm' requires identity pooling (position-semantic " \
                "selection pooling forbids reordering)"
            assert getattr(core, "act_kind", "pointwise") == "pointwise", \
                "order='rcm' requires pointwise activations"
            # compose the partition order into the input gather map and
            # extend with fake (-1 -> zero) nodes for the partition padding
            old_map = np.asarray(self.ctx["order_map"])
            new_map = old_map[part.order]
            pad = part.n_padded - len(new_map)
            if pad:
                new_map = np.concatenate(
                    [new_map, np.full(pad, -1, new_map.dtype)])
            self.ctx["order_map"] = jnp.asarray(new_map, jnp.int32)
            self.order = [self.order[i] for i in part.order]
        self.ctx["S"] = par.ShardedGso(mesh, part, data_axis=data_axis)
        return self


def _make_gso(GSO, mode: str):
    """GSO container by mode: 'dense'/'band'/'bcsr' -> ops.gso.Gso;
    'edge' -> COO EdgeList (O(nnz) gather/segment-sum shifts)."""
    if mode == "edge":
        from graph_neural_networks_tpu.ops import attention_sparse as asp
        return asp.build_edge_list(GSO)
    return gso_lib.as_gso(GSO, mode=mode)


def _identity_order_map(order, N):
    """order as gather map (no fake nodes)."""
    return jnp.asarray(np.asarray(order), jnp.int32)


def _pool_tables(S_np, N_list, alpha, L):
    """Per-layer MaxPoolLocal neighborhood tables (or None when the layer
    keeps all nodes — identity pooling)."""
    tables = []
    for l in range(L):
        if N_list[l + 1] == N_list[l] and alpha[l] <= 1:
            tables.append(None)
            continue
        tbl = gt.compute_neighborhood(S_np, alpha[l], n_rows=N_list[l + 1],
                                      nb=N_list[l], output_type="matrix")
        tables.append(jnp.asarray(tbl, jnp.int32))
    return tuple(tables)


# ---------------------------------------------------------------------------
# Concrete architectures
# ---------------------------------------------------------------------------

class SelectionGNN(_ArchBase):
    """Selection GNN: (GraphFilter -> sigma -> pooling) x L + global MLP;
    optional Graclus coarsening pooling. Reference: architectures.py:49-479.
    """

    def __init__(self, dimNodeSignals, nFilterTaps, bias, nonlinearity,
                 nSelectedNodes, poolingFunction, poolingSize, dimLayersMLP,
                 GSO, order=None, coarsening=False, rng=None,
                 gsoMode="dense"):
        GSO = _normalize_gso(GSO)
        L = len(nFilterTaps)
        assert len(dimNodeSignals) == L + 1
        sigma = resolve_activation(nonlinearity)
        E = GSO.shape[0]
        self._cfg = dict(bias=bias, sigma=sigma,
                         dims=_as_tuple(dimNodeSignals),
                         taps=_as_tuple(nFilterTaps),
                         mlp=_as_tuple(dimLayersMLP),
                         pool=_resolve_pool(poolingFunction))
        self.coarsening = bool(coarsening) and E == 1
        self.E = E
        self.order_name = order
        self.gso_mode = gsoMode
        self._build(GSO, nSelectedNodes, poolingSize, rng)

    def _build(self, GSO, nSelectedNodes, poolingSize, rng=None):
        cfg = self._cfg
        L = len(cfg["taps"])
        E = self.E
        if self.coarsening:
            # honor per-layer poolingSize (powers of 2): layer l consumes
            # log2(alpha_l) binary coarsening levels (the reference forces
            # alpha=2 regardless of poolingSize, architectures.py:246-248
            # — a documented divergence)
            alpha = [int(a) for a in (poolingSize or [2] * L)]
            assert len(alpha) == L, (alpha, L)
            k_levels = []
            for a in alpha:
                k = max(int(round(math.log2(a))), 0) if a > 1 else 0
                assert 2 ** k == a or a == 1, \
                    f"coarsening poolingSize must be a power of 2, got {a}"
                k_levels.append(k)
            total = sum(k_levels)
            self.alpha = alpha
            graphs, order = gt.coarsen(GSO[0], levels=total, rng=rng)
            if order is None:                 # total == 0: no pooling at all
                order = list(range(graphs[0].shape[0]))
            self.order = order
            offs = np.concatenate([[0], np.cumsum(k_levels)])
            N_list = [graphs[o].shape[0] for o in offs]
            S_levels = [jnp.asarray(graphs[o].todense(), jnp.float32)[None]
                        for o in offs[:L]]
            N0_orig = GSO.shape[1]
            order_map = np.full(N_list[0], -1, np.int64)
            for slot, src in enumerate(order):
                if src < N0_orig:
                    order_map[slot] = src
            ctx = {
                "S": S_levels,
                "order_map": jnp.asarray(order_map, jnp.int32),
                "pool_nbh": (None,) * L,
            }
            core = _ConvCore(
                filter_kind="graph_filter", dims=cfg["dims"], taps=cfg["taps"],
                taps2=(), n_nodes=tuple(N_list), sigma=cfg["sigma"],
                pool_kind="coarsen", readout_dims=cfg["mlp"],
                readout_kind="mlp", use_bias=cfg["bias"], edge_features=E,
                coarsening=True, pool_alpha=tuple(alpha))
        else:
            S_np, order = gt.permutation_by_name(self.order_name)(GSO)
            self.order = order
            self._S_np = S_np
            N = S_np.shape[1]
            N_list = [N] + list(nSelectedNodes)
            alpha = list(poolingSize)
            self.alpha = alpha
            pool_kind = ("no_pool" if cfg["pool"] == "NoPool" else "max_local")
            ctx = {
                "S": _make_gso(S_np, getattr(self, "gso_mode", "dense")),
                "order_map": _identity_order_map(order, N),
                "pool_nbh": (_pool_tables(S_np, N_list, alpha, L)
                             if pool_kind == "max_local" else (None,) * L),
            }
            core = _ConvCore(
                filter_kind="graph_filter", dims=cfg["dims"], taps=cfg["taps"],
                taps2=(), n_nodes=tuple(N_list), sigma=cfg["sigma"],
                pool_kind=pool_kind, readout_dims=cfg["mlp"],
                readout_kind="mlp", use_bias=cfg["bias"], edge_features=E)
        self.core = core
        self.ctx = ctx
        self._ctx_cast = {}   # new ctx: drop per-dtype casts
        self.S = ctx["S"]
        self.N = N_list
        self._finalize((cfg["dims"][0], GSO.shape[1]))

    def changeGSO(self, GSO, nSelectedNodes=None, poolingSize=None):
        """Re-derive ordering/structure for a new GSO, keeping params
        (reference architectures.py:322-420)."""
        GSO = _normalize_gso(GSO)
        if nSelectedNodes is None or len(nSelectedNodes) == 0:
            nSelectedNodes = self.N[1:]
        if poolingSize is None or len(poolingSize) == 0:
            poolingSize = getattr(self, "alpha",
                                  [1] * len(self._cfg["taps"]))
        self._build(GSO, nSelectedNodes, poolingSize)

    change_gso = changeGSO


class _SelectionVariant(_ArchBase):
    """Shared scaffolding for the Selection-GNN-shaped variants (spectral,
    node/edge-variant, ARMA, attention families, local readouts)."""

    filter_kind = "graph_filter"
    readout_kind = "mlp"
    act_kind = "pointwise"

    def __init__(self, dims, taps, taps2, bias, sigma, nSelectedNodes,
                 poolingFunction, poolingSize, readout_dims, GSO, order,
                 edge_features=None, t_max=5, act_hops=(), act_kind=None,
                 gsoMode="dense", attentionMode="dense"):
        GSO = _normalize_gso(GSO)
        L = len(taps)
        sigma = resolve_activation(sigma)
        self._cfg = dict(
            dims=_as_tuple(dims), taps=_as_tuple(taps),
            taps2=_as_tuple(taps2) if taps2 else (), bias=bias, sigma=sigma,
            readout=_as_tuple(readout_dims), pool=_resolve_pool(poolingFunction),
            t_max=t_max, act_hops=_as_tuple(act_hops),
            act_kind=act_kind or self.act_kind)
        self.E = GSO.shape[0] if edge_features is None else edge_features
        self.order_name = order
        self.gso_mode = gsoMode
        self.attention_mode = attentionMode
        self._build(GSO, nSelectedNodes, poolingSize)

    # subclass hook: extra ctx entries derived from the (permuted) GSO
    def _extra_ctx(self, S_np, N_list):
        return {}

    def _build(self, GSO, nSelectedNodes, poolingSize):
        cfg = self._cfg
        L = len(cfg["taps"])
        S_np, order = gt.permutation_by_name(self.order_name)(GSO)
        self.order = order
        self._S_np = S_np
        N = S_np.shape[1]
        N_list = [N] + list(nSelectedNodes)
        alpha = list(poolingSize)
        self.alpha = alpha
        pool_kind = "no_pool" if cfg["pool"] == "NoPool" else "max_local"
        attn_mode = getattr(self, "attention_mode", "dense")
        if (self.filter_kind in ("gat", "gcat", "ev_attention")
                and attn_mode == "edge"):
            # O(E) edge-list attention: the GSO rides as an EdgeList and
            # the layer family dispatches to the SDDMM/segment-softmax
            # path (no B x P x E x N x N materialization;
            # reference pathology graphML.py:640-737)
            from graph_neural_networks_tpu.ops import attention_sparse as asp
            S_ctx = asp.build_edge_list(S_np)
        elif (self.filter_kind in ("gat", "gcat", "ev_attention")
                and attn_mode == "band"):
            # banded block attention (ops.attention_band): dense-tile
            # SDDMM + band softmax + band aggregation — pair with
            # order='RCM' to keep the band narrow
            S_ctx = gso_lib.as_gso(S_np, mode="band")
        else:
            S_ctx = _make_gso(S_np, getattr(self, "gso_mode", "dense"))
        ctx = {
            "S": S_ctx,
            "order_map": _identity_order_map(order, N),
            "pool_nbh": (_pool_tables(S_np, N_list, alpha, L)
                         if pool_kind == "max_local" else (None,) * L),
        }
        ctx.update(self._extra_ctx(S_np, N_list))
        self.core = _ConvCore(
            filter_kind=self.filter_kind, dims=cfg["dims"], taps=cfg["taps"],
            taps2=cfg["taps2"], n_nodes=tuple(N_list), sigma=cfg["sigma"],
            act_kind=cfg["act_kind"], act_hops=cfg["act_hops"],
            pool_kind=pool_kind, readout_dims=cfg["readout"],
            readout_kind=self.readout_kind, use_bias=cfg["bias"],
            edge_features=self.E, t_max=cfg["t_max"])
        self.ctx = ctx
        self._ctx_cast = {}   # new ctx: drop per-dtype casts
        self.S = ctx["S"]
        self.N = N_list
        self._finalize((cfg["dims"][0], GSO.shape[1]))

    def changeGSO(self, GSO, nSelectedNodes=None, poolingSize=None):
        GSO = _normalize_gso(GSO)
        if not nSelectedNodes:
            nSelectedNodes = self.N[1:]
        if not poolingSize:
            poolingSize = getattr(self, "alpha",
                                  [1] * len(self._cfg["taps"]))
        self._build(GSO, nSelectedNodes, poolingSize)

    change_gso = changeGSO


class LocalActivationGNN(_SelectionVariant):
    """Selection GNN with localized (max/median) activations.
    Reference: architectures.py:481-815."""

    def __init__(self, dimNodeSignals, nFilterTaps, bias, nonlinearity,
                 kHopActivation, nSelectedNodes, poolingFunction, poolingSize,
                 dimLayersMLP, GSO, order=None):
        act = nonlinearity if isinstance(nonlinearity, str) else (
            "max_local" if nonlinearity is gll.MaxLocalActivation
            else "median_local")
        if act in ("MaxLocalActivation",):
            act = "max_local"
        if act in ("MedianLocalActivation",):
            act = "median_local"
        assert act in ("max_local", "median_local")
        self._local_act = act
        super().__init__(dimNodeSignals, nFilterTaps, (), bias, "relu",
                         nSelectedNodes, poolingFunction, poolingSize,
                         dimLayersMLP, GSO, order, act_hops=kHopActivation,
                         act_kind=act)

    def _extra_ctx(self, S_np, N_list):
        nbh, cnt = [], []
        for l, khop in enumerate(self._cfg["act_hops"]):
            n_l = N_list[l + 1]
            tabs, cnts = [], []
            for k in range(1, khop + 1):
                lst = gt.compute_neighborhood(S_np, k, n_rows=n_l, nb=n_l,
                                              output_type="list")
                width = max(max((len(v) for v in lst), default=1), 1)
                tab = np.empty((n_l, width), np.int64)
                cn = np.empty((n_l,), np.int64)
                for i, v in enumerate(lst):
                    tab[i, :len(v)] = v
                    tab[i, len(v):] = i
                    cn[i] = len(v)
                tabs.append(jnp.asarray(tab, jnp.int32))
                cnts.append(jnp.asarray(cn, jnp.int32))
            nbh.append(tuple(tabs))
            cnt.append(tuple(cnts))
        return {"act_nbh": tuple(nbh), "act_cnt": tuple(cnt)}


class LocalGNN(_SelectionVariant):
    """Selection GNN with per-node linear readout (+ singleNodeForward).
    Reference: architectures.py:816-1184."""
    readout_kind = "per_node"

    def __init__(self, dimNodeSignals, nFilterTaps, bias, nonlinearity,
                 nSelectedNodes, poolingFunction, poolingSize, dimReadout,
                 GSO, order=None):
        super().__init__(dimNodeSignals, nFilterTaps, (), bias, nonlinearity,
                         nSelectedNodes, poolingFunction, poolingSize,
                         dimReadout, GSO, order)


class SpectralGNN(_SelectionVariant):
    """Selection GNN with spectral filters (+ spline for M < N).
    Reference: architectures.py:1185-1484."""
    filter_kind = "spectral"

    def __init__(self, dimNodeSignals, nCoeff, bias, nonlinearity,
                 nSelectedNodes, poolingFunction, poolingSize, dimLayersMLP,
                 GSO, order=None):
        super().__init__(dimNodeSignals, nCoeff, (), bias, nonlinearity,
                         nSelectedNodes, poolingFunction, poolingSize,
                         dimLayersMLP, GSO, order)

    def _extra_ctx(self, S_np, N_list):
        E, N, _ = S_np.shape
        V = np.zeros((E, N, N))
        VH = np.zeros((E, N, N))
        lam = np.zeros((E, N))
        for e in range(E):
            w, v = np.linalg.eig(S_np[e])
            lam[e], V[e] = w.real, v.real
            VH[e] = V[e].conj().T
        splines = []
        for M in self._cfg["taps"]:
            if M == N:
                splines.append(None)
            else:
                sk = np.stack([gt.spline_basis(M, lam[e]) for e in range(E)])
                splines.append(jnp.asarray(sk, jnp.float32))
        return {"V": jnp.asarray(V, jnp.float32),
                "VH": jnp.asarray(VH, jnp.float32),
                "spline": tuple(splines)}


class NodeVariantGNN(_SelectionVariant):
    """Selection GNN with hybrid node-variant filters.
    Reference: architectures.py:1485-1720."""
    filter_kind = "node_variant"

    def __init__(self, dimNodeSignals, nShiftTaps, nNodeTaps, bias,
                 nonlinearity, nSelectedNodes, poolingFunction, poolingSize,
                 dimLayersMLP, GSO, order=None):
        super().__init__(dimNodeSignals, nShiftTaps, nNodeTaps, bias,
                         nonlinearity, nSelectedNodes, poolingFunction,
                         poolingSize, dimLayersMLP, GSO, order)

    def _extra_ctx(self, S_np, N_list):
        maps = tuple(
            jnp.asarray(gt.nv_copy_nodes(S_np, M), jnp.int32)
            for M in self._cfg["taps2"])
        return {"copy_nodes": maps}


class _EdgeVariantMixin:
    filter_kind = "edge_variant"

    def _extra_ctx(self, S_np, N_list):
        edge_mode = getattr(self, "ev_mode", "dense") == "edge"
        patterns = []
        idents = None
        for M in self._cfg["taps2"]:
            ide, pat = gt.ev_sparsity_pattern(S_np, M)
            if edge_mode:
                # edge-list support: union over E, with a per-E validity
                # mask so edge features keep their own patterns
                support = pat.sum(0) > 0
                row, col = np.nonzero(support)
                valid = pat[:, row, col]
                patterns.append((jnp.asarray(row, jnp.int32),
                                 jnp.asarray(col, jnp.int32),
                                 jnp.asarray(valid, jnp.float32)))
                if idents is None:
                    idents = jnp.asarray(
                        np.einsum("enn->en", ide), jnp.float32)
            else:
                patterns.append(jnp.asarray(pat, jnp.float32))
                if idents is None:
                    idents = jnp.asarray(ide, jnp.float32)
        return {"ev_identity": idents, "ev_pattern": tuple(patterns)}


class EdgeVariantGNN(_EdgeVariantMixin, _SelectionVariant):
    """Selection GNN with (hybrid) edge-variant filters.
    Reference: architectures.py:1721-1956."""

    def __init__(self, dimNodeSignals, nShiftTaps, nFilterNodes, bias,
                 nonlinearity, nSelectedNodes, poolingFunction, poolingSize,
                 dimLayersMLP, GSO, order=None, evMode="dense"):
        self.ev_mode = evMode
        super().__init__(dimNodeSignals, nShiftTaps, nFilterNodes, bias,
                         nonlinearity, nSelectedNodes, poolingFunction,
                         poolingSize, dimLayersMLP, GSO, order)


class LocalEdgeNet(_EdgeVariantMixin, _SelectionVariant):
    """Edge-variant filters + per-node readout.
    Reference: architectures.py:1957-2242."""
    readout_kind = "per_node"

    def __init__(self, dimNodeSignals, nShiftTaps, nFilterNodes, bias,
                 nonlinearity, nSelectedNodes, poolingFunction, poolingSize,
                 dimReadout, GSO, order=None, evMode="dense"):
        self.ev_mode = evMode
        super().__init__(dimNodeSignals, nShiftTaps, nFilterNodes, bias,
                         nonlinearity, nSelectedNodes, poolingFunction,
                         poolingSize, dimReadout, GSO, order)


class ARMAfilterGNN(_SelectionVariant):
    """Selection GNN with ARMA (Jacobi) filters.
    Reference: architectures.py:2243-2555."""
    filter_kind = "arma"

    def __init__(self, dimNodeSignals, nDenominatorTaps, nResidueTaps, bias,
                 nonlinearity, nSelectedNodes, poolingFunction, poolingSize,
                 dimLayersMLP, GSO, order=None, tMax=5):
        super().__init__(dimNodeSignals, nResidueTaps, nDenominatorTaps, bias,
                         nonlinearity, nSelectedNodes, poolingFunction,
                         poolingSize, dimLayersMLP, GSO, order, t_max=tMax)


class LocalARMA(ARMAfilterGNN):
    """ARMA filters + per-node readout. Reference: architectures.py:2556-2919."""
    readout_kind = "per_node"

    def __init__(self, dimNodeSignals, nDenominatorTaps, nResidueTaps, bias,
                 nonlinearity, nSelectedNodes, poolingFunction, poolingSize,
                 dimReadout, GSO, order=None, tMax=5):
        super().__init__(dimNodeSignals, nDenominatorTaps, nResidueTaps, bias,
                         nonlinearity, nSelectedNodes, poolingFunction,
                         poolingSize, dimReadout, GSO, order, tMax)


class GraphAttentionNetwork(_SelectionVariant):
    """GAT stack (heads concatenated on inner layers, averaged on the last).
    Reference: architectures.py:3575-3814."""
    filter_kind = "gat"

    def __init__(self, dimNodeSignals, nAttentionHeads, nonlinearity,
                 nSelectedNodes, poolingFunction, poolingSize, dimLayersMLP,
                 bias, GSO, order=None, attentionMode="dense"):
        super().__init__(dimNodeSignals, nAttentionHeads, (), bias,
                         nonlinearity, nSelectedNodes, poolingFunction,
                         poolingSize, dimLayersMLP, GSO, order,
                         attentionMode=attentionMode)


class GraphConvolutionAttentionNetwork(_SelectionVariant):
    """GCAT stack. Reference: architectures.py:3815-4087."""
    filter_kind = "gcat"

    def __init__(self, dimNodeSignals, nFilterTaps, nAttentionHeads, bias,
                 nonlinearity, nSelectedNodes, poolingFunction, poolingSize,
                 dimLayersMLP, GSO, order=None, attentionMode="dense"):
        super().__init__(dimNodeSignals, nFilterTaps, nAttentionHeads, bias,
                         nonlinearity, nSelectedNodes, poolingFunction,
                         poolingSize, dimLayersMLP, GSO, order,
                         attentionMode=attentionMode)


class EdgeVariantAttention(_SelectionVariant):
    """Edge-variant filters parameterized by attention.
    Reference: architectures.py:4088-4356."""
    filter_kind = "ev_attention"

    def __init__(self, dimNodeSignals, nFilterTaps, nAttentionHeads, bias,
                 nonlinearity, nSelectedNodes, poolingFunction, poolingSize,
                 dimLayersMLP, GSO, order=None, attentionMode="dense"):
        super().__init__(dimNodeSignals, nFilterTaps, nAttentionHeads, bias,
                         nonlinearity, nSelectedNodes, poolingFunction,
                         poolingSize, dimLayersMLP, GSO, order,
                         attentionMode=attentionMode)


# ---------------------------------------------------------------------------
# Aggregation GNNs
# ---------------------------------------------------------------------------

class _AggCore(nn.Module):
    """Aggregation-sequence CNN: z = x SN, then Conv1d stack + MLP (+AggMLP).
    Reference: architectures.py:3172-3218."""
    dims: tuple          # F
    taps: tuple          # K (conv kernel sizes)
    n_seq: tuple         # N per layer (along the aggregation axis)
    alpha: tuple         # pooling sizes
    sigma: Callable
    mlp_dims: tuple
    agg_mlp_dims: tuple
    n_nodes: int
    use_bias: bool
    edge_features: int

    @nn.compact
    def __call__(self, x, ctx):
        B = x.shape[0]
        F0 = self.dims[0]
        E = self.edge_features
        idx = ctx["order_map"]
        x = x[:, :, idx]
        SN = ctx["SN"]                                # nNodes x E x N x maxN
        n_nodes, _, N, maxN = SN.shape
        z = jnp.einsum("bfn,pens->bpefs", x, SN)      # B x nNodes x E x F x maxN
        z = z.reshape(B * n_nodes, E * F0, maxN)
        for l in range(len(self.taps)):
            # Conv1d valid correlation: channels E*F[l] -> E*F[l+1]
            z = z.transpose(0, 2, 1)                  # B' x maxN x C
            z = nn.Conv(self.dims[l + 1] * E, (self.taps[l],),
                        padding="VALID", use_bias=self.use_bias,
                        kernel_init=nn.initializers.variance_scaling(
                            1 / 3, "fan_in", "uniform"),
                        bias_init=nn.initializers.zeros)(z)
            z = z.transpose(0, 2, 1)
            z = self.sigma(z)
            if self.alpha[l] > 1:
                Lw = z.shape[-1]
                keep = (Lw // self.alpha[l]) * self.alpha[l]
                z = jnp.max(z[..., :keep].reshape(z.shape[0], z.shape[1],
                                                  keep // self.alpha[l],
                                                  self.alpha[l]), axis=-1)
        y = z.reshape(B * n_nodes, self.dims[-1] * self.n_seq[-1] * E)
        y = MLP(self.mlp_dims, self.sigma, self.use_bias)(y)
        y = y.reshape(B, n_nodes, -1).transpose(0, 2, 1)  # B x dim x nNodes
        if n_nodes == 1 or len(self.agg_mlp_dims) > 0:
            y = y.transpose(0, 2, 1).reshape(B, -1)
            y = MLP(self.agg_mlp_dims, self.sigma, self.use_bias)(y)
        return y, y


class AggregationGNN(_ArchBase):
    """Aggregation GNN: build per-node aggregation sequences
    [x_i, (Sx)_i, (S^2 x)_i, ...] then run a regular CNN on them.
    Reference: architectures.py:2920-3229."""

    def __init__(self, dimFeatures, nFilterTaps, bias, nonlinearity,
                 poolingFunction, poolingSize, dimLayersMLP, GSO, order=None,
                 maxN=None, nNodes=1, dimLayersAggMLP=[]):
        GSO = _normalize_gso(GSO)
        sigma = resolve_activation(nonlinearity)
        S_np, self.order = gt.permutation_by_name(order)(GSO)
        E, N, _ = S_np.shape
        L = len(nFilterTaps)
        self.maxN = N if maxN is None else min(maxN, N)
        # sequence-length bookkeeping through valid conv + pooling
        n_seq = [self.maxN]
        for l in range(L):
            out_conv = n_seq[l] - (nFilterTaps[l] - 1)
            n_seq.append(int((out_conv - (poolingSize[l] - 1) - 1)
                             / poolingSize[l] + 1))
        # SN: [delta_i, S delta_i, ...] per selected node
        delta = np.zeros((E, N, nNodes))
        for n in range(nNodes):
            delta[:, n, n] = 1.0
        SN = [delta.copy()]
        for _ in range(1, self.maxN):
            delta = S_np @ delta
            SN.append(delta.copy())
        SN = np.stack(SN, axis=1)                     # E x maxN x N x nNodes
        SN = SN.transpose(3, 0, 2, 1)                 # nNodes x E x N x maxN
        self.ctx = {
            "SN": jnp.asarray(SN, jnp.float32),
            "order_map": _identity_order_map(self.order, N),
        }
        self._ctx_cast = {}   # new ctx: drop per-dtype casts
        self.N = n_seq
        self.core = _AggCore(
            dims=_as_tuple(dimFeatures), taps=_as_tuple(nFilterTaps),
            n_seq=tuple(n_seq), alpha=_as_tuple(poolingSize), sigma=sigma,
            mlp_dims=_as_tuple(dimLayersMLP),
            agg_mlp_dims=_as_tuple(dimLayersAggMLP), n_nodes=nNodes,
            use_bias=bias, edge_features=E)
        self._finalize((dimFeatures[0], N))


class MultiNodeAggregationGNN(_ArchBase):
    """Outer layers of per-node AggregationGNNs with rotated node orders.
    Reference: architectures.py:3230-3574."""

    def __init__(self, nSelectedNodes, nShifts, dimFeatures, nFilterTaps,
                 bias, nonlinearity, poolingFunction, poolingSize,
                 dimLayersMLP, GSO, order=None):
        GSO = _normalize_gso(GSO)
        sigma = resolve_activation(nonlinearity)
        S_np, self.order = gt.permutation_by_name(order)(GSO)
        self.N_nodes = S_np.shape[1]
        self.P = list(nSelectedNodes)
        self.R = len(self.P)
        self.sigma = sigma
        self.inner = []  # [r][p] AggregationGNN
        N = self.N_nodes
        max_p = max(self.P)
        inner_orders = [list(range(N))]
        for p in range(1, max_p):
            rest = [n for n in range(N) if n != p]
            inner_orders.append([p] + rest)
        self.inner_orders = inner_orders
        for r in range(self.R):
            row = []
            for p in range(self.P[r]):
                io = inner_orders[p]
                sub_S = S_np[:, io, :][:, :, io]
                row.append(AggregationGNN(
                    dimFeatures[r], nFilterTaps[r], bias, sigma,
                    poolingFunction, poolingSize[r], [dimFeatures[r + 1][0]],
                    sub_S, order=None, maxN=nShifts[r]))
            self.inner.append(row)
        self._mlp = MLP(_as_tuple(dimLayersMLP), sigma, bias)
        self._mlp_dims = _as_tuple(dimLayersMLP)
        self._dims = dimFeatures
        self._bias = bias
        self._input_shape = (dimFeatures[0][0], self.N_nodes)

    def init(self, key):
        params = {"inner": [], "mlp": None}
        keys = jax.random.split(key, self.R * max(self.P) + 1)
        ki = 0
        for r in range(self.R):
            row = []
            for p in range(self.P[r]):
                row.append(self.inner[r][p].init(keys[ki]))
                ki += 1
            params["inner"].append(row)
        dummy = jnp.zeros((1, self._dims[-1][-1] * self.P[-1]))
        params["mlp"] = self._mlp.init(keys[-1], dummy)
        return params

    def apply(self, params, x):
        x = jnp.asarray(x, jnp.float32)
        B = x.shape[0]
        order = jnp.asarray(np.asarray(self.order), jnp.int32)
        x = x[:, :, order]
        N = self.N_nodes
        for r in range(self.R):
            outs = []
            for p in range(self.P[r]):
                io = jnp.asarray(np.asarray(self.inner_orders[p]), jnp.int32)
                xr = x[:, :, io]
                outs.append(self.inner[r][p].apply(params["inner"][r][p], xr))
            y = jnp.stack(outs, axis=2)               # B x F x P[r]
            if r < self.R - 1:
                if y.shape[2] < N:
                    x = jnp.pad(y, ((0, 0), (0, 0), (0, N - y.shape[2])))
                else:
                    x = y
        y = y.reshape(B, -1)                          # flatten F-major per ref
        return self._mlp.apply(params["mlp"], y)

    def split_forward(self, params, x):
        y = self.apply(params, x)
        return y, y


# ---------------------------------------------------------------------------
# Recurrent architectures (static GSO)
# ---------------------------------------------------------------------------

class _GRNNCore(nn.Module):
    """hiddenState -> outputState GraphFilter -> rho -> per-node readout.
    Reference: architectures.py:4357-4662 (splitForward at :4533-4570)."""
    hidden_kind: str     # plain|time|node|edge
    dim_in: int
    dim_out: int
    dim_hidden: int
    taps: tuple          # (K_hidden, K_output)
    sigma_hidden: Callable
    rho_output: Callable
    sigma_readout: Callable
    readout_dims: tuple
    use_bias: bool
    edge_features: int

    @nn.compact
    def __call__(self, x, z0, ctx):
        B, T, F, N = x.shape
        S = ctx["S"]
        kind = self.hidden_kind
        cls = {"plain": gll.HiddenState, "time": gll.TimeGatedHiddenState,
               "node": gll.NodeGatedHiddenState,
               "edge": gll.EdgeGatedHiddenState}[kind]
        z, _ = cls(self.dim_in, self.dim_hidden, self.taps[0],
                   nonlinearity=self.sigma_hidden,
                   edge_features=self.edge_features,
                   use_bias=self.use_bias, name="hiddenState")(x, z0, S)
        y = gll.GraphFilter(self.dim_hidden, self.dim_out, self.taps[1],
                            self.edge_features, self.use_bias,
                            name="outputState")(
            z.reshape(B * T, self.dim_hidden, N), S)
        y = self.rho_output(y).reshape(B, T, self.dim_out, N)
        y_out = y
        y = y.transpose(0, 1, 3, 2)
        y = MLP(self.readout_dims, self.sigma_readout, self.use_bias,
                name="Readout")(y)
        return y.transpose(0, 1, 3, 2), y_out


class GraphRecurrentNN(_ArchBase):
    """GRNN: z_t = sigma(A(S)x_t + B(S)z_{t-1}), graph-filter output layer,
    per-node readout; z0 ~ N(0,1) each forward.
    Reference: architectures.py:4357-4662."""
    hidden_kind = "plain"

    def __init__(self, dimInputSignals, dimOutputSignals, dimHiddenSignals,
                 nFilterTaps, bias, nonlinearityHidden, nonlinearityOutput,
                 nonlinearityReadout, dimReadout, GSO, gsoMode="dense"):
        GSO = _normalize_gso(GSO)
        self.order = list(range(GSO.shape[1]))
        self.H = dimHiddenSignals
        self.gso_mode = gsoMode
        self._S_np = GSO
        self.ctx = {"S": _make_gso(GSO, gsoMode)}
        self._ctx_cast = {}
        self.S = self.ctx["S"]
        self.core = _GRNNCore(
            hidden_kind=self.hidden_kind, dim_in=dimInputSignals,
            dim_out=dimOutputSignals, dim_hidden=dimHiddenSignals,
            taps=_as_tuple(nFilterTaps),
            sigma_hidden=resolve_activation(nonlinearityHidden),
            rho_output=resolve_activation(nonlinearityOutput),
            sigma_readout=resolve_activation(nonlinearityReadout),
            readout_dims=_as_tuple(dimReadout), use_bias=bias,
            edge_features=GSO.shape[0])
        self._input_shape = (dimInputSignals, GSO.shape[1])
        self._jit_apply = jax.jit(
            lambda params, x, z0, ctx: self.core.apply(params, x, z0, ctx))

    def init(self, key, T: int = 2):
        F0, N = self._input_shape
        dummy_x = jnp.zeros((1, T, F0, N))
        dummy_z0 = jnp.zeros((1, self.H, N))
        return self.core.init(key, dummy_x, dummy_z0, self.ctx)

    def split_forward(self, params, x, rng=None, z0=None):
        x = jnp.asarray(x, jnp.float32)
        B, T, F0, N = x.shape
        if z0 is None:
            rng = jax.random.PRNGKey(0) if rng is None else rng
            z0 = jax.random.normal(rng, (B, self.H, N))
        return self._jit_apply(params, x, z0, self.ctx)

    def apply(self, params, x, rng=None, z0=None):
        return self.split_forward(params, x, rng=rng, z0=z0)[0]

    def single_node_forward(self, params, x, nodes, rng=None):
        y = self.apply(params, x, rng=rng)            # B x T x dim x N
        B = y.shape[0]
        if isinstance(nodes, int):
            nodes = [nodes] * B
        order = list(self.order)
        perm_nodes = jnp.asarray([order.index(int(n)) for n in nodes])
        return y[jnp.arange(B), :, :, perm_nodes]

    def changeGSO(self, GSO):
        GSO = _normalize_gso(GSO)
        self._S_np = GSO
        self.ctx = {"S": _make_gso(GSO, getattr(self, "gso_mode", "dense"))}
        self._ctx_cast = {}
        self.S = self.ctx["S"]

    change_gso = changeGSO


class GatedGraphRecurrentNN(GraphRecurrentNN):
    """Gated GRNN with time/node/edge gating.
    Reference: architectures.py:4663-4984."""

    def __init__(self, dimInputSignals, dimOutputSignals, dimHiddenSignals,
                 nFilterTaps, bias, nonlinearityHidden, nonlinearityOutput,
                 nonlinearityReadout, dimReadout, GSO, gateType="time",
                 gsoMode="dense"):
        assert gateType in ("time", "node", "edge")
        self.hidden_kind = gateType
        super().__init__(dimInputSignals, dimOutputSignals, dimHiddenSignals,
                         nFilterTaps, bias, nonlinearityHidden,
                         nonlinearityOutput, nonlinearityReadout, dimReadout,
                         GSO, gsoMode=gsoMode)
