"""End-to-end architecture parity vs the reference: transplant the
reference's trained-shape weights into this framework and assert the full
forward pass (and the split GFL activations) are allclose — the
BASELINE.md acceptance list: Selection GNN, Aggregation GNN, EdgeNet
(edge-variant), GAT, GRNN.
"""

import sys
import types
from unittest import mock

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
for _mod in ("hdf5storage", "gensim"):
    try:
        __import__(_mod)
    except ImportError:
        sys.modules.setdefault(_mod, types.ModuleType(_mod))
for _alias, _type in (("int", int), ("bool", bool), ("float", float),
                      ("object", object)):
    if not hasattr(np, _alias):
        setattr(np, _alias, _type)

import alegnn.modules.architectures as ref_archs  # noqa: E402
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from graph_neural_networks_tpu.models import architectures as archs  # noqa: E402
from graph_neural_networks_tpu.utils import graph as gt  # noqa: E402

RNG = np.random.default_rng(17)
N, B = 20, 3


@pytest.fixture(scope="module")
def S():
    W = gt.create_graph("SBM", N, {"nCommunities": 2, "probIntra": 0.8,
                                   "probInter": 0.25},
                        rng=np.random.default_rng(5))
    return (W / np.max(np.abs(np.linalg.eigvalsh(W))))[None]  # 1 x N x N


@pytest.fixture(scope="module")
def x():
    return RNG.standard_normal((B, 1, N)).astype(np.float32)


def _np(t):
    return t.detach().numpy()


def _close(mine, ref, atol=2e-5, rtol=2e-4):
    np.testing.assert_allclose(np.asarray(mine), _np(ref), atol=atol,
                               rtol=rtol)


def test_selection_gnn_full_parity(S, x):
    ref = ref_archs.SelectionGNN([1, 4, 8], [3, 3], True, tnn.ReLU,
                                 [N, N], __import__("alegnn.utils.graphML",
                                                    fromlist=["NoPool"]).NoPool,
                                 [1, 1], [5], S.astype(np.float32))
    ref = ref.float()
    mine = archs.SelectionGNN([1, 4, 8], [3, 3], True, "relu", [N, N],
                              "NoPool", [1, 1], [5], S)
    params = mine.init(jax.random.PRNGKey(0))
    p = params["params"]
    p["GraphFilter_0"]["weight"] = jnp.asarray(_np(ref.GFL[0].weight))
    p["GraphFilter_0"]["bias"] = jnp.asarray(_np(ref.GFL[0].bias))
    p["GraphFilter_1"]["weight"] = jnp.asarray(_np(ref.GFL[3].weight))
    p["GraphFilter_1"]["bias"] = jnp.asarray(_np(ref.GFL[3].bias))
    p["MLP_0"]["TorchDense_0"]["kernel"] = jnp.asarray(_np(ref.MLP[0].weight).T)
    p["MLP_0"]["TorchDense_0"]["bias"] = jnp.asarray(_np(ref.MLP[0].bias))
    xt = torch.tensor(x)
    ref_out, ref_gfl = ref.splitForward(xt)
    my_out, my_gfl = mine.split_forward(params, x)
    _close(my_gfl, ref_gfl)
    _close(my_out, ref_out)


def test_selection_gnn_pooling_parity(S, x):
    """With MaxPoolLocal selection pooling engaged (exercises zero-pad +
    neighborhood gather agreement end to end)."""
    gml = __import__("alegnn.utils.graphML", fromlist=["MaxPoolLocal"])
    ref = ref_archs.SelectionGNN([1, 4, 4], [2, 2], True, tnn.ReLU,
                                 [12, 6], gml.MaxPoolLocal, [2, 2], [3],
                                 S.astype(np.float32)).float()
    mine = archs.SelectionGNN([1, 4, 4], [2, 2], True, "relu", [12, 6],
                              "MaxPoolLocal", [2, 2], [3], S)
    params = mine.init(jax.random.PRNGKey(0))
    p = params["params"]
    for l, ref_idx in ((0, 0), (1, 3)):
        p[f"GraphFilter_{l}"]["weight"] = jnp.asarray(
            _np(ref.GFL[ref_idx].weight))
        p[f"GraphFilter_{l}"]["bias"] = jnp.asarray(
            _np(ref.GFL[ref_idx].bias))
    p["MLP_0"]["TorchDense_0"]["kernel"] = jnp.asarray(_np(ref.MLP[0].weight).T)
    p["MLP_0"]["TorchDense_0"]["bias"] = jnp.asarray(_np(ref.MLP[0].bias))
    ref_out = ref(torch.tensor(x))
    my_out = mine.apply(params, x)
    _close(my_out, ref_out)


def test_edge_variant_gnn_full_parity(S, x):
    gml = __import__("alegnn.utils.graphML", fromlist=["NoPool"])
    M = 10
    ref = ref_archs.EdgeVariantGNN([1, 4], [2], [M], True, tnn.ReLU, [N],
                                   gml.NoPool, [1], [3],
                                   S.astype(np.float32)).float()
    mine = archs.EdgeVariantGNN([1, 4], [2], [M], True, "relu", [N],
                                "NoPool", [1], [3], S)
    params = mine.init(jax.random.PRNGKey(0))
    p = params["params"]
    p["EdgeVariantGF_0"]["weightEV"] = jnp.asarray(_np(ref.EVGFL[0].weightEV))
    p["EdgeVariantGF_0"]["weightLSI"] = jnp.asarray(_np(ref.EVGFL[0].weightLSI))
    p["EdgeVariantGF_0"]["bias"] = jnp.asarray(_np(ref.EVGFL[0].bias))
    p["MLP_0"]["TorchDense_0"]["kernel"] = jnp.asarray(_np(ref.MLP[0].weight).T)
    p["MLP_0"]["TorchDense_0"]["bias"] = jnp.asarray(_np(ref.MLP[0].bias))
    _close(mine.apply(params, x), ref(torch.tensor(x)), atol=5e-5)


def test_gat_full_parity(S, x):
    gml = __import__("alegnn.utils.graphML", fromlist=["NoPool"])
    ref = ref_archs.GraphAttentionNetwork([1, 4, 4], [2, 2],
                                          torch.nn.functional.relu, [N, N],
                                          gml.NoPool, [1, 1], [3], True,
                                          S.astype(np.float32)).float()
    mine = archs.GraphAttentionNetwork([1, 4, 4], [2, 2], "relu", [N, N],
                                       "NoPool", [1, 1], [3], True, S)
    params = mine.init(jax.random.PRNGKey(0))
    p = params["params"]
    # GAT stack: gat[0] and gat[2] (pooling in between)
    p["GraphAttentional_0"]["mixer"] = jnp.asarray(_np(ref.GAT[0].mixer))
    p["GraphAttentional_0"]["weight"] = jnp.asarray(_np(ref.GAT[0].weight))
    p["GraphAttentional_1"]["mixer"] = jnp.asarray(_np(ref.GAT[2].mixer))
    p["GraphAttentional_1"]["weight"] = jnp.asarray(_np(ref.GAT[2].weight))
    p["MLP_0"]["TorchDense_0"]["kernel"] = jnp.asarray(_np(ref.MLP[0].weight).T)
    p["MLP_0"]["TorchDense_0"]["bias"] = jnp.asarray(_np(ref.MLP[0].bias))
    _close(mine.apply(params, x), ref(torch.tensor(x)), atol=1e-4, rtol=1e-3)


def test_aggregation_gnn_full_parity(S, x):
    gml = __import__("alegnn.utils.graphML", fromlist=["NoPool"])
    ref = ref_archs.AggregationGNN([1, 4, 8], [3, 3], True, tnn.ReLU,
                                   tnn.MaxPool1d, [2, 2], [5],
                                   S.astype(np.float32), maxN=16).float()
    ref.SN = ref.SN.float()
    mine = archs.AggregationGNN([1, 4, 8], [3, 3], True, "relu",
                                "MaxPoolLocal", [2, 2], [5], S, maxN=16)
    params = mine.init(jax.random.PRNGKey(0))
    p = params["params"]
    # torch Conv1d weight (C_out, C_in, K) -> flax Conv kernel (K, C_in, C_out)
    for l, ref_idx in ((0, 0), (1, 3)):
        conv = ref.ConvLayers[ref_idx]
        p[f"Conv_{l}"]["kernel"] = jnp.asarray(
            _np(conv.weight).transpose(2, 1, 0))
        p[f"Conv_{l}"]["bias"] = jnp.asarray(_np(conv.bias))
    p["MLP_0"]["TorchDense_0"]["kernel"] = jnp.asarray(_np(ref.MLP[0].weight).T)
    p["MLP_0"]["TorchDense_0"]["bias"] = jnp.asarray(_np(ref.MLP[0].bias))
    _close(mine.apply(params, x), ref(torch.tensor(x)), atol=1e-4, rtol=1e-3)


def test_grnn_full_parity(S):
    T = 4
    H = 4
    xt = RNG.standard_normal((B, T, 1, N)).astype(np.float32)
    z0 = RNG.standard_normal((B, H, N)).astype(np.float32)
    ref = ref_archs.GraphRecurrentNN(1, 2, H, [2, 2], True, torch.tanh,
                                     torch.relu, tnn.ReLU, [2],
                                     S.astype(np.float32)).float()
    mine = archs.GraphRecurrentNN(1, 2, H, [2, 2], True, "tanh", "relu",
                                  "relu", [2], S)
    params = mine.init(jax.random.PRNGKey(0), T=T)
    p = params["params"]
    hs = ref.hiddenState
    p["hiddenState"]["aWeights"] = jnp.asarray(_np(hs.aWeights))
    p["hiddenState"]["bWeights"] = jnp.asarray(_np(hs.bWeights))
    p["hiddenState"]["xBias"] = jnp.asarray(_np(hs.xBias))
    p["hiddenState"]["zBias"] = jnp.asarray(_np(hs.zBias))
    p["outputState"]["weight"] = jnp.asarray(_np(ref.outputState.weight))
    p["outputState"]["bias"] = jnp.asarray(_np(ref.outputState.bias))
    p["Readout"]["TorchDense_0"]["kernel"] = jnp.asarray(
        _np(ref.Readout[0].weight).T)
    p["Readout"]["TorchDense_0"]["bias"] = jnp.asarray(
        _np(ref.Readout[0].bias))
    # inject the same z0 into the reference (it draws torch.randn inline)
    with mock.patch.object(torch, "randn",
                           lambda *a, **k: torch.tensor(z0)):
        ref_out = ref(torch.tensor(xt))
    my_out = mine.apply(params, xt, z0=jnp.asarray(z0))
    _close(my_out, ref_out, atol=1e-4, rtol=1e-3)
