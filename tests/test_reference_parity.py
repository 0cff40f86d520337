"""Golden parity vs the actual reference implementation.

Imports the reference (`/root/reference`, torch CPU) and checks that every
filter functional and layer produces the SAME activations as this
framework given identical weights and GSO — the BASELINE.md acceptance
criterion ("per-layer activations allclose vs reference semantics").
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
# dataTools pulls optional deps the container may lack; stub the missing
# ones (tests only touch graphML / graphTools, which don't use them).
for _mod in ("hdf5storage", "gensim", "matplotlib", "matplotlib.pyplot"):
    try:
        __import__(_mod)
    except ImportError:
        sys.modules.setdefault(_mod, types.ModuleType(_mod))

# numpy 2.x removed the deprecated scalar aliases the reference still uses
# (graphTools.py:525 np.int, :1461 np.bool) — shim them for the comparison.
for _alias, _type in (("int", int), ("bool", bool), ("float", float),
                      ("object", object)):
    if not hasattr(np, _alias):
        setattr(np, _alias, _type)

import alegnn.utils.graphML as gml  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from graph_neural_networks_tpu.ops import filters, gso as gso_lib  # noqa: E402
from graph_neural_networks_tpu.utils import graph as gt  # noqa: E402

RNG = np.random.default_rng(42)
B, G, F, E, K, N = 3, 2, 4, 2, 3, 12


def _t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


def _j(x):
    return jnp.asarray(np.asarray(x), jnp.float32)


def _rand(*shape, scale=0.6):
    return (RNG.random(shape) - 0.5) * 2 * scale


@pytest.fixture(scope="module")
def S():
    W = gt.create_graph("SBM", N, {"nCommunities": 3, "probIntra": 0.8,
                                   "probInter": 0.25},
                        rng=np.random.default_rng(3))
    W = W / np.max(np.abs(np.linalg.eigvalsh(W)))
    return np.stack([W, 0.5 * W + 0.1 * np.triu(W)])  # E=2 edge features


@pytest.fixture(scope="module")
def x():
    return _rand(B, G, N)


def _close(mine, ref, atol=2e-5, rtol=2e-4):
    np.testing.assert_allclose(np.asarray(mine),
                               ref.detach().numpy(), atol=atol, rtol=rtol)


# --- functionals -----------------------------------------------------------

def test_lsigf_parity(S, x):
    h = _rand(F, E, K, G)
    b = _rand(F, 1)
    ref = gml.LSIGF(_t(h), _t(S), _t(x), _t(b))
    mine = filters.lsigf(_j(h), gso_lib.as_gso(S), _j(x), _j(b))
    _close(mine, ref)


def test_spectral_gf_parity(S, x):
    Ssym = (S + S.transpose(0, 2, 1)) / 2
    V = np.stack([np.linalg.eigh(Ssym[e])[1] for e in range(E)])
    VH = V.transpose(0, 2, 1)
    h = _rand(F, E, G, N)
    ref = gml.spectralGF(_t(h), _t(V), _t(VH), _t(x))
    mine = filters.spectral_gf(_j(h), _j(V), _j(VH), _j(x))
    _close(mine, ref)


def test_nvgf_parity(S, x):
    h = _rand(F, E, K, G, N)
    ref = gml.NVGF(_t(h), _t(S), _t(x))
    mine = filters.nvgf(_j(h), gso_lib.as_gso(S), _j(x))
    _close(mine, ref)


def test_evgf_parity(S, x):
    Phi = _rand(F, E, K, G, N, N)
    ref = gml.EVGF(_t(Phi), _t(x))
    mine = filters.evgf(_j(Phi), _j(x))
    _close(mine, ref, atol=5e-5)


def test_jarma_parity(S, x):
    P = 2
    psi = _rand(F, E, P, G, scale=0.3)
    varphi = _rand(F, E, P, G)
    phi = _rand(F, E, K, G)
    ref = gml.jARMA(_t(psi), _t(varphi), _t(phi), _t(S), _t(x), tMax=4)
    mine = filters.jarma(_j(psi), _j(varphi), _j(phi), gso_lib.as_gso(S),
                         _j(x), t_max=4)
    _close(mine, ref, atol=5e-4, rtol=5e-3)


def test_attention_gso_parity(S, x):
    P = 3
    a = _rand(P, E, 2 * F)
    W = _rand(P, E, F, G)
    ref = gml.learnAttentionGSO(_t(x), _t(a), _t(W), _t(S))
    mine = filters.attention_gso(_j(x), _j(a), _j(W), gso_lib.as_gso(S))
    _close(mine, ref, atol=1e-4, rtol=1e-3)


def test_graph_attention_parity(S, x):
    P = 3
    a = _rand(P, E, 2 * F)
    W = _rand(P, E, F, G)
    ref = gml.graphAttention(_t(x), _t(a), _t(W), _t(S))
    mine = filters.graph_attention(_j(x), _j(a), _j(W), gso_lib.as_gso(S))
    _close(mine, ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("Fo", [G, F])
def test_gat_lsigf_parity(S, x, Fo):
    """Exact parity including the reference's tap-layout quirk
    (graphML.py:863-865 reinterprets W via permute+reshape — replicated
    bit-for-bit in filters.gat_lsigf)."""
    P = 2
    h = _rand(E, K)
    a = _rand(P, E, 2 * Fo)
    W = _rand(P, E, Fo, G)
    ref = gml.graphAttentionLSIGF(_t(h), _t(x), _t(a), _t(W), _t(S))
    mine = filters.gat_lsigf(_j(h), _j(x), _j(a), _j(W), gso_lib.as_gso(S))
    _close(mine, ref, atol=1e-4, rtol=1e-3)


def test_gat_evgf_parity(S, x):
    P, Kk = 2, 3
    a = _rand(P, Kk, E, 2 * F)
    W = _rand(P, Kk, E, F, G)
    ref = gml.graphAttentionEVGF(_t(x), _t(a), _t(W), _t(S))
    mine = filters.gat_evgf(_j(x), _j(a), _j(W), gso_lib.as_gso(S))
    _close(mine, ref, atol=1e-4, rtol=1e-3)


T = 4


def test_lsigf_db_parity(S, x):
    h = _rand(F, E, K, G)
    Sbt = np.stack([np.stack([S * (1 + 0.05 * t) for t in range(T)])
                    for _ in range(B)])
    xt = _rand(B, T, G, N)
    ref = gml.LSIGF_DB(_t(h), _t(Sbt), _t(xt))
    mine = filters.lsigf_db(_j(h), _j(Sbt), _j(xt))
    _close(mine, ref, atol=5e-5, rtol=5e-4)


def test_grnn_db_parity(S):
    # E=1: the reference's register update (graphML.py:1234) crashes for
    # E>1 in current torch (another latent limitation we don't replicate)
    E = 1
    S = S[:1]
    H = 3
    a = _rand(H, E, K, G, scale=0.4)
    bt = _rand(H, E, K, H, scale=0.4)
    Sbt = np.stack([np.stack([S * (1 + 0.05 * t) for t in range(T)])
                    for _ in range(B)])
    xt = _rand(B, T, G, N)
    z0 = _rand(B, H, N)
    xb = _rand(H, 1)
    zb = _rand(H, 1)

    # float32 run: the reference's internal selection matrix CK is created
    # float32 (graphML.py:1181), so float64 inputs crash at t >= K
    def _t(v):
        return torch.tensor(np.asarray(v), dtype=torch.float32)
    # bias shape (H, 1): what HiddenState_DB actually passes
    # (graphML.py:3512; the docstring's (1,1,H,1) breaks broadcasting)
    ref = gml.GRNN_DB(_t(a), _t(bt), _t(Sbt), _t(xt), _t(z0), torch.tanh,
                      xBias=_t(xb), zBias=_t(zb))
    mine = filters.grnn_db(_j(a), _j(bt), _j(Sbt), _j(xt), _j(z0), jnp.tanh,
                           x_bias=_j(xb), z_bias=_j(zb))
    _close(mine, ref, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("gate", ["none", "time", "node", "edge"])
def test_gated_grnn_parity(S, gate):
    E = 1  # reference edge gating assumes a single edge feature (:1415)
    S = S[:1]
    H = 3
    a = _rand(H, E, K, G, scale=0.4)
    bt = _rand(H, E, K, H, scale=0.4)
    xt = _rand(B, T, G, N)
    z0 = _rand(B, H, N)
    if gate == "none":
        qh_t = qc_t = torch.ones(1, dtype=torch.float64)
        qh_j = qc_j = None
    else:
        shape = {"time": (B, T, 1, 1), "node": (B, T, 1, N),
                 "edge": (B, T, 1, N, N)}[gate]
        qh = RNG.random(shape)
        qc = RNG.random(shape)
        qh_t, qc_t = _t(qh), _t(qc)
        qh_j, qc_j = _j(qh), _j(qc)
    ref = gml.GatedGRNN(_t(a), _t(bt), _t(S), _t(xt), _t(z0), torch.tanh,
                        q_hat=qh_t, q_check=qc_t)
    mine = filters.gated_grnn(_j(a), _j(bt), gso_lib.as_gso(S), _j(xt),
                              _j(z0), jnp.tanh, q_hat=qh_j, q_check=qc_j)
    _close(mine, ref, atol=1e-4, rtol=1e-3)


# --- layers (zero-pad/slice + structure precompute contracts) --------------

def test_graph_filter_layer_parity(S, x):
    from graph_neural_networks_tpu.models import layers as gll
    ref_layer = gml.GraphFilter(G, F, K, E, bias=True).double()
    ref_layer.addGSO(_t(S))
    mine = gll.GraphFilter(G, F, K, E, True)
    params = mine.init(jax.random.PRNGKey(0), _j(x), gso_lib.as_gso(S))
    params = {"params": {
        "weight": _j(ref_layer.weight.detach().numpy()),
        "bias": _j(ref_layer.bias.detach().numpy())}}
    got = mine.apply(params, _j(x), gso_lib.as_gso(S))
    _close(got, ref_layer(_t(x)))


def test_graph_filter_layer_zero_pad_parity(S, x):
    """The selection-pooling contract: input with fewer nodes than the GSO
    is zero-padded, output sliced back (graphML.py:2125-2144)."""
    from graph_neural_networks_tpu.models import layers as gll
    n_in = N - 4
    xs = x[..., :n_in]
    ref_layer = gml.GraphFilter(G, F, K, E, bias=True).double()
    ref_layer.addGSO(_t(S))
    mine = gll.GraphFilter(G, F, K, E, True)
    params = {"params": {
        "weight": _j(ref_layer.weight.detach().numpy()),
        "bias": _j(ref_layer.bias.detach().numpy())}}
    got = mine.apply(params, _j(xs), gso_lib.as_gso(S))
    _close(got, ref_layer(_t(xs)))


def test_max_local_activation_parity(S, x):
    from graph_neural_networks_tpu.models import layers as gll
    Kact = 2
    ref_layer = gml.MaxLocalActivation(Kact).double()
    ref_layer.addGSO(_t(S))
    xf = x[:, :1, :]  # single feature
    ref_out = ref_layer(_t(xf))
    # my neighbor tables (self-padded 'matrix' form, same as reference)
    tables = []
    for k in range(1, Kact + 1):
        tbl = gt.compute_neighborhood(S, k, output_type="matrix")
        tables.append(jnp.asarray(tbl, jnp.int32))
    mine = gll.MaxLocalActivation(Kact)
    params = {"params": {"weight": _j(ref_layer.weight.detach().numpy())}}
    got = mine.apply(params, _j(xf), tables)
    _close(got, ref_out)


def test_median_local_activation_parity(S, x):
    from graph_neural_networks_tpu.models import layers as gll
    Kact = 1
    ref_layer = gml.MedianLocalActivation(Kact).double()
    ref_layer.addGSO(_t(S))
    xf = x[:, :1, :]
    ref_out = ref_layer(_t(xf))
    lst = gt.compute_neighborhood(S, 1, output_type="list")
    width = max(len(v) for v in lst)
    tbl = np.empty((N, width), np.int64)
    cnt = np.empty((N,), np.int64)
    for i, v in enumerate(lst):
        tbl[i, :len(v)] = v
        tbl[i, len(v):] = i
        cnt[i] = len(v)
    mine = gll.MedianLocalActivation(Kact)
    params = {"params": {"weight": _j(ref_layer.weight.detach().numpy())}}
    got = mine.apply(params, _j(xf), [jnp.asarray(tbl, jnp.int32)],
                     [jnp.asarray(cnt, jnp.int32)])
    _close(got, ref_out)


def test_max_pool_local_parity(S, x):
    from graph_neural_networks_tpu.models import layers as gll
    n_out = 6
    ref_layer = gml.MaxPoolLocal(N, n_out, 2)
    ref_layer.addGSO(_t(S))
    ref_out = ref_layer(_t(x))
    tbl = gt.compute_neighborhood(S, 2, n_rows=n_out, nb=N,
                                  output_type="matrix")
    mine = gll.MaxPoolLocal(N, n_out, 2)
    got = mine.apply({}, _j(x), jnp.asarray(tbl, jnp.int32))
    _close(got, ref_out)


def test_edge_variant_layer_parity(S, x):
    from graph_neural_networks_tpu.models import layers as gll
    M = 8
    ref_layer = gml.EdgeVariantGF(G, F, K, M, N, E, bias=True).double()
    ref_layer.addGSO(_t(S))
    ref_out = ref_layer(_t(x))
    ident, pattern = gt.ev_sparsity_pattern(S, M)
    mine = gll.EdgeVariantGF(G, F, K, M, N, E, True)
    params = {"params": {
        "weightEV": _j(ref_layer.weightEV.detach().numpy()),
        "weightLSI": _j(ref_layer.weightLSI.detach().numpy()),
        "bias": _j(ref_layer.bias.detach().numpy())}}
    got = mine.apply(params, _j(x), gso_lib.as_gso(S), _j(ident), _j(pattern))
    _close(got, ref_out, atol=5e-5)


def test_node_variant_layer_parity(S, x):
    from graph_neural_networks_tpu.models import layers as gll
    M = 7
    ref_layer = gml.NodeVariantGF(G, F, K, M, E, bias=True).double()
    ref_layer.addGSO(_t(S))
    ref_out = ref_layer(_t(x))
    copy_nodes = gt.nv_copy_nodes(S, M)
    np.testing.assert_array_equal(copy_nodes,
                                  ref_layer.copyNodes.numpy())
    mine = gll.NodeVariantGF(G, F, K, M, E, True)
    params = {"params": {
        "weight": _j(ref_layer.weight.detach().numpy()),
        "bias": _j(ref_layer.bias.detach().numpy())}}
    got = mine.apply(params, _j(x), gso_lib.as_gso(S),
                     jnp.asarray(copy_nodes))
    _close(got, ref_out)


def test_hidden_state_db_layer_parity(S):
    from graph_neural_networks_tpu.models import layers as gll
    E = 1  # see test_grnn_db_parity
    S = S[:1]
    H = 3
    Sbt = np.stack([np.stack([S * (1 + 0.05 * t) for t in range(T)])
                    for _ in range(B)])
    xt = _rand(B, T, G, N)
    z0 = _rand(B, H, N)
    # float32 (see test_grnn_db_parity)
    def _t32(v):
        return torch.tensor(np.asarray(v), dtype=torch.float32)
    ref_layer = gml.HiddenState_DB(G, H, K, nonlinearity=torch.tanh,
                                   E=E, bias=True).float()
    ref_layer.addGSO(_t32(Sbt))
    ref_z, ref_zT = ref_layer(_t32(xt), _t32(z0))
    mine = gll.HiddenStateDB(G, H, K, nonlinearity=jnp.tanh,
                             edge_features=E, use_bias=True)
    params = {"params": {
        "aWeights": _j(ref_layer.aWeights.detach().numpy()),
        "bWeights": _j(ref_layer.bWeights.detach().numpy()),
        "xBias": _j(ref_layer.xBias.detach().numpy()),
        "zBias": _j(ref_layer.zBias.detach().numpy())}}
    got_z, got_zT = mine.apply(params, _j(xt), _j(z0), _j(Sbt))
    _close(got_z, ref_z, atol=1e-4, rtol=1e-3)
    # ref zT is (B,1,1,H,N) (double unsqueeze, graphML.py:3517); ours (B,1,H,N)
    _close(got_zT, ref_zT.squeeze(1), atol=1e-4, rtol=1e-3)


def test_neighborhood_matches_reference(S):
    """computeNeighborhood parity (the structural precompute both pooling
    and local activations rely on)."""
    import alegnn.utils.graphTools as ref_gt
    for k in (1, 2, 3):
        ref_nb = ref_gt.computeNeighborhood(np.abs(S), k, outputType="list")
        my_nb = gt.compute_neighborhood(S, k, output_type="list")
        for i in range(N):
            assert set(map(int, ref_nb[i])) == set(map(int, my_nb[i])), \
                f"k={k}, node {i}"
