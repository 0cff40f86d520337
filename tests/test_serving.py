"""Serving path: AOT compilation, ragged-batch padding, bf16, export."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_networks_tpu import serving
from graph_neural_networks_tpu.models import architectures as archs
from graph_neural_networks_tpu.models import architectures_time as archt
from graph_neural_networks_tpu.utils import graph as gt


@pytest.fixture(scope="module")
def sel():
    rng = np.random.default_rng(0)
    N = 24
    G = gt.Graph("SBM", N, {"nCommunities": 3, "probIntra": 0.8,
                            "probInter": 0.2}, rng=rng)
    S = G.W / np.max(np.abs(np.linalg.eigvalsh(G.W)))
    arch = archs.SelectionGNN([1, 8, 8], [3, 3], True, "relu", [N, N],
                              "NoPool", [1, 1], [3], S)
    params = arch.init(jax.random.PRNGKey(0))
    return arch, params, N


def test_engine_matches_forward(sel):
    arch, params, N = sel
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 1, N)).astype(np.float32)
    eng = serving.InferenceEngine(arch, params, (x,))
    np.testing.assert_allclose(eng(x), arch(params, x), rtol=1e-5,
                               atol=1e-6)


def test_engine_pads_ragged_batches(sel):
    arch, params, N = sel
    rng = np.random.default_rng(2)
    x8 = rng.standard_normal((8, 1, N)).astype(np.float32)
    eng = serving.InferenceEngine(arch, params, (x8,))
    for n in (1, 3, 8):
        x = x8[:n]
        y = eng(x)
        assert y.shape[0] == n
        np.testing.assert_allclose(y, arch(params, x), rtol=1e-5,
                                   atol=1e-6)
    with pytest.raises(AssertionError):
        eng(rng.standard_normal((9, 1, N)).astype(np.float32))


def test_engine_bf16(sel):
    arch, params, N = sel
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 1, N)).astype(np.float32)
    eng = serving.InferenceEngine(arch, params, (x,), dtype=jnp.bfloat16)
    y = eng(x)
    assert y.dtype == jnp.float32
    # bf16 has ~3 decimal digits; logits should still rank-match mostly
    y32 = np.asarray(arch(params, x))
    np.testing.assert_allclose(y, y32, rtol=0.1, atol=0.1)


def test_engine_cost_analysis(sel):
    arch, params, N = sel
    x = np.zeros((4, 1, N), np.float32)
    eng = serving.InferenceEngine(arch, params, (x,))
    f = eng.flops_per_sample()
    assert np.isfinite(f) and f > 0


def test_engine_db_architecture():
    """DB family: (x, S) forwards, including an EllGso graph input."""
    from graph_neural_networks_tpu.ops import ell as ell_lib
    from tests.test_ell import _random_db_gso
    rng = np.random.default_rng(4)
    B, T, N = 4, 5, 12
    S = _random_db_gso(rng, B, T, 1, N, 3)
    x = rng.standard_normal((B, T, 6, N)).astype(np.float32)
    arch = archt.LocalGNN_DB([6, 8], [2], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=N, T=T)
    ell = ell_lib.ell_from_dense(S)
    eng = serving.InferenceEngine(arch, params, (x, ell))
    y = eng(x, ell)
    np.testing.assert_allclose(y, arch(params, x, ell), rtol=1e-5,
                               atol=1e-6)


def test_export_roundtrip(sel, tmp_path):
    arch, params, N = sel
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 1, N)).astype(np.float32)
    path = str(tmp_path / "selgnn.stablehlo")
    serving.export_model(arch, params, (x,), path=path)
    fwd = serving.load_exported(path)
    np.testing.assert_allclose(fwd(x), arch(params, x), rtol=1e-5,
                               atol=1e-6)
