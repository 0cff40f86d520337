"""Randomized cross-mode consistency (fuzz) tests.

The fixed-seed parity suites pin each mode against the reference; these
sweep RANDOM graphs (varied size, density, edge features, topologies)
and assert that every GSO layout the framework offers — dense einsum,
band Pallas slab, BCSR Pallas blocks, COO edge list — computes the SAME
shift, filter, and architecture outputs and input-gradients. Catches
layout-extraction edge cases (empty block rows/columns, padding tails,
asymmetric patterns) that hand-picked cases miss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from graph_neural_networks_tpu.models import architectures as archs
from graph_neural_networks_tpu.ops import filters
from graph_neural_networks_tpu.ops import gso as gso_lib
from graph_neural_networks_tpu.ops.attention_sparse import build_edge_list

MODES = ("band", "bcsr", "edge")


def _random_graph(rng, N, E, density, topology):
    """A random (E, N, N) GSO: 'scatter' = uniform sparsity, 'banded' =
    nonzeros near the diagonal (exercises small-w band slabs), 'block' =
    community blocks (exercises BCSR segment walks)."""
    S = np.zeros((E, N, N))
    if topology == "banded":
        bw = max(2, int(N * density * 4))
        for i in range(N):
            lo, hi = max(0, i - bw), min(N, i + bw + 1)
            row = rng.random(hi - lo) * (rng.random(hi - lo) < 0.5)
            S[:, i, lo:hi] = row * rng.random((E, 1))
    elif topology == "block":
        nb = max(1, N // 16)
        for _ in range(max(1, int(nb * nb * density * 8))):
            bi, bj = rng.integers(0, nb, 2)
            blk = rng.random((E, 16, 16)) * (rng.random((16, 16)) < 0.3)
            S[:, bi * 16:(bi + 1) * 16, bj * 16:(bj + 1) * 16] = blk
        S = S[:, :N, :N]
    else:
        mask = rng.random((N, N)) < density
        S = rng.random((E, N, N)) * mask
    # keep magnitudes tame (normalized GSOs in practice)
    denom = max(np.abs(S).max(), 1e-6)
    return S / denom


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_gshift_modes_agree(seed):
    rng = np.random.default_rng(100 + seed)
    N = int(rng.integers(20, 150))
    E = int(rng.integers(1, 3))
    topology = ["scatter", "banded", "block"][seed % 3]
    density = float(rng.uniform(0.02, 0.2))
    S = _random_graph(rng, N, E, density, topology)
    B, G = 2, 3
    x = jnp.asarray(rng.standard_normal((B, E, G, N)), jnp.float32)

    ref = gso_lib.gshift(gso_lib.as_gso(S, mode="dense"), x)
    with pltpu.force_tpu_interpret_mode():
        for mode in MODES:
            g = (build_edge_list(S) if mode == "edge"
                 else gso_lib.as_gso(S, mode=mode))
            out = gso_lib.gshift(g, x)
            np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5,
                                       err_msg=f"mode={mode} N={N} E={E} "
                                               f"topology={topology}")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lsigf_modes_agree_with_grads(seed):
    rng = np.random.default_rng(200 + seed)
    N = int(rng.integers(24, 100))
    E, G, F, K, B = 1, 2, 3, int(rng.integers(2, 5)), 2
    topology = ["banded", "scatter", "block"][seed % 3]
    S = _random_graph(rng, N, E, 0.08, topology)
    h = jnp.asarray(rng.standard_normal((F, E, K, G)), jnp.float32) * 0.3
    x = jnp.asarray(rng.standard_normal((B, G, N)), jnp.float32)

    def run(g):
        def f(xx):
            return jnp.sum(filters.lsigf(h, g, xx) ** 2)
        return filters.lsigf(h, g, x), jax.grad(f)(x)

    y_ref, dx_ref = run(gso_lib.as_gso(S, mode="dense"))
    with pltpu.force_tpu_interpret_mode():
      for mode in MODES:
        g = (build_edge_list(S) if mode == "edge"
             else gso_lib.as_gso(S, mode=mode))
        y, dx = run(g)
        np.testing.assert_allclose(y, y_ref, rtol=5e-5, atol=5e-5,
                                   err_msg=f"fwd mode={mode} N={N} K={K}")
        np.testing.assert_allclose(dx, dx_ref, rtol=5e-4, atol=5e-4,
                                   err_msg=f"grad mode={mode} N={N} K={K}")


@pytest.mark.parametrize("seed", [0, 1])
def test_selection_gnn_gso_modes_agree(seed):
    rng = np.random.default_rng(300 + seed)
    N = int(rng.integers(32, 80))
    S = _random_graph(rng, N, 1, 0.1,
                      "banded" if seed % 2 else "scatter")[0]
    B, C = 3, 2
    x = jnp.asarray(rng.standard_normal((B, 1, N)), jnp.float32)

    outs = {}
    with pltpu.force_tpu_interpret_mode():
      for mode in ("dense",) + MODES:
        arch = archs.SelectionGNN([1, 4, 4], [3, 2], True, "relu", [N, N],
                                  "NoPool", [1, 1], [C], S, gsoMode=mode)
        params = arch.init(jax.random.PRNGKey(7))
        outs[mode] = np.asarray(arch.apply(params, x))
    for mode in MODES:
        np.testing.assert_allclose(outs[mode], outs["dense"], rtol=2e-4,
                                   atol=2e-5, err_msg=f"mode={mode} N={N}")


@pytest.mark.parametrize("seed", [0, 1])
def test_gat_attention_modes_agree(seed):
    rng = np.random.default_rng(400 + seed)
    N = int(rng.integers(32, 96))
    S = _random_graph(rng, N, 1, 0.08, "banded")[0]
    S = (S + S.T) / 2  # attention masks assume symmetric support
    B, C = 2, 2
    x = jnp.asarray(rng.standard_normal((B, 1, N)), jnp.float32)

    outs = {}
    with pltpu.force_tpu_interpret_mode():
      for mode in ("dense", "band", "edge"):
        arch = archs.GraphAttentionNetwork([1, 4], [2], "relu", [N],
                                           "NoPool", [1], [C], True, S,
                                           attentionMode=mode)
        params = arch.init(jax.random.PRNGKey(8))
        outs[mode] = np.asarray(arch.apply(params, x))
    for mode in ("band", "edge"):
        np.testing.assert_allclose(outs[mode], outs["dense"], rtol=3e-4,
                                   atol=3e-5, err_msg=f"mode={mode} N={N}")
