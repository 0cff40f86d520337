"""Multi-device tests on the 8-device virtual CPU mesh: sharded shifts
match the single-device dense shift; data-parallel step matches
single-device training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graph_neural_networks_tpu import parallel as par
from graph_neural_networks_tpu.ops import gso as gso_lib
from graph_neural_networks_tpu.utils import graph as gt

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return par.make_mesh((1, 8))


@pytest.fixture(scope="module")
def band_graph():
    # a path-of-clusters graph: banded after RCM
    N = 64
    W = np.zeros((N, N))
    for i in range(N - 1):
        W[i, i + 1] = W[i + 1, i] = 1.0
    extra = RNG.integers(0, N - 4, 30)
    for i in extra:
        W[i, i + 3] = W[i + 3, i] = 0.5
    return W


def test_partition_ring(band_graph):
    part = par.partition_nodes(band_graph, 8)
    assert part.n_padded % 8 == 0
    assert part.is_ring, f"bandwidth {part.bandwidth}"
    # pad/unpad round trip
    x = RNG.random((3, 64))
    np.testing.assert_allclose(part.unpad_signal(part.pad_signal(x)), x)


def test_sharded_allgather_matches_dense(mesh, band_graph):
    part = par.partition_nodes(band_graph, 8)
    Np = part.n_padded
    x = RNG.random((2, 1, 3, 64)).astype(np.float32)   # B x E x G x N
    xp = part.pad_signal(x)
    shift = par.sharded_gshift_allgather(mesh, part)
    with mesh:
        got = np.asarray(shift(jnp.asarray(xp)))
    want = np.einsum("begn,enm->begm", xp, part.S_perm)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sharded_ring_matches_dense(mesh, band_graph):
    part = par.partition_nodes(band_graph, 8)
    x = RNG.random((2, 1, 3, 64)).astype(np.float32)
    xp = part.pad_signal(x)
    shift = par.sharded_gshift_ring(mesh, part)
    with mesh:
        got = np.asarray(shift(jnp.asarray(xp)))
    want = np.einsum("begn,enm->begm", xp, part.S_perm)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sharded_matches_gshift_roundtrip(mesh, band_graph):
    """End to end: unpad(sharded_shift(pad(x))) == dense gshift on the
    original graph."""
    part = par.partition_nodes(band_graph, 8)
    x = RNG.random((2, 1, 3, 64)).astype(np.float32)
    g = gso_lib.as_gso(band_graph)
    want = np.asarray(gso_lib.gshift(g, jnp.asarray(x)))
    shift = par.sharded_gshift_ring(mesh, part)
    with mesh:
        got = part.unpad_signal(np.asarray(shift(jnp.asarray(part.pad_signal(x)))))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_dp_train_step_matches_single(mesh):
    """Gradient step under data-parallel sharding == single-device step."""
    dmesh = par.make_mesh((8, 1))
    Wk = RNG.random((6, 4)).astype(np.float32)
    params = {"w": jnp.asarray(Wk)}
    opt = optax.sgd(0.1)
    opt_state = opt.init(params)
    x = RNG.random((16, 6)).astype(np.float32)
    y = RNG.random((16, 4)).astype(np.float32)

    def step(p, s, xb, yb):
        def loss(p):
            return jnp.mean((xb @ p["w"] - yb) ** 2)
        l, g = jax.value_and_grad(loss)(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, l

    p1, _, l1 = jax.jit(step)(params, opt_state, x, y)
    dp_step = par.make_dp_train_step(step, dmesh)
    p2, _, l2 = dp_step(params, opt_state, x, y)
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    np.testing.assert_allclose(p1["w"], p2["w"], rtol=1e-5)


def test_sharded_gso_lsigf_matches_dense(mesh, band_graph):
    """The whole point: filters.lsigf with a ShardedGso == dense lsigf."""
    from graph_neural_networks_tpu.ops import filters
    part = par.partition_nodes(band_graph, 8)
    sgso = par.ShardedGso(mesh, part)
    assert sgso.uses_ring
    h = RNG.random((4, 1, 3, 2)).astype(np.float32)   # F,E,K,G
    x = RNG.random((2, 2, 64)).astype(np.float32)     # B,G,N
    want = np.asarray(filters.lsigf(jnp.asarray(h),
                                    gso_lib.as_gso(part.S_perm),
                                    jnp.asarray(part.pad_signal(x))))
    with mesh:
        got = np.asarray(filters.lsigf(jnp.asarray(h), sgso,
                                       jnp.asarray(part.pad_signal(x))))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_architecture_shard_matches_dense(mesh, band_graph):
    """Full SelectionGNN forward with a node-sharded GSO (arch.shard) ==
    the dense single-device forward."""
    import jax
    from graph_neural_networks_tpu.models import architectures as archs
    S = band_graph / np.max(np.abs(np.linalg.eigvalsh(band_graph)))
    arch = archs.SelectionGNN([1, 4, 4], [3, 3], True, "relu", [64, 64],
                              "NoPool", [1, 1], [3], S)
    params = arch.init(jax.random.PRNGKey(0))
    x = RNG.random((3, 1, 64)).astype(np.float32)
    want = np.asarray(arch.apply(params, x))
    arch.shard(mesh, 8)
    with mesh:
        got = np.asarray(arch.apply(params, x))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_partition_general_graph_falls_back(mesh):
    W = gt.create_graph("SBM", 40, {"nCommunities": 2, "probIntra": 0.9,
                                    "probInter": 0.3},
                        rng=np.random.default_rng(1))
    part = par.partition_nodes(W, 8)
    if not part.is_ring:
        with pytest.raises(AssertionError):
            par.sharded_gshift_ring(mesh, part)
    # all-gather path always works
    x = RNG.random((1, 1, 2, 40)).astype(np.float32)
    xp = part.pad_signal(x)
    shift = par.sharded_gshift_allgather(mesh, part)
    with mesh:
        got = np.asarray(shift(jnp.asarray(xp)))
    want = np.einsum("begn,enm->begm", xp, part.S_perm)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
