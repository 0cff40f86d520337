"""Sharded band attention on the 8-device virtual CPU mesh vs the dense
reference attention (same masking arithmetic), forward and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_networks_tpu import parallel as par
from graph_neural_networks_tpu.ops import filters, gso as gso_lib
from graph_neural_networks_tpu.parallel import attention as sha

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return par.make_mesh((2, 4), ("data", "graph"))


def _graph(N=96, bw=10, E=1, seed=0):
    rng = np.random.default_rng(seed)
    S = np.zeros((E, N, N), np.float32)
    for e in range(E):
        for i in range(N - 1):
            S[e, i, i + 1] = S[e, i + 1, i] = rng.random() + 0.1
        ii = rng.integers(0, N - bw, 60)
        for i in ii:
            j = i + rng.integers(1, bw)
            S[e, i, j] = S[e, j, i] = rng.random()
    return S


def _setup(E=1, P=2, F=3, G=2, B=2, seed=0):
    S = _graph(E=E, seed=seed)
    part = par.partition_nodes(S, 4, order="none")
    assert part.is_ring
    rng = np.random.default_rng(seed + 1)
    x = rng.standard_normal((B, G, S.shape[1])).astype(np.float32)
    xp = jnp.asarray(part.pad_signal(x))
    a = jnp.asarray(rng.standard_normal((P, E, 2 * F)) * .3, jnp.float32)
    W_p = jnp.asarray(rng.standard_normal((P, E, F, G)) * .3, jnp.float32)
    Sd = gso_lib.as_gso(part.S_perm)
    return part, xp, a, W_p, Sd


def test_sharded_gat_matches_dense(mesh):
    part, xp, a, W_p, Sd = _setup()
    sattn = sha.ShardedBandAttention(mesh, part, data_axis="data")
    with mesh:
        got = np.asarray(sha.sharded_graph_attention(xp, a, W_p, sattn))
    want = np.asarray(filters.graph_attention(xp, a, W_p, Sd))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_sharded_gat_multi_edge_feature(mesh):
    part, xp, a, W_p, Sd = _setup(E=2, seed=4)
    sattn = sha.ShardedBandAttention(mesh, part, data_axis="data")
    with mesh:
        got = np.asarray(sha.sharded_graph_attention(xp, a, W_p, sattn))
    want = np.asarray(filters.graph_attention(xp, a, W_p, Sd))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_sharded_gat_grads_match_dense(mesh):
    part, xp, a, W_p, Sd = _setup()
    sattn = sha.ShardedBandAttention(mesh, part)

    def loss_sharded(x, a, W):
        return jnp.sum(sha.sharded_graph_attention(x, a, W, sattn) ** 2)

    def loss_dense(x, a, W):
        return jnp.sum(filters.graph_attention(x, a, W, Sd) ** 2)

    with mesh:
        gs = jax.grad(loss_sharded, argnums=(0, 1, 2))(xp, a, W_p)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(xp, a, W_p)
    for got, want, name in zip(gs, gd, ("x", "a", "W")):
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3,
                                   err_msg=name)


def test_sharded_gcat_matches_dense(mesh):
    part, xp, a, W_p, Sd = _setup(seed=6)
    h = jnp.asarray(np.random.default_rng(5).random((1, 3)), jnp.float32)
    sattn = sha.ShardedBandAttention(mesh, part, data_axis="data")
    with mesh:
        got = np.asarray(sha.sharded_gat_lsigf(h, xp, a, W_p, sattn))
    want = np.asarray(filters.gat_lsigf(h, xp, a, W_p, Sd))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_sharded_flash_matches_dense(mesh):
    """Sharded attention with the flash shard-local kernels (interpret
    mode on the CPU mesh) == dense reference attention."""
    part, xp, a, W_p, Sd = _setup(seed=21)
    sattn = sha.ShardedBandAttention(mesh, part, data_axis="data",
                                     local_flash=True)
    assert sattn.use_flash
    with mesh:
        got = np.asarray(sha.sharded_graph_attention(xp, a, W_p, sattn))
    want = np.asarray(filters.graph_attention(xp, a, W_p, Sd))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_sharded_flash_grads_match_dense(mesh):
    """Gradients through the flash shard-local custom VJP (cotangent
    halo exchange + d_a1x halo fold) == dense autodiff."""
    part, xp, a, W_p, Sd = _setup(seed=22)
    sattn = sha.ShardedBandAttention(mesh, part, local_flash=True)

    def loss_sharded(x, a, W):
        return jnp.sum(sha.sharded_graph_attention(x, a, W, sattn) ** 2)

    def loss_dense(x, a, W):
        return jnp.sum(filters.graph_attention(x, a, W, Sd) ** 2)

    with mesh:
        gs = jax.grad(loss_sharded, argnums=(0, 1, 2))(xp, a, W_p)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(xp, a, W_p)
    for got, want, name in zip(gs, gd, ("x", "a", "W")):
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3,
                                   err_msg=name)


def test_sharded_flash_gcat_matches_dense(mesh):
    """Flash shard-local step with with_s=False (the GCAT alpha-alone
    shift) == dense GCAT."""
    part, xp, a, W_p, Sd = _setup(seed=23)
    h = jnp.asarray(np.random.default_rng(9).random((1, 3)), jnp.float32)
    sattn = sha.ShardedBandAttention(mesh, part, data_axis="data",
                                     local_flash=True)
    with mesh:
        got = np.asarray(sha.sharded_gat_lsigf(h, xp, a, W_p, sattn))
    want = np.asarray(filters.gat_lsigf(h, xp, a, W_p, Sd))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_filters_route_sharded_gso(mesh):
    """filters.graph_attention / gat_lsigf with a ShardedGso transparently
    run the sharded band-attention path."""
    part, xp, a, W_p, Sd = _setup(seed=11)
    sgso = par.ShardedGso(mesh, part, data_axis="data")
    h = jnp.asarray(np.random.default_rng(7).random((1, 2)), jnp.float32)
    with mesh:
        got_gat = np.asarray(filters.graph_attention(xp, a, W_p, sgso))
        got_gcat = np.asarray(filters.gat_lsigf(h, xp, a, W_p, sgso))
    np.testing.assert_allclose(
        got_gat, np.asarray(filters.graph_attention(xp, a, W_p, Sd)),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        got_gcat, np.asarray(filters.gat_lsigf(h, xp, a, W_p, Sd)),
        atol=1e-4, rtol=1e-4)


def test_gat_architecture_shard_matches_dense(mesh):
    """GraphAttentionNetwork.shard(): full sharded forward == dense."""
    from graph_neural_networks_tpu.models import architectures as archs
    S = _graph(N=96, seed=13)[0]
    S = S / np.max(np.abs(np.linalg.eigvalsh(S)))
    arch = archs.GraphAttentionNetwork(
        [2, 4, 4], [2, 2], "relu", [96, 96], "NoPool", [1, 1], [3],
        True, S)
    params = arch.init(jax.random.PRNGKey(1))
    x = RNG.standard_normal((2, 2, 96)).astype(np.float32)
    want = np.asarray(arch.apply(params, x))
    arch.shard(mesh, 4, data_axis="data")
    with mesh:
        got = np.asarray(arch.apply(params, x))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_sharded_evgf_matches_dense(mesh):
    rng = np.random.default_rng(8)
    part, xp, _, _, Sd = _setup(seed=8)
    P, K, E, F, G = 1, 2, 1, 3, 2
    a = jnp.asarray(rng.standard_normal((P, K, E, 2 * F)) * .3, jnp.float32)
    W_p = jnp.asarray(rng.standard_normal((P, K, E, F, G)) * .3, jnp.float32)
    sattn = sha.ShardedBandAttention(mesh, part, data_axis="data")
    with mesh:
        got = np.asarray(sha.sharded_gat_evgf(xp, a, W_p, sattn))
    want = np.asarray(filters.gat_evgf(xp, a, W_p, Sd))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
