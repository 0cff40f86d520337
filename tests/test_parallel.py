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


def test_sharded_5d_signal(mesh, band_graph):
    """Recurrent-shaped (B, T, E, G, N) signals go through the sharded
    shift (round-1 limitation: 4-D only)."""
    part = par.partition_nodes(band_graph, 8)
    sgso = par.ShardedGso(mesh, part)
    x = RNG.random((2, 3, 1, 2, part.n_padded)).astype(np.float32)
    with mesh:
        got = np.asarray(sgso.shift(jnp.asarray(x)))
    want = np.einsum("btegn,enm->btegm", x, part.S_perm)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sharded_architecture_gradients_match_dense(mesh, band_graph):
    """Loss gradients through SelectionGNN with a node-sharded GSO ==
    gradients on the dense single-device path (full training parity)."""
    from graph_neural_networks_tpu.models import architectures as archs
    S = band_graph / np.max(np.abs(np.linalg.eigvalsh(band_graph)))
    x = RNG.random((4, 1, 64)).astype(np.float32)
    y = RNG.integers(0, 3, 4)

    def build():
        return archs.SelectionGNN([1, 4, 4], [3, 3], True, "relu", [64, 64],
                                  "NoPool", [1, 1], [3], S)

    def loss_fn(arch):
        ctx, core = arch.ctx, arch.core

        def loss(p):
            logits = core.apply(p, jnp.asarray(x), ctx)[0]
            onehot = jax.nn.one_hot(jnp.asarray(y), 3)
            return -jnp.mean(jnp.sum(
                jax.nn.log_softmax(logits) * onehot, axis=-1))
        return loss

    dense_arch = build()
    params = dense_arch.init(jax.random.PRNGKey(0))
    l_dense, g_dense = jax.value_and_grad(loss_fn(dense_arch))(params)

    sh_arch = build().shard(mesh, 8)
    with mesh:
        l_sh, g_sh = jax.jit(jax.value_and_grad(loss_fn(sh_arch)))(params)
        jax.block_until_ready(g_sh)
    np.testing.assert_allclose(float(l_sh), float(l_dense), rtol=1e-5)
    for pd, ps in zip(jax.tree_util.tree_leaves(g_dense),
                      jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(ps), np.asarray(pd),
                                   atol=1e-4, rtol=1e-4)


def test_shard_rcm_composition(mesh, band_graph):
    """arch.shard(order='rcm') composes the partition order into the model:
    the sharded forward == the dense forward with the same composed
    ordering (swap the ShardedGso for its dense reconstruction)."""
    from graph_neural_networks_tpu.models import architectures as archs
    from graph_neural_networks_tpu.ops import gso as gso_lib
    S = band_graph / np.max(np.abs(np.linalg.eigvalsh(band_graph)))
    arch = archs.SelectionGNN([1, 4, 4], [3, 3], True, "relu", [64, 64],
                              "NoPool", [1, 1], [3], S)
    arch.shard(mesh, 8, order="rcm")
    sgso = arch.ctx["S"]
    assert sgso.uses_ring
    params = arch.init(jax.random.PRNGKey(1))
    x = RNG.random((3, 1, 64)).astype(np.float32)
    with mesh:
        got = np.asarray(arch.apply(params, x))
    # dense oracle with the identical composed node ordering
    arch.ctx = dict(arch.ctx)
    arch.ctx["S"] = gso_lib.as_gso(sgso.partition.S_perm)
    want = np.asarray(arch.apply(params, x))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_large_graph_no_dense(mesh):
    """The scaling demo: N=200k banded sparse graph, partitioned and
    shifted across 8 devices without EVER materializing a dense (N, N)
    array (which would be 160 GB)."""
    import scipy.sparse
    N = 200_000
    rng = np.random.default_rng(7)
    # random banded sparse graph: each node links to a few nearby nodes
    k = 4
    rows = np.repeat(np.arange(N), k)
    offs = rng.integers(1, 200, size=N * k)
    cols = np.clip(rows + offs * rng.choice([-1, 1], size=N * k), 0, N - 1)
    vals = rng.random(N * k).astype(np.float32)
    A = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(N, N))
    A = (A + A.T).tocoo()

    part = par.partition_nodes(A, 8, order="none")  # already local
    # slab memory is O(N * bandwidth), orders of magnitude below dense
    assert part.slabs.nbytes < 0.02 * (4 * N * N)
    with pytest.raises(AssertionError):
        _ = part.S_perm  # densification is refused at this N

    sgso = par.ShardedGso(mesh, part)
    assert sgso.uses_ring
    x = rng.random((1, 1, 1, part.n_padded)).astype(np.float32)
    with mesh:
        got = np.asarray(sgso.shift(jnp.asarray(x)))
    want = (scipy.sparse.csr_matrix(part.S_csr[0]).T @ x[0, 0, 0]).astype(
        np.float32)
    np.testing.assert_allclose(got[0, 0, 0], want, atol=1e-3, rtol=1e-3)


def test_overlap_split_path_gradients(mesh):
    """The overlapped (interior/boundary split) ring shift: forward and
    VJP match the scipy oracle on a graph wide enough that nbl > 2w."""
    import scipy.sparse
    N = 4096
    rng = np.random.default_rng(11)
    k = 3
    rows = np.repeat(np.arange(N), k)
    cols = np.clip(rows + rng.integers(-100, 101, size=N * k), 0, N - 1)
    vals = rng.random(N * k)
    A = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(N, N))
    part = par.partition_nodes(A, 8, order="none")
    assert part.nbl > 2 * part.w, (part.nbl, part.w)  # split path engaged
    sgso = par.ShardedGso(mesh, part)
    assert sgso.uses_ring
    x = rng.random((2, 1, 1, part.n_padded)).astype(np.float32)
    ct = rng.random((2, 1, 1, part.n_padded)).astype(np.float32)

    with mesh:
        y, vjp = jax.vjp(sgso.shift, jnp.asarray(x))
        (dx,) = vjp(jnp.asarray(ct))
        y, dx = np.asarray(y), np.asarray(dx)
    S = scipy.sparse.csr_matrix(part.S_csr[0])
    for b in range(2):
        np.testing.assert_allclose(y[b, 0, 0], S.T @ x[b, 0, 0],
                                   atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(dx[b, 0, 0], S @ ct[b, 0, 0],
                                   atol=1e-3, rtol=1e-3)


def test_multihost_helpers_single_process(mesh):
    """Multi-host bring-up helpers degrade correctly on one process with
    the 8-device virtual mesh (the slicing/mesh logic is what a pod
    run depends on)."""
    from graph_neural_networks_tpu.parallel import multihost as mh
    info = mh.initialize_multihost()        # no-op single-process
    assert info["process_count"] == 1 and info["process_index"] == 0
    assert info["devices"] == info["local_devices"] == 8

    m = mh.make_pod_mesh()                  # graph axis = all local devices
    assert m.shape["graph"] == 8 and m.shape["data"] == 1
    m2 = mh.make_pod_mesh(graph_parallelism=4)
    assert m2.shape["graph"] == 4 and m2.shape["data"] == 2
    with pytest.raises(AssertionError):
        mh.make_pod_mesh(graph_parallelism=3)

    sl = mh.per_host_batch_slice(64)
    assert sl == slice(0, 64)
    # simulated 4-process pod: each host loads its own quarter
    slices = [mh.per_host_batch_slice(64, process_count=4, process_index=i)
              for i in range(4)]
    assert slices == [slice(0, 16), slice(16, 32), slice(32, 48),
                      slice(48, 64)]
    with pytest.raises(AssertionError):
        mh.per_host_batch_slice(10, process_count=4, process_index=0)

    # host-local data -> global sharded array (single-process degenerate)
    from jax.sharding import PartitionSpec as P
    x = np.arange(64, dtype=np.float32).reshape(8, 8)
    xs = mh.shard_host_data(m2, x[mh.per_host_batch_slice(8)], P("data"))
    assert xs.shape == (8, 8)
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_pallas_local_contract_matches_einsum(mesh):
    """The Pallas shard-local band contraction (TPU fast path inside the
    ring shift) == the windowed einsum, forward and VJP (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu
    from graph_neural_networks_tpu.parallel import shift as shf
    import scipy.sparse
    N = 2048
    rng = np.random.default_rng(13)
    k = 3
    rows = np.repeat(np.arange(N), k)
    cols = np.clip(rows + rng.integers(-100, 101, size=N * k), 0, N - 1)
    A = scipy.sparse.coo_matrix((rng.random(N * k), (rows, cols)),
                                shape=(N, N))
    part = par.partition_nodes(A, 2, order="none")
    assert part.inner_bs == 128 and part.w >= 1
    s_sq, s_sq_t, lo, hi = shf._sq_slabs(part)
    w, ibs, nbl = part.w, part.inner_bs, part.nbl
    n_ext = (nbl + 2 * w) * ibs
    halo = w * ibs
    x_ext = jnp.asarray(rng.random((2, 1, 1, n_ext)), jnp.float32)
    slab = jnp.asarray(part.slabs[0])        # shard 0: (E, nbl, W, ibs, ibs)
    want, vjp_e = jax.vjp(lambda xe: shf._band_contract(xe, slab), x_ext)
    ct = jnp.asarray(rng.random(want.shape), jnp.float32)
    (dx_want,) = vjp_e(ct)
    with pltpu.force_tpu_interpret_mode():
        got, vjp_p = jax.vjp(
            lambda xe: shf._pallas_local_contract(
                xe[..., halo:halo + nbl * ibs], xe[..., :halo],
                xe[..., halo + nbl * ibs:], jnp.asarray(s_sq[0]),
                jnp.asarray(s_sq_t[0]), jnp.asarray(lo[0]),
                jnp.asarray(hi[0]), w, ibs, nbl), x_ext)
        (dx_got,) = vjp_p(ct)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dx_got), np.asarray(dx_want),
                               atol=1e-3, rtol=1e-3)


def test_grnn_shard_matches_dense(mesh, band_graph):
    """Static-GSO GraphRecurrentNN with arch.shard(): the lax.scan hidden
    recurrence runs over the node-sharded ring shift, matching the
    single-device dense forward and gradients."""
    import jax
    import optax
    from graph_neural_networks_tpu.models import architectures as archs
    S = band_graph / np.max(np.abs(np.linalg.eigvalsh(band_graph)))
    arch = archs.GraphRecurrentNN(2, 3, 4, [3, 3], True, "tanh",
                                  "identity", "identity", [3], S)
    params = arch.init(jax.random.PRNGKey(0))
    x = RNG.random((2, 4, 2, 64)).astype(np.float32)
    z0 = jnp.zeros((2, 4, 64))
    want = np.asarray(arch.apply(params, x, z0=z0))

    def loss(p, ctx):
        y = arch.core.apply(p, jnp.asarray(x), z0, ctx)[0]
        return jnp.mean(y ** 2)

    g_want = jax.grad(loss)(params, arch.ctx)
    arch.shard(mesh, 8)
    with mesh:
        got = np.asarray(arch.apply(params, x, z0=z0))
        g_got = jax.jit(jax.grad(loss))(params, arch.ctx)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_got),
                    jax.tree_util.tree_leaves(g_want)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("gate", ["time", "node"])
def test_gated_grnn_shard_matches_dense(mesh, band_graph, gate):
    """Time/node-gated GRNNs shard too (the gates scale lsigf outputs, so
    the recurrence stays on the sharded shift; edge gates need the dense
    GSO by definition)."""
    import jax
    from graph_neural_networks_tpu.models import architectures as archs
    S = band_graph / np.max(np.abs(np.linalg.eigvalsh(band_graph)))
    arch = archs.GatedGraphRecurrentNN(2, 3, 4, [2, 2], True, "tanh",
                                       "identity", "identity", [3], S,
                                       gateType=gate)
    params = arch.init(jax.random.PRNGKey(0))
    x = RNG.random((2, 3, 2, 64)).astype(np.float32)
    z0 = jnp.zeros((2, 4, 64))
    want = np.asarray(arch.apply(params, x, z0=z0))
    arch.shard(mesh, 8)
    with mesh:
        got = np.asarray(arch.apply(params, x, z0=z0))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def _scattered_block_graph(N, ibs, n_blocks, rng):
    """Edges clustered in randomly placed (ibs x ibs) blocks — scattered
    at the shard level (RCM bandwidth ~ N: no band order exists), but
    block-sparse: exactly BCSR's case."""
    import scipy.sparse
    nb = N // ibs
    S = np.zeros((N, N), np.float32)
    for _ in range(n_blocks):
        bi, bj = rng.integers(0, nb, 2)
        blk = (rng.random((ibs, ibs)) < 0.3) * rng.random((ibs, ibs))
        S[bi*ibs:(bi+1)*ibs, bj*ibs:(bj+1)*ibs] += blk
    return S


def test_sharded_bcsr_scattered_fwd_and_grads():
    """Scattered-graph sharding: per-shard BCSR column slices. Forward
    and gradient parity vs the dense einsum on a graph whose RCM
    bandwidth ~ N (the band slab would degenerate dense); per-shard
    memory O(nnzb/P * ibs^2) asserted."""
    from graph_neural_networks_tpu import parallel as par
    rng = np.random.default_rng(0)
    N, ibs, P_ = 512, 32, 4
    S = _scattered_block_graph(N, ibs, 24, rng)
    part = par.partition_nodes_bcsr(S, P_, inner_block=ibs)
    # scattered: the band slab would be (near-)full bandwidth
    band_part = par.partition_nodes(S, P_, order="rcm",
                                    inner_block=ibs)
    assert band_part.w >= band_part.nbl, \
        "test graph unexpectedly bandable — pick a more scattered one"
    # memory: proportional to this shard's nonzero blocks, NOT N^2/P
    dense_slice_bytes = part.n_padded * part.block_size * 4
    assert part.shard_bytes < 0.7 * dense_slice_bytes, \
        (part.shard_bytes, dense_slice_bytes)

    mesh = par.make_mesh((2, P_))
    shift = par.sharded_gshift_bcsr(mesh, part)
    E, G, B = 1, 3, 2
    x = rng.standard_normal((B, E, G, N)).astype(np.float32)
    xp = jnp.asarray(part.pad_signal(x))
    y = np.asarray(shift(xp))
    y_ref = np.einsum("begn,enm->begm", np.asarray(xp),
                      part.S_perm)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)

    # gradient parity (autodiff through all_gather + local contraction)
    def loss_sharded(xp):
        return jnp.sum(shift(xp) ** 2)

    def loss_dense(xp):
        Sd = jnp.asarray(part.S_perm)
        return jnp.sum(jnp.einsum("begn,enm->begm", xp, Sd) ** 2)
    g_sh = np.asarray(jax.grad(loss_sharded)(xp))
    g_d = np.asarray(jax.grad(loss_dense)(xp))
    np.testing.assert_allclose(g_sh, g_d, rtol=1e-4, atol=1e-4)


def test_sharded_bcsr_through_filters_and_arch():
    """ShardedGso(BcsrPartition) routes lsigf through the scattered
    sharded shift; 5-D signals work; unpad round-trips."""
    from graph_neural_networks_tpu import parallel as par
    from graph_neural_networks_tpu.ops import filters
    rng = np.random.default_rng(1)
    N, ibs, P_ = 128, 16, 4
    S = _scattered_block_graph(N, ibs, 20, rng)
    S = S / np.max(np.abs(np.linalg.eigvalsh(S)))
    part = par.partition_nodes_bcsr(S, P_, inner_block=ibs)
    mesh = par.make_mesh((2, P_))
    sgso = par.ShardedGso(mesh, part)
    assert not sgso.uses_ring
    F, E, K, G, B = 4, 1, 3, 2, 2
    h = jnp.asarray(rng.standard_normal((F, E, K, G)) * 0.3, jnp.float32)
    x = rng.standard_normal((B, E, G, N)).astype(np.float32)
    xp = jnp.asarray(part.pad_signal(x))
    y_sh = filters.lsigf(h, sgso, xp[:, 0])
    Sd = jnp.asarray(part.S_perm)
    y_d = filters.lsigf(h, Sd, xp[:, 0])
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_d),
                               rtol=1e-4, atol=1e-4)
