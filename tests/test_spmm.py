"""BCSR block-sparse SpMM kernel: numerical parity vs dense matmul.

Runs the Pallas kernel in interpreter mode on CPU; the compiled-TPU path is
exercised by bench.py on real hardware.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from graph_neural_networks_tpu.ops import spmm

RNG = np.random.default_rng(3)


def _sparse_matrix(N, density=0.05, block_cluster=True):
    S = np.zeros((N, N))
    if block_cluster:
        # clustered sparsity typical after a locality-preserving ordering
        n_clusters = max(N // 64, 1)
        bounds = np.linspace(0, N, n_clusters + 1).astype(int)
        for c in range(n_clusters):
            lo, hi = bounds[c], bounds[c + 1]
            blk = RNG.random((hi - lo, hi - lo))
            S[lo:hi, lo:hi] = np.where(blk < 0.3, blk, 0)
    # sprinkle random off-cluster edges
    mask = RNG.random((N, N)) < density
    S[mask] = RNG.random(mask.sum())
    return S


@pytest.mark.parametrize("N,R,bs", [(100, 16, 32), (256, 64, 128),
                                    (300, 40, 128), (64, 8, 8)])
def test_bcsr_matches_dense(N, R, bs):
    S = _sparse_matrix(N)
    x = RNG.random((R, N))
    blocks, brow, bcol = spmm.dense_to_bcsr(S, bs)
    got = spmm.bcsr_matmul(jnp.asarray(x, jnp.float32),
                           jnp.asarray(blocks), jnp.asarray(brow),
                           jnp.asarray(bcol), n_cols=N, block_size=bs,
                           interpret=True)
    want = x @ S
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_bcsr_pattern_extraction():
    S = _sparse_matrix(128)
    blocks, brow, bcol = spmm.dense_to_bcsr(S, 32)
    blocks2 = spmm.dense_to_bcsr_with_pattern(S * 2.0, 32, brow, bcol)
    np.testing.assert_allclose(blocks2, 2 * blocks, atol=1e-6)


def test_bcsr_all_zero_matrix():
    S = np.zeros((64, 64))
    x = RNG.random((8, 64))
    blocks, brow, bcol = spmm.dense_to_bcsr(S, 32)
    got = spmm.bcsr_matmul(jnp.asarray(x, jnp.float32), jnp.asarray(blocks),
                           jnp.asarray(brow), jnp.asarray(bcol), n_cols=64,
                           block_size=32, interpret=True)
    np.testing.assert_allclose(got, np.zeros((8, 64)), atol=1e-6)


@pytest.mark.parametrize("N,bw,bs", [(96, 20, 16), (256, 40, 32)])
def test_band_matmul_matches_dense(N, bw, bs):
    rng = np.random.default_rng(5)
    S = np.zeros((N, N))
    ii = rng.integers(0, N, size=N * 6)
    jj = ii + rng.integers(-bw, bw + 1, size=len(ii))
    ok = (jj >= 0) & (jj < N)
    S[ii[ok], jj[ok]] = rng.random(ok.sum())
    x = rng.random((10, N)).astype(np.float32)
    s_band, w = spmm.dense_to_band(S, bs)
    got = spmm.band_matmul(jnp.asarray(x), jnp.asarray(s_band), n_cols=N,
                           w=w, block_size=bs, interpret=True)
    np.testing.assert_allclose(got, x @ S, atol=1e-4, rtol=1e-4)


def test_band_shift_register_matches_chained():
    """Fused K-tap register == chained band_matmul (interpret mode; the
    compiled-TPU path is experimental pending Mosaic DMA validation)."""
    N, R, K = 96, 12, 4
    rng = np.random.default_rng(7)
    S = np.zeros((N, N), np.float32)
    ii = rng.integers(0, N, 400)
    jj = ii + rng.integers(-20, 21, 400)
    ok = (jj >= 0) & (jj < N)
    S[ii[ok], jj[ok]] = rng.random(ok.sum())
    x = rng.random((R, N)).astype(np.float32)
    s_band, w = spmm.dense_to_band(S, 16)
    got = spmm.band_shift_register(jnp.asarray(x), jnp.asarray(s_band),
                                   n_taps=K, n_cols=N, w=w, block_size=16,
                                   row_tile=8, interpret=True)
    want = [x]
    for _ in range(K - 1):
        want.append(want[-1] @ S)
    np.testing.assert_allclose(got, np.stack(want), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("C", [2, 3])
def test_band_matmul_col_tile_matches_dense(C):
    """Multi-column band kernel (col_tile=C shares x window tiles across C
    adjacent output columns) == dense, including nb not a multiple of C."""
    N, bw, bs = 176, 30, 16   # nb = 11, not a multiple of 2 or 3
    rng = np.random.default_rng(17)
    S = np.zeros((N, N))
    ii = rng.integers(0, N, size=N * 6)
    jj = ii + rng.integers(-bw, bw + 1, size=len(ii))
    ok = (jj >= 0) & (jj < N)
    S[ii[ok], jj[ok]] = rng.random(ok.sum())
    x = rng.random((10, N)).astype(np.float32)
    s_band, w = spmm.dense_to_band(S, bs)
    got = spmm.band_matmul(jnp.asarray(x), jnp.asarray(s_band), n_cols=N,
                           w=w, block_size=bs, col_tile=C, interpret=True)
    np.testing.assert_allclose(got, x @ S, atol=1e-4, rtol=1e-4)


def test_band_register_vjp_matches_chained():
    """Differentiable fused register (band_register custom VJP) == chained
    band_shift taps, forward AND gradient."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    N, R, K, bs = 96, 12, 4, 16
    rng = np.random.default_rng(23)
    S = np.zeros((N, N), np.float32)
    ii = rng.integers(0, N, 400)
    jj = ii + rng.integers(-20, 21, 400)
    ok = (jj >= 0) & (jj < N)
    S[ii[ok], jj[ok]] = rng.random(ok.sum())
    x = jnp.asarray(rng.random((R, N)), jnp.float32)
    s_band, w = spmm.dense_to_band(S, bs)
    s_band_t, _ = spmm.dense_to_band(S.T, bs)
    sb, sbt = jnp.asarray(s_band), jnp.asarray(s_band_t)
    ct = jnp.asarray(rng.random((K, R, N)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        y, pull = jax.vjp(
            lambda x: spmm.band_register(x, sb, sbt, K, N, w, bs, 8), x)
        (dx,) = pull(ct)
    want = [np.asarray(x)]
    for _ in range(K - 1):
        want.append(want[-1] @ S)
    np.testing.assert_allclose(y, np.stack(want), atol=1e-4, rtol=1e-4)
    # dx = sum_k ct_k (S^T)^k
    dwant = np.zeros_like(np.asarray(x))
    for k in range(K):
        dwant += np.asarray(ct[k]) @ np.linalg.matrix_power(S.T, k)
    np.testing.assert_allclose(dx, dwant, atol=1e-3, rtol=1e-3)


def test_gshift_register_fused_matches_dense():
    """gshift_register takes the fused band path (B,E,G,N signals) and
    matches the dense chained register, forward and grads through lsigf."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from graph_neural_networks_tpu.ops import filters, gso as gso_lib
    N, K = 64, 3
    rng = np.random.default_rng(29)
    S = np.zeros((N, N), np.float32)
    ii = rng.integers(0, N, 300)
    jj = ii + rng.integers(-12, 13, 300)
    ok = (jj >= 0) & (jj < N)
    S[ii[ok], jj[ok]] = rng.random(ok.sum())
    h = jnp.asarray(rng.random((3, 1, K, 2)), jnp.float32)
    x = jnp.asarray(rng.random((2, 1, 2, N)), jnp.float32)

    g_dense = gso_lib.as_gso(S, mode="dense")
    want_z = gso_lib.gshift_register(g_dense, x, K)
    with pltpu.force_tpu_interpret_mode():
        g_band = gso_lib.as_gso(S, mode="band", block_size=16)
        # the fused predicate must actually fire for this config
        assert spmm.register_vmem_bytes(N, g_band.band_w, 16, 256) \
            <= 12 * 2 ** 20
        got_z = gso_lib.gshift_register(g_band, x, K)
        np.testing.assert_allclose(got_z, want_z, atol=1e-4, rtol=1e-4)
        gh_b, gx_b = jax.grad(
            lambda h, xx: jnp.sum(
                filters.lsigf(h, g_band, xx[:, 0]) ** 2),
            argnums=(0, 1))(h, x)
    gh_d, gx_d = jax.grad(
        lambda h, xx: jnp.sum(filters.lsigf(h, g_dense, xx[:, 0]) ** 2),
        argnums=(0, 1))(h, x)
    np.testing.assert_allclose(gh_b, gh_d, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(gx_b, gx_d, atol=1e-3, rtol=1e-3)


def test_band_diag_only():
    S = np.diag(np.arange(1.0, 33.0))
    x = np.random.default_rng(0).random((4, 32)).astype(np.float32)
    s_band, w = spmm.dense_to_band(S, 16)
    assert w == 0
    got = spmm.band_matmul(jnp.asarray(x), jnp.asarray(s_band), n_cols=32,
                           w=0, block_size=16, interpret=True)
    np.testing.assert_allclose(got, x @ S, atol=1e-5)


def test_bcsr_gso_trainable_matches_dense():
    """The 'bcsr' Gso mode is differentiable too (bcsr_shift custom VJP:
    backward = shift by the transposed BCSR)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from graph_neural_networks_tpu.ops import filters, gso as gso_lib
    N = 64
    rng = np.random.default_rng(13)
    S = _sparse_matrix(N)
    h = jnp.asarray(rng.random((3, 1, 3, 2)), jnp.float32)
    x = jnp.asarray(rng.random((2, 2, N)), jnp.float32)
    g_dense = gso_lib.as_gso(S, mode="dense")
    with pltpu.force_tpu_interpret_mode():
        g_bcsr = gso_lib.as_gso(S, mode="bcsr", block_size=16)
        y_b = filters.lsigf(h, g_bcsr, x)
        gh_b, gx_b = jax.grad(
            lambda h, x: jnp.sum(filters.lsigf(h, g_bcsr, x) ** 2),
            argnums=(0, 1))(h, x)
    y_d = filters.lsigf(h, g_dense, x)
    gh_d, gx_d = jax.grad(
        lambda h, x: jnp.sum(filters.lsigf(h, g_dense, x) ** 2),
        argnums=(0, 1))(h, x)
    np.testing.assert_allclose(y_b, y_d, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gh_b, gh_d, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(gx_b, gx_d, atol=1e-3, rtol=1e-3)


def test_band_gso_trainable_matches_dense():
    """The 'band' Gso mode: forward == dense AND gradients flow through the
    Pallas kernel via the custom VJP (training on the sparse path)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from graph_neural_networks_tpu.ops import filters, gso as gso_lib
    N = 64
    rng = np.random.default_rng(11)
    S = np.zeros((N, N), np.float32)
    ii = rng.integers(0, N, 300)
    jj = ii + rng.integers(-12, 13, 300)
    ok = (jj >= 0) & (jj < N)
    S[ii[ok], jj[ok]] = rng.random(ok.sum())
    h = jnp.asarray(rng.random((3, 1, 3, 2)), jnp.float32)
    x = jnp.asarray(rng.random((2, 2, N)), jnp.float32)

    g_dense = gso_lib.as_gso(S, mode="dense")
    with pltpu.force_tpu_interpret_mode():
        g_band = gso_lib.as_gso(S, mode="band", block_size=16)

        y_d = filters.lsigf(h, g_dense, x)
        y_b = filters.lsigf(h, g_band, x)
        np.testing.assert_allclose(y_b, y_d, atol=1e-4, rtol=1e-4)

        def loss_band(h, x):
            return jnp.sum(filters.lsigf(h, g_band, x) ** 2)

        def loss_dense(h, x):
            return jnp.sum(filters.lsigf(h, g_dense, x) ** 2)

        gh_b, gx_b = jax.grad(loss_band, argnums=(0, 1))(h, x)
        gh_d, gx_d = jax.grad(loss_dense, argnums=(0, 1))(h, x)
    np.testing.assert_allclose(gh_b, gh_d, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(gx_b, gx_d, atol=1e-3, rtol=1e-3)


def test_gso_bcsr_gshift_matches_dense():
    from graph_neural_networks_tpu.ops import gso as gso_lib
    N = 96
    S = np.stack([_sparse_matrix(N), _sparse_matrix(N)])
    x = RNG.random((3, 2, 4, N)).astype(np.float32)  # B x E x G x N
    g_dense = gso_lib.as_gso(S, mode="dense")
    want = gso_lib.gshift(g_dense, jnp.asarray(x))
    # bcsr path in interpret mode: monkeypatch the kernel call
    import functools
    orig = spmm.bcsr_matmul
    try:
        spmm.bcsr_matmul = functools.partial(orig, interpret=True)
        g_bcsr = gso_lib.as_gso(S, mode="bcsr", block_size=32)
        got = gso_lib.gshift(g_bcsr, jnp.asarray(x))
    finally:
        spmm.bcsr_matmul = orig
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_bcsr_union_pattern_for_mismatched_edge_features():
    """E=2 GSO whose edge features have different supports: as_gso falls
    back to the union sparsity pattern (gso.py)."""
    from graph_neural_networks_tpu.ops import gso as gso_lib
    rng = np.random.default_rng(21)
    N = 64
    S0 = np.zeros((N, N), np.float32)
    S1 = np.zeros((N, N), np.float32)
    S0[:32, :32] = rng.random((32, 32)) * (rng.random((32, 32)) < 0.3)
    S1[32:, 32:] = rng.random((32, 32)) * (rng.random((32, 32)) < 0.3)
    g = gso_lib.as_gso(np.stack([S0, S1]), mode="bcsr", block_size=16)
    assert g.blocks.shape[0] == 2
    # dense forward equality through the duck-typed dense attribute
    np.testing.assert_allclose(np.asarray(g.S[0]), S0, atol=1e-6)


def test_gso_keep_dense_false():
    """Sparse-mode Gso without the dense device copy: shifts work, dense
    fallbacks raise clearly (large-N memory contract)."""
    import pytest
    from jax.experimental.pallas import tpu as pltpu
    from graph_neural_networks_tpu.ops import gso as gso_lib
    rng = np.random.default_rng(5)
    N = 32
    S = np.triu(rng.random((N, N)) * (rng.random((N, N)) < 0.2), 1)
    S = S + S.T
    x = jnp.asarray(rng.random((2, 1, 1, N)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        g = gso_lib.as_gso(S, mode="band", block_size=8, keep_dense=False)
        assert g.S is None
        got = np.asarray(gso_lib.gshift(g, x))
    want = np.einsum("begn,nm->begm", np.asarray(x), S)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    with pytest.raises(AssertionError, match="keep_dense"):
        gso_lib.dense(g)


def test_bcsr_matmul_rectangular():
    """Rectangular BCSR (N_in != n_cols): the sharded scattered shift's
    per-shard column-slice contraction (regression: xp was padded to the
    OUTPUT width and crashed for any n_cols_in > n_cols_out)."""
    rng = np.random.default_rng(3)
    bs, nb_in, nb_out = 32, 8, 2
    Nin, Nout = nb_in * bs, nb_out * bs
    S = np.zeros((Nin, Nout), np.float32)
    for _ in range(6):
        bi, bj = rng.integers(0, nb_in), rng.integers(0, nb_out)
        S[bi*bs:(bi+1)*bs, bj*bs:(bj+1)*bs] = rng.random((bs, bs))
    tiles = S.reshape(nb_in, bs, nb_out, bs).transpose(0, 2, 1, 3)
    nz = np.abs(tiles).sum(axis=(2, 3)) > 0
    br, bc = np.nonzero(nz)
    o = np.lexsort((br, bc))
    blocks, br, bc = tiles[br[o], bc[o]], br[o], bc[o]
    x = rng.standard_normal((16, Nin)).astype(np.float32)
    got = spmm.bcsr_matmul(jnp.asarray(x), jnp.asarray(blocks),
                           jnp.asarray(br, jnp.int32),
                           jnp.asarray(bc, jnp.int32),
                           n_cols=Nout, block_size=bs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), x @ S, rtol=1e-5,
                               atol=1e-5)


def test_bcsr_matmul_trailing_zero_pads_sorted():
    """Padding blocks appended with bcol = LAST column keep the
    sorted-by-col precondition; the Pallas kernel must produce the same
    result as without pads (regression: bcol=0 pads at the END broke
    searchsorted's column segments and silently corrupted outputs)."""
    rng = np.random.default_rng(4)
    bs, nb = 32, 4
    N = nb * bs
    S = np.zeros((N, N), np.float32)
    for bi, bj in [(0, 0), (3, 2), (1, 2)]:
        S[bi*bs:(bi+1)*bs, bj*bs:(bj+1)*bs] = rng.random((bs, bs))
    blocks, br, bc = spmm.dense_to_bcsr(S, bs)
    # pad the way partition_nodes_bcsr does: zero blocks at the last col
    pad = 3
    blocks_p = np.concatenate([blocks, np.zeros((pad, bs, bs),
                                                np.float32)])
    br_p = np.concatenate([br, np.zeros(pad, np.int32)])
    bc_p = np.concatenate([bc, np.full(pad, nb - 1, np.int32)])
    x = rng.standard_normal((16, N)).astype(np.float32)
    y0 = spmm.bcsr_matmul(jnp.asarray(x), jnp.asarray(blocks),
                          jnp.asarray(br), jnp.asarray(bc),
                          n_cols=N, block_size=bs, interpret=True)
    y1 = spmm.bcsr_matmul(jnp.asarray(x), jnp.asarray(blocks_p),
                          jnp.asarray(br_p), jnp.asarray(bc_p),
                          n_cols=N, block_size=bs, interpret=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y0), x @ S, rtol=1e-5,
                               atol=1e-5)


def test_bcsr_shift_rect_pallas_matches_partition():
    """bcsr_shift_rect (interpret) on REAL BcsrPartition shards
    (n_parts=4, padded block lists) == the dense column slice — the
    exact per-chip program of sharded_gshift_bcsr's TPU path."""
    from graph_neural_networks_tpu import parallel as par
    rng = np.random.default_rng(5)
    N, ibs, P_ = 256, 32, 4
    S = np.zeros((N, N), np.float32)
    nb = N // ibs
    for _ in range(10):
        bi, bj = rng.integers(0, nb, 2)
        S[bi*ibs:(bi+1)*ibs, bj*ibs:(bj+1)*ibs] += rng.random((ibs, ibs))
    part = par.partition_nodes_bcsr(S, P_, inner_block=ibs)
    assert int(part.nnzb.max()) != int(part.nnzb.min()), \
        "want uneven shards so padding blocks actually appear"
    x = rng.standard_normal((8, part.n_padded)).astype(np.float32)
    Sd = part.S_perm[0]
    for p in range(P_):
        lo = p * part.block_size
        y = spmm.bcsr_matmul(
            jnp.asarray(x), jnp.asarray(part.blocks[p, 0]),
            jnp.asarray(part.brow[p, 0]), jnp.asarray(part.bcol[p, 0]),
            n_cols=part.block_size, block_size=ibs, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y), x @ Sd[:, lo:lo + part.block_size],
            rtol=1e-4, atol=1e-5)
        # and the transposed layout (the VJP's g @ S^T)
        g = rng.standard_normal((8, part.block_size)).astype(np.float32)
        dx = spmm.bcsr_matmul(
            jnp.asarray(g), jnp.asarray(part.blocks_t[p, 0]),
            jnp.asarray(part.brow_t[p, 0]),
            jnp.asarray(part.bcol_t[p, 0]),
            n_cols=part.n_padded, block_size=ibs, interpret=True)
        np.testing.assert_allclose(
            np.asarray(dx), g @ Sd[:, lo:lo + part.block_size].T,
            rtol=1e-4, atol=1e-5)
