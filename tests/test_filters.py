"""Golden tests: each filter functional vs an independent dense numpy oracle
written straight from the math (SURVEY.md §2.2 semantics), not from either
implementation. float32 device path vs float64 oracle, tol ~1e-4.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from graph_neural_networks_tpu.ops import filters, gso as gso_lib

RNG = np.random.default_rng(7)
B, G, F, E, K, N = 3, 2, 4, 2, 3, 11


def _rand(*shape, scale=0.7):
    return (RNG.random(shape) - 0.5) * 2 * scale


@pytest.fixture(scope="module")
def S():
    S = _rand(E, N, N)
    # graph-ish: sparsify & zero diagonal, symmetric support
    mask = RNG.random((N, N)) < 0.4
    mask = np.triu(mask, 1)
    mask = mask | mask.T
    S = S * mask
    return S / (np.abs(S).sum(axis=-1, keepdims=True).max() + 1)


@pytest.fixture(scope="module")
def x():
    return _rand(B, G, N)


def powers(S, K):
    out = [np.broadcast_to(np.eye(N), (E, N, N))]
    for _ in range(K - 1):
        out.append(out[-1] @ S)
    return np.stack(out, axis=1)  # E x K x N x N


def test_lsigf(S, x):
    h = _rand(F, E, K, G)
    b = _rand(F, N)
    Sk = powers(S, K)
    # y[b,f,m] = sum_{e,k,g,n} h[f,e,k,g] x[b,g,n] (S^k)[e,n,m] + b
    want = np.einsum("fekg,bgn,eknm->bfm", h, x, Sk) + b
    got = filters.lsigf(jnp.asarray(h, jnp.float32),
                        gso_lib.as_gso(S), jnp.asarray(x, jnp.float32),
                        jnp.asarray(b, jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_lsigf_accepts_raw_dense(S, x):
    h = _rand(F, E, K, G)
    got_gso = filters.lsigf(jnp.asarray(h, jnp.float32), gso_lib.as_gso(S),
                            jnp.asarray(x, jnp.float32))
    got_raw = filters.lsigf(jnp.asarray(h, jnp.float32),
                            jnp.asarray(S, jnp.float32),
                            jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(got_gso, got_raw, atol=1e-6)


def test_spectral_gf(S, x):
    # use a symmetric single-edge-feature GSO for a real eigenbasis
    Ssym = (S + S.transpose(0, 2, 1)) / 2
    V = np.stack([np.linalg.eigh(Ssym[e])[1] for e in range(E)])
    VH = V.transpose(0, 2, 1)
    h = _rand(F, E, G, N)
    want = np.einsum("emn,fegn,enp,bgp->bfm", V, h, VH, x)
    got = filters.spectral_gf(jnp.asarray(h, jnp.float32),
                              jnp.asarray(V, jnp.float32),
                              jnp.asarray(VH, jnp.float32),
                              jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_nvgf(S, x):
    h = _rand(F, E, K, G, N)
    Sk = powers(S, K)
    want = np.einsum("fekgm,bgn,eknm->bfm", h, x, Sk)
    got = filters.nvgf(jnp.asarray(h, jnp.float32), gso_lib.as_gso(S),
                       jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


def test_evgf(S, x):
    Phi = _rand(F, E, K, G, N, N)
    want = np.zeros((B, F, N))
    for f in range(F):
        for e in range(E):
            for g in range(G):
                cum = np.eye(N)
                for k in range(K):
                    cum = Phi[f, e, k, g] @ cum
                    want[:, f, :] += (cum @ x[:, g, :].T).T
    got = filters.evgf(jnp.asarray(Phi, jnp.float32),
                       jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-4)


def test_jarma(S, x):
    P = 2
    t_max = 4
    psi = _rand(F, E, P, G, scale=0.3)
    varphi = _rand(F, E, P, G)
    phi = _rand(F, E, K, G)
    diag = np.stack([np.diag(np.diag(S[e])) for e in range(E)])
    Stilde = S - diag
    want = np.zeros((B, F, N))
    for f in range(F):
        for e in range(E):
            for p in range(P):
                for g in range(G):
                    sbar_inv = np.diag(1.0 / (np.diag(S[e]) - psi[f, e, p, g]))
                    M = sbar_inv @ Stilde[e]
                    # H1
                    v = (sbar_inv @ x[:, g, :].T).T
                    for tau in range(t_max + 1):
                        want[:, f, :] += (-1.0) ** tau * varphi[f, e, p, g] * v
                        v = (M @ v.T).T
                    # H2
                    y = x[:, g, :]
                    for _ in range(t_max + 1):
                        y = (M @ y.T).T
                    want[:, f, :] += (-1.0) ** (t_max + 1) * y
    # H3 residue
    Sk = powers(S, K)
    want += np.einsum("fekg,bgn,eknm->bfm", phi, x, Sk)
    got = filters.jarma(jnp.asarray(psi, jnp.float32),
                        jnp.asarray(varphi, jnp.float32),
                        jnp.asarray(phi, jnp.float32),
                        gso_lib.as_gso(S), jnp.asarray(x, jnp.float32),
                        t_max=t_max)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-3)


def _attention_oracle(x, a, W, S, slope=0.2):
    P = a.shape[0]
    Fo = W.shape[2]
    Seye = S + np.eye(N)[None]
    mask = (np.abs(Seye).sum(0) > 1e-9).astype(float)
    Wx = np.einsum("pefg,bgn->bpefn", W, x)
    a1, a2 = a[..., :Fo], a[..., Fo:]
    e1 = np.einsum("pef,bpefn->bpen", a1, Wx)
    e2 = np.einsum("pef,bpefn->bpen", a2, Wx)
    eij = e2[..., :, None] + e1[..., None, :]  # a1 pairs with column j
    eij = np.where(eij >= 0, eij, slope * eij)
    logits = eij * mask - (1 - mask) * 1e12
    logits = logits - logits.max(axis=-1, keepdims=True)
    aij = np.exp(logits)
    aij = aij / aij.sum(axis=-1, keepdims=True)
    return aij * mask


def test_attention_gso(S, x):
    P = 3
    a = _rand(P, E, 2 * F)
    W = _rand(P, E, F, G)
    want = _attention_oracle(x, a, W, S)
    got = filters.attention_gso(jnp.asarray(x, jnp.float32),
                                jnp.asarray(a, jnp.float32),
                                jnp.asarray(W, jnp.float32),
                                gso_lib.as_gso(S))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
    # rows over existing neighborhoods sum to ~1 where mask has support
    mask = (np.abs(S + np.eye(N)).sum(0) > 1e-9)
    rowsum = np.asarray(got).sum(-1)
    assert np.allclose(rowsum, 1.0, atol=1e-3)


def test_graph_attention(S, x):
    P = 3
    a = _rand(P, E, 2 * F)
    W = _rand(P, E, F, G)
    aij = _attention_oracle(x, a, W, S)
    Wx = np.einsum("pefg,bgn->bpefn", W, x)
    want = np.einsum("bpefn,benm,bpenm->bpfm", Wx, np.broadcast_to(S, (B, E, N, N)), aij)
    got = filters.graph_attention(jnp.asarray(x, jnp.float32),
                                  jnp.asarray(a, jnp.float32),
                                  jnp.asarray(W, jnp.float32),
                                  gso_lib.as_gso(S))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_gat_lsigf(S, x):
    P = 2
    h = _rand(E, K)
    a = _rand(P, E, 2 * F)
    W = _rand(P, E, F, G)
    aij = _attention_oracle(x, a, W, S)
    # tap layout replicates the reference quirk (see filters.gat_lsigf)
    W_taps = np.transpose(W, (0, 3, 1, 2)).reshape(P, F, E, 1, G)
    hW = h[None, None, :, :, None] * W_taps
    want = np.zeros((B, P, F, N))
    for b_ in range(B):
        for p in range(P):
            for e in range(E):
                xk = x[b_]  # G x N
                for k in range(K):
                    want[b_, p] += np.einsum("fg,gn->fn", hW[p, :, e, k], xk)
                    xk = xk @ aij[b_, p, e]
    got = filters.gat_lsigf(jnp.asarray(h, jnp.float32),
                            jnp.asarray(x, jnp.float32),
                            jnp.asarray(a, jnp.float32),
                            jnp.asarray(W, jnp.float32),
                            gso_lib.as_gso(S))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_gat_evgf(S, x):
    P, Kk = 2, 3
    a = _rand(P, Kk, E, 2 * F)
    W = _rand(P, Kk, E, F, G)
    # oracle
    want = np.zeros((B, P, E, F, N))
    W0x = np.einsum("pefg,bgn->bpefn", W[:, 0], x)
    run = W0x
    for k in range(Kk):
        aij = _attention_oracle(x, a[:, k], W[:, k], S)
        run = np.einsum("bpefn,benm,bpenm->bpefm", run,
                        np.broadcast_to(S, (B, E, N, N)), aij)
        want += run
    want = want.sum(axis=2)
    got = filters.gat_evgf(jnp.asarray(x, jnp.float32),
                           jnp.asarray(a, jnp.float32),
                           jnp.asarray(W, jnp.float32),
                           gso_lib.as_gso(S))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


# --- time-varying ---------------------------------------------------------

T = 5


@pytest.fixture(scope="module")
def Sbt(S):
    # time/batch-varying GSO sharing the base support
    return np.stack([np.stack([S * (1 + 0.1 * RNG.random((E, 1, 1)))
                               for _ in range(T)]) for _ in range(B)])


@pytest.fixture(scope="module")
def xt():
    return _rand(B, T, G, N)


def test_lsigf_db(Sbt, xt):
    h = _rand(F, E, K, G)
    want = np.zeros((B, T, F, N))
    for b_ in range(B):
        for t in range(T):
            for k in range(K):
                if t - k < 0:
                    continue
                for e in range(E):
                    v = xt[b_, t - k]  # G x N
                    # product S(t-k+1) ... S(t) applied via right-multiplication
                    for tau in range(t - k + 1, t + 1):
                        v = v @ Sbt[b_, tau, e]
                    want[b_, t] += np.einsum("fg,gn->fn", h[:, e, k], v)
    got = filters.lsigf_db(jnp.asarray(h, jnp.float32),
                           jnp.asarray(Sbt, jnp.float32),
                           jnp.asarray(xt, jnp.float32))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_grnn_db(Sbt, xt):
    H = 3
    a = _rand(H, E, K, G, scale=0.4)
    bt = _rand(H, E, K, H, scale=0.4)
    z0 = _rand(B, H, N)
    sigma = np.tanh
    # oracle: explicit register of delayed products
    Ax = np.zeros((B, T, H, N))
    for b_ in range(B):
        for t in range(T):
            for k in range(K):
                if t - k < 0:
                    continue
                for e in range(E):
                    v = xt[b_, t - k]
                    for tau in range(t - k + 1, t + 1):
                        v = v @ Sbt[b_, tau, e]
                    Ax[b_, t] += np.einsum("hg,gn->hn", a[:, e, k], v)
    zs = []  # list over t of B x H x N
    for t in range(T):
        Bz = np.zeros((B, H, N))
        for b_ in range(B):
            for k in range(K):
                ti = t - 1 - k
                if ti >= 0:
                    zz = zs[ti][b_]
                elif ti == -1:
                    zz = z0[b_]
                else:
                    continue
                for e in range(E):
                    v = zz  # H x N
                    for tau in range(t - k + 1, t + 1):
                        v = v @ Sbt[b_, tau, e]
                    Bz[b_] += np.einsum("hj,jn->hn", bt[:, e, k], v)
        zt = sigma(Ax[:, t] + Bz)
        zs.append(zt)
    want = np.stack(zs, axis=1)
    got = filters.grnn_db(jnp.asarray(a, jnp.float32),
                          jnp.asarray(bt, jnp.float32),
                          jnp.asarray(Sbt, jnp.float32),
                          jnp.asarray(xt, jnp.float32),
                          jnp.asarray(z0, jnp.float32), jnp.tanh)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("gate", ["none", "time", "node", "edge"])
def test_gated_grnn(S, xt, gate):
    H = 3
    a = _rand(H, E, K, G, scale=0.4)
    bt = _rand(H, E, K, H, scale=0.4)
    z0 = _rand(B, H, N)
    if gate == "none":
        qh = qc = None
    elif gate == "time":
        qh = RNG.random((B, T, 1, 1))
        qc = RNG.random((B, T, 1, 1))
    elif gate == "node":
        qh = RNG.random((B, T, 1, N))
        qc = RNG.random((B, T, 1, N))
    else:
        qh = RNG.random((B, T, 1, N, N))
        qc = RNG.random((B, T, 1, N, N))
    Sk = powers(S, K)

    def oracle_lsigf(h, Se, xx):  # xx: B' x G' x N, per-sample GSO Se: B' x E x N x N
        out = np.zeros((xx.shape[0], h.shape[0], N))
        for bb in range(xx.shape[0]):
            for e in range(E):
                v = xx[bb]
                for k in range(h.shape[2]):
                    out[bb] += np.einsum("fg,gn->fn", h[:, e, k], v)
                    v = v @ Se[bb, e]
        return out

    # Ax
    if gate == "edge":
        Sb = qh.reshape(B * T, 1, N, N) * S[None]
        Ax = oracle_lsigf(a, Sb, xt.reshape(B * T, G, N)).reshape(B, T, H, N)
    else:
        Sb = np.broadcast_to(S, (B * T, E, N, N))
        Ax = oracle_lsigf(a, Sb, xt.reshape(B * T, G, N)).reshape(B, T, H, N)
        if qh is not None:
            Ax = qh * Ax
    # recurrence
    zt = z0
    want = []
    for t in range(T):
        if gate == "edge":
            Sb_t = qc[:, t] * S[None]
            Bz = oracle_lsigf(bt, Sb_t, zt)
        else:
            Bz = oracle_lsigf(bt, np.broadcast_to(S, (B, E, N, N)), zt)
            if qc is not None:
                Bz = qc[:, t] * Bz
        zt = np.tanh(Ax[:, t] + Bz)
        want.append(zt)
    want = np.stack(want, axis=1)
    j = lambda v: None if v is None else jnp.asarray(v, jnp.float32)
    got = filters.gated_grnn(j(a), j(bt), gso_lib.as_gso(S), j(xt), j(z0),
                             jnp.tanh, q_hat=j(qh), q_check=j(qc))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
