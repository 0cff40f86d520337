"""Filter functionals: every GSP filter family, lowered to the graph shift.

Behavior-compatible re-designs of the reference functionals in
``alegnn/utils/graphML.py`` (file:line cites below), written for XLA:
static K-tap unrolled shift registers feeding a single MXU contraction,
``lax.scan`` for recurrences, and no data-dependent control flow.

Conventions (reference graphML.py:103-117):
  x : (B, G, N) graph signals, h : (F, E, K, G) taps, S : (E, N, N) GSO,
  y : (B, F, N); time-varying x : (B, T, G, N) with S : (B, T, E, N, N).
Shift = row-vector right-multiplication ``x @ S`` (graphML.py:158-161);
EVGF / spectral filters use column-vector left-multiplication
(graphML.py:389-488, 178-291).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from graph_neural_networks_tpu.ops import ell as ell_lib
from graph_neural_networks_tpu.ops import gso as gso_lib

INFINITE = 1e12  # the reference's additive -inf for masked softmax (graphML.py:73)


def _dense(S):
    return gso_lib.dense(S)


def _shift_register(gso, x: jnp.ndarray, K: int) -> jnp.ndarray:
    """Stack [x, xS, xS^2, ..., xS^{K-1}] along a new K axis.

    x: (B, E, G, N) -> z: (B, E, K, G, N). The reference's hot loop
    (graphML.py:158-161) re-expressed as K-1 chained SpMMs.
    """
    return gso_lib.gshift_register(gso, x, K)


def lsigf(h: jnp.ndarray, gso, x: jnp.ndarray,
          b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Linear shift-invariant graph filter (the graph convolution).

    y_f = sum_{e,k,g} h[f,e,k,g] (x_g S_e^k) + b_f.  Reference:
    graphML.py:83-176. h: (F,E,K,G), x: (B,G,N) -> y: (B,F,N).
    """
    F, E, K, G = h.shape
    B, G_, N = x.shape
    assert G_ == G
    xe = jnp.broadcast_to(x[:, None], (B, E, G, N))
    z = _shift_register(gso, xe, K)                      # B x E x K x G x N
    # one big contraction: (B*N, EKG) @ (EKG, F)
    y = jnp.einsum("bekgn,fekg->bfn", z, h)
    return y if b is None else y + b


def spectral_gf(h: jnp.ndarray, V: jnp.ndarray, VH: jnp.ndarray,
                x: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Spectral-form LSI filter: y_f = sum_{e,g} V_e diag(h_{feg}) V_e^H x_g.

    Reference: graphML.py:178-291. h: (F,E,G,N), V/VH: (E,N,N),
    x: (B,G,N) -> y: (B,F,N).
    """
    VHx = jnp.einsum("enm,bgm->begn", VH, x)
    y = jnp.einsum("emn,fegn,begn->bfm", V, h, VHx)
    return y if b is None else y + b


def nvgf(h: jnp.ndarray, gso, x: jnp.ndarray,
         b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Node-variant graph filter: per-node taps.

    y_f = sum_{e,k,g} diag(h_k^{efg}) (x_g S_e^k).  Reference:
    graphML.py:293-387. h: (F,E,K,G,N), x: (B,G,N) -> y: (B,F,N).
    """
    F, E, K, G, N = h.shape
    B = x.shape[0]
    xe = jnp.broadcast_to(x[:, None], (B, E, G, N))
    z = _shift_register(gso, xe, K)                      # B x E x K x G x N
    y = jnp.einsum("bekgn,fekgn->bfn", z, h)
    return y if b is None else y + b


def evgf(Phi: jnp.ndarray, x: jnp.ndarray,
         b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Edge-variant graph filter: cumulative products of per-edge matrices.

    y_f = sum_{e,k,g} Phi^{(k)}...Phi^{(0)} x_g with Phi: (F,E,K,G,N,N)
    (graph-sparsity-masked by the layer). Column-vector convention:
    (Phi v)[n] = sum_m Phi[n,m] v[m]. Reference: graphML.py:389-488.
    """
    F, E, K, G, N, _ = Phi.shape
    # v_k: (B,F,E,G,N) cumulative product applied to x
    v = jnp.einsum("fegnm,bgm->bfegn", Phi[:, :, 0], x)
    acc = v
    for k in range(1, K):
        v = jnp.einsum("fegnm,bfegm->bfegn", Phi[:, :, k], v)
        acc = acc + v
    y = jnp.einsum("bfegn->bfn", acc)
    return y if b is None else y + b


def evgf_edges(w0: jnp.ndarray, wk: Optional[jnp.ndarray],
               row: jnp.ndarray, col: jnp.ndarray, x: jnp.ndarray,
               b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Edge-variant filter with weights living ON THE EDGES — the O(nnz)
    re-derivation of `evgf` demanded by SURVEY §7 (the reference keeps
    masked dense (F,E,K,G,N,N) weights, graphML.py:389-488).

    w0: (F,E,G,N) diagonal taps (k=0 has identity support);
    wk: (F,E,K-1,G,nnz) per-edge taps on the (row, col) support, or None
    when K == 1; column-vector convention — the tap on edge (row i, col j)
    sends v[j] into output i.  x: (B,G,N) -> y: (B,F,N).
    """
    v = w0[None] * x[:, None, None]                       # B,F,E,G,N
    acc = v
    if wk is not None:
        N = w0.shape[-1]
        for k in range(wk.shape[2]):
            msg = wk[None, :, :, k] * v[..., col]         # B,F,E,G,nnz
            agg = jax.ops.segment_sum(jnp.moveaxis(msg, -1, 0), row,
                                      num_segments=N)
            v = jnp.moveaxis(agg, 0, -1)
            acc = acc + v
    y = jnp.einsum("bfegn->bfn", acc)
    return y if b is None else y + b


def jarma(psi: jnp.ndarray, varphi: jnp.ndarray, phi: jnp.ndarray, gso,
          x: jnp.ndarray, b: Optional[jnp.ndarray] = None,
          t_max: int = 5) -> jnp.ndarray:
    """ARMA rational graph filter via Jacobi iterations.

    Reference: graphML.py:490-638. psi/varphi: (F,E,P,G), phi: (F,E,K,G),
    x: (B,G,N) -> y: (B,F,N). Splits S into its diagonal and off-diagonal,
    inverts the (diagonal) Sbar = Diag(S) - psi*I in closed form, then runs
    t_max Jacobi iterations for the rational part plus an LSIGF residue.
    """
    S = _dense(gso)
    F, E, P, G = psi.shape
    B, G_, N = x.shape
    diag_s = jnp.diagonal(S, axis1=1, axis2=2)            # E x N
    Stilde = S - jnp.einsum("en,nm->enm", diag_s, jnp.eye(N, dtype=S.dtype))
    sbar_inv = 1.0 / (diag_s[None, :, None, None, :]
                      - psi[..., None])                   # F x E x P x G x N
    # (Sbar^{-1} x): diagonal scaling of x
    sbar_inv_x = jnp.einsum("fepgn,bgn->bfepgn", sbar_inv, x)

    # M = Sbar^{-1} Stilde is NEVER materialized (it would be
    # F x E x P x G x N x N — the round-1 memory blowup): applying M is
    # one shared (E,N,N) contraction followed by the diagonal scaling.
    def apply_M(v):
        sv = jnp.einsum("enm,bfepgm->bfepgn", Stilde, v)
        return sbar_inv[None] * sv

    # H1: sum_tau (-1)^tau varphi M^tau (Sbar^{-1} x)
    v = sbar_inv_x
    h1 = jnp.einsum("fepg,bfepgn->bpfn", varphi, v)
    sign = -1.0
    for _ in range(1, t_max + 1):
        v = apply_M(v)
        h1 = h1 + sign * jnp.einsum("fepg,bfepgn->bpfn", varphi, v)
        sign = -sign
    # H2: (-1)^{t_max+1} M^{t_max+1} x
    y = jnp.broadcast_to(x[:, None, None, None], (B, F, E, P, G, N))
    for _ in range(t_max + 1):
        y = apply_M(y)
    h2_sign = -1.0 if t_max % 2 == 0 else 1.0
    h2 = h2_sign * jnp.einsum("bfepgn->bpfn", y)
    # H3: plain LSIGF residue
    h3 = lsigf(phi, gso, x)
    u = jnp.sum(h1 + h2, axis=1) + h3
    return u if b is None else u + b


# ---------------------------------------------------------------------------
# Attention (GAT family)
# ---------------------------------------------------------------------------

def _slab5(gso):
    """A band-mode Gso's slab as (E, nb, W, ibs, ibs)."""
    E, nb, Wibs, ibs = gso.s_band.shape
    return gso.s_band.reshape(E, nb, Wibs // ibs, ibs, ibs)


def attention_gso(x: jnp.ndarray, a: jnp.ndarray, W: jnp.ndarray, gso,
                  negative_slope: float = 0.2) -> jnp.ndarray:
    """Learn the attention GSO alpha_ij (GAT coefficients).

    alpha^{ep}_{ij} = softmax_j(LeakyReLU(a1.Wx_i + a2.Wx_j)) masked to the
    S+I support with an additive -1e12 (reference graphML.py:640-737 —
    including its exact masking arithmetic, for parity).
    x: (B,G,N), a: (P,E,2F), W: (P,E,F,G) -> aij: (B,P,E,N,N).
    """
    S = _dense(gso)
    E, N, _ = S.shape
    P = a.shape[0]
    F = W.shape[2]
    Seye = S + jnp.eye(N, dtype=S.dtype)[None]
    Wx = jnp.einsum("pefg,bgn->bpefn", W, x)
    a1, a2 = a[..., :F], a[..., F:]
    a1Wx = jnp.einsum("pef,bpefn->bpen", a1, Wx)
    a2Wx = jnp.einsum("pef,bpefn->bpen", a2, Wx)
    # e_ij = a2.Wx_i (row i) + a1.Wx_j (col j) — NOTE the reference
    # broadcasts a1 along columns (graphML.py:713: a1Wx is 1 x N repeated
    # down rows, a2Wx^T is N x 1 repeated across columns), i.e. a1 pairs
    # with the *neighbor* j and a2 with the *center* i.
    eij = jax.nn.leaky_relu(a2Wx[..., :, None] + a1Wx[..., None, :],
                            negative_slope=negative_slope)  # B x P x E x N x N
    mask = (jnp.abs(Seye).sum(0) > 1e-9).astype(x.dtype)    # N x N
    aij = jax.nn.softmax(eij * mask - (1 - mask) * INFINITE, axis=-1)
    return aij * mask


def graph_attention(x: jnp.ndarray, a: jnp.ndarray, W: jnp.ndarray, gso,
                    negative_slope: float = 0.2) -> jnp.ndarray:
    """GAT layer output: y^p_i = sum_e sum_j s^e_ij alpha^{ep}_ij W^{ep} x_j.

    Reference: graphML.py:739-809 — note the output aggregates with the
    *edge-weighted* attention S * alpha. Returns (B, P, F, N).
    Pass an attention_sparse.EdgeList as `gso` for the O(E) edge-list path
    (no B x P x E x N x N materialization).
    """
    from graph_neural_networks_tpu.ops import attention_sparse as asp
    if isinstance(gso, asp.EdgeList):
        return asp.graph_attention_edges(x, a, W, gso, negative_slope)
    if hasattr(gso, "band_attention"):   # parallel.sharded_gso.ShardedGso
        from graph_neural_networks_tpu.parallel import attention as sha
        return sha.sharded_graph_attention(x, a, W, gso.band_attention)
    if isinstance(gso, gso_lib.Gso) and gso.mode == "band":
        from graph_neural_networks_tpu.ops import attention_band as ab
        return ab.graph_attention_band(x, a, W, _slab5(gso), gso.band_w,
                                       negative_slope=negative_slope)
    S = _dense(gso)
    aij = attention_gso(x, a, W, gso, negative_slope)
    Wx = jnp.einsum("pefg,bgn->bpefn", W, x)
    y = jnp.einsum("bpefn,bpenm->bpefm", Wx, S[None, None] * aij)
    return jnp.sum(y, axis=2)


def gat_lsigf(h: jnp.ndarray, x: jnp.ndarray, a: jnp.ndarray, W: jnp.ndarray,
              gso, b: Optional[jnp.ndarray] = None,
              negative_slope: float = 0.2) -> jnp.ndarray:
    """K-tap LSIGF over the learned attention GSO (GCAT).

    Reference: graphML.py:811-895. h: (E,K), x: (B,G,N), a: (P,E,2F),
    W: (P,E,F,G) -> y: (B,P,F,N). Pass an EdgeList as `gso` for the O(E)
    edge-list path.
    """
    from graph_neural_networks_tpu.ops import attention_sparse as asp
    if isinstance(gso, asp.EdgeList):
        return asp.gat_lsigf_edges(h, x, a, W, gso, b, negative_slope)
    if hasattr(gso, "band_attention"):   # parallel.sharded_gso.ShardedGso
        from graph_neural_networks_tpu.parallel import attention as sha
        return sha.sharded_gat_lsigf(h, x, a, W, gso.band_attention, b)
    if isinstance(gso, gso_lib.Gso) and gso.mode == "band":
        from graph_neural_networks_tpu.ops import attention_band as ab
        return ab.gat_lsigf_band(h, x, a, W, _slab5(gso), gso.band_w, b,
                                 negative_slope)
    E, K = h.shape
    P, _, F, G = W.shape
    B, _, N = x.shape
    aij = attention_gso(x, a, W, gso, negative_slope)     # B x P x E x N x N
    # Filter-tap layout replicates the reference exactly (graphML.py:863-865):
    # W.permute(0,3,1,2).reshape(P,F,E,1,G) — for F == G this transposes W's
    # (f,g) axes relative to the attention stage; for F != G it is a raw
    # memory reinterpretation (a reference quirk kept for activation parity;
    # it is a fixed linear reparameterization, harmless to training).
    W_taps = jnp.transpose(W, (0, 3, 1, 2)).reshape(P, F, E, 1, G)
    hW = h[None, None, :, :, None] * W_taps               # P x F x E x K x G
    xe = jnp.broadcast_to(x[:, None, None], (B, P, E, G, N))
    zs = [xe]
    for _ in range(1, K):
        xe = jnp.einsum("bpegn,bpenm->bpegm", xe, aij)
        zs.append(xe)
    z = jnp.stack(zs, axis=3)                             # B x P x E x K x G x N
    y = jnp.einsum("bpekgn,pfekg->bpfn", z, hW)
    return y if b is None else y + b


def gat_evgf(x: jnp.ndarray, a: jnp.ndarray, W: jnp.ndarray, gso,
             b: Optional[jnp.ndarray] = None,
             negative_slope: float = 0.2) -> jnp.ndarray:
    """Edge-variant filter where each hop's matrix is its own attention GSO.

    Reference: graphML.py:897-969. a: (P,K,E,2F), W: (P,K,E,F,G) ->
    y: (B,P,F,N). Pass an EdgeList as `gso` for the O(E) edge-list path.
    """
    from graph_neural_networks_tpu.ops import attention_sparse as asp
    if isinstance(gso, asp.EdgeList):
        return asp.gat_evgf_edges(x, a, W, gso, b, negative_slope)
    if hasattr(gso, "band_attention"):   # parallel.sharded_gso.ShardedGso
        from graph_neural_networks_tpu.parallel import attention as sha
        return sha.sharded_gat_evgf(x, a, W, gso.band_attention, b)
    if isinstance(gso, gso_lib.Gso) and gso.mode == "band":
        from graph_neural_networks_tpu.ops import attention_band as ab
        return ab.gat_evgf_band(x, a, W, _slab5(gso), gso.band_w, b,
                                negative_slope)
    S = _dense(gso)
    P, K, E, F, G = W.shape
    W0x = jnp.einsum("pefg,bgn->bpefn", W[:, 0], x)
    aij = attention_gso(x, a[:, 0], W[:, 0], gso, negative_slope)
    W0x = jnp.einsum("bpefn,bpenm->bpefm", W0x, S[None, None] * aij)
    y = W0x
    for k in range(1, K):
        aij = attention_gso(x, a[:, k], W[:, k], gso, negative_slope)
        W0x = jnp.einsum("bpefn,bpenm->bpefm", W0x, S[None, None] * aij)
        y = y + W0x
    y = jnp.sum(y, axis=2)
    return y if b is None else y + b


# ---------------------------------------------------------------------------
# Time-varying (delayed, batch GSO) functionals
# ---------------------------------------------------------------------------

def db_graph_shift(xe: jnp.ndarray, S) -> jnp.ndarray:
    """One per-(batch,time) graph shift of xe: (B,T,E,G,N); S is a dense
    (B,T,E,N,N) stack or an ell.EllGso (incl. the node-sharded
    parallel.db.ShardedEllGso) with leading axes (B,T)."""
    if isinstance(S, ell_lib.EllGso):
        return S.db_shift(xe)
    return jnp.einsum("btegn,btenm->btegm", xe, S)


def step_shift_rows(r, S_t):
    """One node-major graph shift of r (B,N,E,C) by a per-step GSO:
    ops.ell.EllGso with leading (B,), or dense (B,N,N)/(B,E,N,N)."""
    if isinstance(S_t, ell_lib.EllGso):
        return S_t.db_shift_rows(r)
    S = jnp.asarray(S_t)
    if S.ndim == 3:
        S = S[:, None]
    return jnp.einsum("bnec,benm->bmec", r, S.astype(r.dtype))


def tap_register_combine(w, b, shifted, x_nm):
    """Post-shift half of ``tap_register_step``: build the tap stack
    from the ALREADY-shifted register (S(t)·z_{0..K-2}(t-1)) and
    contract with the taps. Split out so closed-loop rollouts that
    obtain the shifted registers elsewhere (the grid environment's
    fused window pass carries them as a table payload,
    data.flocking._jnp_env_step_grid) share the exact same math.

    w: (F,E,K,G); shifted: (B,N,E,K-1,G); x_nm: (B,N,G).
    Returns (reg' (B,N,E,K-1,G), y (B,N,F))."""
    F, E, K, G = w.shape
    B, N, _ = x_nm.shape
    x0 = jnp.broadcast_to(x_nm[:, :, None, None], (B, N, E, 1, G))
    stack = jnp.concatenate([x0, shifted], axis=-2) if K > 1 else x0
    y = jnp.einsum("bnekg,fekg->bnf", stack, w)
    if b is not None:
        y = y + jnp.reshape(b, (-1,))
    return stack[..., : K - 1, :], y


def tap_register_step(w, b, reg, x_nm, S_t):
    """One causal step of a delayed graph filter (lsigf_db) on the
    node-major tap register — THE recurrence z_k(t) = S(t)·z_{k-1}(t-1)
    that defines the DB family, shared by the scan formulation below
    and the architectures' rollout_step closed-loop interface
    (architectures_time) so the two can never drift apart.

    w: (F,E,K,G); reg: (B,N,E,K-1,G) holding z_{0..K-2}(t-1); x_nm:
    (B,N,G); S_t: EllGso with leading (B,) or dense (B,[E,]N,N).
    Returns (reg' (B,N,E,K-1,G), y (B,N,F))."""
    F, E, K, G = w.shape
    B, N, _ = x_nm.shape
    if K > 1:
        r = reg.reshape(B, N, E, (K - 1) * G)
        shifted = step_shift_rows(r, S_t).reshape(B, N, E, K - 1, G)
    else:
        shifted = jnp.zeros((B, N, E, 0, G), x_nm.dtype)
    return tap_register_combine(w, b, shifted, x_nm)


def _lsigf_db_ell_rows(h, S, x, b=None):
    """ELL lsigf_db in the node-major layout: x (B,T,G,N) -> y (B,T,N,F).

    Formulated as a ``lax.scan`` over T carrying the K-1 deep delayed
    register z_k(t) = S(t)·z_{k-1}(t-1) node-major: each step does ONE
    ``ell_shift_rows`` of row width E·(K-1)·G instead of the K-1
    separate width-E·G shifts of the tap-loop formulation. The TPU
    gather is row-LATENCY bound and flat in row width
    (experiments/probe_pallas_gather.json: ~5-7 ns/row, and a Pallas
    kernel cannot beat it — see the probe), so gathering (K-1)x wider
    rows (K-1)x less often is a direct (K-1)x win. The tap contraction
    is one (B·N, K·E·G)x(K·E·G, F) matmul per step.
    """
    F, E, K, G = h.shape
    B, T, _, N = x.shape
    xr = jnp.swapaxes(x, -1, -2)                       # B x T x N x G

    def step(reg, inp):
        x_t, S_t = inp                                 # (B,N,G), ell (B,)
        return tap_register_step(h, None, reg, x_t, S_t)

    reg0 = jnp.zeros((B, N, E, max(K - 1, 1), G), x.dtype)
    if K == 1:
        reg0 = reg0[..., :0, :]
    xs = (jnp.moveaxis(xr, 1, 0),
          jax.tree_util.tree_map(lambda s: jnp.moveaxis(s, 1, 0), S))
    _, ys = jax.lax.scan(step, reg0, xs)               # (T, B, N, F)
    y = jnp.moveaxis(ys, 0, 1)
    return y if b is None else y + jnp.reshape(b, (-1,))


def lsigf_db(h: jnp.ndarray, S, x: jnp.ndarray,
             b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Delayed LSIGF over a per-(batch, time) GSO.

    y(t) = sum_k h_k x(t-k) S(t-k+1)...S(t) (unit-delay information
    propagation for decentralized controllers). Reference:
    graphML.py:977-1094. h: (F,E,K,G), x: (B,T,G,N); S: dense
    (B,T,E,N,N) or an O(N·deg) ell.EllGso. b: (F,1) bias or None.
    """
    if isinstance(S, ell_lib.EllGso):
        return jnp.swapaxes(_lsigf_db_ell_rows(h, S, x, b), -1, -2)
    F, E, K, G = h.shape
    B, T, _, N = x.shape
    xe = jnp.broadcast_to(x[:, :, None], (B, T, E, G, N))
    zs = [xe]
    for _ in range(1, K):
        # shift down the time axis (zero-pad t=0), then shift on the graph
        xe = jnp.concatenate(
            [jnp.zeros_like(xe[:, :1]), xe[:, :-1]], axis=1)
        xe = db_graph_shift(xe, S)
        zs.append(xe)
    z = jnp.stack(zs, axis=2)                             # B x T x K x E x G x N
    y = jnp.einsum("btkegn,fekg->btfn", z, h)
    return y if b is None else y + b


def _grnn_db_ell_rows(a, b_taps, S, x, z0, sigma, x_bias, z_bias):
    """ELL grnn_db with the hidden-state register held node-major
    (B,N,E,K,H) across the whole scan — every per-step register shift is
    one ell_shift_rows (the TPU-fast gather layout), with the single
    layout transpose paid once at the output boundary."""
    H, E, K, F = a.shape
    B, T, _, N = x.shape
    Axr = _lsigf_db_ell_rows(a, S, x, x_bias)          # B x T x N x H
    zb = None if z_bias is None else jnp.reshape(z_bias, (-1,))

    def apply_b(reg):
        # reg: (B,N,E,K,H); Bz[b,n,h] = sum_{e,k,j} b[h,e,k,j] reg[b,n,e,k,j]
        out = jnp.einsum("hekj,bnekj->bnh", b_taps, reg)
        return out if zb is None else out + zb

    def step_shift(reg, S_t):
        # reg: (B,N,E,K-1,H); S_t has leading axes (B,)
        r = reg.reshape(B, N, E, (K - 1) * H)
        r = S_t.db_shift_rows(r)
        return r.reshape(B, N, E, K - 1, H)

    # t = 0: register holds [z_{-1}=z0, 0, ..., 0]
    reg0 = jnp.zeros((B, N, E, K, H), x.dtype)
    z0r = jnp.swapaxes(z0, -1, -2)                     # B x N x H
    reg0 = reg0.at[..., 0, :].set(
        jnp.broadcast_to(z0r[:, :, None], (B, N, E, H)))
    z_t = sigma(Axr[:, 0] + apply_b(reg0))             # B x N x H

    def step(carry, inp):
        z_prev, reg = carry
        S_t, Ax_t = inp
        # delay the register: drop the oldest, shift all, prepend z_{t-1}
        shifted = step_shift(reg[..., : K - 1, :], S_t)
        reg = jnp.concatenate(
            [jnp.broadcast_to(z_prev[:, :, None, None], (B, N, E, 1, H)),
             shifted], axis=-2)
        z_new = sigma(Ax_t + apply_b(reg))
        return (z_new, reg), z_new

    if T > 1:
        S_rest = jax.tree_util.tree_map(
            lambda s: jnp.moveaxis(s[:, 1:], 1, 0), S)
        xs = (S_rest, jnp.moveaxis(Axr[:, 1:], 1, 0))
        (_, _), z_rest = jax.lax.scan(step, (z_t, reg0), xs)
        zr = jnp.concatenate(
            [z_t[:, None], jnp.moveaxis(z_rest, 0, 1)], axis=1)
    else:
        zr = z_t[:, None]
    return jnp.swapaxes(zr, -1, -2)                    # B x T x H x N


def grnn_db(a: jnp.ndarray, b_taps: jnp.ndarray, S: jnp.ndarray,
            x: jnp.ndarray, z0: jnp.ndarray, sigma: Callable,
            x_bias: Optional[jnp.ndarray] = None,
            z_bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Hidden-state sequence z_t = sigma(A(S)x_t + B(S;t)z_{t-1}) on a
    time-varying batch GSO, keeping a K-deep register of delayed hidden
    states. Reference: graphML.py:1096-1290 (python t-loop) re-expressed as
    ``lax.scan``.

    a: (H,E,K,F), b_taps: (H,E,K,H), x: (B,T,F,N), z0: (B,H,N)
    -> z: (B,T,H,N); S: dense (B,T,E,N,N) or an ell.EllGso.
    """
    if isinstance(S, ell_lib.EllGso):
        return _grnn_db_ell_rows(a, b_taps, S, x, z0, sigma,
                                 x_bias, z_bias)
    H, E, K, F = a.shape
    B, T, _, N = x.shape
    Ax = lsigf_db(a, S, x, b=x_bias)                       # B x T x H x N

    def step_shift(reg, S_t):
        # reg: (B, K-1, E, H, N); S_t has leading axes (B,)
        return jnp.einsum("bkejn,benm->bkejm", reg, S_t)

    def apply_b(reg):
        # reg: B x K x E x H x N ;  Bz[b,h,n] = sum_{e,k,h'} b[h,e,k,h'] reg[b,k,e,h',n]
        out = jnp.einsum("hekj,bkejn->bhn", b_taps, reg)
        return out if z_bias is None else out + z_bias.reshape(1, H, 1)

    # t = 0: register holds [z_{-1}=z0, 0, ..., 0]
    reg0 = jnp.zeros((B, K, E, H, N), x.dtype)
    reg0 = reg0.at[:, 0].set(jnp.broadcast_to(z0[:, None], (B, E, H, N)))
    z_t = sigma(Ax[:, 0] + apply_b(reg0))

    def step(carry, inp):
        z_prev, reg = carry
        S_t, Ax_t = inp
        # delay the register: drop the oldest, shift all by S_t, prepend z_{t-1}
        shifted = step_shift(reg[:, :K - 1], S_t)
        reg = jnp.concatenate(
            [jnp.broadcast_to(z_prev[:, None, None], (B, 1, E, H, N)),
             shifted], axis=1)
        z_new = sigma(Ax_t + apply_b(reg))
        return (z_new, reg), z_new

    if T > 1:
        S_rest = jax.tree_util.tree_map(
            lambda s: jnp.moveaxis(s[:, 1:], 1, 0), S)
        xs = (S_rest, jnp.moveaxis(Ax[:, 1:], 1, 0))
        (_, _), z_rest = jax.lax.scan(step, (z_t, reg0), xs)
        z = jnp.concatenate([z_t[:, None], jnp.moveaxis(z_rest, 0, 1)], axis=1)
    else:
        z = z_t[:, None]
    return z


def _lsigf_batched_gso(h: jnp.ndarray, Sb: jnp.ndarray, x: jnp.ndarray,
                       b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """LSIGF where every batch row has its own (gated) GSO.

    h: (F,E,K,G), Sb: (R,E,N,N), x: (R,G,N) -> (R,F,N). The TPU-native
    replacement for the reference's BTxBT matmul + diagonal trick
    (graphML.py:1425-1431): just a batched SpMM.
    """
    F, E, K, G = h.shape
    R, _, N = x.shape
    xe = jnp.broadcast_to(x[:, None], (R, E, G, N))
    zs = [xe]
    for _ in range(1, K):
        xe = jnp.einsum("regn,renm->regm", xe, Sb)
        zs.append(xe)
    z = jnp.stack(zs, axis=2)                              # R x E x K x G x N
    y = jnp.einsum("rekgn,fekg->rfn", z, h)
    return y if b is None else y + b


def _lsigf_batched_edges(h: jnp.ndarray, coeff: jnp.ndarray, edges,
                         x: jnp.ndarray,
                         b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """LSIGF where every batch row has its own per-edge gated GSO — the
    O(nnz) equivalent of _lsigf_batched_gso for edge-gated recurrences.

    h: (F,E,K,G), coeff: (R,E,nnz) gated edge weights, x: (R,G,N)
    -> (R,F,N).
    """
    from graph_neural_networks_tpu.ops import attention_sparse as asp
    F, E, K, G = h.shape
    R, _, N = x.shape
    xe = jnp.broadcast_to(x[:, None], (R, E, G, N))
    zs = [xe]
    for _ in range(1, K):
        xe = asp.edge_shift(xe, coeff, edges)
        zs.append(xe)
    z = jnp.stack(zs, axis=2)                              # R x E x K x G x N
    y = jnp.einsum("rekgn,fekg->rfn", z, h)
    return y if b is None else y + b


def gated_grnn(a: jnp.ndarray, b_taps: jnp.ndarray, gso, x: jnp.ndarray,
               z0: jnp.ndarray, sigma: Callable,
               q_hat: Optional[jnp.ndarray] = None,
               q_check: Optional[jnp.ndarray] = None,
               x_bias: Optional[jnp.ndarray] = None,
               z_bias: Optional[jnp.ndarray] = None,
               edge_gated: bool = False) -> jnp.ndarray:
    """Static-GSO gated GRNN: z_t = sigma(qhat*(A(S)x_t) + qcheck*(B(S)z_{t-1})).

    Gate shapes select the mode (reference graphML.py:1292-1527):
      None            -> ungated,
      (B,T,1,1)       -> time gate (scalar per (b,t)),
      (B,T,1,N)       -> node gate,
      (B,T,1,N,N)     -> edge gate (gates the GSO itself inside the filter).
    a: (H,E,K,F), b_taps: (H,E,K,H), S: (E,N,N), x: (B,T,F,N), z0: (B,H,N).

    The ungated / time-gated / node-gated paths never densify the GSO —
    they run through ``gshift`` and so support band/BCSR Gso layouts and
    node-sharded ShardedGso. Only the edge-gated path (which modulates
    individual GSO entries, reference graphML.py:1415-1431) needs the
    dense (E,N,N) array.
    """
    H, E, K, F = a.shape
    B, T, _, N = x.shape
    xb = None if x_bias is None else x_bias.reshape(1, H, 1)
    zb = None if z_bias is None else z_bias.reshape(1, H, 1)

    from graph_neural_networks_tpu.ops import attention_sparse as asp
    sparse_edges = edge_gated and isinstance(gso, asp.EdgeList)
    edge_hat = q_hat is not None and (q_hat.ndim == 5 or sparse_edges)
    edge_check = q_check is not None and (q_check.ndim == 5 or sparse_edges)
    S = (_dense(gso) if (edge_hat or edge_check) and not sparse_edges
         else None)

    # --- input-to-hidden Ax over all (b, t) at once
    if not edge_hat:
        Ax = lsigf(a, gso, x.reshape(B * T, F, N), b=xb).reshape(B, T, H, N)
        if q_hat is not None:
            Ax = q_hat * Ax
    elif sparse_edges:
        # per-edge gate (B,T,1,nnz) modulates the edge values in the SpMM
        # itself — the O(nnz) form of the reference's gated-GSO semantics
        # (graphML.py:1415-1431) with no N x N materialization
        coeff = (q_hat.reshape(B * T, 1, -1)
                 * gso.s_val[None])                        # BT x E x nnz
        Ax = _lsigf_batched_edges(a, coeff, gso, x.reshape(B * T, F, N),
                                  b=xb).reshape(B, T, H, N)
    else:
        Sb = q_hat.reshape(B * T, 1, N, N) * S[None]       # BT x E x N x N
        Ax = _lsigf_batched_gso(a, Sb, x.reshape(B * T, F, N),
                                b=xb).reshape(B, T, H, N)

    # --- hidden-to-hidden recurrence (lax.scan over t; the gate for step t
    # rides along as a scanned input so long sequences compile once)
    def step(z_prev, inp):
        Ax_t, qc_t = inp
        if not edge_check:
            Bz = lsigf(b_taps, gso, z_prev, b=zb)
            if qc_t is not None:
                Bz = qc_t * Bz
        elif sparse_edges:
            coeff_t = qc_t * gso.s_val[None]               # B x E x nnz
            Bz = _lsigf_batched_edges(b_taps, coeff_t, gso, z_prev, b=zb)
        else:
            Sb_t = qc_t * S[None]                          # B x E x N x N
            Bz = _lsigf_batched_gso(b_taps, Sb_t, z_prev, b=zb)
        z_new = sigma(Ax_t + Bz)
        return z_new, z_new

    ax_xs = jnp.moveaxis(Ax, 1, 0)                         # T x B x H x N
    if q_check is None:
        _, z_seq = jax.lax.scan(lambda c, ax: step(c, (ax, None)), z0, ax_xs)
    else:
        qc_xs = jnp.moveaxis(q_check, 1, 0)                # T x B x 1 x ...
        _, z_seq = jax.lax.scan(step, z0, (ax_xs, qc_xs))
    return jnp.moveaxis(z_seq, 0, 1)
