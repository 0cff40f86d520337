"""Flocking dataset: swarm imitation learning for decentralized control.

Re-design of the reference's ``Flocking`` (dataTools.py:2210-4005):
  * expert (centralized) controller rollouts for supervision,
  * pairwise-distance communication graphs renormalized by lambda_max,
  * 6-feature agent states,
  * closed-loop `compute_trajectory` that runs a trained architecture in
    the loop (the evaluation path for decentralized controllers),
  * velocity-variance flocking cost.

The physics is pure array math; the closed-loop rollout feeds the model a
zero-padded full-horizon history each step (causal unit-delay filters
ignore the future), so one jitted forward serves every step.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from graph_neural_networks_tpu.data.base import Data, ZERO_TOL, invert_tensor_ew


def _lambda_max_power(W, iters: int = 64):
    """Top eigenvalue of a symmetric nonnegative (B,N,N) matrix by power
    iteration — O(iters·N²) instead of eigvalsh's O(N³), the large-N path
    for in-scan graph normalization."""
    import jax
    import jax.numpy as jnp
    B, N, _ = W.shape
    v = jnp.ones((B, N), W.dtype) / jnp.sqrt(N)

    def body(_, v):
        w = jnp.einsum("bnm,bn->bm", W, v)
        return w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True),
                               ZERO_TOL)

    v = jax.lax.fori_loop(0, iters, body, v)
    return jnp.einsum("bn,bnm,bm->b", v, W, v)


def _jnp_comm_graph(pos, comm_radius, lam_method: str = "eig"):
    """Single-step jnp communication graph (B,2,N) -> (B,N,N), unweighted
    + lambda_max-normalized — the in-scan mirror of
    compute_communication_graph (reference dataTools.py:2816-3020).
    lam_method 'power' replaces eigvalsh with power iteration (large N)."""
    import jax.numpy as jnp
    diff = pos[:, :, :, None] - pos[:, :, None, :]
    dist_sq = jnp.sum(diff ** 2, axis=1)
    Wk = jnp.exp(-dist_sq)
    Wk = jnp.where(dist_sq > comm_radius ** 2, 0.0, Wk)
    N = pos.shape[-1]
    Wk = jnp.where(jnp.eye(N, dtype=bool)[None], 0.0, Wk)
    W = (Wk > ZERO_TOL).astype(pos.dtype)
    if lam_method == "power":
        lam = _lambda_max_power(W)
    else:
        lam = jnp.max(jnp.linalg.eigvalsh(W), axis=-1)
    lam = jnp.where(jnp.abs(lam) < ZERO_TOL, 1.0, lam)
    return W / lam[:, None, None]


def _jnp_states(pos, vel, graph):
    """Single-step jnp 6-feature agent state — the in-scan mirror of
    compute_states (reference dataTools.py:2612-2815)."""
    import jax.numpy as jnp
    diff_pos = pos[:, :, :, None] - pos[:, :, None, :]
    dist_sq = jnp.sum(diff_pos ** 2, axis=1)
    diff_vel = vel[:, :, :, None] - vel[:, :, None, :]
    adj = (jnp.abs(graph) > ZERO_TOL).astype(pos.dtype)[:, None]
    inv = jnp.where(jnp.abs(dist_sq) > ZERO_TOL, 1.0 / dist_sq, 0.0)
    inv = inv[:, None] * adj
    diff_pos = diff_pos * adj
    diff_vel = diff_vel * adj
    state_vel = jnp.sum(diff_vel, axis=-1)
    state_pos_fourth = jnp.sum(diff_pos * inv ** 2, axis=-1)
    state_pos_sq = jnp.sum(diff_pos * inv, axis=-1)
    return jnp.concatenate([state_vel, state_pos_fourth, state_pos_sq],
                           axis=-2)


def _jnp_env_step_chunked(pos, vel, comm_radius, d_max, chunk,
                          v_prev, lam_iters: int = 8):
    """One O(N·deg)-memory environment step for very large swarms: the
    ELL communication graph (top-d_max binary in-neighbors per agent,
    lambda_max-normalized) AND the 6-feature agent states, computed in
    row chunks of `chunk` agents — the (N,N) distance/adjacency matrices
    of ``_jnp_comm_graph``/``_jnp_states`` are never allocated (at
    N=65536 they would be 17 GB each), only (B, chunk, N) workspaces.

    Exact vs the dense step whenever d_max >= the true max in-degree
    (the neighbor sets are binary, so top_k returns them all; the masked
    state reductions sum the same terms). lambda_max by power iteration
    on the ELL matvec, warm-started from ``v_prev`` — the eigenvector is
    carried across scan steps, so a few iterations per step track the
    slowly-moving swarm spectrum. Returns (idx (B,N,D), val_norm
    (B,N,D), states (B,6,N), v (B,N)). Requires N % chunk == 0.
    """
    import jax
    import jax.numpy as jnp
    from graph_neural_networks_tpu.ops import ell as ell_lib
    B, _, N = pos.shape
    assert N % chunk == 0, (N, chunk)
    r2 = comm_radius ** 2
    cols = jnp.arange(N)

    def one(lo):
        pr = jax.lax.dynamic_slice(pos, (0, 0, lo), (B, 2, chunk))
        vr = jax.lax.dynamic_slice(vel, (0, 0, lo), (B, 2, chunk))
        dp = pr[..., :, None] - pos[:, :, None, :]      # B,2,chunk,N
        d2 = jnp.sum(dp ** 2, axis=1)                   # B,chunk,N
        rows = lo + jnp.arange(chunk)
        m = ((d2 <= r2) & (jnp.exp(-d2) > ZERO_TOL)
             & (cols[None, None, :] != rows[None, :, None]))
        mf = m.astype(pos.dtype)
        val, idx = _env_topk(mf, d_max)                 # B,chunk,D
        dv = vr[..., :, None] - vel[:, :, None, :]      # B,2,chunk,N
        inv = jnp.where(d2 > ZERO_TOL, 1.0 / d2, 0.0) * mf
        inv = inv[:, None]                              # B,1,chunk,N
        mfe = mf[:, None]
        st = jnp.concatenate(
            [jnp.sum(dv * mfe, -1), jnp.sum(dp * inv ** 2, -1),
             jnp.sum(dp * inv, -1)], axis=-2)           # B,6,chunk
        return idx.astype(jnp.int32), val, st

    idxs, vals, sts = jax.lax.map(one, jnp.arange(N // chunk) * chunk)
    idx = jnp.moveaxis(idxs, 0, 1).reshape(B, N, d_max)
    val = jnp.moveaxis(vals, 0, 1).reshape(B, N, d_max)
    states = jnp.moveaxis(sts, 0, 2).reshape(B, 6, N)

    ell = ell_lib.EllGso(idx, val[:, None])

    def mv(v):                                          # W v, W symmetric
        return ell_lib.ell_shift(v[:, None, None, :], ell)[:, 0, 0]

    def body(_, v):
        w = mv(v)
        return w / jnp.maximum(
            jnp.linalg.norm(w, axis=-1, keepdims=True), ZERO_TOL)

    v = jax.lax.fori_loop(0, lam_iters, body, v_prev)
    lam = jnp.einsum("bn,bn->b", v, mv(v))
    lam = jnp.where(jnp.abs(lam) < ZERO_TOL, 1.0, lam)
    return idx, val / lam[:, None, None], states, v


def _ell_power_lambda(idx, val, v_prev, lam_iters: int):
    """Warm-started power iteration for lambda_max on an ELL graph
    ((B,N,D) idx/val); returns (lam (B,), v (B,N))."""
    import jax
    import jax.numpy as jnp
    from graph_neural_networks_tpu.ops import ell as ell_lib
    ell = ell_lib.EllGso(idx, val[:, None])

    def mv(v):
        return ell_lib.ell_shift(v[:, None, None, :], ell)[:, 0, 0]

    def body(_, v):
        w = mv(v)
        return w / jnp.maximum(
            jnp.linalg.norm(w, axis=-1, keepdims=True), ZERO_TOL)

    v = jax.lax.fori_loop(0, lam_iters, body, v_prev)
    lam = jnp.einsum("bn,bn->b", v, mv(v))
    lam = jnp.where(jnp.abs(lam) < ZERO_TOL, 1.0, lam)
    return lam, v


def _jnp_env_step_grid(pos, vel, comm_radius, d_max, v_prev,
                       lam_iters: int = 8, table_size=None,
                       cell_cap: int = 16, use_kernel=None,
                       lam_path: str = "auto", cell_factor: int = 1,
                       payload=None, expert_repel=None):
    """One O(N·k) cell-list environment step — the TPU-native spatial
    hash grid replacing the O(N²) all-pairs step for very large swarms.

    Agents are binned into square cells of side ``comm_radius`` on a
    MODULAR (toroidal) grid of Gx x Gy = ``table_size`` cells (slot =
    (cx mod Gx) + Gx·(cy mod Gy)); every agent's neighbors live in its
    3x3 cell neighborhood. The cell table is stored as ONE ROW PER CELL
    holding its (up to ``cell_cap``) members' features, so the
    candidate fetch is 9 WIDE row gathers per agent — the TPU gather is
    row-latency bound and flat in row width (probe_pallas_gather.json),
    so this costs 9N gathers instead of the all-pairs N² distance work.
    All shapes static; host cost per step: one N-key sort + one row
    scatter + 9N row gathers + O(N·9·cell_cap) vector work. The modular
    map (vs a hash) means two distinct occupied cells only share a slot
    when they are exactly Gx (or Gy) cells apart — impossible while the
    swarm's extent is below Gx·comm_radius, so slot occupancy equals
    true cell occupancy (measured max 6-7 agents/cell at flocking
    densities; a random hash pooled up to 4-5 cells per slot).

    Exactness: identical neighbor SETS and states as the all-pairs step
    whenever (a) no slot overflows ``cell_cap`` (the returned ``ok``
    flag is False if one did — aliased far cells merely pool capacity
    and add distance-filtered candidates; they never create false
    neighbors), and (b) d_max >= true max in-degree. Neighbor order
    within a row follows the candidate window, not ascending index —
    ELL consumers sum over the row, so only float association differs.
    lambda_max by the same warm-started power iteration as the chunked
    step.

    pos/vel: (B,2,N); v_prev: (B,N). Returns (idx (B,N,D) int32,
    val_norm (B,N,D), states (B,6,N), v (B,N), ok ()).

    payload (B,N,P) rides the cell table as P extra feature blocks and
    the same window pass additionally returns its NORMALIZED graph
    shift shifted = (W/lambda) @ payload (B,N,P) before ``ok`` — the
    fused-policy rollout: the policy's delayed tap registers
    (models.architectures_time.rollout_payload) are shifted by the
    step's own neighbor exchange, replacing the separate O(N·d_max)
    ELL register gather entirely (at N=1M that gather's padded
    intermediate alone is ~9 GB). The payload shift sums the
    UNTRUNCATED in-range neighbor mask, so it equals the ELL shift
    exactly whenever d_max covers the true max in-degree (the step's
    existing exactness condition); float association differs
    (candidate order vs ELL-slot order). Requires the window-lambda
    path (lam_path 'auto'/'window').

    expert_repel=repelDist: the same cell table (repelDist <=
    comm_radius, so the window covers every repel-range pair) gets a
    SECOND cheap window pass at r2=repelDist^2 whose 6-feature states
    ARE the centralized expert's collision sums — the step then also
    returns repel = 2*(st2+st4, st3+st5) (B,2,N), turning the expert
    supervision of ``generate_trajectories_large`` O(N) (the chunked
    all-pairs expert is O(N^2/chunk)). Equals
    ``_jnp_expert_accel_chunked``'s pairwise sum up to float
    association and the d2==repel^2 boundary comparator (< there,
    <= here — measure-zero).

    lambda_max: with the fused window kernel (lam_path='window', the
    'auto' choice whenever use_kernel), the FIRST power-iteration
    matvec W @ v_prev is folded into the main window pass for free
    (v_prev rides the cell table's 7th feature block), and each
    further matvec is ONE candidate-window pass (re-scatter v into the
    table's v lanes + window-major gather + wv_only kernel) — O(9N)
    row gathers instead of the O(N·d_max) element gathers of the ELL
    matvec (_ell_power_lambda, the lam_path='ell' / non-kernel
    choice). The window matvec sums the UNTRUNCATED neighbor mask, so
    it equals the ELL matvec exactly whenever d_max covers the true
    max degree (the step's existing exactness condition); float
    association differs (candidate order vs ELL-slot order).

    Replaces: reference computeCommunicationGraph + computeStates
    (dataTools.py:2816, 2612) at O(N·k).
    """
    import jax
    import jax.numpy as jnp
    B, _, N = pos.shape
    H, Gx, Gy, C = _grid_geometry(N, table_size, cell_cap, cell_factor)
    r2 = comm_radius ** 2
    inv_s = 1.0 / (cell_factor * comm_radius)
    if expert_repel is not None:
        # cells are sized by comm_radius: a larger repel radius would
        # silently drop collision pairs outside the window (ADVICE r4)
        assert float(expert_repel) <= float(comm_radius), \
            (expert_repel, comm_radius)
    if use_kernel is None:
        use_kernel = _gridwin_enabled()
    # 'auto' = the window lambda on every grid path (kernel or XLA):
    # lam_iters=0 is then the zero-pass fold everywhere, and the ELL
    # matvec (which would freeze v at lam_iters=0) stays opt-in
    win_lam = lam_path in ("auto", "window")
    P = 0 if payload is None else int(payload.shape[-1])
    assert P == 0 or win_lam, \
        "the fused payload shift rides the window-lambda pass " \
        "(lam_path 'auto'/'window')"
    # agent-chunked window math: all big intermediates are (chunk, M)-
    # shaped — minor dim M=9C, so the (8,128) tiling pads ~1.8x instead
    # of the ~14x a (N,9,C,6) layout costs (a full-N layout at 262k
    # OOM'd the chip purely on padding). With the fused Pallas window
    # kernel the per-chunk XLA arrays are just the gather output and
    # the kernel result — but inside lax.map XLA stack-allocates the
    # kernel result (the kernel itself asks for ~24 MB of VMEM at
    # row_tile=512 — above the 16 MB scoped default, raised via
    # CompilerParams.vmem_limit_bytes in ops.gridwin). The chunk
    # budget scales inversely with the table row width so the
    # per-chunk gather workspace stays bounded when payload blocks
    # widen the rows. The 65536*256 anchor gives 65536 rows at the
    # quad scheme's payload-free Wt=256 (unchanged from the r3
    # tuning) and 131072 at the 3x3 scheme's Wt=128 (2x the r3
    # chunk, ADVICE r4); both were exercised on-chip at 262k
    # (probe_gridwin_v2.json, probe_fused_policy.json).
    Wt = -(-(7 + P) * C // 128) * 128
    chunk = _fit_chunk(
        N, max(4096, 65536 * 256 // Wt) if use_kernel else 8192)

    def one(pos_b, vel_b, v0_b, pay_b=None):
        px, py = pos_b[0], pos_b[1]
        vx, vy = vel_b[0], vel_b[1]
        cell_rows, cx, cy, ok, (order, vpos) = _grid_build_table(
            px, py, vx, vy, inv_s, H, Gx, Gy, C,
            v=v0_b if win_lam else None, pay=pay_b)
        rows_out = _grid_rows_chunked(
            px, py, vx, vy, cx, cy, 0, N, chunk, cell_rows,
            Gx, Gy, C, r2, d_max, N, use_kernel=use_kernel,
            inv_s=inv_s, factor=cell_factor, n_pay=P)
        if P:
            idx, val, states, wv, wpay, cnt = rows_out
            if d_max > 0:
                # fused-policy coverage check: the payload shift sums
                # the UNTRUNCATED mask while the emitted ELL graph is
                # truncated to d_max — if any agent's true in-degree
                # exceeds d_max the two silently diverge (DAGger
                # training graphs inconsistent with the dynamics that
                # produced them), so surface it through the same ok
                # flag as cell overflow (ADVICE r4).
                ok = jnp.logical_and(ok, jnp.max(cnt) <= d_max)
        else:
            idx, val, states, wv = rows_out
        if expert_repel is not None:
            # second window pass over the SAME table at the repel
            # radius: its states are the expert's collision sums
            # (d_max=1 keeps the selection work trivial)
            st_r = _grid_rows_chunked(
                px, py, vx, vy, cx, cy, 0, N, chunk, cell_rows,
                Gx, Gy, C, float(expert_repel) ** 2, 1, N,
                use_kernel=use_kernel, inv_s=inv_s,
                factor=cell_factor)[2]
            rep = 2.0 * jnp.stack(
                [st_r[2] + st_r[4], st_r[3] + st_r[5]])   # (2, N)
        else:
            rep = None
        if not win_lam:
            if rep is not None:
                return idx, val, states, rep, ok
            return idx, val, states, ok
        flat = cell_rows.reshape(-1)
        Wt = cell_rows.shape[1]

        def wv_pass(vb):
            tbl = flat.at[vpos].set(jnp.take(vb, order),
                                    mode="drop").reshape(H, Wt)
            return _grid_rows_chunked(
                px, py, vx, vy, cx, cy, 0, N, chunk, tbl,
                Gx, Gy, C, r2, d_max, N, use_kernel=use_kernel,
                wv_only=True, inv_s=inv_s, factor=cell_factor)

        nrm = lambda w: w / jnp.maximum(jnp.linalg.norm(w), ZERO_TOL)
        if lam_iters == 0:
            # ZERO-pass "fold" mode: the main window pass already
            # computed wv = W @ v_prev, so lam = v_prev' W v_prev /
            # v_prev'v_prev is the Rayleigh quotient (error quadratic
            # in the warm eigenvector's angle) and v still advances one
            # power iteration — unlike the ELL path's lam_iters=0,
            # which freezes v. Fidelity vs converged lambda:
            # experiments/probe_lambda_fidelity.json (r4 rows).
            v = nrm(wv)
            lam = jnp.dot(v0_b, wv) / jnp.maximum(
                jnp.dot(v0_b, v0_b), ZERO_TOL)
        else:
            v = nrm(wv)
            if lam_iters > 1:
                v = jax.lax.fori_loop(
                    0, lam_iters - 1, lambda i, vb: nrm(wv_pass(vb)), v)
            lam = jnp.dot(v, wv_pass(v))
        lam = jnp.where(jnp.abs(lam) < ZERO_TOL, 1.0, lam)
        out = (idx, val / lam, states, v)
        if P:
            out = out + (wpay / lam,)
        if rep is not None:
            out = out + (rep,)
        return out + (ok,)

    if win_lam:
        outs = jax.vmap(one)(*((pos, vel, v_prev)
                               + ((payload,) if P else ())))
        *outs, ok = outs
        return tuple(outs) + (jnp.all(ok),)
    if expert_repel is not None:
        idx, val, states, rep, ok = jax.vmap(one)(pos, vel, v_prev)
    else:
        idx, val, states, ok = jax.vmap(one)(pos, vel, v_prev)
    lam, v = _ell_power_lambda(idx, val, v_prev, lam_iters)
    out = (idx, val / lam[:, None, None], states, v)
    if expert_repel is not None:
        out = out + (rep,)
    return out + (jnp.all(ok),)


def _grid_geometry(N, table_size, cell_cap, factor: int = 1):
    """(H, Gx, Gy, C): modular-grid dims (H = Gx*Gy slots, power of 2).
    factor = cell side in units of comm_radius: 1 -> 3x3 windows of
    side-r cells (9 gathers/agent, C=16 default); 2 -> 2x2 windows of
    side-2r cells (4 gathers/agent from a quarter-size table, C=32
    default — measured 4.6x faster candidate fetch at N=262k,
    probe_build_variants/probe_gather_width)."""
    if table_size is not None:
        H = int(table_size)
    else:
        n_cells = max(N // (factor * factor), 1024)
        H = 1 << (n_cells - 1).bit_length()       # ~N/f^2, power of 2
    assert H & (H - 1) == 0, "table_size must be a power of two"
    k2 = H.bit_length() - 1
    Gx = 1 << ((k2 + 1) // 2)
    return H, Gx, H // Gx, int(cell_cap)


def _parse_env_grid(env_grid):
    """(table_size, cell_cap, cell_factor) from an env_grid spec: True
    -> the quad scheme defaults (None, 32, 2); a (table_size, cell_cap)
    pair keeps the original 3x3 side-r scheme (factor 1); a 3-tuple
    sets the factor explicitly."""
    if env_grid is True:
        return None, 32, 2
    tup = tuple(env_grid)
    if len(tup) == 2:
        return tup[0], tup[1], 1
    return tup


def _grid_hash(cx, cy, Gx, Gy):
    """Modular toroidal cell -> slot: exact (collision-free) while the
    swarm extent stays under Gx*comm_radius x Gy*comm_radius."""
    import jax.numpy as jnp
    return (jnp.remainder(cx, Gx)
            + Gx * jnp.remainder(cy, Gy)).astype(jnp.int32)


def _grid_builder() -> str:
    """'fused' | 'gather' | 'scatter' table materialization
    (GNT_BUILD overrides). Default: 'fused' on TPU — the one-kernel
    scatter-free build (ops.gridwin.table_build), validated on chip
    r5: bit-exact vs the element scatter and 11.4 / 13.9 ms at 262k
    for P=0 / P=18 vs the scatter's 14.8 / 45.1 ms (the scatter is
    element-latency bound so the fused-policy payload multiplies its
    cost; the fused build is payload-width independent) — full fused
    env step 99.6 -> 67.8 ms (probe_build_gather.json r5). 'gather'
    is the r4b two-stage build (searchsorted srcmap + H*C row gather
    + table_transpose relayout; measured slower than the scatter at
    262k — kept as the reference formulation). 'scatter' off-TPU
    (the Pallas build would run in interpret mode there)."""
    import os
    b = os.environ.get("GNT_BUILD", "")
    if b in ("gather", "scatter", "fused"):
        return b
    import jax
    if jax.default_backend() == "tpu":
        return "fused"
    return "scatter"


def _grid_build_table(px, py, vx, vy, inv_s, H, Gx, Gy, C, v=None,
                      pay=None, builder=None):
    """Bin all N agents into the cell table. Returns (cell_rows
    (H, W), cx (N,), cy (N,), ok, (order, vpos)) with W = (7+P)C
    rounded up to a multiple of 128 lanes. Table rows are
    FEATURE-BLOCKED: [px*C | py*C | vx*C | vy*C | valid*C | id*C | v*C
    | pay*C x P | pad] — a per-feature candidate block slices out
    contiguously, and the window-major gather output IS the fused
    window kernel's operand with zero re-layout (ops.gridwin v2).
    ``v`` (N,) fills the 7th block (the power-iteration eigenvector,
    so the kernel folds one W@v matvec into the main pass); ``pay``
    (N, P) fills P further blocks (the policy's tap registers, so the
    same pass emits their graph shift — the fused-policy rollout).
    (order, vpos) lets later matvec passes re-scatter an updated v
    into the same slots: ``flat_table.at[vpos].set(v[order])``.
    ``builder`` picks the materialization ('scatter' | 'gather', None
    -> _grid_builder()'s backend default); both produce bit-identical
    tables whenever ok=True."""
    import jax
    import jax.numpy as jnp
    N = px.shape[0]
    # ids travel through the float table: exact only below the f32
    # integer limit (also the window kernel's invalid-id sentinel)
    assert N < 2 ** 24, \
        f"grid env stores agent ids in float32 cells; N={N} >= 2^24 " \
        "would silently corrupt neighbor ids"
    P = 0 if pay is None else pay.shape[-1]
    W = -(-(7 + P) * C // 128) * 128
    cx = jnp.floor(px * inv_s).astype(jnp.int32)
    cy = jnp.floor(py * inv_s).astype(jnp.int32)
    h = _grid_hash(cx, cy, Gx, Gy)
    iota = jnp.arange(N, dtype=jnp.int32)
    hs, order = jax.lax.sort_key_val(h, iota)
    # rank of each agent within its (sorted) equal-slot run
    flag = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (hs[1:] != hs[:-1]).astype(jnp.int32)])
    seg_start = jax.lax.cummax(jnp.where(flag > 0, iota, 0))
    rank = iota - seg_start
    ok = jnp.max(rank) < C
    feats = [px, py, vx, vy, jnp.ones_like(px),
             iota.astype(px.dtype),
             jnp.zeros_like(px) if v is None else v]
    f = jnp.stack(feats, axis=-1)
    if P:
        f = jnp.concatenate([f, pay.astype(px.dtype)], axis=-1)
    fs = jnp.take(f, order, axis=0)
    base = hs * W + jnp.minimum(rank, C - 1)
    # flat (H*W) position of the v lane for each SORTED agent
    vpos = base + 6 * C
    if builder is None:
        builder = _grid_builder()
    if builder == "fused":
        # ONE-KERNEL scatter-free build (r5): each cell's members are a
        # contiguous run of the SORTED feature rows, so the kernel
        # DMAs each TH-cell window and distributes it in VMEM —
        # no H*C slot gather (8x the occupied rows), no searchsorted
        # srcmap (37 ms at 262k: XLA lowers it to log2(N) element-
        # gather passes), no separate relayout. starts come from a
        # bincount + cumsum (one element scatter-add). Bit-identical
        # to the gather build (overflowing runs keep their first C
        # sorted members).
        from graph_neural_networks_tpu.ops import gridwin
        F_n = 7 + P
        assert F_n <= 128, \
            "fused build packs one slot's features into 128 lanes"
        counts = jnp.zeros(H, jnp.int32).at[hs].add(1, mode="drop")
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(counts).astype(jnp.int32)])
        pad_rows = gridwin.table_build_pad_rows(C)
        fs_pad = jnp.zeros((N + pad_rows, 128),
                           px.dtype).at[:N, :F_n].set(fs)
        cell_rows = gridwin.table_build(fs_pad, starts, C=C, F=F_n)
        return cell_rows, cx, cy, ok, (order, vpos)
    if builder == "gather":
        # SCATTER-FREE build: hs is sorted, so each cell's members are
        # a contiguous run of fs rows; one searchsorted gives every
        # run's start (empty cells get zero-length runs), slot (c, s)
        # reads row starts[c]+s, and one H*C-row gather + a streaming
        # Pallas relayout (ops.gridwin.table_transpose) materialize the
        # table. Cost is independent of the payload width P (slot rows
        # are 128 lanes regardless), vs the element scatter's
        # ~10-12 ns x (7+P)·N. Bit-identical to the scatter build
        # whenever ok=True; under cell overflow the scatter's clobber
        # winner for slot C-1 is unspecified (duplicate scatter
        # indices) while this build deterministically keeps the C-th
        # sorted member — callers must already treat ok=False output
        # as unusable (env_grid_strict / RuntimeWarning).
        F_n = 7 + P
        assert F_n <= 128, \
            "gather build packs one slot's features into 128 lanes"
        fs128 = jnp.zeros((N + 1, 128), px.dtype).at[:N, :F_n].set(fs)
        starts = jnp.searchsorted(
            hs, jnp.arange(H, dtype=hs.dtype)).astype(jnp.int32)
        counts = jnp.concatenate(
            [starts[1:], jnp.full((1,), N, jnp.int32)]) - starts
        src = starts[:, None] + jnp.arange(C, dtype=jnp.int32)[None]
        src = jnp.where(
            jnp.arange(C, dtype=jnp.int32)[None]
            < jnp.minimum(counts, C)[:, None],
            src, N)                                     # N -> zero row
        mm = jnp.take(fs128, src.reshape(-1), axis=0)   # (H*C, 128)
        from graph_neural_networks_tpu.ops import gridwin
        cell_rows = gridwin.table_transpose(mm, C=C, F=F_n)
        return cell_rows, cx, cy, ok, (order, vpos)
    # ONE fancy scatter straight into the feature-blocked flat layout:
    # agent (sorted) i's feature f lands at hs*W + f*C + min(rank, C-1).
    # The previous (H*C, 7) row scatter + (H,C,7)->(H,7,C) transpose
    # relayout cost 38.7 ms at N=262k (tile padding); this is 17.3 ms,
    # bit-identical (probe_build_variants.json).
    pos = base[:, None] + (jnp.arange(7 + P, dtype=jnp.int32) * C)[None]
    flat = jnp.zeros((H * W,), px.dtype).at[pos].set(fs, mode="drop")
    cell_rows = flat.reshape(H, W)
    return cell_rows, cx, cy, ok, (order, vpos)


def _gridwin_enabled() -> bool:
    """Default-on (TPU): the fused Pallas window kernel v2
    (ops.gridwin) owns the whole post-gather candidate path — mask,
    states, first-d_max selection, and the folded W@v matvec — with
    zero re-layout (the gather output is its operand). The round-3 v1
    kernel that fused only the mask/state math was a measured WASH
    (packing + un-interleaving re-paid the relayout the transpose
    cost); v2 removes both sides. GNT_NO_GRIDWIN=1 forces the XLA
    window path on TPU; GNT_GRIDWIN=1 opts the (slow, interpret-mode)
    kernel in off-TPU — tests exercise parity that way."""
    import os
    if os.environ.get("GNT_NO_GRIDWIN"):
        return False
    import jax
    if jax.default_backend() == "tpu":
        return True
    return bool(os.environ.get("GNT_GRIDWIN"))


def _grid_rows(pxc, pyc, vxc, vyc, cxc, cyc, own_ids, cell_rows,
               Gx, Gy, C, r2, d_max, n_total, use_kernel=None,
               wv_only=False, inv_s=None, factor: int = 1,
               n_pay: int = 0):
    """Neighbor extraction + 6-feature states for ONE set of rows
    against the global cell table: (idx (rows, d_max) int32 GLOBAL ids,
    val01 (rows, d_max), states (6, rows), wv (rows,) = the masked sum
    of the table's v feature — one W @ v_prev power-iteration matvec
    folded into the window pass). wv_only=True computes just wv (the
    candidate-window matvec for subsequent power iterations).
    n_pay>0 appends wpay (rows, n_pay): the masked sums of the table's
    payload blocks — the UNTRUNCATED graph shift of each payload
    feature (the fused-policy register shift; truncation-free like wv,
    so it matches the ELL shift exactly whenever d_max covers the true
    max in-degree) — and cnt (rows,): each row's TRUE in-degree (the
    untruncated mask sum), so callers can verify the d_max-coverage
    condition instead of assuming it.

    factor 1: the agent's 3x3 cell neighborhood (side-r cells, 9
    windows). factor >= 2: side-factor*r cells — every neighbor within
    r lies in the 2x2 window based at floor((x - r)/s) since the
    window spans 2r/s <= 1 cells per axis (4 gathers from a table
    factor^2 smaller; needs inv_s = 1/(factor*r)).

    On TPU the post-gather candidate path runs in the fused Pallas
    kernel (ops.gridwin v2, zero re-layout — the pure-XLA formulation
    pays ~10x the useful work in tile-padding relayouts, round-3
    probes); set GNT_NO_GRIDWIN=1 to force the XLA path (CPU default;
    GNT_GRIDWIN=1 opts the interpret-mode kernel in for tests)."""
    import jax.numpy as jnp
    rows = pxc.shape[0]
    W = cell_rows.shape[1]
    if factor == 1:
        offs = jnp.array([(dx, dy) for dx in (-1, 0, 1)
                          for dy in (-1, 0, 1)], jnp.int32)
        wx = cxc[:, None] + offs[None, :, 0]
        wy = cyc[:, None] + offs[None, :, 1]
    else:
        assert inv_s is not None
        offs = jnp.array([(dx, dy) for dx in (0, 1)
                          for dy in (0, 1)], jnp.int32)
        bx = jnp.floor(pxc * inv_s - 1.0 / factor).astype(jnp.int32)
        by = jnp.floor(pyc * inv_s - 1.0 / factor).astype(jnp.int32)
        wx = bx[:, None] + offs[None, :, 0]
        wy = by[:, None] + offs[None, :, 1]
    n_win = offs.shape[0]
    M = n_win * C
    # neighborhood windows (deduped when the modular map aliases two of
    # the agent's own windows — a duplicated window would double-count
    # its candidates)
    h9 = _grid_hash(wx, wy, Gx, Gy)                  # (rows, n_win)
    dup = (h9[:, :, None] == h9[:, None, :])
    first = jnp.argmax(dup, axis=-1)
    keep = (first == jnp.arange(n_win)[None, :])     # (rows, n_win)

    if use_kernel is None:
        use_kernel = _gridwin_enabled()
    if use_kernel:
        from graph_neural_networks_tpu.ops import gridwin
        # window-major gather: (n_win*rows, W) -> (n_win, rows, W) is a
        # major-dim split (layout no-op) and the kernel's operand as-is
        cand = jnp.take(cell_rows, jnp.swapaxes(h9, 0, 1).reshape(-1),
                        axis=0).reshape(n_win, rows, W)
        own = jnp.concatenate(
            [pxc[:, None], pyc[:, None], vxc[:, None], vyc[:, None],
             own_ids.astype(pxc.dtype)[:, None],
             keep.astype(pxc.dtype),
             jnp.zeros((rows, 128 - 5 - n_win), pxc.dtype)], axis=1)
        # scale the row tile down as the table row widens (payload
        # blocks) to keep the kernel's VMEM block under ~16 MB
        rt = _fit_chunk(rows, 512 if W <= 2048 else 256)
        out = gridwin.grid_window(cand, own, C=C, r2=r2, d_max=d_max,
                                  row_tile=rt, wv_only=wv_only,
                                  n_pay=n_pay)
        if wv_only:
            return out[:, 0]
        idx = out[:, :d_max].astype(jnp.int32)
        val = out[:, d_max:2 * d_max]
        st = jnp.swapaxes(out[:, 2 * d_max:2 * d_max + 6], 0, 1)
        wv = out[:, 2 * d_max + 6]
        if n_pay:
            wpay = out[:, 2 * d_max + 8:2 * d_max + 8 + n_pay]
            cnt = out[:, 2 * d_max + 7]
            return idx, val, st, wv, wpay, cnt
        return idx, val, st, wv

    # pure-XLA window path (CPU / GNT_NO_GRIDWIN)
    nf = 7 + n_pay
    cand_flat = jnp.take(cell_rows, h9.reshape(-1), axis=0)
    cand3 = cand_flat.reshape(rows, n_win, W)
    # ONE explicit re-layout to feature-major (nf, rows, M): per-feature
    # slices of the raw (rows, n_win, nf, C) layout tile-pad ~14x on the
    # (nf, C) minor dims (probe round 3)
    cand = jnp.stack([cand3[..., f * C:(f + 1) * C] for f in range(nf)],
                     axis=0).reshape(nf, rows, M)
    cpx, cpy, cvx, cvy = cand[0], cand[1], cand[2], cand[3]
    valid = cand[4] * jnp.repeat(keep.astype(pxc.dtype), C, axis=-1)
    cid = cand[5].astype(jnp.int32)              # exact: N < 2^24
    dpx = pxc[:, None] - cpx
    dpy = pyc[:, None] - cpy
    d2 = dpx ** 2 + dpy ** 2
    m = (valid > 0) & (d2 <= r2) & (cid != own_ids[:, None])
    if r2 > -np.log(ZERO_TOL):
        # exp(-d2) > tol is implied by d2 <= r2 below this bound — the
        # kernel (ops.gridwin) applies the same static shortcut, so the
        # two masks stay bit-identical
        m &= jnp.exp(-d2) > ZERO_TOL
    mf = m.astype(pxc.dtype)
    wv = jnp.sum(cand[6] * mf, axis=-1)
    if wv_only:
        return wv
    # 6-feature states (same reductions as _jnp_states, over the
    # 9C candidate window instead of all N)
    dvx = vxc[:, None] - cvx
    dvy = vyc[:, None] - cvy
    inv = jnp.where(d2 > ZERO_TOL, 1.0 / d2, 0.0) * mf
    red = lambda z: jnp.sum(z, axis=-1)
    st = jnp.stack(
        [red(dvx * mf), red(dvy * mf),
         red(dpx * inv ** 2), red(dpy * inv ** 2),
         red(dpx * inv), red(dpy * inv)], axis=0)  # (6, rows)
    if d_max == 0:
        # no-selection mode: zero-width ELL columns (rollouts that
        # don't emit the graph — states/wv/wpay are untruncated)
        idx = jnp.zeros((rows, 0), jnp.int32)
        val = jnp.zeros((rows, 0), pxc.dtype)
    else:
        cid_fill = jnp.where(m, cid, jnp.int32(n_total))
        # first-d_max neighbors: rank-compare min-reduce directly over
        # the candidates' ORIGINAL (global) ids (one match per rank)
        rdt = jnp.int8 if d_max < 127 else jnp.int32
        rk = jnp.minimum(jnp.cumsum(m.astype(jnp.int32), axis=-1),
                         d_max + 1).astype(rdt)
        tgt = jnp.arange(1, d_max + 1, dtype=rdt)
        candidates = jnp.where(
            m[:, None, :] & (rk[:, None, :] == tgt[:, None]),
            cid_fill[:, None, :], jnp.int32(n_total))
        idx = jnp.min(candidates, axis=-1)           # (rows, d_max)
        val = (idx < n_total).astype(pxc.dtype)
        idx = jnp.where(idx < n_total, idx, 0)
    if n_pay:
        wpay = jnp.stack([red(cand[7 + p] * mf) for p in range(n_pay)],
                         axis=-1)                    # (rows, n_pay)
        cnt = red(mf)                                # true in-degree
        return idx, val, st, wv, wpay, cnt
    return idx, val, st, wv


def _grid_rows_chunked(px, py, vx, vy, cx, cy, lo0, n_rows, chunk,
                       cell_rows, Gx, Gy, C, r2, d_max, n_total,
                       use_kernel=None, wv_only=False, inv_s=None,
                       factor: int = 1, n_pay: int = 0):
    """_grid_rows over rows [lo0, lo0+n_rows) of the (full) agent
    arrays, in chunks (lax.map). lo0 may be traced (sharded block
    offset). Requires n_rows % chunk == 0."""
    import jax
    import jax.numpy as jnp

    def window(lo):
        sl = lambda z: jax.lax.dynamic_slice(z, (lo,), (chunk,))
        own = lo + jnp.arange(chunk, dtype=jnp.int32)
        return _grid_rows(sl(px), sl(py), sl(vx), sl(vy),
                          sl(cx), sl(cy), own, cell_rows,
                          Gx, Gy, C, r2, d_max, n_total,
                          use_kernel=use_kernel, wv_only=wv_only,
                          inv_s=inv_s, factor=factor, n_pay=n_pay)

    if n_rows == chunk:
        return window(lo0)
    los = lo0 + jnp.arange(n_rows // chunk, dtype=jnp.int32) * chunk
    if wv_only:
        return jax.lax.map(window, los).reshape(n_rows)
    if n_pay:
        idxs, vals, sts, wvs, wps, cnts = jax.lax.map(window, los)
        return (idxs.reshape(n_rows, d_max),
                vals.reshape(n_rows, d_max),
                jnp.moveaxis(sts, 0, 1).reshape(6, n_rows),
                wvs.reshape(n_rows), wps.reshape(n_rows, n_pay),
                cnts.reshape(n_rows))
    idxs, vals, sts, wvs = jax.lax.map(window, los)
    return (idxs.reshape(n_rows, d_max), vals.reshape(n_rows, d_max),
            jnp.moveaxis(sts, 0, 1).reshape(6, n_rows),
            wvs.reshape(n_rows))


def _topk_blocked(scores, k: int, block: int):
    """Exact top-k along the last axis in two stages: per-block top-k,
    then top-k over the nb·k candidates. Any global top-k element is in
    its own block's top-k (k <= block), so this is exact. NOTE: no
    longer on any env path — the rank-compare min-reduce (_env_topk)
    replaced all env uses in round 3; kept as the general-scores
    (non-binary) exact top-k utility for huge lane counts (the round-2
    65536-wide top_k device fault). Requires N % block == 0."""
    import jax
    import jax.numpy as jnp
    *L, N = scores.shape
    nb = N // block
    s = scores.reshape(*L, nb, block)
    v1, i1 = jax.lax.top_k(s, k)                  # (*L, nb, k)
    gidx = (i1 + (jnp.arange(nb) * block)[:, None]).reshape(*L, nb * k)
    v2, i2 = jax.lax.top_k(v1.reshape(*L, nb * k), k)
    idx = jnp.take_along_axis(gidx, i2, axis=-1)
    return v2, idx


def _env_topk(mf, d_max: int, block: int = 2048):
    """First-``d_max`` set bits per row of a BINARY mask, as ``(val,
    idx)`` with the exact ``lax.top_k`` contract on {0,1} inputs: values
    are the mask entries, indices ascending (top_k's tie-break), rows
    with fewer than ``d_max`` set bits padded with ``val=0``.

    NOT a general top-k — the env steps only ever rank binary adjacency
    masks, and ``lax.top_k``'s sort is pathological on TPU when fused
    with the mask producers (~250 ms vs ~60 ms for the whole N=16384
    env map body, experiments/probe_env_fusion.json; an
    optimization_barrier does not help). This computes the same answer
    as a rank compare: ``idx_d = min{ j : mask_j and cumsum(mask)_j ==
    d+1 }``, one vectorized min-reduce, no sort. Ranks are clipped to
    ``d_max+1`` and held in int8 when possible to cut the D-pass memory
    traffic. Parity with ``lax.top_k`` on binary masks is tested
    (tests/test_ell.py) and was verified on chip
    (probe_env_internals.json: parity_minreduce_vs_topk ok).

    Rows where ``val == 0`` carry ``idx = 0`` (top_k would point at the
    first zero entry instead); every consumer gates by ``val``.
    """
    import jax.numpy as jnp
    N = mf.shape[-1]
    m = mf > 0
    rdt = jnp.int8 if d_max < 127 else jnp.int32
    r = jnp.minimum(jnp.cumsum(m.astype(jnp.int32), axis=-1),
                    d_max + 1).astype(rdt)
    tgt = jnp.arange(1, d_max + 1, dtype=rdt)
    cols = jnp.arange(N, dtype=jnp.int32)
    cand = jnp.where(m[..., None] & (r[..., None] == tgt),
                     cols[..., :, None], jnp.int32(N))
    idx = jnp.min(cand, axis=-2)                    # (..., d_max)
    valid = idx < N
    idx = jnp.where(valid, idx, 0)
    return valid.astype(mf.dtype), idx


def _fit_chunk(n: int, chunk: int) -> int:
    """Largest divisor of n that is <= chunk (the chunked env/expert
    kernels require the row-chunk to divide N exactly)."""
    chunk = max(min(int(chunk), n), 1)
    while n % chunk:
        chunk -= 1
    return chunk


def _jnp_expert_accel_grid(pos, vel, comm_radius, repel_dist, accel_max,
                           table_size=None, cell_cap: int = 32,
                           factor: int = 2, use_kernel=None):
    """Centralized expert acceleration via the cell grid, O(N): bin
    agents into the SAME cell geometry the env uses (cells sized by
    comm_radius >= repel_dist, so the window covers every repel-range
    pair) and read the collision sums from one window pass at
    r2=repel_dist^2 (the window states' dp·inv and dp·inv² columns).
    The velocity-consensus term is a global O(N) reduction. Returns
    (accel (B,2,N), ok) — ok False iff a cell overflowed cell_cap.
    Equals ``_jnp_expert_accel_chunked`` up to float association (and
    the measure-zero d2==repel² boundary comparator)."""
    import jax
    import jax.numpy as jnp
    B, _, N = pos.shape
    assert float(repel_dist) <= float(comm_radius), \
        (repel_dist, comm_radius)   # cells sized by comm_radius
    H, Gx, Gy, C = _grid_geometry(N, table_size, cell_cap, factor)
    inv_s = 1.0 / (factor * comm_radius)
    if use_kernel is None:
        use_kernel = _gridwin_enabled()
    chunk = _fit_chunk(N, 65536 if use_kernel else 8192)
    r2 = float(repel_dist) ** 2

    def one(pos_b, vel_b):
        px, py = pos_b[0], pos_b[1]
        vx, vy = vel_b[0], vel_b[1]
        cell_rows, cx, cy, ok, _ = _grid_build_table(
            px, py, vx, vy, inv_s, H, Gx, Gy, C)
        st = _grid_rows_chunked(
            px, py, vx, vy, cx, cy, 0, N, chunk, cell_rows,
            Gx, Gy, C, r2, 1, N, use_kernel=use_kernel,
            inv_s=inv_s, factor=factor)[2]
        rep = 2.0 * jnp.stack([st[2] + st[4], st[3] + st[5]])
        return rep, ok

    rep, ok = jax.vmap(one)(pos, vel)
    vel_term = -(N * vel - jnp.sum(vel, axis=-1, keepdims=True))
    return (jnp.clip(vel_term + rep, -accel_max, accel_max),
            jnp.all(ok))


def _jnp_expert_accel_chunked(pos, vel, repel_dist, accel_max,
                              chunk: int):
    """Centralized expert acceleration, jitted and O(B·chunk·N): the
    velocity-consensus term is GLOBAL (−Σ_j (v_i − v_j) = −(N·v_i − Σv),
    an O(N) reduction — no pairwise work), and the collision-avoidance
    term only involves pairs within repel_dist, summed per row chunk.
    Exact vs the numpy expert (reference dataTools.py:3406-3507 /
    compute_optimal_trajectory's inner step)."""
    import jax
    import jax.numpy as jnp
    B, _, N = pos.shape
    assert N % chunk == 0, (N, chunk)
    r2 = repel_dist ** 2
    vel_term = -(N * vel - jnp.sum(vel, axis=-1, keepdims=True))

    def one(lo):
        pr = jax.lax.dynamic_slice(pos, (0, 0, lo), (B, 2, chunk))
        dp = pr[..., :, None] - pos[:, :, None, :]      # B,2,chunk,N
        d2 = jnp.sum(dp ** 2, axis=1)                   # B,chunk,N
        m = (d2 < r2).astype(pos.dtype)
        inv = jnp.where(d2 > ZERO_TOL, 1.0 / d2, 0.0)
        w = (m * (inv ** 2 + inv))[:, None]             # B,1,chunk,N
        return 2.0 * jnp.sum(dp * w, axis=-1)           # B,2,chunk

    reps = jax.lax.map(one, jnp.arange(N // chunk) * chunk)
    repel = jnp.moveaxis(reps, 0, 2).reshape(B, 2, N)
    return jnp.clip(vel_term + repel, -accel_max, accel_max)


def _jnp_recompute_supervision(pos, vel, comm_radius, repel_dist,
                               accel_max, lam_method: str = "eig",
                               zero_last: bool = True):
    """Device recompute of everything DAGger training needs from a
    trajectory's (pos, vel) alone: (states (B,T,6,N), expert accel
    (B,T,2,N), normalized comm graphs (B,T,N,N)).

    The TPU-native half of the device-resident DAGger store
    (TrainerFlocking deviceStore): trajectories live on device as
    pos/vel only — 125x smaller than the dense graph stacks at the
    reference config — and states/graphs/expert labels are recomputed
    inside the jitted train step (recompute-over-transfer, the same
    trade the grid env makes; the reference keeps all four arrays as
    host numpy and re-pulls them every randomEpoch re-roll,
    training.py:1258-1331 + dataTools.py:2612-3020).

    Matches the host pipeline (compute_states / compute_
    communication_graph / the trainer's _expert_accel) to f32 rounding;
    zero_last additionally zeroes accel[T-1] — the reference
    convention (it never drives a transition inside the horizon), also
    applied by compute_optimal_trajectory. Dense all-pairs math: meant
    for reference-scale N (the large-swarm grid store recomputes via
    the cell-list passes instead)."""
    import jax.numpy as jnp
    B, T, _, N = pos.shape
    pf = pos.reshape(B * T, 2, N)
    vf = vel.reshape(B * T, 2, N)
    S = _jnp_comm_graph(pf, comm_radius, lam_method)
    x = _jnp_states(pf, vf, S)
    y = _jnp_expert_accel_chunked(pf, vf, repel_dist, accel_max, N)
    x = x.reshape(B, T, 6, N)
    y = y.reshape(B, T, 2, N)
    if zero_last:
        y = y.at[:, T - 1].set(0.0)
    return x, y, S.reshape(B, T, N, N)


def _jnp_recompute_supervision_grid(pos, vel, comm_radius, repel_dist,
                                    accel_max, d_max: int, grid,
                                    lam_iters: int = 1,
                                    zero_last: bool = True):
    """Grid-scale device recompute of DAGger supervision from (pos,
    vel) trajectories: (states (B,T,6,N), expert accel (B,T,2,N), ELL
    graphs (idx (B,T,N,D), val (B,T,1,N,D)), ok).

    The large-swarm form of ``_jnp_recompute_supervision``: everything
    comes from O(N) cell-list window passes (``_jnp_env_step_grid``
    with ``expert_repel`` — the expert's collision sums ride a second
    pass over the same table), scanning over T with the lambda
    eigenvector CARRIED (warm-started power iteration; t=0 cold-starts
    at 32 iterations like the rollouts). This is what makes 262k+
    TRAINING device-resident: the store holds pos/vel only (the ELL
    graph stack for even a handful of 262k trajectories is tens of
    GB), and each training batch rebuilds its states/graphs/labels on
    device in one scan. ``accel_max`` is the expert's clip — pass
    100.0 to match ``generate_trajectories_large``'s labels (the
    reference expert default, dataTools.py:3406); zero_last zeroes
    accel[T-1] (reference convention). ``ok`` covers cell overflow;
    d_max-coverage carries the usual grid contract — pick d_max >=
    the swarm's max in-degree or the EMITTED graphs are top-d_max
    truncations of the dynamics' untruncated neighbor sums (the
    rollouts' ok flag checks this where a payload rides the table)."""
    import jax
    import jax.numpy as jnp
    gts, gcc, gcf = _parse_env_grid(grid)
    B, T, _, N = pos.shape
    D = min(d_max, N)
    a_max_exp = accel_max

    def env(pos_t, vel_t, v, iters):
        i_t, s_t, x_t, v, rep, ok = _jnp_env_step_grid(
            pos_t, vel_t, comm_radius, D, v, lam_iters=iters,
            table_size=gts, cell_cap=gcc, cell_factor=gcf,
            expert_repel=repel_dist)
        vel_term = -(N * vel_t - jnp.sum(vel_t, axis=-1, keepdims=True))
        a = jnp.clip(vel_term + rep, -a_max_exp, a_max_exp)
        return i_t, s_t, x_t, a, v, ok

    v0 = jnp.ones((B, N), pos.dtype) / jnp.sqrt(N)
    i0, s0, x0, a0, v0, ok0 = env(pos[:, 0], vel[:, 0], v0,
                                  max(lam_iters, 32))

    def body(carry, pv):
        v, ok = carry
        i_t, s_t, x_t, a, v, ok_t = env(pv[0], pv[1], v, lam_iters)
        return (v, jnp.logical_and(ok, ok_t)), (i_t, s_t, x_t, a)

    pv = (jnp.moveaxis(pos[:, 1:], 0, 1), jnp.moveaxis(vel[:, 1:], 0, 1))
    (v, ok), (gi, gv, xs, ys) = jax.lax.scan(body, (v0, ok0), pv)
    swap = lambda a0, rest: jnp.concatenate(
        [a0[:, None], jnp.moveaxis(rest, 0, 1)], axis=1)
    x = swap(x0, xs)
    y = swap(a0, ys)
    gi = swap(i0, gi)
    gv = swap(s0, gv)
    if zero_last:
        y = y.at[:, T - 1].set(0.0)
    return x, y, (gi, gv[:, :, None]), ok


_COST_JIT = None


def evaluate_cost_device(vel):
    """``Flocking.evaluate``'s velocity-variance cost as one jitted
    device reduction: vel (B,T,2,N) -> scalar (mean over samples of
    the summed per-step mean-squared deviation from the swarm-average
    velocity). The single definition behind every device-side cost
    (deviceStore validation, the largeswarm driver's scalars-only
    eval) so the formula cannot drift from ``evaluate``."""
    global _COST_JIT
    if _COST_JIT is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def _cost(vel):
            vbar = jnp.mean(vel, axis=3, keepdims=True)
            d = vel - vbar
            c_t = jnp.mean(jnp.sum(d * d, axis=2), axis=2)  # (B, T)
            return jnp.mean(jnp.sum(c_t, axis=1))

        _COST_JIT = _cost
    return _COST_JIT(vel)


def compute_differences(u: np.ndarray):
    """Pairwise differences u_i - u_j and squared distances.

    u: (S, 2, N) or (S, T, 2, N) ->
    diff: (S, [T,] 2, N, N), dist_sq: (S, [T,] N, N).
    Reference: dataTools.py:3341-3404."""
    squeeze = u.ndim == 3
    if squeeze:
        u = u[:, None]
    diff = u[..., :, None] - u[..., None, :]          # S x T x 2 x N x N
    dist_sq = np.sum(diff ** 2, axis=-3)              # S x T x N x N
    if squeeze:
        return diff[:, 0], dist_sq[:, 0]
    return diff, dist_sq


class Flocking(Data):

    def __init__(self, nAgents, commRadius, repelDist, nTrain, nValid, nTest,
                 duration, samplingTime, initGeometry="circular",
                 initVelValue=3.0, initMinDist=0.1, accelMax=10.0,
                 normalizeGraph=True, doPrint=False, dataType=np.float64,
                 rng=None):
        super().__init__()
        rng = np.random.default_rng() if rng is None else rng
        self.rng = rng
        self.nAgents = nAgents
        self.commRadius = commRadius
        self.repelDist = repelDist
        self.nTrain, self.nValid, self.nTest = nTrain, nValid, nTest
        self.duration = float(duration)
        self.samplingTime = samplingTime
        self.initGeometry = initGeometry
        self.initVelValue = initVelValue
        self.initMinDist = initMinDist
        self.accelMax = accelMax
        self.normalizeGraph = normalizeGraph
        self.doPrint = doPrint
        self.dataType = dataType
        # defaults for closed-loop rollouts (trainer/evaluator paths):
        # set rollout_ell_degree=D (+ rollout_lam_method='power') for
        # large swarms — O(T·N·D) graph histories, no per-step eigvalsh;
        # rollout_env_chunk=C additionally makes the env step itself
        # O(N·deg) memory (chunked states/graph + warm-started lambda)
        self.rollout_ell_degree = None
        self.rollout_lam_method = "eig"
        self.rollout_env_chunk = None
        n_samples = nTrain + nValid + nTest

        init_pos, init_vel = self.compute_initial_positions(
            nAgents, n_samples, commRadius, minDist=initMinDist,
            geometry=initGeometry, xMaxInitVel=initVelValue,
            yMaxInitVel=initVelValue)
        pos, vel, accel = self.compute_optimal_trajectory(
            init_pos, init_vel, self.duration, samplingTime, repelDist,
            accelMax=accelMax)
        comm_graph = self.compute_communication_graph(pos, commRadius,
                                                      normalizeGraph)
        state = self.compute_states(pos, vel, comm_graph)

        self.initPos, self.initVel = {}, {}
        self.pos, self.vel, self.accel = {}, {}, {}
        self.commGraph, self.state = {}, {}
        bounds = [0, nTrain, nTrain + nValid, n_samples]
        for i, name in enumerate(("train", "valid", "test")):
            sl = slice(bounds[i], bounds[i + 1])
            self.samples[name]["signals"] = state[sl].copy()
            self.samples[name]["targets"] = accel[sl].copy()
            self.initPos[name] = init_pos[sl]
            self.initVel[name] = init_vel[sl]
            self.pos[name] = pos[sl]
            self.vel[name] = vel[sl]
            self.accel[name] = accel[sl]
            self.commGraph[name] = comm_graph[sl]
            self.state[name] = state[sl]
        self.astype(dataType)

    @classmethod
    def for_rollout(cls, nAgents, commRadius, repelDist, samplingTime,
                    initGeometry="circular", initVelValue=3.0,
                    initMinDist=0.1, accelMax=10.0, normalizeGraph=True,
                    doPrint=False, dataType=np.float64, rng=None):
        """Environment-only construction: all the physics/rollout machinery
        (compute_initial_positions, compute_trajectory, evaluate) WITHOUT
        generating expert supervision trajectories. The constructor's
        host-side expert generation is O(nSamples·T·N²) numpy (reference
        dataTools.py:3406-3507) — infeasible at large-swarm N, where only
        the jitted closed-loop rollout (ELL histories, power-iteration
        lambda_max) is wanted: evaluation/serving of a trained controller
        on swarms far bigger than it was trained on."""
        self = cls.__new__(cls)
        Data.__init__(self)
        self.rng = np.random.default_rng() if rng is None else rng
        self.nAgents = nAgents
        self.commRadius = commRadius
        self.repelDist = repelDist
        self.nTrain = self.nValid = self.nTest = 0
        self.duration = 0.0
        self.samplingTime = samplingTime
        self.initGeometry = initGeometry
        self.initVelValue = initVelValue
        self.initMinDist = initMinDist
        self.accelMax = accelMax
        self.normalizeGraph = normalizeGraph
        self.doPrint = doPrint
        self.dataType = dataType
        self.rollout_ell_degree = None
        self.rollout_lam_method = "eig"
        self.rollout_env_chunk = None
        self.initPos, self.initVel = {}, {}
        self.pos, self.vel, self.accel = {}, {}, {}
        self.commGraph, self.state = {}, {}
        return self

    @classmethod
    def large(cls, nAgents, commRadius, repelDist, nTrain, nValid, nTest,
              duration, samplingTime, ell_degree, env_chunk=None,
              lam_iters: int = 8, gen_batch: int = 4, rng=None,
              env_grid=None, **kw):
        """Large-swarm TRAINING dataset: expert supervision generated
        on-device (``generate_trajectories_large`` — jitted chunked
        expert + chunked env, O(N·deg) everywhere) and the communication
        graphs stored as a numpy-leaf ``EllGso`` instead of the dense
        (B,T,N,N) stack (107 GB at N=4096, nTrain=8, T=100 — the
        constructor path cannot run there). Rollout defaults are set so
        TrainerFlocking/evaluate_flocking run DAGger, validation, and
        closed-loop evaluation in the same O(N·deg) regime.

        env_grid (True or a grid spec, round 4): generation AND all
        downstream rollouts run on the O(N·k) cell-list grid env, with
        the expert's collision sums from a second window pass over the
        same cell table (``expert_repel``) — generation becomes O(N)
        per step instead of O(N²/chunk), the 262k-to-1M TRAINING
        regime."""
        from graph_neural_networks_tpu.ops import ell as ell_lib
        self = cls.for_rollout(nAgents, commRadius, repelDist,
                               samplingTime, rng=rng, **kw)
        self.duration = float(duration)
        self.nTrain, self.nValid, self.nTest = nTrain, nValid, nTest
        ell_degree = min(ell_degree, nAgents)
        env_chunk = _fit_chunk(nAgents, nAgents // 8 if env_chunk is None
                               else env_chunk)
        self.rollout_ell_degree = ell_degree
        self.rollout_lam_method = "power"
        self.rollout_env_chunk = env_chunk
        if env_grid is not None:
            self.rollout_env_grid = env_grid
        n_samples = nTrain + nValid + nTest
        init_pos, init_vel = self.compute_initial_positions(
            nAgents, n_samples, commRadius, minDist=self.initMinDist,
            geometry=self.initGeometry, xMaxInitVel=self.initVelValue,
            yMaxInitVel=self.initVelValue)
        outs = []
        for lo in range(0, n_samples, gen_batch):
            outs.append(self.generate_trajectories_large(
                init_pos[lo:lo + gen_batch], init_vel[lo:lo + gen_batch],
                duration, ell_degree, env_chunk, lam_iters=lam_iters,
                env_grid=env_grid))
        pos, vel, accel, state = (np.concatenate([o[i] for o in outs], 0)
                                  for i in range(4))
        gidx = np.concatenate([np.asarray(o[4].idx) for o in outs], 0)
        gval = np.concatenate([np.asarray(o[4].val) for o in outs], 0)
        bounds = [0, nTrain, nTrain + nValid, n_samples]
        for i, name in enumerate(("train", "valid", "test")):
            sl = slice(bounds[i], bounds[i + 1])
            self.samples[name]["signals"] = state[sl].copy()
            self.samples[name]["targets"] = accel[sl].copy()
            self.initPos[name] = init_pos[sl]
            self.initVel[name] = init_vel[sl]
            self.pos[name] = pos[sl]
            self.vel[name] = vel[sl]
            self.accel[name] = accel[sl]
            self.commGraph[name] = ell_lib.EllGso(gidx[sl].copy(),
                                                  gval[sl].copy())
            self.state[name] = state[sl]
        self.astype(np.float32)
        return self

    @classmethod
    def large_device(cls, nAgents, commRadius, repelDist, nTrain, nValid,
                     nTest, duration, samplingTime, ell_degree,
                     lam_iters: int = 1, gen_batch: int = 1, rng=None,
                     env_grid=True, **kw):
        """DEVICE-RESIDENT large-swarm training dataset (the 262k-1M
        regime): expert trajectories are generated on device by the
        O(N) grid env + grid expert in EVAL SHAPE (d_max=0 — no graph
        is ever emitted during generation) and only (pos, vel) are
        kept, as jnp device arrays. Nothing O(T·N·D) is ever
        materialized or pulled: even a handful of 262k trajectories'
        ELL graph stacks are tens of GB, which is why ``Flocking.large``
        (host numpy storage) cannot reach this scale. Pair with
        ``TrainerFlocking(deviceStore=True, ellDegree=D)``: each
        training batch recomputes states/graphs/expert labels on
        device (``_jnp_recompute_supervision_grid``), DAGger re-rolls
        run ``rollout_traj_device``, and validation cost is computed
        on device. Replaces at scale: reference Flocking dataset +
        DAGger storage (dataTools.py:2210-3020, training.py:716-1696).
        """
        import jax
        import jax.numpy as jnp
        self = cls.for_rollout(nAgents, commRadius, repelDist,
                               samplingTime, rng=rng, **kw)
        self.duration = float(duration)
        self.nTrain, self.nValid, self.nTest = nTrain, nValid, nTest
        self.rollout_ell_degree = min(ell_degree, nAgents)
        self.rollout_lam_method = "power"
        self.rollout_env_grid = True if env_grid is True else env_grid
        # one lambda-iteration setting for the WHOLE device pipeline:
        # generation (here), DAGger re-rolls and validation
        # (rollout_traj_device resolves it), and the train-step
        # supervision recompute (TrainerFlocking._build_step_device) —
        # a mismatch would train on graphs normalized differently from
        # the rollouts that produced the trajectories
        self.rollout_lam_iters = lam_iters
        gts, gcc, gcf = _parse_env_grid(self.rollout_env_grid)
        n_samples = nTrain + nValid + nTest
        init_pos, init_vel = self.compute_initial_positions(
            nAgents, n_samples, commRadius, minDist=self.initMinDist,
            geometry=self.initGeometry, xMaxInitVel=self.initVelValue,
            yMaxInitVel=self.initVelValue)
        dt = samplingTime
        T = len(np.arange(0, duration, dt))
        r = commRadius
        a_max_exp = 100.0            # reference expert clip

        def gen(pos0, vel0):
            B, _, N = pos0.shape

            def env(pos, vel, v, iters):
                _i, _s, _x, v, rep, ok = _jnp_env_step_grid(
                    pos, vel, r, 0, v, lam_iters=iters,
                    table_size=gts, cell_cap=gcc, cell_factor=gcf,
                    expert_repel=repelDist)
                vel_term = -(N * vel
                             - jnp.sum(vel, axis=-1, keepdims=True))
                a = jnp.clip(vel_term + rep, -a_max_exp, a_max_exp)
                return a, v, ok

            v0 = jnp.ones((B, N), pos0.dtype) / jnp.sqrt(N)
            a, v0, ok0 = env(pos0, vel0, v0, max(lam_iters, 32))

            def step(carry, _):
                pos, vel, a, v, ok = carry
                vel_n = a * dt + vel
                pos_n = a * dt * dt / 2 + vel * dt + pos
                a_n, v, ok_n = env(pos_n, vel_n, v, lam_iters)
                return ((pos_n, vel_n, a_n, v,
                         jnp.logical_and(ok, ok_n)),
                        (pos_n, vel_n))

            carry = (pos0, vel0, a, v0, ok0)
            carry, (ps, vs) = jax.lax.scan(step, carry, None,
                                           length=T - 1)
            swap = lambda z0, zz: jnp.concatenate(
                [z0[:, None], jnp.moveaxis(zz, 0, 1)], axis=1)
            return swap(pos0, ps), swap(vel0, vs), carry[-1]

        gen_jit = jax.jit(gen)
        pos_l, vel_l = [], []
        all_ok = True
        for lo in range(0, n_samples, gen_batch):
            ip_c = init_pos[lo:lo + gen_batch]
            iv_c = init_vel[lo:lo + gen_batch]
            keep = ip_c.shape[0]
            if keep < gen_batch:
                # pad the ragged last chunk by repetition: one
                # compiled shape for every chunk (a second remote
                # compile of the T-step scan costs minutes)
                pad = gen_batch - keep
                ip_c = np.concatenate([ip_c, ip_c[:1].repeat(pad, 0)])
                iv_c = np.concatenate([iv_c, iv_c[:1].repeat(pad, 0)])
            p, v, ok = gen_jit(jnp.asarray(ip_c, jnp.float32),
                               jnp.asarray(iv_c, jnp.float32))
            pos_l.append(p[:keep])
            vel_l.append(v[:keep])
            all_ok = all_ok and bool(ok)
        pos = jnp.concatenate(pos_l, 0)
        vel = jnp.concatenate(vel_l, 0)
        if not all_ok:
            import warnings
            warnings.warn(
                "grid overflow during large_device expert generation — "
                "raise cell_cap/table_size", RuntimeWarning)
        bounds = [0, nTrain, nTrain + nValid, n_samples]
        for i, name in enumerate(("train", "valid", "test")):
            sl = slice(bounds[i], bounds[i + 1])
            self.initPos[name] = init_pos[sl]
            self.initVel[name] = init_vel[sl]
            self.pos[name] = pos[sl]       # device-resident
            self.vel[name] = vel[sl]
        return self

    def generate_trajectories_large(self, init_pos, init_vel, duration,
                                    ell_degree: int, env_chunk: int,
                                    lam_iters: int = 8, env_grid=None):
        """Expert supervision at large N, fully on-device: ONE jitted
        lax.scan rolls the centralized expert
        (``_jnp_expert_accel_chunked``) and computes per-step states +
        top-D ELL communication graphs (``_jnp_env_step_chunked``) —
        every stage O(N·deg) memory, replacing the constructor's
        host-side O(nSamples·T·N²) numpy generation at swarm sizes where
        that cannot run. env_grid: both the env AND the expert's
        collision sums run on the O(N·k) cell-list grid
        (``_jnp_env_step_grid(expert_repel=...)`` — the repel sums come
        from a second window pass over the same cell table), making
        generation O(N) per step; the velocity-consensus term is a
        global O(N) reduction either way. Returns numpy (pos, vel,
        accel, states (B,T,6,N), graphs EllGso with (B,T,N,D) leaves
        [, ok exactness flag when env_grid])."""
        import jax
        import jax.numpy as jnp
        from graph_neural_networks_tpu.ops import ell as ell_lib
        dt = self.samplingTime
        T = len(np.arange(0, duration, dt))
        r = self.commRadius
        repel = self.repelDist
        a_max_exp = 100.0                 # expert clip, reference default
        D, chunk = ell_degree, env_chunk
        use_grid = env_grid is not None
        if use_grid:
            gts, gcc, gcf = _parse_env_grid(env_grid)

        # cache the jitted generator per static config so repeated
        # sample-batch calls (Flocking.large's gen_batch loop) do not
        # re-trace — remote compiles through the tunnel are expensive
        key = ("gen_large", T, D, chunk, lam_iters,
               None if not use_grid else (gts, gcc, gcf))
        cache = getattr(self, "_scan_cache", None)
        if cache is None:
            cache = self._scan_cache = {}

        def gen(pos0, vel0):
            B, _, N = pos0.shape
            v0 = jnp.ones((B, N), pos0.dtype) / jnp.sqrt(N)

            def step(carry, _):
                pos, vel, v, ok = carry
                if use_grid:
                    i_t, s_t, x_t, v, rep, ok_n = _jnp_env_step_grid(
                        pos, vel, r, min(D, N), v, lam_iters=lam_iters,
                        table_size=gts, cell_cap=gcc, cell_factor=gcf,
                        expert_repel=repel)
                    vel_term = -(N * vel
                                 - jnp.sum(vel, axis=-1, keepdims=True))
                    a = jnp.clip(vel_term + rep, -a_max_exp, a_max_exp)
                    ok = jnp.logical_and(ok, ok_n)
                else:
                    i_t, s_t, x_t, v = _jnp_env_step_chunked(
                        pos, vel, r, D, chunk, v, lam_iters=lam_iters)
                    a = _jnp_expert_accel_chunked(pos, vel, repel,
                                                  a_max_exp, chunk)
                vel_n = a * dt + vel
                pos_n = a * dt * dt / 2 + vel * dt + pos
                return ((pos_n, vel_n, v, ok),
                        (pos, vel, a, x_t, (i_t, s_t)))

            carry = (pos0, vel0, v0, jnp.asarray(True))
            carry, (pos, vel, acc, xs, Ss) = jax.lax.scan(
                step, carry, None, length=T)
            swap = lambda z: jnp.moveaxis(z, 0, 1)
            # reference convention: accel[T-1] stays zero (it never
            # drives a transition inside the horizon)
            accel = swap(acc).at[:, T - 1].set(0.0)
            return (swap(pos), swap(vel), accel, swap(xs),
                    (swap(Ss[0]), swap(Ss[1])), carry[-1])

        if key not in cache:
            cache[key] = jax.jit(gen)
        pos0 = jnp.asarray(init_pos, jnp.float32)
        vel0 = jnp.asarray(init_vel, jnp.float32)
        pos, vel, accel, states, (gi, gv), ok = cache[key](pos0, vel0)
        graphs = ell_lib.EllGso(np.asarray(gi), np.asarray(gv)[:, :, None])
        if use_grid and not bool(ok):
            import warnings
            warnings.warn(
                "grid cell_cap overflowed during large-swarm expert "
                "generation: neighbor sets (and expert collision sums) "
                "may be incomplete — raise cell_cap/table_size",
                RuntimeWarning)
        out = (np.asarray(pos), np.asarray(vel), np.asarray(accel),
               np.asarray(states), graphs)
        return out + ((bool(ok),) if use_grid else ())

    # -- reference-named aliases -------------------------------------------
    def getData(self, name, samplesType, *args):
        """Fetch auxiliary trajectories: 'pos'|'vel'|'accel'|'commGraph'|
        'state'|'initPos'|'initVel' (reference dataTools.py:3021-3080)."""
        store = {"pos": self.pos, "vel": self.vel, "accel": self.accel,
                 "commGraph": self.commGraph, "state": self.state,
                 "initPos": self.initPos, "initVel": self.initVel}[name]
        out = store[samplesType]
        if len(args) == 1:
            if isinstance(args[0], int):
                idx = np.random.permutation(out.shape[0])[:args[0]]
            else:
                idx = np.asarray(args[0])
            out = out[idx]
        return out

    get_data = getData

    def comm_graph_ell(self, samplesType, d_max=None):
        """Stored communication-graph trajectories as an ops.ell.EllGso
        (O(N·deg) padded in-neighbor layout) — drop-in for the dense
        (B,T,N,N) stack on every DB architecture."""
        from graph_neural_networks_tpu.ops import ell as ell_lib
        S = self.getData("commGraph", samplesType)
        return ell_lib.ell_from_dense(S[:, :, None], d_max=d_max)

    # -- initial conditions (reference dataTools.py:3508-3700) --------------
    def compute_initial_positions(self, nAgents, nSamples, commRadius,
                                  minDist=0.1, geometry="rectangular",
                                  xMaxInitVel=3.0, yMaxInitVel=3.0):
        rng = self.rng
        assert geometry in ("rectangular", "circular")
        min_dist = minDist * (1 + ZERO_TOL)
        comm_radius = commRadius * (1 - ZERO_TOL)
        if geometry == "rectangular":
            dist_fixed = (comm_radius + min_dist) / (2.0 * np.sqrt(2))
            dist_perturb = (comm_radius - min_dist) / (4.0 * np.sqrt(2))
            per_axis = int(np.ceil(np.sqrt(nAgents)))
            axis = np.arange(-(per_axis * dist_fixed) / 2,
                             (per_axis * dist_fixed) / 2, step=dist_fixed)
            xf = np.tile(axis, per_axis)
            yf = np.repeat(axis, per_axis)
            fixed = np.stack([xf, yf])[:, :nAgents]
            fixed = np.repeat(fixed[None], nSamples, axis=0)
            perturb = rng.uniform(-dist_perturb, dist_perturb,
                                  (nSamples, 2, nAgents))
            init_pos = fixed + perturb
        else:
            r_fixed = (comm_radius + min_dist) / 2.0
            r_perturb = (comm_radius - min_dist) / 4.0
            fixed_radius = np.arange(0, r_fixed * nAgents, step=r_fixed) + r_fixed
            a_fixed = (comm_radius / fixed_radius + min_dist / fixed_radius) / 2.0
            for a in range(len(a_fixed)):
                per_circle = 2 * np.pi // a_fixed[a]
                a_fixed[a] = 2 * np.pi / per_circle
            init_radius = np.empty(0)
            init_angles = np.empty(0)
            agents_so_far, n = 0, 0
            while agents_so_far < nAgents:
                this_angles = np.arange(0, 2 * np.pi, step=a_fixed[n])
                agents_so_far += len(this_angles)
                init_radius = np.concatenate(
                    [init_radius, np.repeat(fixed_radius[n], len(this_angles))])
                init_angles = np.concatenate([init_angles, this_angles])
                n += 1
            init_radius = init_radius[:nAgents]
            init_angles = init_angles[:nAgents]
            init_radius = np.repeat(init_radius[None], nSamples, 0)
            init_angles = np.repeat(init_angles[None], nSamples, 0)
            init_radius += rng.uniform(-r_perturb, r_perturb,
                                       (nSamples, nAgents))
            per_angle_perturb = min(a_fixed) / 4
            init_angles += rng.uniform(-per_angle_perturb, per_angle_perturb,
                                       (nSamples, nAgents))
            init_pos = np.stack([init_radius * np.cos(init_angles),
                                 init_radius * np.sin(init_angles)], axis=1)
        # velocities: uniform per-sample bias + small per-agent perturbation
        # (all agents roughly share a velocity, as in the reference :3668-3697)
        x_vel = rng.uniform(-xMaxInitVel, xMaxInitVel, (nSamples, 1))
        y_vel = rng.uniform(-yMaxInitVel, yMaxInitVel, (nSamples, 1))
        vel_bias = np.stack([x_vel, y_vel], axis=1)   # nSamples x 2 x 1
        perturb = rng.uniform(-xMaxInitVel / 10, xMaxInitVel / 10,
                              (nSamples, 2, nAgents))
        init_vel = vel_bias + perturb
        return init_pos, init_vel

    compute_initial_positions.__doc__ = "Grid/circle initial placement with perturbations."
    computeInitialPositions = compute_initial_positions

    # -- expert controller (reference dataTools.py:3406-3506) ---------------
    def compute_optimal_trajectory(self, initPos, initVel, duration,
                                   samplingTime, repelDist, accelMax=100.0):
        nSamples, _, nAgents = initPos.shape
        time = np.arange(0, duration, samplingTime)
        T = len(time)
        pos = np.zeros((nSamples, T, 2, nAgents))
        vel = np.zeros((nSamples, T, 2, nAgents))
        accel = np.zeros((nSamples, T, 2, nAgents))
        pos[:, 0] = initPos
        vel[:, 0] = initVel
        for t in range(1, T):
            diff_pos, dist_sq = compute_differences(pos[:, t - 1])
            diff_vel, _ = compute_differences(vel[:, t - 1])
            repel_mask = (dist_sq < repelDist ** 2).astype(np.float64)
            diff_pos = diff_pos * repel_mask[:, None]
            dist_sq_inv = invert_tensor_ew(dist_sq)[:, None]
            accel[:, t - 1] = (-np.sum(diff_vel, axis=3)
                               + 2 * np.sum(diff_pos * (dist_sq_inv ** 2
                                                        + dist_sq_inv), axis=3))
            np.clip(accel[:, t - 1], -accelMax, accelMax, out=accel[:, t - 1])
            vel[:, t] = accel[:, t - 1] * samplingTime + vel[:, t - 1]
            pos[:, t] = (accel[:, t - 1] * samplingTime ** 2 / 2
                         + vel[:, t - 1] * samplingTime + pos[:, t - 1])
        return pos, vel, accel

    computeOptimalTrajectory = compute_optimal_trajectory

    # -- communication graph (reference dataTools.py:2816-3020) -------------
    def compute_communication_graph(self, pos, commRadius, normalizeGraph,
                                    kernelType="gaussian", weighted=False,
                                    kernelScale=1.0):
        squeeze = False
        if pos.ndim == 3:
            pos = pos[:, None]
            squeeze = True
        nSamples, T, _, N = pos.shape
        _, dist_sq = compute_differences(pos)
        if kernelType == "gaussian":
            W = np.exp(-kernelScale * dist_sq)
        else:
            W = dist_sq.copy()
        W[dist_sq > commRadius ** 2] = 0.0
        idx = np.arange(N)
        W[:, :, idx, idx] = 0.0
        if not weighted:
            W = (W > ZERO_TOL).astype(np.float64)
        if normalizeGraph:
            eigs = np.linalg.eigvalsh(W)
            lam = np.max(eigs, axis=-1)
            lam[np.abs(lam) < ZERO_TOL] = 1.0
            W = W / lam[..., None, None]
        return W[:, 0] if squeeze else W

    computeCommunicationGraph = compute_communication_graph

    # -- states (reference dataTools.py:2612-2815) --------------------------
    def compute_states(self, pos, vel, graphMatrix):
        diff_pos, dist_sq = compute_differences(pos)
        diff_vel, _ = compute_differences(vel)
        adj = (np.abs(graphMatrix) > ZERO_TOL).astype(np.float64)[..., None, :, :]
        dist_sq_inv = invert_tensor_ew(dist_sq)[..., None, :, :] * adj
        diff_pos = diff_pos * adj
        diff_vel = diff_vel * adj
        state_vel = np.sum(diff_vel, axis=-1)
        state_pos_fourth = np.sum(diff_pos * dist_sq_inv ** 2, axis=-1)
        state_pos_sq = np.sum(diff_pos * dist_sq_inv, axis=-1)
        return np.concatenate([state_vel, state_pos_fourth, state_pos_sq],
                              axis=-2)

    computeStates = compute_states

    # -- closed-loop rollout (reference dataTools.py:3166-3340) -------------
    def _scan_rollout(self, T: int, w: int, policy, ell_degree=None,
                      lam_method: str = "eig", env_chunk=None,
                      lam_iters: int = 8, step_mode: bool = False,
                      env_grid=None, return_graphs: bool = True,
                      traj_only: bool = False):
        """Build (and cache) a jitted lax.scan closed-loop rollout: the
        whole T-step env+model loop is ONE compiled program (no host
        round-trip per physics step — the reference pathology at
        dataTools.py:3166; SURVEY.md §7 hard-parts). policy must be
        traceable: (params, x_hist (B,w,6,N), S_hist) -> (B,w,2,N); its
        tap at the last window step drives the physics.

        step_mode: the policy exposes rollout_init/rollout_step (the DB
        architectures' register-carrying step interface) — the carry
        holds the policy's own recurrent state instead of x/S history
        windows, and each step does ONE graph shift per filter layer
        instead of a w-step re-forward. Exact (test_rollout_step.py).

        ell_degree=D: the model sees ops.ell.EllGso histories (top-D
        in-neighbors per step) and the stacked graph trajectory comes
        back as an EllGso — O(T·N·D) instead of O(T·N²), the large-swarm
        path. Combine with lam_method='power' to avoid the O(N³)
        eigvalsh per step.

        env_chunk=C (requires ell_degree): the environment step itself
        runs O(N·deg)-memory via ``_jnp_env_step_chunked`` — states and
        the graph built in C-row chunks, lambda_max by warm-started
        power iteration (`lam_iters` per step) on the ELL matvec. This
        removes the env's own (N,N) allocations (17 GB each at N=65536),
        the last dense obstacle to very large swarms.

        env_grid=(table_size, cell_cap) or True (requires ell_degree):
        O(N·k) cell-list env step (``_jnp_env_step_grid``) — the rollout
        additionally returns a trailing exactness flag ``ok`` (False iff
        some hash cell overflowed cell_cap during the roll).

        traj_only=True: the scan's per-step outputs are (pos, vel) ONLY
        — no accel/states/graph trajectory is ever stacked (the loop
        still computes whatever the policy consumes). The rollout
        returns (pos, vel) [+ ok], all on device: the device-resident
        DAGger path (TrainerFlocking deviceStore) re-rolls learner
        trajectories without materializing or pulling the O(T·N·D)
        graph stacks that made randomEpoch d2h-bound (~2 min/epoch at
        the reference config through the ~25 MB/s tunnel; states and
        graphs are recomputed on device in the training batch
        instead — _jnp_recompute_supervision)."""
        import jax
        import jax.numpy as jnp
        from graph_neural_networks_tpu.ops import ell as ell_lib
        step_mode = bool(step_mode and hasattr(policy, "rollout_step"))
        import os
        key = (T, w, id(policy), ell_degree, lam_method, env_chunk,
               lam_iters, step_mode, env_grid, return_graphs, traj_only,
               bool(os.environ.get("GNT_NO_FUSED_POLICY")),
               bool(os.environ.get("GNT_FUSED_POLICY")))
        cache = getattr(self, "_scan_cache", None)
        if cache is None:
            cache = self._scan_cache = {}
        if key in cache:
            return cache[key]
        dt = self.samplingTime
        r = self.commRadius
        a_max = self.accelMax

        def _pv_step(step):
            # traj_only adapter: keep the carry, emit only (pos, vel)
            def wrapped(c, u):
                c2, ys = step(c, u)
                return c2, ys[:2]
            return wrapped

        def _pv_assemble(init_pos, init_vel, pos, vel):
            import jax.numpy as jnp
            swap = lambda z: jnp.moveaxis(z, 0, 1)
            return (jnp.concatenate([init_pos[:, None], swap(pos)],
                                    axis=1),
                    jnp.concatenate([init_vel[:, None], swap(vel)],
                                    axis=1))

        if env_chunk is not None or env_grid is not None:
            assert ell_degree is not None, \
                "env_chunk/env_grid require ell_degree (the O(N*deg) " \
                "graph layout)"
            init_fn, step_fn = self._chunked_pieces(
                w, policy, ell_degree, env_chunk, lam_iters,
                step_mode=step_mode, env_grid=env_grid,
                return_graphs=return_graphs)

            def rollout_chunked(params, init_pos, init_vel):
                carry, (x0, i0, s0) = init_fn(init_pos, init_vel)

                if traj_only:
                    carry, (pos, vel) = jax.lax.scan(
                        _pv_step(lambda c, u: step_fn(params, c)),
                        carry, None, length=T - 1)
                    out = _pv_assemble(init_pos, init_vel, pos, vel)
                    if env_grid is not None:
                        out = out + (carry[-1],)
                    return out

                def step(carry, _):
                    return step_fn(params, carry)

                carry, (pos, vel, acc, xs, Ss) = jax.lax.scan(
                    step, carry, None, length=T - 1)
                swap = lambda z: jnp.moveaxis(z, 0, 1)
                pos = jnp.concatenate([init_pos[:, None], swap(pos)], axis=1)
                vel = jnp.concatenate([init_vel[:, None], swap(vel)], axis=1)
                zero_a = jnp.zeros_like(acc[:1])
                accel = jnp.concatenate([swap(acc), swap(zero_a)], axis=1)
                states = jnp.concatenate([x0[:, None], swap(xs)], axis=1)
                gi = jnp.concatenate([i0[:, None], swap(Ss[0])], axis=1)
                gv = jnp.concatenate([s0[:, None], swap(Ss[1])], axis=1)
                graphs = ell_lib.EllGso(gi, gv[:, :, None])
                out = (pos, vel, accel, states, graphs)
                if env_grid is not None:
                    out = out + (carry[-1],)   # exactness flag
                return out

            cache[key] = jax.jit(rollout_chunked)
            return cache[key]

        def rollout(params, init_pos, init_vel):
            B, _, N = init_pos.shape
            S0 = _jnp_comm_graph(init_pos, r, lam_method)
            x0 = _jnp_states(init_pos, init_vel, S0)
            if ell_degree is None:
                to_out = lambda S_n: S_n
            else:
                D = min(ell_degree, N)
                to_out = lambda S_n: ell_lib.ell_topk(S_n[:, None], D)

            def env_advance(pos_t, vel_t, a):
                vel_n = a * dt + vel_t
                pos_n = a * dt * dt / 2 + vel_t * dt + pos_t
                S_n = _jnp_comm_graph(pos_n, r, lam_method)
                x_n = _jnp_states(pos_n, vel_n, S_n)
                return pos_n, vel_n, S_n, x_n

            if step_mode:
                # policy carries its own recurrent state; one shift/step
                def step(carry, _):
                    pos_t, vel_t, x_t, S_t, pstate = carry
                    pstate, y = policy.rollout_step(params, pstate, x_t,
                                                    S_t)
                    a = jnp.clip(y, -a_max, a_max)
                    pos_n, vel_n, S_n, x_n = env_advance(pos_t, vel_t, a)
                    S_out = to_out(S_n)
                    return ((pos_n, vel_n, x_n, S_out, pstate),
                            (pos_n, vel_n, a, x_n, S_out))

                carry = (init_pos, init_vel, x0, to_out(S0),
                         policy.rollout_init(params, B, N))
                if traj_only:
                    _, (pos, vel) = jax.lax.scan(_pv_step(step), carry,
                                                 None, length=T - 1)
                    return _pv_assemble(init_pos, init_vel, pos, vel)
                _, (pos, vel, acc, xs, Ss) = jax.lax.scan(
                    step, carry, None, length=T - 1)
                return _assemble(init_pos, init_vel, x0, S0, pos, vel,
                                 acc, xs, Ss)

            xw = jnp.zeros((B, w, 6, N), init_pos.dtype).at[:, -1].set(x0)
            if ell_degree is None:
                Sw = jnp.zeros((B, w, N, N),
                               init_pos.dtype).at[:, -1].set(S0)
                as_hist = lambda Sw: Sw
            else:
                e0 = ell_lib.ell_topk(S0[:, None], D)           # lead (B,)
                iw = jnp.zeros((B, w, N, D),
                               jnp.int32).at[:, -1].set(e0.idx)
                vw = jnp.zeros((B, w, 1, N, D),
                               init_pos.dtype).at[:, -1].set(e0.val)
                Sw = (iw, vw)
                as_hist = lambda Sw: ell_lib.EllGso(*Sw)

            def roll_window(Sw, S_new):
                if ell_degree is None:
                    return jnp.concatenate([Sw[:, 1:], S_new[:, None]],
                                           axis=1)
                iw, vw = Sw
                e = S_new
                return (jnp.concatenate([iw[:, 1:], e.idx[:, None]], axis=1),
                        jnp.concatenate([vw[:, 1:], e.val[:, None]], axis=1))

            def step(carry, _):
                pos_t, vel_t, xw, Sw = carry
                y = policy(params, xw, as_hist(Sw))
                a = jnp.clip(y[:, -1], -a_max, a_max)
                pos_n, vel_n, S_n, x_n = env_advance(pos_t, vel_t, a)
                S_out = to_out(S_n)
                xw = jnp.concatenate([xw[:, 1:], x_n[:, None]], axis=1)
                Sw = roll_window(Sw, S_out)
                return (pos_n, vel_n, xw, Sw), (pos_n, vel_n, a, x_n, S_out)

            carry = (init_pos, init_vel, xw, Sw)
            if traj_only:
                _, (pos, vel) = jax.lax.scan(_pv_step(step), carry,
                                             None, length=T - 1)
                return _pv_assemble(init_pos, init_vel, pos, vel)
            _, (pos, vel, acc, xs, Ss) = jax.lax.scan(step, carry, None,
                                                      length=T - 1)
            return _assemble(init_pos, init_vel, x0, S0, pos, vel, acc,
                             xs, Ss)

        def _assemble(init_pos, init_vel, x0, S0, pos, vel, acc, xs, Ss):
            # prepend t=0; accel convention matches the host loop: a from
            # step t drives the transition into t+1 and is stored at t
            swap = lambda z: jnp.moveaxis(z, 0, 1)
            pos = jnp.concatenate([init_pos[:, None], swap(pos)], axis=1)
            vel = jnp.concatenate([init_vel[:, None], swap(vel)], axis=1)
            zero_a = jnp.zeros_like(acc[:1])
            accel = jnp.concatenate([swap(acc), swap(zero_a)], axis=1)
            states = jnp.concatenate([x0[:, None], swap(xs)], axis=1)
            if ell_degree is None:
                graphs = jnp.concatenate([S0[:, None], swap(Ss)], axis=1)
            else:
                D0 = min(ell_degree, S0.shape[-1])  # same clamp as to_out
                graphs = jax.tree_util.tree_map(
                    lambda a0, rest: jnp.concatenate(
                        [a0[:, None], swap(rest)], axis=1),
                    ell_lib.ell_topk(S0[:, None], D0), Ss)
            return pos, vel, accel, states, graphs

        cache[key] = jax.jit(rollout)
        return cache[key]

    def _chunked_pieces(self, w, policy, ell_degree, env_chunk, lam_iters,
                        step_mode: bool = False, env_grid=None,
                        return_graphs: bool = True):
        """init/step closures shared by the monolithic and segmented
        chunked rollouts. carry = (pos, vel, x-window, ell-idx-window,
        ell-val-window, lambda_max eigenvector [, ok]) — or, in
        step_mode, (pos, vel, x_t, idx_t, val_t, policy-state,
        eigenvector [, ok]): the policy's own registers replace the
        history windows entirely (one graph shift per step instead of a
        w-step re-forward).

        env_grid: None uses the O(N·deg)-memory chunked all-pairs env
        step; (table_size, cell_cap) or True uses the O(N·k) cell-list
        grid step (``_jnp_env_step_grid``), adding a running exactness
        flag ``ok`` (False iff some hash cell overflowed cell_cap at
        some step) as the last carry element.

        FUSED-POLICY mode (grid + step_mode + a payload-capable policy
        with one edge feature, the default — GNT_NO_FUSED_POLICY=1
        opts out): the policy's tap registers ride the grid env's cell
        table as payload feature blocks and the env's own window pass
        emits their graph shift (S_t @ registers), so the policy's
        separate O(N·d_max)-row ELL register gather disappears from
        the step entirely (at N=1M its padded intermediate alone is
        ~9 GB — the fused step is both faster and the only way that
        size fits). carry = (pos, vel, x_t, shifted-registers,
        policy-state, eigenvector, ok); the env's ELL graph (idx/val)
        is still computed for the trajectory outputs. Same float-
        association and d_max-coverage caveats as the window lambda
        (see _jnp_env_step_grid)."""
        import os
        import jax.numpy as jnp
        from graph_neural_networks_tpu.ops import ell as ell_lib
        dt = self.samplingTime
        r = self.commRadius
        a_max = self.accelMax
        step_mode = bool(step_mode and hasattr(policy, "rollout_step"))
        use_grid = env_grid is not None
        if use_grid:
            gts, gcc, gcf = _parse_env_grid(env_grid)
        pw = getattr(policy, "payload_width", 0)
        # auto heuristic: the payload's cost is the element-latency-
        # bound table scatter (~12 ns/element, probe_fused_policy +
        # the windowed-scatter negative result in TODO.md) while the
        # unfused ELL register gather costs ~9 ns/row x d_max rows —
        # so fusing wide-register policies (GRNN hidden states) would
        # LOSE once payload_width >> d_max. GNT_FUSED_POLICY=1 forces
        # fusion regardless (e.g. when the unfused gather cannot even
        # fit, as at N=1M); GNT_NO_FUSED_POLICY=1 forces it off.
        fused = (step_mode and use_grid
                 and not os.environ.get("GNT_NO_FUSED_POLICY")
                 and hasattr(policy, "rollout_step_shifted")
                 and hasattr(policy, "rollout_payload")
                 and getattr(policy, "E", None) == 1
                 and pw > 0
                 and (bool(os.environ.get("GNT_FUSED_POLICY"))
                      or pw <= 1.5 * ell_degree))
        # return_graphs=False: the ELL graph trajectory comes back with
        # ZERO columns (d_max=0 skips the kernel's whole rank/selection
        # block and the per-step (N, D) ys stacking). Only legal when
        # nothing consumes the graph in the loop: the fused policy
        # shifts its registers via the window pass's untruncated mask
        # sums, so trajectories are unchanged (exact — d_max only ever
        # truncated the EMITTED graph, not the dynamics).
        # "auto" = False exactly when this rollout is fused: what
        # eval-only callers (evaluate_flocking, Trainer validation)
        # pass so they never pay for graphs they don't read.
        if return_graphs == "auto":
            return_graphs = not fused
        assert return_graphs or fused, \
            "return_graphs=False requires the fused-policy grid " \
            "rollout (non-fused step/window policies consume the ELL " \
            "graph each step)"

        def env_step(pos, vel, v, N, iters, payload=None):
            D = min(ell_degree, N) if return_graphs else 0
            if use_grid:
                return _jnp_env_step_grid(
                    pos, vel, r, D, v, lam_iters=iters,
                    table_size=gts, cell_cap=gcc, cell_factor=gcf,
                    payload=payload)
            chunk = _fit_chunk(N, env_chunk)
            i, s, x, v = _jnp_env_step_chunked(
                pos, vel, r, D, chunk, v, lam_iters=iters)
            return i, s, x, v, jnp.asarray(True)

        def init_fn(init_pos, init_vel):
            B, _, N = init_pos.shape
            D = min(ell_degree, N)
            v0 = jnp.ones((B, N), init_pos.dtype) / jnp.sqrt(N)
            i0, s0, x0, v0, ok = env_step(
                init_pos, init_vel, v0, N,
                max(lam_iters, 32))             # cold start: converge
            if fused:
                # zero registers shift to zero: no payload pass needed
                pstate = policy.rollout_init(None, B, N)
                sh0 = jnp.zeros_like(
                    policy.rollout_payload(pstate).reshape(B, N, -1))
                carry = (init_pos, init_vel, x0, sh0, pstate, v0)
            elif step_mode:
                pstate = policy.rollout_init(None, B, N)
                carry = (init_pos, init_vel, x0, i0, s0, pstate, v0)
            else:
                xw = jnp.zeros((B, w, 6, N),
                               init_pos.dtype).at[:, -1].set(x0)
                iw = jnp.zeros((B, w, N, D), jnp.int32).at[:, -1].set(i0)
                vw = jnp.zeros((B, w, 1, N, D),
                               init_pos.dtype).at[:, -1].set(s0[:, None])
                carry = (init_pos, init_vel, xw, iw, vw, v0)
            if use_grid:
                carry = carry + (ok,)
            return carry, (x0, i0, s0)

        def step_fn(params, carry):
            if use_grid:
                *carry, ok = carry
            if fused:
                pos_t, vel_t, x_t, sh_t, pstate, v = carry
            elif step_mode:
                pos_t, vel_t, x_t, i_t, s_t, pstate, v = carry
            else:
                pos_t, vel_t, xw, iw, vw, v = carry
            B, _, N = pos_t.shape
            if fused:
                pstate, y = policy.rollout_step_shifted(
                    params, pstate, x_t, sh_t)
                a = jnp.clip(y, -a_max, a_max)
            elif step_mode:
                pstate, y = policy.rollout_step(
                    params, pstate, x_t, ell_lib.EllGso(i_t, s_t[:, None]))
                a = jnp.clip(y, -a_max, a_max)
            else:
                y = policy(params, xw, ell_lib.EllGso(iw, vw))
                a = jnp.clip(y[:, -1], -a_max, a_max)
            vel_n = a * dt + vel_t
            pos_n = a * dt * dt / 2 + vel_t * dt + pos_t
            if fused:
                pay = policy.rollout_payload(pstate).reshape(B, N, -1)
                i_n, s_n, x_n, v, sh_n, ok_n = env_step(
                    pos_n, vel_n, v, N, lam_iters, payload=pay)
                out = (pos_n, vel_n, x_n, sh_n, pstate, v)
            else:
                i_n, s_n, x_n, v, ok_n = env_step(pos_n, vel_n, v, N,
                                                  lam_iters)
                if step_mode:
                    out = (pos_n, vel_n, x_n, i_n, s_n, pstate, v)
                else:
                    xw = jnp.concatenate([xw[:, 1:], x_n[:, None]], axis=1)
                    iw = jnp.concatenate([iw[:, 1:], i_n[:, None]], axis=1)
                    vw = jnp.concatenate([vw[:, 1:], s_n[:, None, None]],
                                         axis=1)
                    out = (pos_n, vel_n, xw, iw, vw, v)
            if use_grid:
                out = out + (jnp.logical_and(ok, ok_n),)
            return out, (pos_n, vel_n, a, x_n, (i_n, s_n))

        return init_fn, step_fn

    def _scan_rollout_segmented(self, T, w, policy, ell_degree, env_chunk,
                                lam_iters: int = 8, seg: int = 8,
                                step_mode: bool = False, env_grid=None):
        """Host-segmented chunked rollout for very large swarms: the
        T-step closed loop runs as ceil((T-1)/seg) device programs of at
        most `seg` scan steps each, with the carry kept on device and
        per-segment trajectory slices pulled to host between calls.

        Identical math (same init/step closures) to the monolithic
        ``_scan_rollout(env_chunk=...)`` program, but (a) bounds
        single-program device execution time — at N>=65536 a monolithic
        T=50 scan exceeds the runtime's execution limit and faults the
        device (TODO.md round-2 log) — and (b) caps device-resident
        trajectory memory at O(seg·N·deg) instead of O(T·N·deg).
        Returns numpy (pos, vel, accel, states, EllGso graphs) in the
        same layout as the monolithic rollout. The compiled init/segment
        programs are cached on self (same key scheme as _scan_rollout)
        so repeated calls — e.g. per-epoch evaluation — do not
        re-trace."""
        import jax
        import jax.numpy as jnp
        from graph_neural_networks_tpu.ops import ell as ell_lib
        import os
        key = ("seg", T, w, id(policy), ell_degree, env_chunk, lam_iters,
               seg, step_mode, env_grid,
               bool(os.environ.get("GNT_NO_FUSED_POLICY")),
               bool(os.environ.get("GNT_FUSED_POLICY")))
        cache = getattr(self, "_scan_cache", None)
        if cache is None:
            cache = self._scan_cache = {}
        if key in cache:
            return cache[key]
        init_fn, step_fn = self._chunked_pieces(
            w, policy, ell_degree, env_chunk, lam_iters,
            step_mode=step_mode, env_grid=env_grid)
        init_jit = jax.jit(init_fn)
        seg_cache = {}

        def seg_prog(n):
            if n not in seg_cache:
                def run_seg(params, carry):
                    def body(c, _):
                        return step_fn(params, c)
                    return jax.lax.scan(body, carry, None, length=n)
                seg_cache[n] = jax.jit(run_seg)
            return seg_cache[n]

        def run(params, init_pos, init_vel):
            carry, (x0, i0, s0) = init_jit(init_pos, init_vel)
            host = lambda z: np.asarray(jax.device_get(z))
            pos_l, vel_l, acc_l, xs_l, gi_l, gv_l = ([] for _ in range(6))
            if T <= 1:      # init-only trajectory (duration <= dt)
                x0, i0, s0 = host(x0), host(i0), host(s0)
                out = (host(init_pos)[:, None], host(init_vel)[:, None],
                       np.zeros_like(host(init_pos))[:, None],
                       x0[:, None],
                       ell_lib.EllGso(i0[:, None], s0[:, None, None]))
                if env_grid is not None:
                    out = out + (host(carry[-1]),)
                return out
            left = T - 1
            while left > 0:
                n = min(seg, left)
                carry, (p, v_, a, xs, Ss) = seg_prog(n)(params, carry)
                pos_l.append(host(p)); vel_l.append(host(v_))
                acc_l.append(host(a)); xs_l.append(host(xs))
                gi_l.append(host(Ss[0])); gv_l.append(host(Ss[1]))
                left -= n
            swap = lambda chunks: np.moveaxis(np.concatenate(chunks, 0), 0, 1)
            init_pos = host(init_pos); init_vel = host(init_vel)
            x0, i0, s0 = host(x0), host(i0), host(s0)
            pos = np.concatenate([init_pos[:, None], swap(pos_l)], axis=1)
            vel = np.concatenate([init_vel[:, None], swap(vel_l)], axis=1)
            acc = swap(acc_l)
            accel = np.concatenate(
                [acc, np.zeros_like(acc[:, :1])], axis=1)
            states = np.concatenate([x0[:, None], swap(xs_l)], axis=1)
            gi = np.concatenate([i0[:, None], swap(gi_l)], axis=1)
            gv = np.concatenate([s0[:, None], swap(gv_l)], axis=1)
            graphs = ell_lib.EllGso(gi, gv[:, :, None])
            out = (pos, vel, accel, states, graphs)
            if env_grid is not None:
                out = out + (host(carry[-1]),)   # exactness flag
            return out

        cache[key] = run
        return run

    def compute_trajectory(self, initPos, initVel, duration, archit=None,
                           accel=None, params=None, rng=None, doPrint=None,
                           history_window=None, jit=True, ell_degree=None,
                           lam_method: str = "eig", env_chunk=None,
                           lam_iters: int = 8, seg=None, step_mode=None,
                           env_grid=None, env_grid_strict: bool = False,
                           return_graphs: bool = True):
        """Roll the swarm forward. Either apply a given open-loop `accel`
        sequence, or run `archit` (params, x_hist, S_hist) -> accel closed
        loop: at each step the model sees the (zero-padded) history and its
        output at the current step drives the physics.

        env_grid (requires ell_degree; True or (table_size, cell_cap)):
        O(N·k) cell-list environment step — the TPU-scalable path for
        very large swarms (``_jnp_env_step_grid``). Exact vs the
        all-pairs env whenever no hash cell overflows cell_cap; a
        RuntimeWarning is raised if one did (raise cell_cap /
        table_size). env_grid_strict=True upgrades that warning to a
        RuntimeError — use it in long training/eval runs where a
        filtered warning would let incomplete neighbor sets pass
        silently (the sharded API instead returns the raw ok flag).

        return_graphs=False (fused-policy grid rollouts only): the
        returned graph trajectory has ZERO ELL columns — evaluation /
        cost callers that never read the graph skip both the window
        kernel's rank/selection block and the O(T·N·D) graph stacking.
        Positions/velocities are EXACT vs return_graphs=True (the
        fused policy's register shifts are untruncated mask sums;
        d_max only ever shaped the emitted graph). "auto" = False
        exactly when the rollout is fused — safe for any caller that
        never reads the returned graphs, at any scale/config.

        lam_iters: warm-started power iterations for the per-step
        lambda_max. The eigenvector carried across steps tracks the
        slowly-moving spectrum extremely well: over a 100-step N=4096
        rollout even lam_iters=1 matches a converged (64-iteration)
        reference to 1e-5 relative cost and 0.03%-of-scale positions
        (experiments/probe_lambda_fidelity.json). With the grid env on
        TPU, lam_iters=0 is the ZERO-COST "fold" mode (Rayleigh
        quotient from the W@v matvec folded into the main window pass,
        eigenvector still advanced) and matches the converged reference
        to the same fidelity (5.7e-6 relative cost — the recommended
        large-swarm setting); lam_iters>=1 adds one candidate-window
        matvec pass each. The default 8 is kept for compatibility.

        history_window: for causal finite-memory controllers (K-tap
        delayed filters, aggregation GNNs) pass their memory depth — the
        rollout then feeds only the last `window` steps each call
        (identical outputs by causality, O(T*K) instead of O(T^2)).

        step_mode (None = auto): when `archit` exposes
        rollout_init/rollout_step (all three DB architectures), the
        compiled rollout carries the policy's own recurrent registers
        and does ONE graph shift per step — no history windows at all
        (exact; test_rollout_step.py / test_data.py parity). Auto also
        enables the compiled scan path for GraphRecurrentNN_DB, which
        has no finite causal window. Pass step_mode=False to force the
        windowed re-forward path."""
        assert archit is not None or accel is not None
        # None = auto; an explicit True still requires the capability
        step_mode = bool((step_mode is None or step_mode)
                         and archit is not None
                         and hasattr(archit, "rollout_step"))
        if ell_degree is None:
            ell_degree = self.rollout_ell_degree
        if lam_method == "eig" and self.rollout_lam_method != "eig":
            lam_method = self.rollout_lam_method
        if env_chunk is None:
            env_chunk = getattr(self, "rollout_env_chunk", None)
        if env_grid is None:
            env_grid = getattr(self, "rollout_env_grid", None)
        initPos = np.asarray(initPos, np.float64)
        initVel = np.asarray(initVel, np.float64)
        B, _, N = initPos.shape
        T = len(np.arange(0, duration, self.samplingTime))
        pos = np.zeros((B, T, 2, N))
        vel = np.zeros((B, T, 2, N))
        pos[:, 0] = initPos
        vel[:, 0] = initVel
        if accel is not None:
            accel = np.asarray(accel, np.float64)
            for t in range(1, T):
                vel[:, t] = accel[:, t - 1] * self.samplingTime + vel[:, t - 1]
                pos[:, t] = (accel[:, t - 1] * self.samplingTime ** 2 / 2
                             + vel[:, t - 1] * self.samplingTime
                             + pos[:, t - 1])
            return pos, vel, accel, None, None

        if ((history_window is not None or step_mode) and jit
                and params is not None):
            # one compiled lax.scan for the whole closed loop (policy must
            # be traceable and take explicit params; legacy numpy policies
            # pass params=None and fall through to the host loop below)
            import jax
            import jax.numpy as jnp
            w = int(history_window) if history_window is not None else 0
            to_f64 = lambda out: tuple(jax.tree_util.tree_map(
                lambda a: np.asarray(
                    a, np.float64 if np.issubdtype(a.dtype, np.floating)
                    else None), o) for o in out)

            def check_ok(out):
                # grid mode returns a trailing exactness flag: strip it
                # and surface overflow as a warning (results stand, but
                # some neighbor may have been missed)
                if env_grid is None:
                    return out
                *out, ok = out
                if not bool(np.asarray(ok)):
                    msg = ("grid env: a hash cell overflowed cell_cap "
                           "during the rollout (raise cell_cap/"
                           "table_size), or — fused-policy rollouts — "
                           "some agent's in-degree exceeded d_max "
                           "(raise ell_degree): neighbor sets / "
                           "emitted graphs may be incomplete")
                    if env_grid_strict:
                        raise RuntimeError(msg)
                    import warnings
                    warnings.warn(msg, RuntimeWarning)
                return tuple(out)

            if seg is not None:
                # host-segmented: bounds single-program device time for
                # very large swarms (see _scan_rollout_segmented)
                assert env_chunk is not None or env_grid is not None, \
                    "seg= requires env_chunk or env_grid (the O(N*deg) " \
                    "env path is what the segmented rollout segments)"
                assert return_graphs, \
                    "return_graphs=False is monolithic-only (the " \
                    "segmented rollout's per-segment host pulls " \
                    "include the graph slices)"
                roll = self._scan_rollout_segmented(
                    T, w, archit,
                    ell_degree=ell_degree, env_chunk=env_chunk,
                    lam_iters=lam_iters, seg=int(seg),
                    step_mode=step_mode, env_grid=env_grid)
                return check_ok(to_f64(roll(
                    params, jnp.asarray(initPos, jnp.float32),
                    jnp.asarray(initVel, jnp.float32))))
            roll = self._scan_rollout(T, w, archit,
                                      ell_degree=ell_degree,
                                      lam_method=lam_method,
                                      env_chunk=env_chunk,
                                      lam_iters=lam_iters,
                                      step_mode=step_mode,
                                      env_grid=env_grid,
                                      return_graphs=return_graphs)
            out = roll(params, jnp.asarray(initPos, jnp.float32),
                       jnp.asarray(initVel, jnp.float32))
            # graphs may be an EllGso pytree (ell_degree mode): convert
            # leaf-wise, keeping integer index dtype
            return check_ok(to_f64(out))

        accel_out = np.zeros((B, T, 2, N))
        state_hist = np.zeros((B, T, 6, N))
        graph_hist = np.zeros((B, T, N, N))
        g0 = self.compute_communication_graph(pos[:, 0], self.commRadius,
                                              True)
        graph_hist[:, 0] = g0
        state_hist[:, 0] = self.compute_states(pos[:, :1], vel[:, :1],
                                               graph_hist[:, :1])[:, 0]
        for t in range(1, T):
            if history_window is not None:
                # causal finite-memory: only the last `window` steps matter
                w = int(history_window)
                lo = max(t - w, 0)
                xw = state_hist[:, lo:t]
                Sw = graph_hist[:, lo:t]
                if xw.shape[1] < w:  # left-pad to a fixed window size (one
                    pad = w - xw.shape[1]  # compiled shape for the whole roll)
                    xw = np.concatenate(
                        [np.zeros_like(xw[:, :1]).repeat(pad, 1), xw], 1)
                    Sw = np.concatenate(
                        [np.zeros_like(Sw[:, :1]).repeat(pad, 1), Sw], 1)
                y = np.asarray(archit(params, xw, Sw))
                accel_out[:, t - 1] = np.clip(y[:, -1], -self.accelMax,
                                              self.accelMax)
                vel[:, t] = (accel_out[:, t - 1] * self.samplingTime
                             + vel[:, t - 1])
                pos[:, t] = (accel_out[:, t - 1] * self.samplingTime ** 2 / 2
                             + vel[:, t - 1] * self.samplingTime
                             + pos[:, t - 1])
                gt_ = self.compute_communication_graph(
                    pos[:, t], self.commRadius, True)
                graph_hist[:, t] = gt_
                state_hist[:, t] = self.compute_states(
                    pos[:, t:t + 1], vel[:, t:t + 1],
                    graph_hist[:, t:t + 1])[:, 0]
                continue
            # model acts on the padded full-horizon history; causal filters
            # ignore the zero future
            y = archit(params, state_hist, graph_hist)
            y = np.asarray(y)
            accel_out[:, t - 1] = np.clip(y[:, t - 1], -self.accelMax,
                                          self.accelMax)
            vel[:, t] = accel_out[:, t - 1] * self.samplingTime + vel[:, t - 1]
            pos[:, t] = (accel_out[:, t - 1] * self.samplingTime ** 2 / 2
                         + vel[:, t - 1] * self.samplingTime + pos[:, t - 1])
            gt_ = self.compute_communication_graph(pos[:, t], self.commRadius,
                                                   True)
            graph_hist[:, t] = gt_
            state_hist[:, t] = self.compute_states(
                pos[:, t:t + 1], vel[:, t:t + 1],
                graph_hist[:, t:t + 1])[:, 0]
        return pos, vel, accel_out, state_hist, graph_hist

    computeTrajectory = compute_trajectory

    def rollout_traj_device(self, initPos, initVel, duration, archit,
                            params, history_window=None,
                            ell_degree=None, lam_method: str = "eig",
                            env_chunk=None, lam_iters=None,
                            step_mode=None, env_grid=None,
                            env_grid_strict: bool = False):
        """Compiled closed-loop rollout returning DEVICE (pos, vel)
        (B,T,2,N) jnp.float32 arrays — nothing else is stacked in the
        scan and nothing is pulled to host (the grid exactness flag is
        the only scalar sync). The device-resident DAGger path: the
        trainer re-rolls learner trajectories with this and recomputes
        states/graphs/expert labels on device in the training batch
        (``_jnp_recompute_supervision``), so randomEpoch stops paying
        the ~25 MB/s tunnel d2h on dense graph trajectories (~2 min/
        epoch at the reference config, measured 2026-08-20). Same
        compiled step closures as ``compute_trajectory`` — positions
        and velocities are bit-identical to the full rollout
        (test_training.py deviceStore parity)."""
        step_mode = bool((step_mode is None or step_mode)
                         and hasattr(archit, "rollout_step"))
        assert history_window is not None or step_mode, \
            "rollout_traj_device needs the compiled rollout (a finite " \
            "history_window or a step-interface architecture)"
        if ell_degree is None:
            ell_degree = self.rollout_ell_degree
        if lam_method == "eig" and self.rollout_lam_method != "eig":
            lam_method = self.rollout_lam_method
        if env_chunk is None:
            env_chunk = getattr(self, "rollout_env_chunk", None)
        if env_grid is None:
            env_grid = getattr(self, "rollout_env_grid", None)
        if lam_iters is None:
            # one lambda setting across generation / re-rolls /
            # recompute (Flocking.large_device stores it)
            lam_iters = getattr(self, "rollout_lam_iters", 8)
        import jax.numpy as jnp
        T = len(np.arange(0, duration, self.samplingTime))
        w = int(history_window) if history_window is not None else 0
        roll = self._scan_rollout(
            T, w, archit, ell_degree=ell_degree, lam_method=lam_method,
            env_chunk=env_chunk, lam_iters=lam_iters,
            step_mode=step_mode, env_grid=env_grid,
            return_graphs="auto" if env_grid is not None else True,
            traj_only=True)
        out = roll(params, jnp.asarray(initPos, jnp.float32),
                   jnp.asarray(initVel, jnp.float32))
        if env_grid is not None:
            pos, vel, ok = out
            if not bool(np.asarray(ok)):
                msg = ("grid env: cell_cap overflow or (fused) "
                       "in-degree > d_max during the rollout — "
                       "results may be incomplete")
                if env_grid_strict:
                    raise RuntimeError(msg)
                import warnings
                warnings.warn(msg, RuntimeWarning)
            return pos, vel
        return out

    # -- cost (reference dataTools.py:3082-3164) ----------------------------
    def rollout_cost(self, initPos, initVel, duration, archit, params,
                     history_window=None, ell_degree=None,
                     env_chunk=None, env_grid=None, lam_iters: int = 8,
                     step_mode=None, env_grid_strict: bool = False):
        """Closed-loop rollout reduced to the flocking cost ON DEVICE:
        returns (cost_full, cost_end) — ``evaluate``'s velocity-variance
        cost over the whole trajectory and at the final step — with the
        per-step cost accumulated in the scan CARRY. No trajectory is
        ever stacked or pulled to host (O(N) device memory, two scalars
        d2h), so million-agent / long-horizon evaluation runs at the
        rollout's own speed — ``compute_trajectory`` + host
        ``evaluate`` materializes O(T·N) arrays and pays the tunnel
        d2h (~25 MB/s here) on all of them. Exact: same init/step
        closures as the compiled rollout (graphs skipped only where
        that is exact, return_graphs='auto'), same cost formula as
        ``evaluate`` (reference evaluation.py:170-328 computes this
        cost from pulled trajectories; dataTools.py:3342+ the cost).

        Requires the compiled-rollout conditions (traceable archit
        with explicit params and a finite window or step interface)
        and ell_degree (+ env_chunk or env_grid) — the large-swarm
        configuration this path exists for."""
        step_mode = bool((step_mode is None or step_mode)
                         and hasattr(archit, "rollout_step"))
        if ell_degree is None:
            ell_degree = self.rollout_ell_degree
        if env_chunk is None:
            env_chunk = getattr(self, "rollout_env_chunk", None)
        if env_grid is None:
            env_grid = getattr(self, "rollout_env_grid", None)
        assert ell_degree is not None and (
            env_chunk is not None or env_grid is not None), \
            "rollout_cost is the O(N*deg) compiled path: pass " \
            "ell_degree and env_chunk or env_grid (or construct via " \
            "Flocking.for_rollout/large)"
        w = (int(history_window) if history_window is not None
             else getattr(archit, "causal_window", 0) or 0)
        T = len(np.arange(0, duration, self.samplingTime))
        import os
        key = ("cost", T, w, id(archit), ell_degree, env_chunk,
               lam_iters, step_mode, env_grid,
               bool(os.environ.get("GNT_NO_FUSED_POLICY")),
               bool(os.environ.get("GNT_FUSED_POLICY")))
        cache = getattr(self, "_scan_cache", None)
        if cache is None:
            cache = self._scan_cache = {}
        if key not in cache:
            import jax
            import jax.numpy as jnp
            init_fn, step_fn = self._chunked_pieces(
                w, archit, ell_degree, env_chunk, lam_iters,
                step_mode=step_mode, env_grid=env_grid,
                return_graphs="auto")

            def stepcost(vel):                        # (B,2,N) -> (B,)
                d = vel - jnp.mean(vel, axis=-1, keepdims=True)
                return jnp.mean(jnp.sum(d * d, axis=1), axis=-1)

            def roll(params, init_pos, init_vel):
                carry, _ = init_fn(init_pos, init_vel)
                c0 = stepcost(init_vel)

                def body(cc, _):
                    carry, acc, _last = cc
                    carry, ys = step_fn(params, carry)
                    c = stepcost(ys[1])               # vel_n
                    return (carry, acc + c, c), None

                (carry, acc, last), _ = jax.lax.scan(
                    body, (carry, c0, c0), None, length=T - 1)
                ok = (carry[-1] if env_grid is not None
                      else jnp.asarray(True))
                return jnp.mean(acc), jnp.mean(last), ok

            cache[key] = jax.jit(roll)
        import jax.numpy as jnp
        cf, ce, ok = cache[key](params,
                                jnp.asarray(initPos, jnp.float32),
                                jnp.asarray(initVel, jnp.float32))
        if env_grid is not None and not bool(np.asarray(ok)):
            msg = ("grid env: a hash cell overflowed cell_cap during "
                   "the rollout (raise cell_cap/table_size), or — "
                   "fused-policy rollouts — some agent's in-degree "
                   "exceeded d_max (raise ell_degree): neighbor sets "
                   "/ emitted graphs may be incomplete")
            if env_grid_strict:
                raise RuntimeError(msg)
            import warnings
            warnings.warn(msg, RuntimeWarning)
        return float(cf), float(ce)

    def evaluate(self, vel=None, accel=None, initVel=None, samplingTime=None):
        """Velocity-variance flocking cost: sum over time of the mean squared
        deviation from the swarm-average velocity, averaged over samples."""
        if samplingTime is None:
            samplingTime = self.samplingTime
        if vel is None:
            assert accel is not None and initVel is not None
            B, T, _, N = accel.shape
            vel = np.zeros((B, T, 2, N))
            vel[:, 0] = initVel
            for t in range(1, T):
                vel[:, t] = accel[:, t - 1] * samplingTime + vel[:, t - 1]
        avg_vel = vel.mean(axis=3, keepdims=True)
        diff = vel - avg_vel
        cost_t = np.mean(np.sum(diff ** 2, axis=2), axis=2)  # B x T
        return float(np.mean(np.sum(cost_t, axis=1)))

    def astype(self, dataType):
        from graph_neural_networks_tpu.ops import ell as ell_lib
        for key in ("train", "valid", "test"):
            for store in (self.initPos, self.initVel, self.pos, self.vel,
                          self.accel, self.commGraph, self.state):
                if key not in store:
                    continue              # env-only / large construction
                if isinstance(store[key], ell_lib.EllGso):
                    store[key] = ell_lib.EllGso(
                        np.asarray(store[key].idx),
                        np.asarray(store[key].val).astype(dataType))
                else:
                    store[key] = np.asarray(store[key]).astype(dataType)
        super().astype(dataType)

    def expandDims(self):
        pass  # flocking signals already carry their feature dimension

    expand_dims = expandDims

    def saveVideo(self, saveDir, pos, *args, **kwargs):
        """Save trajectory snapshots (matplotlib). Video encoding (ffmpeg)
        is attempted, falls back to per-frame PNGs."""
        import os
        os.makedirs(saveDir, exist_ok=True)
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return None
        pos = np.asarray(pos)
        if pos.ndim == 3:
            pos = pos[None]
        sample = pos[0]                               # T x 2 x N
        step = max(len(sample) // 25, 1)
        paths = []
        for i, t in enumerate(range(0, len(sample), step)):
            fig, ax = plt.subplots(figsize=(4, 4))
            ax.scatter(sample[t, 0], sample[t, 1], s=8)
            ax.set_title(f"t = {t}")
            p = os.path.join(saveDir, f"frame{i:03d}.png")
            fig.savefig(p)
            plt.close(fig)
            paths.append(p)
        # encode to video when ffmpeg is available (reference
        # dataTools.py:3701 shells out to ffmpeg the same way)
        import shutil
        import subprocess
        if shutil.which("ffmpeg"):
            video = os.path.join(saveDir, "trajectory.mp4")
            try:
                subprocess.run(
                    ["ffmpeg", "-y", "-framerate", "8", "-i",
                     os.path.join(saveDir, "frame%03d.png"),
                     "-pix_fmt", "yuv420p", video],
                    check=True, capture_output=True, timeout=120)
                paths.append(video)
            except Exception:
                pass
        return paths

    save_video = saveVideo
