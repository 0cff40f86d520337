"""Fused cell-window kernel for the grid swarm environment (v2).

The grid env step gathers, per agent, the 9 cell rows of its 3x3 cell
neighborhood (data.flocking._grid_rows). Round-3 measurements showed
the pure-XLA window math pays ~10-25x its useful HBM traffic in tiled
re-layouts ((rows, 9, 6, C) feature slices pad ~14x; the feature-major
transpose costs ~60 ms at N=262k), and the round-3 kernel that fused
only the mask/state math was a WASH: packing its operand and
un-interleaving its (mask | id) output re-paid the same relayout.

v2 owns the WHOLE post-gather candidate path so no intermediate wider
than the kernel result is ever materialized:

    cand (9, rows, 128)  the gather output itself, window-major — cell
                         table rows are built 128 lanes wide
                         (feature-blocked [px|py|vx|vy|valid|id|v]*C,
                         data.flocking._grid_build_table), so
                         jnp.take(...).reshape(9, rows, 128) is a
                         layout no-op and the kernel's first operand
    own  (rows, 128)     [px, py, vx, vy, id, keep[9], pad] per agent
    out  (rows, OW)      [idx[d_max] | val[d_max] | st[6] | wv | cnt]
                         (OW = 2*d_max + 8 rounded up to 128 lanes)

Inside the kernel, per 9-cell window: distance mask, 6-feature partial
states, the W @ v_prev fold (v is the table's 7th feature block — one
power-iteration matvec rides the main pass for free), and the
rank-compare selection of the first d_max neighbors. Ranks come from a
single (rows, 9C) x (9C, 9C) lower-triangular matmul (an MXU prefix
sum); the unique rank==t match makes selection an exact sum-select.
Everything is (tile, C)-lane slices — no transposes, no gather output
ever re-laid out.

Replaces at scale: reference computeCommunicationGraph + computeStates
(dataTools.py:2612-3020). Exactness contract and neighbor-order
semantics identical to the XLA window path in
data.flocking._grid_rows (parity-tested in tests/test_ell.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ZERO_TOL = 1e-9
ID_SENTINEL = float(2 ** 24)   # > any valid agent id (N < 2^24 asserted)


def _make_kernel(C: int, r2: float, d_max: int, OW: int, wv_only: bool,
                 n_win: int, W: int, n_pay: int = 0):
    M = n_win * C
    # exp(-d2) > ZERO_TOL  <=>  d2 < -ln(ZERO_TOL) (~20.7): statically
    # implied by d2 <= r2 at flocking radii, so the 9C transcendentals
    # per agent vanish from the mask whenever r2 is below that bound
    # (data.flocking._grid_rows applies the same static shortcut, so
    # kernel and XLA masks stay bit-identical)
    need_exp = r2 > -math.log(ZERO_TOL)

    def kernel(cand_ref, own_ref, out_ref):
        own = own_ref[:]                              # (TA, 128)
        opx, opy = own[:, 0:1], own[:, 1:2]
        ovx, ovy = own[:, 2:3], own[:, 3:4]
        oid = own[:, 4:5]
        dt = own.dtype

        # re-layout each feature to (TA, n_win*C) FIRST (7*n_win lane-
        # copies), then run every mask/state op on M-lane arrays — the
        # per-window formulation kept whole vregs busy on C-lane slices
        # (12.5% lane utilization at C=16, measured ~36 ms at N=262k;
        # this one runs the math at ~full width)
        def fM(f):
            return jnp.concatenate(
                [cand_ref[w][:, f * C:(f + 1) * C]
                 for w in range(n_win)], axis=1)

        cpx, cpy = fM(0), fM(1)
        cid = fM(5)
        cv = fM(6)
        valid = jnp.concatenate(
            [cand_ref[w][:, 4 * C:5 * C] * own[:, 5 + w:6 + w]
             for w in range(n_win)], axis=1)
        dpx, dpy = opx - cpx, opy - cpy
        d2 = dpx * dpx + dpy * dpy
        m = (valid > 0.0) & (d2 <= r2) & (cid != oid)
        if need_exp:
            m &= jnp.exp(-d2) > ZERO_TOL
        mf = m.astype(dt)
        red = lambda z: jnp.sum(z, axis=1, keepdims=True)
        wv = red(cv * mf)
        if wv_only:
            out_ref[:] = jnp.concatenate(
                [wv, jnp.zeros((wv.shape[0], OW - 1), dt)], axis=1)
            return
        cvx, cvy = fM(2), fM(3)
        inv = jnp.where(d2 > ZERO_TOL, 1.0 / d2, 0.0) * mf
        dvx, dvy = ovx - cvx, ovy - cvy
        s_acc = [red(dvx * mf), red(dvy * mf),
                 red(dpx * inv * inv), red(dpy * inv * inv),
                 red(dpx * inv), red(dpy * inv)]
        if d_max == 0:
            # no-selection mode (rollouts that don't emit the ELL
            # graph): states, wv and the payload shifts are mask sums —
            # the whole rank/selection block (tri matmul + d_max
            # compare-gather passes) is skipped
            sel_out = []
        else:
            # prefix-sum ranks via a lower-triangular ones matmul (MXU)
            tri = jnp.tril(jnp.ones((M, M), dt))
            rk = jax.lax.dot_general(
                mf, tri, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dt)
            # first-d_max selection: rank t+1 matches exactly one
            # masked lane (cumsum increments only on masked lanes), so
            # the gated sum IS the selected id; ids are offset by +1
            # so 0 = none
            g = (cid + 1.0) * mf
            cols = [jnp.sum(g * (rk == float(t + 1)).astype(dt),
                            axis=1, keepdims=True) for t in range(d_max)]
            sel = jnp.concatenate(cols, axis=1)       # (TA, d_max)
            val = (sel > 0.0).astype(dt)
            idxf = jnp.maximum(sel - 1.0, 0.0)
            sel_out = [idxf, val]
        cnt = jnp.sum(mf, axis=1, keepdims=True)
        out = sel_out + s_acc + [wv, cnt]
        # payload fold: the table's blocks 7..6+n_pay carry arbitrary
        # per-agent features (the policy's delayed tap registers,
        # models.architectures_time.rollout_payload); their masked sums
        # ARE the graph shift S_t @ payload the policy's next step
        # needs — so the whole per-step neighbor exchange (mask, states,
        # lambda matvec, register shift) rides ONE table pass
        for pfi in range(n_pay):
            out.append(red(fM(7 + pfi) * mf))
        used = 2 * d_max + 8 + n_pay
        if used < OW:
            out.append(jnp.zeros((mf.shape[0], OW - used), dt))
        out_ref[:] = jnp.concatenate(out, axis=1)

    return kernel


def _out_width(d_max: int, n_pay: int = 0) -> int:
    return -(-(2 * d_max + 8 + n_pay) // 128) * 128


def _make_xpose_kernel(TH: int, C: int, F: int, W: int):
    # Mosaic lowering constraints shaped this (probe_xpose_variants,
    # r5): the natural 3-D formulations all fail — (TH,F,C)->(TH,F*C)
    # and (TH,128,C)->(TH,128*C) shape casts are "unsupported", lane-
    # assembling per-f slices via concatenate hits "result/input offset
    # mismatch on non-concat dimension", and sublane-strided
    # lax.slice is rejected outright. What DOES lower — and beats the
    # XLA relayout ~1.9x (2.7 vs 5.2 ms at F=7, H=65536 on v5e) — is
    # per-h 2-D transposes with DIRECT stores into the output ref at
    # static offsets: ref stores tolerate the vreg offsets that vector
    # concats cannot.
    FC = F * C

    def kernel(mm_ref, out_ref):
        if FC < W:
            out_ref[:] = jnp.zeros((TH, W), mm_ref.dtype)
        for h in range(TH):
            bt = mm_ref[h * C:(h + 1) * C, :].T       # (128, C)
            for f in range(F):
                out_ref[h:h + 1, f * C:(f + 1) * C] = bt[f:f + 1, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("C", "F", "tile_h",
                                             "interpret"))
def table_transpose(mm, *, C: int, F: int, tile_h: int = 0,
                    interpret=None):
    """(H*C, 128) member-major slot rows -> (H, W) feature-blocked cell
    rows, W = ceil(F*C/128)*128: out[h, f*C + c] = mm[h*C + c, f].

    The scatter-free table build (data.flocking._grid_build_table,
    builder='gather') row-gathers each cell's members from the sorted
    feature rows — that lands member-major, but the window kernel's
    operand contract is feature-blocked. This kernel is the relayout:
    pure streaming (read H*C*512 B, write H*W*4 B) with the (C, 128)
    -> (128, C) flips done in VMEM, where they cost register shuffles
    instead of the padded HBM round-trip an XLA transpose of the same
    array pays. interpret=None auto-enables interpret mode off-TPU."""
    HC, L = mm.shape
    assert L == 128 and HC % C == 0, (mm.shape, C)
    H = HC // C
    assert 0 < F <= 128, F
    W = -(-F * C // 128) * 128
    if not tile_h:
        # 16 measured fastest on v5e (8/16 sweep, probe_xpose_variants
        # r5: 2.7 ms at F=7 vs 4.3 at th=8); the kernel body unrolls
        # th*(1 transpose + F stores), so huge tiles also bloat compile
        tile_h = 16
    th = min(tile_h, H)
    while H % th:
        th -= 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _make_xpose_kernel(th, C, F, W),
        grid=(H // th,),
        in_specs=[pl.BlockSpec((th * C, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((th, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), mm.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=bool(interpret),
    )(mm)


def _make_build_kernel(TH: int, C: int, F: int, W: int, BR: int):
    FC = F * C

    SALIGN = 1024   # 1-D int32 HBM refs tile at 1024: DMA slice
                    # offsets/lengths must be tile-aligned (Mosaic:
                    # "Slice shape along dimension 0 must be aligned
                    # to tiling (1024)")

    def kernel(st_hbm, fs_ref, out_ref, st_ref, scratch, sem_s, sem):
        # st_hbm: the (H+1 padded) starts array in HBM (SMEM cannot
        # hold it whole: at the 1M-agent geometry H+1 int32 is 4 B
        # over the chip's 1 MB SMEM — a whole-array scalar prefetch
        # OOMs); each tile DMAs the ALIGNED 2*SALIGN-entry window
        # covering its (TH+1) starts into the 8 KB st_ref SMEM
        # scratch, then the fs window by the fetched base.
        # fs_ref: full (Npad, 128) sorted feature rows in HBM/ANY;
        # scratch (BR + C, 128): this tile's VMEM window
        i = pl.program_id(0)
        h0 = i * TH
        wbase = h0 // SALIGN * SALIGN
        dma_s = pltpu.make_async_copy(
            st_hbm.at[pl.ds(wbase, 2 * SALIGN)], st_ref, sem_s)
        dma_s.start()
        dma_s.wait()
        o0 = h0 - wbase                  # < SALIGN; +TH fits 2*SALIGN
        base = st_ref[o0]
        dma = pltpu.make_async_copy(
            fs_ref.at[pl.ds(base, BR + C), :], scratch, sem)
        dma.start()
        dma.wait()
        if FC < W:
            out_ref[:] = jnp.zeros((TH, W), scratch.dtype)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
        for j in range(TH):
            off = st_ref[o0 + j] - base
            cnt = st_ref[o0 + j + 1] - st_ref[o0 + j]
            blk = scratch[pl.ds(off, C), :]           # (C, 128)
            blk = jnp.where(iota_c < cnt, blk, 0.0)
            bt = blk.T                                # (128, C)
            for f in range(F):
                out_ref[j:j + 1, f * C:(f + 1) * C] = bt[f:f + 1, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("C", "F", "tile_h",
                                             "interpret"))
def table_build(fs, starts, *, C: int, F: int, tile_h: int = 16,
                interpret=None):
    """FUSED scatter-free cell-table build: (H, W) feature-blocked cell
    rows straight from the SORTED agent feature rows, one kernel.

    fs (N, 128): agents sorted by cell slot, row = agent's F features
    (lanes F..127 zero); starts (H+1,) int32: each cell's run start in
    fs (starts[H] = N; empty cells give zero-length runs). Output
    out[h, f*C + c] = fs[starts[h] + c, f] for c < min(run_len, C),
    else 0 — bit-identical to the gather build (and to the element
    scatter whenever no cell overflows).

    Why: the r4b gather build materialized ALL H*C slots by row gather
    (~8x the occupied rows at flocking densities: 40 ms at 262k) after
    a searchsorted srcmap (37 ms — XLA lowers it to log2(N) element-
    gather passes), then relayouted member-major -> feature-blocked.
    This kernel exploits that each cell's members are CONTIGUOUS in fs:
    per TH-cell tile, ONE dma pulls the window [starts[h0],
    starts[h0] + TH*C + C) into VMEM and the in-VMEM distribute
    (dynamic-offset slice, count mask, (C,128) transpose, per-feature
    stores) writes the tile — no slot gather, no relayout pass, read
    amplification ~C/avg-occupancy instead of per-slot latency. The
    per-h store pattern is the Mosaic-safe one from _make_xpose_kernel.

    Overflowing runs (> C members) keep their first C sorted members —
    same semantics as the gather build. NOTE: if overflow is so large
    that a LATER cell's run start falls outside the tile's fixed
    (TH*C + C)-row window, that cell's dynamic slice clamps and reads
    wrong (in-bounds) rows — the table is then garbage beyond the
    first-C truncation. This is within the existing contract (the
    env's ok flag is False on ANY overflow and callers must discard),
    but unlike scatter/gather the fused build's overflow output is not
    bit-reproducible against them. fs must be padded with >= TH*C + C
    zero rows past N (``table_build_pad_rows`` gives the count) so the
    window dma never reads out of bounds.

    Replaces at scale: the table materialization of reference
    computeCommunicationGraph (dataTools.py:2816-3020)."""
    Npad, L = fs.shape
    assert L == 128, fs.shape
    H = starts.shape[0] - 1
    assert 0 < F <= 128, F
    W = -(-F * C // 128) * 128
    th = tile_h
    while H % th:
        th -= 1
    BR = th * C
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Ht = H // th
    # pad starts so every tile's aligned 2048-entry DMA window is in
    # bounds (values past H hold starts[H] = N; harmless)
    starts_pad = jnp.pad(starts.astype(jnp.int32), (0, 2 * 1024),
                         mode="edge")

    # sequential_vmap: callers batch the env step with jax.vmap, but
    # Pallas cannot batch memory-space-ANY operands (the vmap rule
    # would need non-trivial block specs there) — lower any batching
    # to a per-element lax.map of full kernel launches instead
    @jax.custom_batching.sequential_vmap
    def _call(starts_pad, fs):
        return pl.pallas_call(
            _make_build_kernel(th, C, F, W, BR),
            grid=(Ht,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((th, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), fs.dtype),
            scratch_shapes=[
                pltpu.SMEM((2 * 1024,), jnp.int32),
                pltpu.VMEM((BR + C, 128), fs.dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=bool(interpret),
        )(starts_pad, fs)

    return _call(starts_pad, fs)


def table_build_pad_rows(C: int, tile_h: int = 16) -> int:
    """Zero rows required past N in ``table_build``'s fs operand."""
    return tile_h * C + C


@functools.partial(jax.jit, static_argnames=(
    "C", "r2", "d_max", "row_tile", "wv_only", "n_pay", "interpret"))
def grid_window(cand, own, *, C: int, r2: float, d_max: int,
                row_tile: int = 512, wv_only: bool = False,
                n_pay: int = 0, interpret=None):
    """cand (n_win, rows, W) window-major gathered cell rows (n_win = 9
    for the 3x3 side-r scheme with W=128, 4 for the 2x2 side-2r scheme
    with W=256), own (rows, 128) [px py vx vy id keep*n_win pad] ->
    (rows, OW): [idx (d_max, float ids, 0-filled) | val (d_max, 0/1) |
    st (6) | wv = (W v_prev)_row | cnt = in-degree | wpay (n_pay) |
    pad]. wv_only=True computes just the masked-v reduction (the
    candidate-window power-iteration matvec): out lane 0 = wv.
    n_pay>0 additionally folds the table's payload feature blocks
    (7..6+n_pay) as masked sums — the untruncated graph shift of each
    payload feature. interpret=None auto-enables Pallas interpret mode
    off-TPU (CPU tests)."""
    n_win, rows, W = cand.shape
    assert W % 128 == 0 and (7 + n_pay) * C <= W and n_win <= 9, \
        (W, C, n_win, n_pay)
    assert own.shape == (rows, 128), own.shape
    OW = 128 if wv_only else _out_width(d_max, n_pay)
    rt = min(row_tile, rows)
    assert rows % rt == 0, (rows, rt)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _make_kernel(C, r2, d_max, OW, wv_only, n_win, W, n_pay),
        grid=(rows // rt,),
        in_specs=[
            pl.BlockSpec((n_win, rt, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt, OW), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, OW), cand.dtype),
        # the selection loop + pipeline buffers want ~24 MB of VMEM at
        # row_tile=512 — above XLA's conservative 16 MB scoped default
        # but well inside the chip's physical VMEM
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=bool(interpret),
    )(cand, own)
