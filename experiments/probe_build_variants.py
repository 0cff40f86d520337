"""Probe cell-table build variants and gather locality at N=262144.

Build variants:
  A. current: (H*C, 7) row scatter + (H,C,7)->(H,7,C) transpose (41 ms
     — the transpose relayout pads 16x)
  B. flat fancy scatter: one scatter of (N, 7) elements at positions
     hs*W + f*C + rankl into the flat (H*W,) table (no transpose)
  C. member-blocked: (H*C, 8) ROW scatter + free bitcast to (H, 128)
     (the kernel would have to de-interleave 16 members x 8 features)

Gather variants at (H, 128):
  * h9 from raw agent order (current)
  * h9 from cell-sorted agents (consecutive agents hit neighboring
    cells -> DRAM locality), plus the cost of un-sorting 3 outputs.

Writes experiments/probe_build_variants.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from graph_neural_networks_tpu.data import flocking as F

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "probe_build_variants.json"), "w",
             buffering=1)
REPEAT = 10


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def timeit(fn, *args):
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPEAT):
            r = g(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best / REPEAT * 1e3


def main():
    emit(devices=str(jax.devices()), repeat=REPEAT)
    _ = float(jnp.sum(jnp.ones((8, 8))))
    N = 262144
    r = 2.0
    inv_r = 1.0 / r
    env = F.Flocking.for_rollout(N, commRadius=r, repelDist=1.0,
                                 samplingTime=0.01,
                                 rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, 1, r, minDist=env.initMinDist, geometry="circular",
        xMaxInitVel=3.0, yMaxInitVel=3.0)
    px = jnp.asarray(ip[0, 0], jnp.float32)
    py = jnp.asarray(ip[0, 1], jnp.float32)
    vx = jnp.asarray(iv[0, 0], jnp.float32)
    vy = jnp.asarray(iv[0, 1], jnp.float32)
    v0 = jnp.ones((N,), jnp.float32) / np.sqrt(N)
    H, Gx, Gy, C = F._grid_geometry(N, None, 16)
    W = 128

    def common(px, py):
        cx = jnp.floor(px * inv_r).astype(jnp.int32)
        cy = jnp.floor(py * inv_r).astype(jnp.int32)
        h = F._grid_hash(cx, cy, Gx, Gy)
        iota = jnp.arange(N, dtype=jnp.int32)
        hs, order = jax.lax.sort_key_val(h, iota)
        flag = jnp.concatenate([jnp.ones((1,), jnp.int32),
                                (hs[1:] != hs[:-1]).astype(jnp.int32)])
        seg_start = jax.lax.cummax(jnp.where(flag > 0, iota, 0))
        rank = iota - seg_start
        rankl = jnp.minimum(rank, C - 1)
        return cx, cy, hs, order, rankl

    def feats(px, py, vx, vy, v0, order):
        f = jnp.stack([px, py, vx, vy, jnp.ones_like(px),
                       jnp.arange(N, dtype=jnp.float32), v0], axis=-1)
        return jnp.take(f, order, axis=0)

    # -- A: current build --------------------------------------------------
    def build_a(px, py, vx, vy, v0):
        out = F._grid_build_table(px, py, vx, vy, inv_r, H, Gx, Gy, C,
                                  v=v0)
        return out[0]
    emit(tag="build_A_current", t_ms=timeit(build_a, px, py, vx, vy, v0))

    # -- B: flat fancy scatter ----------------------------------------------
    def build_b(px, py, vx, vy, v0):
        cx, cy, hs, order, rankl = common(px, py)
        fs = feats(px, py, vx, vy, v0, order)
        base = hs.astype(jnp.int32) * W + rankl
        pos = base[:, None] + (jnp.arange(7, dtype=jnp.int32) * C)[None]
        flat = jnp.zeros((H * W,), px.dtype).at[pos].set(fs, mode="drop")
        return flat.reshape(H, W)
    emit(tag="build_B_flatscatter",
         t_ms=timeit(build_b, px, py, vx, vy, v0))
    ta = jax.jit(build_a)(px, py, vx, vy, v0)
    tb = jax.jit(build_b)(px, py, vx, vy, v0)
    emit(tag="build_B_equal",
         equal=bool(jnp.all(ta == tb)))

    # -- C: member-blocked row scatter --------------------------------------
    def build_c(px, py, vx, vy, v0):
        cx, cy, hs, order, rankl = common(px, py)
        fs = feats(px, py, vx, vy, v0, order)           # (N, 7)
        fs8 = jnp.concatenate([fs, jnp.zeros((N, 1), px.dtype)], axis=1)
        slot = hs * C + rankl
        tbl = jnp.zeros((H * C, 8), px.dtype).at[slot].set(fs8,
                                                           mode="drop")
        return tbl.reshape(H, 128)
    emit(tag="build_C_memberrows",
         t_ms=timeit(build_c, px, py, vx, vy, v0))

    # -- gather: raw vs sorted agent order ----------------------------------
    offs = jnp.array([(dx, dy) for dx in (-1, 0, 1)
                      for dy in (-1, 0, 1)], jnp.int32)
    cx, cy, hs, order, rankl = jax.jit(common)(px, py)
    cell_rows = tb

    def gather(cell_rows, cxa, cya):
        h9 = F._grid_hash(cxa[:, None] + offs[None, :, 0],
                          cya[:, None] + offs[None, :, 1], Gx, Gy)
        cand = jnp.take(cell_rows, jnp.swapaxes(h9, 0, 1).reshape(-1),
                        axis=0)
        return jnp.sum(cand[:, :1])
    emit(tag="gather_raw_order",
         t_ms=timeit(gather, cell_rows, cx, cy))
    cxs = jnp.take(cx, order)
    cys = jnp.take(cy, order)
    emit(tag="gather_sorted_order",
         t_ms=timeit(gather, cell_rows, cxs, cys))

    # agent-major (rows*9) gather vs window-major (9*rows), sorted
    def gather_agent_major(cell_rows, cxa, cya):
        h9 = F._grid_hash(cxa[:, None] + offs[None, :, 0],
                          cya[:, None] + offs[None, :, 1], Gx, Gy)
        cand = jnp.take(cell_rows, h9.reshape(-1), axis=0)
        return jnp.sum(cand[:, :1])
    emit(tag="gather_sorted_agentmajor",
         t_ms=timeit(gather_agent_major, cell_rows, cxs, cys))

    # un-sort cost: scatter 3 result arrays (N, 32ish) back to raw order
    idx_s = jnp.zeros((N, 32), jnp.int32)
    val_s = jnp.zeros((N, 32), jnp.float32)
    st_s = jnp.zeros((6, N), jnp.float32)

    def unsort(idx_s, val_s, st_s, order):
        i = jnp.zeros_like(idx_s).at[order].set(idx_s)
        v = jnp.zeros_like(val_s).at[order].set(val_s)
        s = jnp.zeros_like(st_s).at[:, order].set(st_s)
        return (jnp.sum(i[:, 0]) + jnp.sum(v[:, 0]) + jnp.sum(s[:, 0]))
    emit(tag="unsort_outputs",
         t_ms=timeit(unsort, idx_s, val_s, st_s, order))
    emit(done=True)


if __name__ == "__main__":
    main()
