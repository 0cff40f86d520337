"""Why does the combined env map body cost 284 ms when its parts sum
to ~41 ms?  Suspicion: fusing lax.top_k with the big masked reductions
in ONE lax.map body makes XLA rematerialize the (B,chunk,N) workspaces
per top_k sort pass.  Compare:

  A. combined body (the current _jnp_env_step_chunked layout)
  B. two separate lax.maps over the same chunks (recompute d2 twice)
  C. combined body but top_k replaced by the cumsum/min-reduce first-D
  D. combined, top_k on a checkpointed (optimization-barriered) mask
  E. B with blocked topk 1024

Writes experiments/probe_env_fusion.json.
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
out_f = open(os.path.join(HERE, "probe_env_fusion.json"), "w", buffering=1)
REPEAT = 10


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def dep(x):
    return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
               for l in jax.tree_util.tree_leaves(x))


def timeit(fn, *args):
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = g(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best / REPEAT * 1e3


def main():
    emit(devices=str(jax.devices()), repeat=REPEAT)
    _ = float(jnp.sum(jnp.ones((8, 8))))
    N = int(os.environ.get("PROBE_N", 16384))
    B, D = 1, 32
    chunk = min(4096, N)
    env = F.Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                 samplingTime=0.01,
                                 rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, B, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    pos = jnp.asarray(ip, jnp.float32)
    vel = jnp.asarray(iv, jnp.float32)
    r2 = 2.0 ** 2
    cols = jnp.arange(N)

    def mask_states(lo, pos, vel):
        pr = jax.lax.dynamic_slice(pos, (0, 0, lo), (B, 2, chunk))
        vr = jax.lax.dynamic_slice(vel, (0, 0, lo), (B, 2, chunk))
        dp = pr[..., :, None] - pos[:, :, None, :]
        d2 = jnp.sum(dp ** 2, axis=1)
        rows = lo + jnp.arange(chunk)
        m = ((d2 <= r2) & (jnp.exp(-d2) > F.ZERO_TOL)
             & (cols[None, None, :] != rows[None, :, None]))
        mf = m.astype(pos.dtype)
        dv = vr[..., :, None] - vel[:, :, None, :]
        inv = jnp.where(d2 > F.ZERO_TOL, 1.0 / d2, 0.0) * mf
        inv = inv[:, None]
        mfe = mf[:, None]
        st = jnp.concatenate(
            [jnp.sum(dv * mfe, -1), jnp.sum(dp * inv ** 2, -1),
             jnp.sum(dp * inv, -1)], axis=-2)
        return mf, st

    def chain(fn):
        def c(pos, vel):
            def body(i, p):
                return p + 0.0 * dep(fn(p, vel))
            return jax.lax.fori_loop(0, REPEAT, body, pos)
        return c

    los = jnp.arange(N // chunk) * chunk

    # A. combined (current env layout)
    def combined(pos, vel):
        def one(lo):
            mf, st = mask_states(lo, pos, vel)
            val, idx = jax.lax.top_k(mf, D)
            return idx.astype(jnp.int32), val, st
        return jax.lax.map(one, los)
    emit(tag="A_combined", t_ms=timeit(chain(combined), pos, vel))

    # B. two separate maps (d2 computed twice)
    def separate(pos, vel):
        def one_st(lo):
            mf, st = mask_states(lo, pos, vel)
            return st
        def one_tk(lo):
            mf, _ = mask_states(lo, pos, vel)
            val, idx = jax.lax.top_k(mf, D)
            return idx.astype(jnp.int32), val
        sts = jax.lax.map(one_st, los)
        idx, val = jax.lax.map(one_tk, los)
        return idx, val, sts
    emit(tag="B_separate_maps", t_ms=timeit(chain(separate), pos, vel))

    # C. combined with first-D min-reduce instead of top_k
    def combined_minreduce(pos, vel):
        def one(lo):
            mf, st = mask_states(lo, pos, vel)
            m = mf > 0
            r = jnp.cumsum(m.astype(jnp.int32), axis=-1)
            tgt = jnp.arange(1, D + 1, dtype=jnp.int32)
            cand = jnp.where((m[..., None]) & (r[..., None] == tgt),
                             cols[None, None, :, None], N)
            idx = jnp.min(cand, axis=-2)
            valid = idx < N
            idx = jnp.where(valid, idx, 0)
            return idx.astype(jnp.int32), valid.astype(mf.dtype), st
        return jax.lax.map(one, los)
    emit(tag="C_combined_minreduce",
         t_ms=timeit(chain(combined_minreduce), pos, vel))

    # D. combined, top_k behind an optimization barrier
    def combined_barrier(pos, vel):
        def one(lo):
            mf, st = mask_states(lo, pos, vel)
            mfb = jax.lax.optimization_barrier(mf)
            val, idx = jax.lax.top_k(mfb, D)
            return idx.astype(jnp.int32), val, st
        return jax.lax.map(one, los)
    emit(tag="D_combined_barrier",
         t_ms=timeit(chain(combined_barrier), pos, vel))

    # E. combined with blocked top_k 1024
    def combined_blk(pos, vel):
        def one(lo):
            mf, st = mask_states(lo, pos, vel)
            val, idx = F._topk_blocked(mf, D, 1024)
            return idx.astype(jnp.int32), val, st
        return jax.lax.map(one, los)
    emit(tag="E_combined_blocked1024",
         t_ms=timeit(chain(combined_blk), pos, vel))

    # parity: C == A indices where valid
    iA, vA, _ = jax.jit(combined)(pos, vel)
    iC, vC, _ = jax.jit(combined_minreduce)(pos, vel)
    ok = bool(jnp.all(jnp.where(vA > 0, iA, -1) == jnp.where(vC > 0, iC, -1))
              and jnp.all(vA == vC))
    emit(tag="parity_C_vs_A", ok=ok)
    emit(done=True)


if __name__ == "__main__":
    main()
