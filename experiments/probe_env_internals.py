"""Split the ~280 ms/step N=16384 env cost into its parts.

probe_rollout_breakdown.json round 3 showed the earlier "env_only =
16.6 ms" was a DCE artifact: with full dependence on all env outputs
(idx/val from top_k, states, power-iteration v) the env step costs
~284 ms.  This probe times each part with forced dependence, and
benchmarks candidate replacements for the top_k neighbor-list build:

  - mask+states only               (the pairwise-distance work)
  - top_k  (current single-stage)  on the (B, chunk, N) binary mask
  - blocked two-stage top_k        (_topk_blocked, block=2048/1024/512)
  - cumsum + min-reduce            (first-D-set-bits via rank compare)
  - iterative argmax               (D passes)
  - power iteration alone          (ell matvec x lam_iters)

Writes JSON lines to experiments/probe_env_internals.json.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from graph_neural_networks_tpu.data import flocking as F
from graph_neural_networks_tpu.ops import ell as ell_lib

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "probe_env_internals.json")
out_f = open(OUT, "w", buffering=1)
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
        r = g(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best / REPEAT * 1e3


def dep(x):
    """Scalar dependence on every element of a pytree."""
    return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
               for l in jax.tree_util.tree_leaves(x))


def main():
    emit(devices=str(jax.devices()), repeat=REPEAT)
    _ = float(jnp.sum(jnp.ones((8, 8))))
    N = int(os.environ.get("PROBE_N", 16384))
    B, D = 1, 32
    chunk = min(4096, N)
    rng = np.random.default_rng(0)

    env = F.Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                 samplingTime=0.01,
                                 rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, B, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    pos = jnp.asarray(ip, jnp.float32)
    vel = jnp.asarray(iv, jnp.float32)
    v0 = jnp.ones((B, N), jnp.float32) / np.sqrt(N)

    r2 = 2.0 ** 2
    cols = jnp.arange(N)

    def mask_states_only(pos, vel):
        def one(lo):
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
            return mf.sum(), st
        s, sts = jax.lax.map(one, jnp.arange(N // chunk) * chunk)
        return s.sum() + dep(sts)

    def body_fori(step1, carry0):
        def chain(c):
            def body(i, c):
                out = step1(c)
                return jax.tree_util.tree_map(
                    lambda a, b: a + 0.0 * b.astype(a.dtype).reshape(-1)[0],
                    c, out) if isinstance(out, tuple) else c + 0.0 * out
            return jax.lax.fori_loop(0, REPEAT, body, c)
        return chain

    # 1. mask + states only (full dependence, chained)
    def chain_mask_states(pos, vel):
        def body(i, p):
            s = mask_states_only(p, vel)
            return p + 0.0 * s
        return jax.lax.fori_loop(0, REPEAT, body, pos)
    emit(tag="mask_states_only", N=N, t_ms=timeit(chain_mask_states, pos, vel))

    # Precompute a realistic mask chunk list for top_k probes (one chunk
    # (B, chunk, N) per step; total work = N/chunk x per-chunk topk).
    def build_mask(pos):
        def one(lo):
            pr = jax.lax.dynamic_slice(pos, (0, 0, lo), (B, 2, chunk))
            dp = pr[..., :, None] - pos[:, :, None, :]
            d2 = jnp.sum(dp ** 2, axis=1)
            rows = lo + jnp.arange(chunk)
            m = ((d2 <= r2)
                 & (cols[None, None, :] != rows[None, :, None]))
            return m.astype(pos.dtype)
        return jax.lax.map(one, jnp.arange(N // chunk) * chunk)
    mf_all = jax.jit(build_mask)(pos)   # (nc, B, chunk, N)
    jax.block_until_ready(mf_all)
    emit(tag="mask_shape", shape=list(mf_all.shape),
         avg_deg=float(mf_all.sum() / N))

    def chain_over(fn):
        # chain REPEAT applications of fn(mf_all) -> (idx, val)
        def c(mf_all):
            def body(i, acc):
                idx, val = fn(mf_all)
                return acc + dep(idx) + dep(val)
            return jax.lax.fori_loop(0, REPEAT, body, 0.0)
        return c

    # 2. current single-stage top_k per chunk
    def topk_single(mf_all):
        def one(mf):
            v, i = jax.lax.top_k(mf, D)
            return i.astype(jnp.int32), v
        i, v = jax.lax.map(one, mf_all)
        return i, v
    emit(tag="topk_single", N=N, t_ms=timeit(chain_over(topk_single), mf_all))

    # 3. blocked two-stage top_k
    for blk in (4096, 2048, 1024, 512):
        def topk_blk(mf_all, blk=blk):
            def one(mf):
                v, i = F._topk_blocked(mf, D, blk)
                return i.astype(jnp.int32), v
            i, v = jax.lax.map(one, mf_all)
            return i, v
        emit(tag=f"topk_blocked_{blk}", N=N,
             t_ms=timeit(chain_over(topk_blk), mf_all))

    # 4. cumsum + min-reduce (first-D-set-bits): rank r_j = cumsum(m)_j;
    #    idx_d = min { j : m_j & r_j == d+1 }.  Binary masks only.
    def first_d_minreduce(mf_all):
        def one(mf):
            m = mf > 0
            r = jnp.cumsum(m.astype(jnp.int32), axis=-1)      # B,chunk,N
            # process the D axis in one broadcast reduce
            tgt = jnp.arange(1, D + 1, dtype=jnp.int32)
            cand = jnp.where((m[..., None]) & (r[..., None] == tgt),
                             cols[None, None, :, None], N)
            idx = jnp.min(cand, axis=-2)                      # B,chunk,D
            valid = idx < N
            idx = jnp.where(valid, idx, 0)
            return idx.astype(jnp.int32), valid.astype(mf.dtype)
        i, v = jax.lax.map(one, mf_all)
        return i, v
    emit(tag="first_d_minreduce", N=N,
         t_ms=timeit(chain_over(first_d_minreduce), mf_all))

    # 5. iterative argmax (D passes, masking out found entries)
    def iter_argmax(mf_all):
        def one(mf):
            def body(d, c):
                m, idx, val = c
                j = jnp.argmax(m, axis=-1)                    # B,chunk
                v = jnp.take_along_axis(m, j[..., None], -1)[..., 0]
                m = m * (1.0 - jax.nn.one_hot(j, N, dtype=m.dtype))
                idx = idx.at[..., d].set(j.astype(jnp.int32))
                val = val.at[..., d].set(v)
                return m, idx, val
            idx0 = jnp.zeros((*mf.shape[:-1], D), jnp.int32)
            val0 = jnp.zeros((*mf.shape[:-1], D), mf.dtype)
            _, idx, val = jax.lax.fori_loop(0, D, body, (mf, idx0, val0))
            return idx, val
        i, v = jax.lax.map(one, mf_all)
        return i, v
    emit(tag="iter_argmax", N=N, t_ms=timeit(chain_over(iter_argmax), mf_all))

    # 6. power iteration alone (lam_iters=8), on a realistic ELL graph
    # (reassemble the real env ELL from all chunks)
    vs, is_ = jax.lax.map(lambda mf: F._env_topk(mf, D), mf_all)
    idx = jnp.moveaxis(is_, 0, 1).reshape(B, N, D).astype(jnp.int32)
    val = jnp.moveaxis(vs, 0, 1).reshape(B, N, D)
    jax.block_until_ready((idx, val))

    def power_iter(idx, val, v0):
        ell = ell_lib.EllGso(idx, val[:, None])
        def mv(v):
            return ell_lib.ell_shift(v[:, None, None, :], ell)[:, 0, 0]
        def body(_, v):
            w = mv(v)
            return w / jnp.maximum(
                jnp.linalg.norm(w, axis=-1, keepdims=True), F.ZERO_TOL)
        def chain(i, v):
            v = jax.lax.fori_loop(0, 8, body, v)
            lam = jnp.einsum("bn,bn->b", v, mv(v))
            return v + 0.0 * lam[:, None]
        return jax.lax.fori_loop(0, REPEAT, chain, v0)
    emit(tag="power_iter_8", N=N, t_ms=timeit(power_iter, idx, val, v0))

    # 6b. the REAL combined env step, full dependence, chained — and
    # knockout variants to find where the 280 ms hides.
    def chain_env(fn):
        def c(pos, vel, v0):
            def body(i, c):
                p, v = c
                out = fn(p, vel, v0)
                return p + 0.0 * dep(out), v
            return jax.lax.fori_loop(0, REPEAT, body, (pos, v0))
        return c

    def env_full(pos, vel, v0):
        return F._jnp_env_step_chunked(pos, vel, 2.0, D, chunk, v0)
    emit(tag="env_real_full", N=N,
         t_ms=timeit(chain_env(env_full), pos, vel, v0))

    def env_no_power(pos, vel, v0):
        idx, val, st, v = F._jnp_env_step_chunked(
            pos, vel, 2.0, D, chunk, v0, lam_iters=0)
        return idx, val, st
    emit(tag="env_real_lam0", N=N,
         t_ms=timeit(chain_env(env_no_power), pos, vel, v0))

    def env_lam1(pos, vel, v0):
        return F._jnp_env_step_chunked(pos, vel, 2.0, D, chunk, v0,
                                       lam_iters=1)
    emit(tag="env_real_lam1", N=N,
         t_ms=timeit(chain_env(env_lam1), pos, vel, v0))

    # drop states dependence only (idx/val/v still used)
    def env_no_states_dep(pos, vel, v0):
        idx, val, st, v = F._jnp_env_step_chunked(pos, vel, 2.0, D,
                                                  chunk, v0)
        return idx, val, v
    emit(tag="env_real_no_states_dep", N=N,
         t_ms=timeit(chain_env(env_no_states_dep), pos, vel, v0))

    # drop idx/val dependence only
    def env_no_idx_dep(pos, vel, v0):
        idx, val, st, v = F._jnp_env_step_chunked(pos, vel, 2.0, D,
                                                  chunk, v0)
        return st, v
    emit(tag="env_real_no_idx_dep", N=N,
         t_ms=timeit(chain_env(env_no_idx_dep), pos, vel, v0))

    # 7. parity check: minreduce == topk on binary masks
    i_tk, v_tk = jax.jit(topk_single)(mf_all)
    i_mr, v_mr = jax.jit(first_d_minreduce)(mf_all)
    # topk on binary returns set bits in ascending index order (stable)
    ok_idx = bool(jnp.all(jnp.where(v_tk > 0, i_tk, -1)
                          == jnp.where(v_mr > 0, i_mr, -1)))
    ok_val = bool(jnp.all(v_tk == v_mr))
    emit(tag="parity_minreduce_vs_topk", ok_idx=ok_idx, ok_val=ok_val)

    emit(done=True)


if __name__ == "__main__":
    main()
