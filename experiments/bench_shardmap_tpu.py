"""Scaling evidence within one chip's reach (VERDICT r2 #9):

1. shard_map overhead at n_parts=1 on TPU for the SHIFT path: the ring
   sharded shift (one-device mesh: the ppermutes are self-sends) vs the
   unsharded band kernel — isolates the shard_map + collective-lowering
   cost from actual ICI traffic.
2. On-chip validation of the scattered-graph sharded BCSR shift
   (bcsr_shift_rect Pallas path) at n_parts=1: numerics vs dense.

Writes experiments/bench_shardmap_tpu.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "bench_shardmap_tpu.json"), "w", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def bench(fn, *args, iters=20):
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    emit(devices=str(jax.devices()))
    _ = float(jnp.sum(jnp.ones((8, 8))))
    from graph_neural_networks_tpu import parallel as par
    from graph_neural_networks_tpu.ops import spmm

    rng = np.random.default_rng(0)
    N, bw, R = 4096, 256, 512
    S = np.zeros((N, N), np.float32)
    ii = rng.integers(0, N, size=int(0.01 * N * N))
    jj = np.clip(ii + rng.integers(-bw, bw + 1, size=len(ii)), 0, N - 1)
    S[ii, jj] = rng.random(len(ii))

    # 1. unsharded band kernel
    sb_np, w = spmm.dense_to_band(S)
    sb = jnp.asarray(sb_np)
    x = jnp.asarray(rng.standard_normal((R, N)), jnp.float32)

    @jax.jit
    def un(x):
        return jax.lax.fori_loop(
            0, 8, lambda i, z: spmm.band_matmul(
                z, sb, n_cols=N, w=w,
                col_tile=spmm.auto_col_tile(N)), x)
    t_un = bench(un, x) / 8
    emit(tag="unsharded_band", t_shift_ms=t_un * 1e3)

    # 2. ring sharded shift on a 1-device mesh
    part = par.partition_nodes(S, 1)
    mesh = par.make_mesh((1, 1))
    sgso = par.ShardedGso(mesh, part)
    xp = jnp.asarray(part.pad_signal(
        np.asarray(x).reshape(R, 1, 1, N).transpose(1, 2, 0, 3)
        .reshape(1, 1, R, N)))

    @jax.jit
    def sh(xp):
        return jax.lax.fori_loop(0, 8, lambda i, z: sgso.shift(z), xp)
    t_sh = bench(sh, xp) / 8
    emit(tag="sharded_ring_p1", t_shift_ms=t_sh * 1e3,
         overhead_pct=100 * (t_sh - t_un) / t_un, uses_ring=sgso.uses_ring)

    # forced-boundary variant: at n_parts=1 the boundary slabs are
    # provably zero and the real shift skips the halo exchange; this
    # keeps the ppermute pair + correction einsums in (with zero
    # slabs), as the honest single-chip proxy for the per-shard work a
    # REAL P>1 ring pays on top of ICI time
    import functools
    from jax import shard_map
    from jax.sharding import PartitionSpec as SP
    from graph_neural_networks_tpu.parallel import shift as shf
    s_sq, s_sq_t, lo, hi = (jnp.asarray(a) for a in shf._sq_slabs(part))
    w_, ibs_, nbl_, halo_ = part.w, part.inner_bs, part.nbl, part.halo

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(SP(None, None, None, "graph"),
                  SP("graph", None, None, None, None),
                  SP("graph", None, None, None, None),
                  SP("graph", None, None, None, None, None),
                  SP("graph", None, None, None, None, None)),
        out_specs=SP(None, None, None, "graph"))
    def _forced(xb, a, b, c, d):
        fl = jax.lax.ppermute(xb[..., -halo_:], "graph", [])
        fr = jax.lax.ppermute(xb[..., :halo_], "graph", [])
        return shf._pallas_local_contract(xb, fl, fr, a[0], b[0],
                                          c[0], d[0], w_, ibs_, nbl_)

    @jax.jit
    def shf_forced(xp):
        return jax.lax.fori_loop(
            0, 8, lambda i, z: _forced(z, s_sq, s_sq_t, lo, hi), xp)
    t_fb = bench(shf_forced, xp) / 8
    emit(tag="sharded_ring_p1_forced_boundary", t_shift_ms=t_fb * 1e3,
         overhead_pct=100 * (t_fb - t_un) / t_un)

    # 3. scattered sharded BCSR on chip (n_parts=1): numerics + time
    ibs = 128
    Ssc = np.zeros((N, N), np.float32)
    nb = N // ibs
    for _ in range(96):
        bi, bj = rng.integers(0, nb, 2)
        Ssc[bi*ibs:(bi+1)*ibs, bj*ibs:(bj+1)*ibs] += \
            (rng.random((ibs, ibs)) < 0.3) * rng.random((ibs, ibs))
    bpart = par.partition_nodes_bcsr(Ssc, 1, inner_block=ibs)
    bshift = par.sharded_gshift_bcsr(mesh, bpart)
    xb = jnp.asarray(bpart.pad_signal(
        rng.standard_normal((1, 1, R, N)).astype(np.float32)))
    y = np.asarray(bshift(xb))
    y_ref = np.einsum("begn,enm->begm", np.asarray(xb), bpart.S_perm)
    err = float(np.max(np.abs(y - y_ref)) / (np.abs(y_ref).max() + 1e-9))
    emit(tag="sharded_bcsr_p1_check", rel_err=err, ok=err < 1e-4)

    @jax.jit
    def bsh(xb):
        return jax.lax.fori_loop(0, 8, lambda i, z: bshift(z), xb)
    t_b = bench(bsh, xb) / 8
    nnzb = int(bpart.nnzb.sum())
    flops = 2 * R * nnzb * ibs * ibs
    emit(tag="sharded_bcsr_p1", t_shift_ms=t_b * 1e3, nnzb=nnzb,
         executed_tflops=flops / t_b / 1e12)


if __name__ == "__main__":
    main()
