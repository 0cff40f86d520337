"""Primitive costs for a cell-list (grid-binned) O(N*k) swarm env step
on TPU: sort/argsort of N keys, bincount (scatter-add), exclusive
cumsum, per-cell window row-gathers, inverse-permutation row gathers.

Writes experiments/probe_grid_primitives.json.
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
out_f = open(os.path.join(HERE, "probe_grid_primitives.json"), "w",
             buffering=1)
REPEAT = 20


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
    rng = np.random.default_rng(0)
    for N in (16384, 65536, 262144):
        H = 2 * N
        C = 16
        keys = jnp.asarray(rng.integers(0, H, N), jnp.int32)
        vals = jnp.asarray(rng.normal(size=(N, 8)), jnp.float32)

        emit(tag="sort_keys", N=N, t_ms=timeit(
            lambda k: jnp.sort(k), keys))
        emit(tag="argsort_keys", N=N, t_ms=timeit(
            lambda k: jnp.argsort(k), keys))
        emit(tag="sort_pairs", N=N, t_ms=timeit(
            lambda k: jax.lax.sort_key_val(k, jnp.arange(N)), keys))
        emit(tag="bincount_H", N=N, H=H, t_ms=timeit(
            lambda k: jnp.zeros(H, jnp.int32).at[k].add(1), keys))
        emit(tag="cumsum_H", N=N, H=H, t_ms=timeit(
            lambda c: jnp.cumsum(c), jnp.ones(H, jnp.int32)))
        emit(tag="cummax_N", N=N, t_ms=timeit(
            lambda k: jax.lax.cummax(k), keys))

        # per-cell window gather: H cells x 9 windows of C rows, width 8
        starts = jnp.asarray(rng.integers(0, N - C, (H, 9)), jnp.int32)

        def window_gather(vals, starts):
            # gather (H, 9, C, 8) via take of row blocks: index rows
            idx = starts[:, :, None] + jnp.arange(C)[None, None, :]
            return jnp.take(vals, idx.reshape(-1), axis=0)
        emit(tag="window_gather_rows", N=N, H=H, C=C,
             rows=H * 9 * C,
             t_ms=timeit(window_gather, vals, starts))

        # contiguous-window alternative: dynamic_slice per (cell,window)
        def window_dslice(vals, starts):
            def one(s9):
                return jax.vmap(
                    lambda s: jax.lax.dynamic_slice(vals, (s, 0), (C, 8))
                )(s9)
            return jax.lax.map(one, starts)
        emit(tag="window_dslice", N=N, H=H, C=C,
             t_ms=timeit(window_dslice, vals, starts))

        # inverse-perm row gather (policy signal permute): N rows width 32
        wide = jnp.asarray(rng.normal(size=(N, 32)), jnp.float32)
        perm = jnp.asarray(rng.permutation(N), jnp.int32)
        emit(tag="perm_rows_w32", N=N, t_ms=timeit(
            lambda v, p: jnp.take(v, p, axis=0), wide, perm))

        # scatter rows back (the unsort)
        emit(tag="scatter_rows_w32", N=N, t_ms=timeit(
            lambda v, p: jnp.zeros_like(v).at[p].set(v), wide, perm))

        # element-level gather of N*D ids (ELL id translation)
        D = 32
        idx = jnp.asarray(rng.integers(0, N, (N, D)), jnp.int32)
        emit(tag="id_translate_ND", N=N, D=D, t_ms=timeit(
            lambda o, i: jnp.take(o, i.reshape(-1)), perm, idx))
    emit(done=True)


if __name__ == "__main__":
    main()
