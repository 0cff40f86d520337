"""Gather probe phase 4: bisect WHY the same jitted ell_shift_rows at the
same shapes is fast in probe processes but 160x slower inside
bench_ell_tpu.py. Hypothesis: process history — some earlier compile or
allocation flips the gather emitter or degrades execution.

Stages (all in ONE process, timing the same target after each):
  T  = time v3 (jit ell_shift_rows) at (4,16,1024,D=16,G=6)
  0. T cold (fresh process)            -> expect fast (probe3 saw 0.05ms)
  1. run the bench's N=256 config preamble (all five compiled fns), T
  2. compile + run one_shift layout='flat' at N=1024, T
  3. run lsigf_dense at N=1024 (dense einsum path), T
  4. allocate the dense Sd for N=4096 (1 GB) and run lsigf_dense, T
  5. re-time with a FRESH jit wrapper of the same python fn, T

Writes JSON lines to experiments/probe_gather_tpu4.json.
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

from graph_neural_networks_tpu.ops import ell as ell_lib
from graph_neural_networks_tpu.ops import filters

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "probe_gather_tpu4.json")
out_f = open(OUT, "w", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def bench(fn, *args, reps=5):
    y = fn(*args)
    jax.block_until_ready(y)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(*args)
        jax.block_until_ready(y)
        ts.append((time.perf_counter() - t0) / reps)
    return float(np.median(ts))


@jax.jit
def v3(x5, idx4, val5):
    return ell_lib.ell_shift_rows(x5, ell_lib.EllGso(idx4, val5))


@jax.jit
def lsigf_ell(h, x, idx, val):
    return filters.lsigf_db(h, ell_lib.EllGso(idx, val), x)


@jax.jit
def lsigf_dense(h, x, S):
    return filters.lsigf_db(h, S, x)


@partial(jax.jit, static_argnames="layout")
def one_shift(x5, idx, val, layout):
    return ell_lib.ell_shift(x5, ell_lib.EllGso(idx, val), layout=layout)


def gso(rng, B, T, N, deg):
    idx = rng.integers(0, N, (B, T, N, deg)).astype(np.int32)
    val = (rng.random((B, T, 1, N, deg)) / deg).astype(np.float32)
    return jnp.asarray(idx), jnp.asarray(val)


def main():
    emit(devices=str(jax.devices()))
    rng = np.random.default_rng(0)
    D, G = 16, 6
    F, K = 4, 3
    h = jnp.asarray(rng.standard_normal((F, 1, K, G)), jnp.float32)

    B, T, N = 4, 16, 1024
    xr = jnp.asarray(rng.standard_normal((B, T, N, 1, G)), jnp.float32)
    idx, val = gso(rng, B, T, N, D)
    edges = B * T * N * D

    def T_probe(stage):
        t = bench(v3, xr, idx, val, reps=5)
        emit(stage=stage, t_ms=t * 1e3, gedges_s=edges / t / 1e9)

    T_probe("0_cold")

    # 1. bench preamble at N=256
    B2, T2, N2 = 4, 16, 256
    x256 = jnp.asarray(rng.standard_normal((B2, T2, G, N2)), jnp.float32)
    xr256 = jnp.asarray(rng.standard_normal((B2, T2, N2, 1, G)), jnp.float32)
    x5_256 = jnp.asarray(rng.standard_normal((B2, T2, 1, G, N2)), jnp.float32)
    i256, v256 = gso(rng, B2, T2, N2, D)
    jax.block_until_ready(v3(xr256, i256, v256))
    jax.block_until_ready(one_shift(x5_256, i256, v256, "rows"))
    jax.block_until_ready(one_shift(x5_256, i256, v256, "flat"))
    jax.block_until_ready(lsigf_ell(h, x256, i256, v256))
    Sd256 = jnp.asarray(ell_lib.ell_to_dense(ell_lib.EllGso(i256, v256)))
    jax.block_until_ready(lsigf_dense(h, x256, Sd256))
    T_probe("1_after_n256_preamble")

    # 2. flat layout at N=1024
    x5_1024 = jnp.asarray(rng.standard_normal((B, T, 1, G, N)), jnp.float32)
    jax.block_until_ready(one_shift(x5_1024, idx, val, "flat"))
    T_probe("2_after_flat_1024")

    # 3. dense lsigf at N=1024
    Sd = jnp.asarray(ell_lib.ell_to_dense(ell_lib.EllGso(idx, val)))
    jax.block_until_ready(lsigf_dense(h, jnp.asarray(
        rng.standard_normal((B, T, G, N)), jnp.float32), Sd))
    T_probe("3_after_dense_1024")

    # 5. fresh jit wrapper, same python fn
    v3b = jax.jit(lambda a, b, c: ell_lib.ell_shift_rows(
        a, ell_lib.EllGso(b, c)))
    t = bench(v3b, xr, idx, val, reps=5)
    emit(stage="5_fresh_wrapper", t_ms=t * 1e3, gedges_s=edges / t / 1e9)

    emit(done=True)


if __name__ == "__main__":
    main()
