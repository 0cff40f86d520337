"""Gather probe phase 5: which exact program execution degrades the
already-compiled gather executable (probe4: same executable 0.064ms ->
12ms after running the N=256 preamble), and is the degradation global
(a dispatch/tunnel effect hitting every program) or gather-specific?

Protocol: time the target T (v3 gather at (4,16,1024)) and a control
matmul after each candidate trigger, one trigger per stage.

Writes JSON lines to experiments/probe_gather_tpu5.json.
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
OUT = os.path.join(HERE, "probe_gather_tpu5.json")
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
def matmul(a, b):
    return a @ b


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
    am = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.float32)
    bm = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.float32)

    def T_probe(stage):
        t = bench(v3, xr, idx, val, reps=5)
        tm = bench(matmul, am, bm, reps=5)
        emit(stage=stage, t_gather_ms=t * 1e3,
             gedges_s=edges / t / 1e9, t_matmul_ms=tm * 1e3)

    T_probe("0_cold")

    B2, T2, N2 = 4, 16, 256
    x256 = jnp.asarray(rng.standard_normal((B2, T2, G, N2)), jnp.float32)
    xr256 = jnp.asarray(rng.standard_normal((B2, T2, N2, 1, G)), jnp.float32)
    x5_256 = jnp.asarray(rng.standard_normal((B2, T2, 1, G, N2)), jnp.float32)
    i256, v256 = gso(rng, B2, T2, N2, D)

    jax.block_until_ready(v3(xr256, i256, v256))
    T_probe("1_after_v3_at_256")

    jax.block_until_ready(one_shift(x5_256, i256, v256, "rows"))
    T_probe("2_after_oneshift_rows_256")

    jax.block_until_ready(one_shift(x5_256, i256, v256, "flat"))
    T_probe("3_after_oneshift_flat_256")

    jax.block_until_ready(lsigf_ell(h, x256, i256, v256))
    T_probe("4_after_lsigf_ell_256")

    Sd256 = jnp.asarray(ell_lib.ell_to_dense(ell_lib.EllGso(i256, v256)))
    T_probe("5_after_h2d_transfer")

    jax.block_until_ready(lsigf_dense(h, x256, Sd256))
    T_probe("6_after_lsigf_dense_256")

    # does it recover after a pause?
    time.sleep(10)
    T_probe("7_after_sleep10")

    emit(done=True)


if __name__ == "__main__":
    main()
