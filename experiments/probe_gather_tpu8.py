"""Probe 8: per-row cost of the TPU sublane gather vs feature width C,
in TRUE sync mode with on-device fori chaining (the probe-4..7
protocol). If the cost is ~flat in C, wide rows amortize the row
latency — the GRNN register shift (C = K*H) rides this; narrow filters
(C = E*G = 6) are latency-bound and should prefer dense at small N.

Writes JSON lines to experiments/probe_gather_tpu8.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from graph_neural_networks_tpu.ops import ell as ell_lib

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "probe_gather_tpu8.json")
out_f = open(OUT, "w", buffering=1)
REPEAT = 30


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def device_time(fn, *args, iters=3):
    r = fn(*args)
    r.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        r.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best / REPEAT


@jax.jit
def chain(xr, idx, val):
    e = ell_lib.EllGso(idx, val)
    return jax.lax.fori_loop(
        0, REPEAT, lambda i, z: ell_lib.ell_shift_rows(z, e), xr)


def main():
    emit(devices=str(jax.devices()), repeat=REPEAT)
    _ = float(jnp.sum(jnp.ones((8, 8))))     # force sync mode
    rng = np.random.default_rng(0)
    D = 16

    for (Bf, N) in [(16, 4096), (8, 65536)]:
        for C in (8, 32, 128, 512):
            if N * C > 16 * (1 << 20):        # cap operand at 64MB f32
                continue
            xr = jnp.asarray(
                rng.standard_normal((Bf, N, 1, C)), jnp.float32)
            idx = jnp.asarray(rng.integers(0, N, (Bf, N, D)), jnp.int32)
            val = jnp.asarray(rng.random((Bf, 1, N, D)) / D, jnp.float32)
            rows = Bf * N * D
            t = device_time(chain, xr, idx, val)
            emit(Bf=Bf, N=N, C=C, t_ms=t * 1e3,
                 ns_per_row=t * 1e9 / rows,
                 grows_s=rows / t / 1e9,
                 eff_gb_s=rows * C * 4 / t / 1e9)

    emit(done=True)


if __name__ == "__main__":
    main()
