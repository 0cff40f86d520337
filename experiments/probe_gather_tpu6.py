"""Probe 6: characterize the axon-tunnel dispatch degradation triggered
by host->device transfers (probe5: a ~17MB jnp.asarray flips EVERY
subsequent execution from ~0.03ms to 5-12ms per call, permanently).

Questions:
  (a) what transfer size flips it? (1,2,4,8,16,32 MB)
  (b) does an on-device fori_loop(repeat) amortize the degraded
      per-dispatch cost (i.e. is it per-dispatch or per-op)?
  (c) does chunked transfer (many small device_puts + device-side
      concatenate) avoid the flip?

Writes JSON lines to experiments/probe_gather_tpu6.json.
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
OUT = os.path.join(HERE, "probe_gather_tpu6.json")
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
def matmul(a, b):
    return a @ b


def fori_matmul(n):
    @jax.jit
    def f(a, b):
        return jax.lax.fori_loop(
            0, n, lambda i, z: z @ b, a)
    return f


def main():
    emit(devices=str(jax.devices()))
    rng = np.random.default_rng(0)
    am = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.float32)
    bm = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.float32)
    f100 = fori_matmul(100)
    f1000 = fori_matmul(1000)

    def T(stage):
        t1 = bench(matmul, am, bm, reps=5)
        t2 = bench(f100, am, bm, reps=2)
        emit(stage=stage, t_matmul_ms=t1 * 1e3, t_fori100_ms=t2 * 1e3,
             per_op_fori100_us=t2 * 1e6 / 100)

    T("0_cold")

    # (a) escalating transfer sizes
    for mb in (1, 2, 4, 8, 12, 16, 32):
        arr = rng.standard_normal(mb * 131072).astype(np.float32)  # mb MB
        z = jnp.asarray(arr)
        jax.block_until_ready(z)
        del z
        T(f"1_after_{mb}MB_transfer")

    # (b) big fori amortization in the (presumably) degraded state
    t3 = bench(f1000, am, bm, reps=1)
    emit(stage="2_fori1000", t_ms=t3 * 1e3, per_op_us=t3 * 1e6 / 1000)

    emit(done=True)


if __name__ == "__main__":
    main()
