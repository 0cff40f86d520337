"""Probe 7: confirm the axon-tunnel degradation trigger is DEVICE->HOST
transfer (probe6 ruled out h2d up to 32MB; every historical slowdown in
probes 1-5 follows the process's first d2h — float() scalar pulls,
np.asarray of device arrays in ell_to_dense).

Also: does fori_loop amortize the degraded dispatch, and does anything
recover it?

Writes JSON lines to experiments/probe_gather_tpu7.json.
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
OUT = os.path.join(HERE, "probe_gather_tpu7.json")
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
        return jax.lax.fori_loop(0, n, lambda i, z: z @ b, a)
    return f


def main():
    emit(devices=str(jax.devices()))
    rng = np.random.default_rng(0)
    am = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.float32)
    bm = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.float32)
    f100 = fori_matmul(100)
    f1000 = fori_matmul(1000)

    def T(stage, fori=False):
        t1 = bench(matmul, am, bm, reps=5)
        rec = dict(stage=stage, t_matmul_ms=t1 * 1e3)
        if fori:
            t2 = bench(f100, am, bm, reps=2)
            t3 = bench(f1000, am, bm, reps=1)
            rec.update(t_fori100_ms=t2 * 1e3,
                       per_op_fori100_us=t2 * 1e6 / 100,
                       t_fori1000_ms=t3 * 1e3,
                       per_op_fori1000_us=t3 * 1e6 / 1000)
        emit(**rec)

    T("0_cold", fori=True)

    # trigger candidate 1: scalar d2h (float() of a device scalar)
    s = float(jnp.sum(am))
    T("1_after_scalar_d2h", fori=True)

    # trigger candidate 2: array d2h (np.asarray of a 4MB device array)
    _ = np.asarray(am)
    T("2_after_4MB_d2h", fori=True)

    # recovery attempts
    z = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.float32)
    jax.block_until_ready(z)
    T("3_after_h2d")

    jax.clear_caches()
    T("4_after_clear_caches")

    time.sleep(30)
    T("5_after_sleep30", fori=True)

    emit(done=True)


if __name__ == "__main__":
    main()
