"""Are TPU row gathers slower inside loop bodies (scan/fori) than as
standalone dispatches? (Bisecting the ~270 ms/step scan tax.)

Same (H, 128) row gather of 9N rows at N=262144, timed:
  * standalone queued dispatches (the protocol every component probe
    uses)
  * inside lax.fori_loop
  * inside lax.scan (carry-threaded indices)
  * element gather (N*D) the policy shape, standalone vs in-scan

Writes experiments/probe_gather_in_loop.json.
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
out_f = open(os.path.join(HERE, "probe_gather_in_loop.json"), "w",
             buffering=1)
REPEAT = 5


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def bench(fn, *args):
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


def bench_once(fn, *args):
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = g(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    emit(devices=str(jax.devices()), repeat=REPEAT)
    _ = float(jnp.sum(jnp.ones((8, 8))))
    N = 262144
    H = 262144
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((H, 128)), jnp.float32)
    idx9 = jnp.asarray(rng.integers(0, H, 9 * N), jnp.int32)

    def g_rows(table, idx):
        return jnp.sum(jnp.take(table, idx, axis=0)[:, :1])
    emit(tag="rows_standalone", t_ms=bench(g_rows, table, idx9))

    def g_rows_fori(table, idx):
        def body(i, acc):
            return acc + jnp.sum(jnp.take(table, idx + i, axis=0)[:, :1])
        return jax.lax.fori_loop(0, REPEAT, body, 0.0)
    emit(tag="rows_fori",
         t_ms=bench_once(g_rows_fori, table, idx9) / REPEAT)

    def g_rows_scan(table, idx):
        def body(c, _):
            acc, ix = c
            acc = acc + jnp.sum(jnp.take(table, ix, axis=0)[:, :1])
            return (acc, ix + 1), ()
        (acc, _), _ = jax.lax.scan(body, (0.0, idx), None, length=REPEAT)
        return acc
    emit(tag="rows_scan",
         t_ms=bench_once(g_rows_scan, table, idx9) / REPEAT)

    # element gather, policy-shaped: x (B, F, N) -> neighbors (B, F, N, D)
    B, F, D = 1, 6, 32
    x = jnp.asarray(rng.random((B, F, N)), jnp.float32)
    nb = jnp.asarray(rng.integers(0, N, (B, N, D)), jnp.int32)

    def g_elem(x, nb):
        out = jnp.take_along_axis(
            x[:, :, :, None], nb[:, None, :, :].repeat(F, 1)
            .reshape(B, F, N, D), axis=2)
        return jnp.sum(out[..., 0])
    emit(tag="elem_standalone", t_ms=bench(g_elem, x, nb))

    def g_elem_scan(x, nb):
        def body(c, _):
            acc, xx = c
            out = jnp.take_along_axis(
                xx[:, :, :, None], nb[:, None, :, :].repeat(F, 1)
                .reshape(B, F, N, D), axis=2)
            return (acc + jnp.sum(out[..., 0]), xx * 0.9999), ()
        (acc, _), _ = jax.lax.scan(body, (0.0, x), None, length=REPEAT)
        return acc
    emit(tag="elem_scan",
         t_ms=bench_once(g_elem_scan, x, nb) / REPEAT)
    emit(done=True)


if __name__ == "__main__":
    main()
