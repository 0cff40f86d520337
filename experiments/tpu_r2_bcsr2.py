"""TPU validation + timing for BCSR kernel v2 (parallel grid, per-column
segments, double-buffered manual DMA). One process, JSON lines out."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from graph_neural_networks_tpu.ops import spmm  # noqa: E402
import bench  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, iters=20, warmup=3):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


# parity on real TPU (banded + scattered patterns, empty columns)
rng = np.random.default_rng(0)
for name, (N, density, bw) in {
    "banded": (1024, 0.01, 200),
    "scattered": (1024, 0.004, 1024),
}.items():
    S, _ = bench.make_graph(N, density, bw, seed=7)
    S[:, 256:384] = 0.0  # force an empty block column
    blocks, brow, bcol = spmm.dense_to_bcsr(S, 128)
    x = jnp.asarray(rng.random((64, N)), jnp.float32)
    got = spmm.bcsr_matmul(x, jnp.asarray(blocks), jnp.asarray(brow),
                           jnp.asarray(bcol), n_cols=N)
    ref = np.asarray(x, np.float64) @ S
    err = float(np.abs(np.asarray(got, np.float64) - ref).max()
                / (np.abs(ref).max() + 1e-9))
    emit(step=f"parity_{name}", err=err, ok=err < 1e-4)

# bench config
Nb, density, bw = 4096, 0.01, 256
S, nnz = bench.make_graph(Nb, density, bw)
peak32 = bench.measure_peak("f32")
peak16 = bench.measure_peak("bf16")
emit(step="peak", f32=peak32 / 1e12, bf16=peak16 / 1e12)

for dt_name, dt, prec, peak in (
        ("f32", jnp.float32, jax.lax.Precision.HIGHEST, peak32),
        ("bf16", jnp.bfloat16, jax.lax.Precision.DEFAULT, peak16)):
    blocks, brow, bcol = spmm.dense_to_bcsr(S, 128)
    blk = jnp.asarray(blocks, dt)
    browj, bcolj = jnp.asarray(brow), jnp.asarray(bcol)
    nnzb = blocks.shape[0]
    for R in (512, 2048):
        xb = jnp.asarray(rng.random((R, Nb)), dt)
        flops = 2 * R * nnzb * 128 * 128
        for rt in (512, 1024):
            repeat = 20

            @jax.jit
            def run(x, rt=rt):
                return jax.lax.fori_loop(
                    0, repeat * 4,
                    lambda i, z: spmm.bcsr_matmul(
                        z, blk, browj, bcolj, n_cols=Nb, row_tile=rt,
                        precision=prec), x)
            try:
                t = timeit(lambda: run(xb)) / repeat / 4
                emit(step="bcsr2", dtype=dt_name, R=R, row_tile=rt,
                     t_shift_ms=t * 1e3, roofline_pct=100 * flops / t / peak,
                     edges_per_s=R * nnz / t)
            except Exception as ex:  # noqa: BLE001
                emit(step="bcsr2_fail", dtype=dt_name, R=R, row_tile=rt,
                     err=repr(ex)[:300])

print("DONE", flush=True)
