"""TPU: bf16 io fused register — parity + timing vs chained bf16 band."""

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


rng = np.random.default_rng(0)

# parity (bf16 tolerance)
N, K = 512, 5
S, _ = bench.make_graph(N, 0.02, 96, seed=3)
s_band, w = spmm.dense_to_band(S, 128)
sb = jnp.asarray(s_band, jnp.bfloat16)
x = jnp.asarray(rng.random((64, N)), jnp.bfloat16)
y = spmm.band_shift_register(x, sb, n_taps=K, n_cols=N, w=w)
want = [np.asarray(x, np.float64)]
for _ in range(K - 1):
    want.append(want[-1] @ S)
err = float(np.abs(np.asarray(y, np.float64) - np.stack(want)).max()
            / (np.abs(np.stack(want)).max() + 1e-9))
emit(step="parity_bf16_reg", err=err, ok=err < 5e-2)

# timing at bench config R=512
Nb = 4096
Sb, nnz = bench.make_graph(Nb, 0.01, 256)
s_bandb, wb = spmm.dense_to_band(Sb, 128)
nb = s_bandb.shape[0]
peak = bench.measure_peak("bf16")
R, repeat, n_shifts = 512, 20, 4
flops_per_shift = 2 * R * nb * (2 * wb + 1) * 128 * 128
sbb = jnp.asarray(s_bandb, jnp.bfloat16)
xb = jnp.asarray(rng.random((R, Nb)), jnp.bfloat16)


@jax.jit
def run_reg(x):
    def body(i, z):
        return spmm.band_shift_register(z, sbb, n_taps=n_shifts + 1,
                                        n_cols=Nb, w=wb)[n_shifts]
    return jax.lax.fori_loop(0, repeat, body, x)


@jax.jit
def run_chain(x):
    return jax.lax.fori_loop(
        0, repeat * n_shifts,
        lambda i, z: spmm.band_matmul(z, sbb, n_cols=Nb, w=wb, col_tile=4),
        x)


for name, fn in (("bf16_reg", run_reg), ("bf16_chain", run_chain)):
    t = timeit(lambda: fn(xb)) / repeat / n_shifts
    emit(step=name, R=R, t_shift_ms=t * 1e3,
         roofline_pct=100 * flops_per_shift / t / peak,
         edges_per_s=R * nnz / t)

print("DONE", flush=True)
