"""TPU validation + timing for the fused K-tap band register and the
multi-column (col_tile) band kernel — round-2 roofline push.

Runs everything in ONE process (the remote-compile tunnel recompiles per
process; batch measurements). Writes JSON lines to stdout.
"""

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


def make_graph(N, density, bw, seed=0):
    return bench.make_graph(N, density, bw, seed)


def timeit(fn, iters=20, warmup=3):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


# ---------------- 1. parity: fused register fwd + vjp on real TPU --------
N, K, bs = 512, 5, 128
S, _ = make_graph(N, 0.02, 96, seed=3)
s_band, w = spmm.dense_to_band(S, bs)
s_band_t, _ = spmm.dense_to_band(S.T, bs)
sb, sbt = jnp.asarray(s_band), jnp.asarray(s_band_t)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((64, N)), jnp.float32)

y = spmm.band_register(x, sb, sbt, K, N, w, bs)
want = [np.asarray(x, np.float64)]
for _ in range(K - 1):
    want.append(want[-1] @ S)
err = float(np.abs(np.asarray(y, np.float64) - np.stack(want)).max()
            / (np.abs(np.stack(want)).max() + 1e-9))
emit(step="parity_fwd", err=err, ok=err < 1e-4)

ct = jnp.asarray(rng.random((K, 64, N)), jnp.float32)
_, pull = jax.vjp(lambda xx: spmm.band_register(xx, sb, sbt, K, N, w, bs), x)
(dx,) = pull(ct)
dwant = np.zeros((64, N))
P = np.eye(N)
for k in range(K):
    dwant += np.asarray(ct[k], np.float64) @ P
    P = P @ S.T
gerr = float(np.abs(np.asarray(dx, np.float64) - dwant).max()
             / (np.abs(dwant).max() + 1e-9))
emit(step="parity_vjp", err=gerr, ok=gerr < 1e-3)

# col_tile parity at bench-like config
S4, _ = make_graph(1024, 0.01, 200, seed=5)
sb4, w4 = spmm.dense_to_band(S4, bs)
sb4j = jnp.asarray(sb4)
x4 = jnp.asarray(rng.random((32, 1024)), jnp.float32)
ref = np.asarray(x4, np.float64) @ S4
for C in (2, 4):
    got = spmm.band_matmul(x4, sb4j, n_cols=1024, w=w4, col_tile=C)
    e = float(np.abs(np.asarray(got, np.float64) - ref).max()
              / (np.abs(ref).max() + 1e-9))
    emit(step=f"parity_coltile_{C}", err=e, ok=e < 1e-4)

# ---------------- 2. timing at the bench config --------------------------
Nb, density, bw = 4096, 0.01, 256
Sb, nnz = make_graph(Nb, density, bw)
s_bandb, wb = spmm.dense_to_band(Sb, bs)
sbb = jnp.asarray(s_bandb)
sbtb = jnp.asarray(spmm.dense_to_band_at(Sb.T, bs, wb))
nb = s_bandb.shape[0]
peak = bench.measure_peak("f32")
emit(step="peak", f32_tflops=peak / 1e12)

for R in (512, 2048):
    xb = jnp.asarray(rng.random((R, Nb)), jnp.float32)
    flops_per_shift = 2 * R * nb * (2 * wb + 1) * bs * bs
    repeat = 20
    n_shifts = 4  # K-1

    # chained baseline at col_tile variants
    for C in (1, 2, 4):
        @jax.jit
        def run_chain(x, C=C):
            return jax.lax.fori_loop(
                0, repeat * n_shifts,
                lambda i, z: spmm.band_matmul(z, sbb, n_cols=Nb, w=wb,
                                              col_tile=C), x)
        t = timeit(lambda: run_chain(xb)) / repeat / n_shifts
        emit(step="chain", R=R, col_tile=C, t_shift_ms=t * 1e3,
             roofline_pct=100 * flops_per_shift / t / peak,
             edges_per_s=R * nnz / t)

    # fused register (one launch for all K taps), row_tile variants
    vm = spmm.register_vmem_bytes(Nb, wb, bs, 256)
    emit(step="register_vmem", bytes=vm, fits=vm <= 12 * 2 ** 20)
    for rt in (128, 256):
        if spmm.register_vmem_bytes(Nb, wb, bs, rt) > 12 * 2 ** 20:
            emit(step="register_skip", R=R, row_tile=rt)
            continue

        @jax.jit
        def run_reg(x, rt=rt):
            def body(i, z):
                out = spmm.band_register(z, sbb, sbtb, n_shifts + 1, Nb,
                                         wb, bs, rt)
                return out[n_shifts]
            return jax.lax.fori_loop(0, repeat, body, x)
        try:
            t = timeit(lambda: run_reg(xb)) / repeat / n_shifts
            emit(step="register", R=R, row_tile=rt, t_shift_ms=t * 1e3,
                 roofline_pct=100 * flops_per_shift / t / peak,
                 edges_per_s=R * nnz / t)
        except Exception as ex:  # noqa: BLE001
            emit(step="register_fail", R=R, row_tile=rt, err=repr(ex)[:300])

print("DONE", flush=True)
