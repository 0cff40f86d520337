"""Headline benchmark: LSIGF graph-convolution throughput on one chip.

Measures the K-tap LSIGF (the framework's hot kernel, SURVEY.md §2.2) on a
sparse graph two ways:
  * dense  -- the reference algorithm (dense N x N matmuls, what
    alegnn/utils/graphML.py:158-161 does on every shift), and
  * bcsr   -- this framework's Pallas block-sparse SpMM path.

Reports edges/s for the sparse path and the speedup over the dense
reference algorithm on the same hardware as vs_baseline (the reference
repo publishes no numbers — BASELINE.md — so the dense algorithm at equal
accuracy is the baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def _bench(fn, iters=20, warmup=3):
    for _ in range(warmup):
        r = fn()
    r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    r.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    # persistent compilation cache: the remote-compile tunnel makes fresh
    # compiles slow (~minutes); cached reruns take seconds
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_compilation_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from graph_neural_networks_tpu.ops import spmm

    N = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 4096
    R = 512          # rows = batch * features
    K = 5            # filter taps
    density = 0.01

    rng = np.random.default_rng(0)
    # banded sparse graph: the post-RCM structure parallel.partition
    # produces for real-world graphs (edges concentrate near the diagonal)
    S = np.zeros((N, N), np.float32)
    bandwidth = 256
    ii = rng.integers(0, N, size=int(density * N * N))
    jj = ii + rng.integers(-bandwidth, bandwidth + 1, size=len(ii))
    ok = (jj >= 0) & (jj < N)
    S[ii[ok], jj[ok]] = rng.random(ok.sum())
    nnz = int((np.abs(S) > 0).sum())

    x = jnp.asarray(rng.random((R, N)), jnp.float32)
    Sd = jnp.asarray(S)
    s_band, w = spmm.dense_to_band(S, 128)
    sb = jnp.asarray(s_band)

    # repeat the shift on-device (fori_loop: one compiled kernel, many
    # iterations) so host dispatch latency (~1.5 ms through this
    # container's TPU tunnel) doesn't mask the device time
    REPEAT = 20

    @jax.jit
    def dense_lsigf(x):
        # f32 MXU precision to match the sparse path (and the reference's
        # fp32/fp64 semantics)
        return jax.lax.fori_loop(
            0, REPEAT * (K - 1),
            lambda i, z: jnp.dot(z, Sd,
                                 precision=jax.lax.Precision.HIGHEST), x)

    @jax.jit
    def band_lsigf(x):
        return jax.lax.fori_loop(
            0, REPEAT * (K - 1),
            lambda i, z: spmm.band_matmul(z, sb, n_cols=N, w=w), x)

    # numerical sanity before timing (numpy oracle; keeps the device
    # program count down — remote compiles are minutes each here)
    d = np.asarray(x) @ S
    b = np.asarray(spmm.band_matmul(x, sb, n_cols=N, w=w))
    err = np.abs(d - b).max() / (np.abs(d).max() + 1e-9)
    assert err < 1e-3, f"band mismatch: rel err {err}"

    t_dense = _bench(lambda: dense_lsigf(x)) / REPEAT
    t_band = _bench(lambda: band_lsigf(x)) / REPEAT

    edges_per_s = R * (K - 1) * nnz / t_band
    speedup = t_dense / t_band
    band_mem = s_band.size / (N * N)

    print(json.dumps({
        "metric": "lsigf_band_spmm_edges_per_s",
        "value": edges_per_s,
        "unit": f"edges/s (N={N}, nnz={nnz}, K={K}, R={R}, "
                f"band mem {band_mem:.1%} of dense, "
                f"dense {t_dense*1e3:.2f}ms, band {t_band*1e3:.2f}ms)",
        "vs_baseline": speedup,
    }))


if __name__ == "__main__":
    main()
