"""Scaling benchmark: edges/s for the sharded K-tap LSIGF vs device count.

Partitions a banded graph over the 'graph' mesh axis, runs the ring
halo-exchange shift (two ppermutes/shift over ICI), and reports per-count
throughput + parallel efficiency vs the single-device run.

On real multi-chip hardware this measures the BASELINE scaling target
(>=80% linear edges/s to N chips); on a single chip / virtual CPU devices
it validates the measurement machinery and the collective path.

Usage:
    python bench_scaling.py [--devices 1,2,4,8] [--n 8192] [--cpu]
Prints one JSON line per device count.
"""

import argparse
import json

import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default=None,
                    help="comma-separated device counts (default: 1..all)")
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--rows", type=int, default=256)
    ap.add_argument("--taps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None,
                    help="also append results to this JSON file")
    args = ap.parse_args()
    if args.cpu:
        import os
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from graph_neural_networks_tpu import parallel as par

    n_avail = jax.device_count()
    if args.devices:
        counts = [int(c) for c in args.devices.split(",")]
    else:
        counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_avail]

    N, R, K = args.n, args.rows, args.taps
    rng = np.random.default_rng(0)
    S = np.zeros((N, N), np.float32)
    bw = N // 16
    ii = rng.integers(0, N, size=int(0.01 * N * N))
    jj = ii + rng.integers(-bw, bw + 1, size=len(ii))
    ok = (jj >= 0) & (jj < N)
    S[ii[ok], jj[ok]] = rng.random(ok.sum())
    nnz = int((S != 0).sum())

    results = []
    base_rate = None
    for nd in counts:
        mesh = par.make_mesh((1, nd), devices=jax.devices()[:nd])
        part = par.partition_nodes(S, nd)
        shift = (par.sharded_gshift_ring(mesh, part) if part.is_ring
                 else par.sharded_gshift_allgather(mesh, part))
        x = jnp.asarray(rng.random((R, 1, 1, part.n_padded)), jnp.float32)

        @jax.jit
        def chain(x):
            z = x
            for _ in range(K - 1):
                z = shift(z)
            return z

        with mesh:
            r = chain(x)
            r.block_until_ready()
            t0 = time.perf_counter()
            iters = 10
            for _ in range(iters):
                r = chain(x)
            r.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
        rate = R * (K - 1) * nnz / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd)
        rec = {
            "metric": "sharded_lsigf_edges_per_s",
            "devices": nd,
            "value": rate,
            "unit": f"edges/s (N={N}, nnz={nnz}, K={K}, R={R}, "
                    f"ring={part.is_ring}, {dt*1e3:.2f}ms)",
            "vs_baseline": eff,
        }
        results.append(rec)
        print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
