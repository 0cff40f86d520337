"""TPU bench: ELL (padded-neighbor) DB shift vs the dense time-varying
contraction, at decentralized-controller-like shapes. One process, all
measurements batched (the axon tunnel recompiles per process).

Writes JSON lines to experiments/bench_ell_tpu_r2.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from graph_neural_networks_tpu.ops import ell as ell_lib
from graph_neural_networks_tpu.ops import filters

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "bench_ell_tpu_r2.json")
REPS = 20


def device_time(fn, *args):
    """Median wall time of fn(*args) with block_until_ready, after warmup."""
    y = fn(*args)
    jax.block_until_ready(y)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(REPS):
            y = fn(*args)
        jax.block_until_ready(y)
        ts.append((time.perf_counter() - t0) / REPS)
    return float(np.median(ts))


def geometric_db_gso(rng, B, T, N, deg):
    """Random geometric-ish sparse per-(b,t) GSO, in-degree <= deg,
    built directly in ELL (no dense N^2 on host for large N)."""
    idx = rng.integers(0, N, (B, T, N, deg)).astype(np.int32)
    val = (rng.random((B, T, 1, N, deg)) / deg).astype(np.float32)
    return ell_lib.EllGso(jnp.asarray(idx), jnp.asarray(val))


def ell_to_dense(ell):
    return jnp.asarray(ell_lib.ell_to_dense(ell))


def main():
    results = []
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    F, G, K = 4, 6, 3
    h = jnp.asarray(rng.standard_normal((F, 1, K, G)), jnp.float32)

    for (B, T, N, deg, do_dense) in [
            (4, 16, 256, 16, True),
            (4, 16, 1024, 16, True),
            (2, 8, 4096, 16, True),
            (1, 8, 65536, 16, False),   # dense impossible: 137 GB
    ]:
        x = jnp.asarray(rng.standard_normal((B, T, G, N)), jnp.float32)
        ell = geometric_db_gso(rng, B, T, N, deg)
        lsigf_ell = jax.jit(lambda h, x, e=ell: filters.lsigf_db(h, e, x))
        t_ell = device_time(lsigf_ell, h, x)
        edges = B * T * N * deg * (K - 1)   # shifts per lsigf call
        rec = {"N": N, "B": B, "T": T, "deg": deg, "K": K,
               "t_ell_ms": t_ell * 1e3,
               "ell_gedges_s": edges / t_ell / 1e9}
        if do_dense:
            Sd = ell_to_dense(ell)
            lsigf_d = jax.jit(lambda h, x, S=Sd: filters.lsigf_db(h, S, x))
            t_d = device_time(lsigf_d, h, x)
            # parity while we're here
            err = float(jnp.max(jnp.abs(lsigf_ell(h, x) - lsigf_d(h, x))))
            rec.update(t_dense_ms=t_d * 1e3, speedup=t_d / t_ell,
                       max_abs_err=err)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    with open(OUT, "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
