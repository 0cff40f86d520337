"""TPU bench: ELL (padded-neighbor) DB shift vs the dense time-varying
contraction, at decentralized-controller-like shapes. One process, all
measurements batched (the axon tunnel recompiles per process).

MEASUREMENT PROTOCOL (probes 4-7, experiments/probe_gather_tpu*.py):
this container's axon tunnel runs fire-and-forget until the process's
FIRST device->host transfer — block_until_ready does NOT actually wait,
so timings taken before any d2h are fake dispatch-only numbers (1000
chained 4096^3 matmuls "complete" in 0.18ms). After one d2h the tunnel
is synchronous forever (isolated dispatches cost ~6ms round-trip, but
QUEUED executions pipeline). So: (1) force sync mode with a scalar pull
up front, (2) chain reps on-device in a fori_loop so one dispatch
covers many kernel executions, (3) amortize the round-trip over an
outer loop with a single terminal block_until_ready — the same pattern
bench.py uses (its recorded numbers are valid: bench_config does a d2h
parity check before timing).

Other gotcha: operands go through jit ARGUMENTS, never closure
constants — the remote-compile tunnel rejects large embedded constants
(HTTP 413).

Writes JSON lines to experiments/bench_ell_tpu_r2.json (incremental).
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from graph_neural_networks_tpu.ops import ell as ell_lib
from graph_neural_networks_tpu.ops import filters

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "bench_ell_tpu_r2.json")
out_f = open(OUT, "w", buffering=1)

REPEAT = 50          # on-device fori chain length per dispatch


def emit(rec):
    print(json.dumps(rec), flush=True)
    out_f.write(json.dumps(rec) + "\n")


def device_time(fn, *args, iters=5):
    """Seconds per fn(*args) with one terminal sync; fn must already
    chain REPEAT executions internally (fori_loop)."""
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


def geometric_db_gso(rng, B, T, N, deg):
    idx = rng.integers(0, N, (B, T, N, deg)).astype(np.int32)
    val = (rng.random((B, T, 1, N, deg)) / deg).astype(np.float32)
    return ell_lib.EllGso(jnp.asarray(idx), jnp.asarray(val))


# --- chained (fori) timing targets; io shapes preserved so z feeds back ---

@jax.jit
def shift_rows_chain(xr, idx, val):
    e = ell_lib.EllGso(idx, val)
    return jax.lax.fori_loop(
        0, REPEAT, lambda i, z: ell_lib.ell_shift_rows(z, e), xr)


@partial(jax.jit, static_argnames="layout")
def shift_chain(x5, idx, val, layout):
    e = ell_lib.EllGso(idx, val)
    return jax.lax.fori_loop(
        0, REPEAT,
        lambda i, z: ell_lib.ell_shift(z, e, layout=layout), x5)


@jax.jit
def lsigf_ell_chain(h, x, idx, val):
    e = ell_lib.EllGso(idx, val)          # h: (G,1,K,G) so y feeds back
    return jax.lax.fori_loop(
        0, REPEAT, lambda i, z: filters.lsigf_db(h, e, z), x)


@jax.jit
def lsigf_dense_chain(h, x, S):
    return jax.lax.fori_loop(
        0, REPEAT, lambda i, z: filters.lsigf_db(h, S, z), x)


@jax.jit
def grnn_ell_chain(a, bt, x, z0, idx, val):
    e = ell_lib.EllGso(idx, val)          # F=H so z feeds back as x
    return jax.lax.fori_loop(
        0, REPEAT,
        lambda i, z: filters.grnn_db(a, bt, e, z, z0, jnp.tanh), x)


@jax.jit
def grnn_dense_chain(a, bt, x, z0, S):
    return jax.lax.fori_loop(
        0, REPEAT,
        lambda i, z: filters.grnn_db(a, bt, S, z, z0, jnp.tanh), x)


@jax.jit
def lsigf_ell_once(h, x, idx, val):
    return filters.lsigf_db(h, ell_lib.EllGso(idx, val), x)


@jax.jit
def lsigf_dense_once(h, x, S):
    return filters.lsigf_db(h, S, x)


def main():
    emit({"devices": str(jax.devices()), "repeat": REPEAT})
    # force the tunnel into synchronous mode BEFORE any timing
    _ = float(jnp.sum(jnp.ones((8, 8))))

    rng = np.random.default_rng(0)
    G, K = 6, 3
    h = jnp.asarray(rng.standard_normal((G, 1, K, G)) * 0.2, jnp.float32)

    for (B, T, N, deg, do_dense, iters) in [
            (4, 16, 256, 16, True, 5),
            (4, 16, 1024, 16, True, 5),
            (2, 8, 4096, 16, True, 5),
            (1, 8, 65536, 16, False, 3),
    ]:
        x = jnp.asarray(rng.standard_normal((B, T, G, N)), jnp.float32)
        ell = geometric_db_gso(rng, B, T, N, deg)
        rec = {"N": N, "B": B, "T": T, "deg": deg, "K": K}
        shift_edges = B * T * N * deg

        xr = jnp.asarray(rng.standard_normal((B, T, N, 1, G)), jnp.float32)
        t = device_time(shift_rows_chain, xr, ell.idx, ell.val, iters=iters)
        rec["t_shift_rowsnative_ms"] = t * 1e3
        rec["shift_rowsnative_gedges_s"] = shift_edges / t / 1e9

        x5 = jnp.asarray(
            rng.standard_normal((B, T, 1, G, N)), jnp.float32)
        for layout in ("rows", "flat"):
            if layout == "flat" and N > 4096:
                continue                  # known-scalarized: minutes
            t = device_time(shift_chain, x5, ell.idx, ell.val, layout,
                            iters=iters)
            rec[f"t_shift_{layout}_ms"] = t * 1e3
            rec[f"shift_{layout}_gedges_s"] = shift_edges / t / 1e9

        t_ell = device_time(lsigf_ell_chain, h, x, ell.idx, ell.val,
                            iters=iters)
        edges = shift_edges * (K - 1)
        rec["t_lsigf_ell_ms"] = t_ell * 1e3
        rec["lsigf_ell_gedges_s"] = edges / t_ell / 1e9

        if do_dense:
            Sd = jnp.asarray(ell_lib.ell_to_dense(ell))
            t_d = device_time(lsigf_dense_chain, h, x, Sd, iters=iters)
            err = float(jnp.max(jnp.abs(
                lsigf_ell_once(h, x, ell.idx, ell.val)
                - lsigf_dense_once(h, x, Sd))))
            rec.update(t_lsigf_dense_ms=t_d * 1e3, speedup=t_d / t_ell,
                       max_abs_err=err)
        emit(rec)

    # GRNN_DB: recurrent register shifts (wide features E*(K-1)*H)
    H = 32
    a = jnp.asarray(rng.standard_normal((H, 1, K, H)) * 0.1, jnp.float32)
    bt = jnp.asarray(rng.standard_normal((H, 1, K, H)) * 0.1, jnp.float32)
    for (B, T, N, deg, do_dense, iters) in [
            (4, 16, 1024, 16, True, 3),
            (2, 8, 4096, 16, True, 3),
            (1, 8, 65536, 16, False, 2),
    ]:
        x = jnp.asarray(rng.standard_normal((B, T, H, N)), jnp.float32)
        z0 = jnp.zeros((B, H, N), jnp.float32)
        ell = geometric_db_gso(rng, B, T, N, deg)
        rec = {"model": "grnn_db", "N": N, "B": B, "T": T, "deg": deg,
               "K": K, "H": H}
        t_e = device_time(grnn_ell_chain, a, bt, x, z0, ell.idx, ell.val,
                          iters=iters)
        rec["t_grnn_ell_ms"] = t_e * 1e3
        if do_dense:
            Sd = jnp.asarray(ell_lib.ell_to_dense(ell))
            t_d = device_time(grnn_dense_chain, a, bt, x, z0, Sd,
                              iters=iters)
            rec.update(t_grnn_dense_ms=t_d * 1e3, speedup=t_d / t_e)
        emit(rec)

    emit({"done": True})


if __name__ == "__main__":
    main()
