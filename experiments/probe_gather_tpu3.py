"""Gather probe phase 3: WHY is the library ell_shift_rows slow when the
bare rows_batched probe formulation is fast at the same shapes?

Phase-2 found (16, N, 6) batched row gathers fast up to N=65536; the
library path (identical math, wrapped in EllGso + reshapes from
(B,T,N,E,G) io) runs ~200x slower at N>=1024. This phase bisects the
graph difference step by step and dumps the optimized HLO of the fast
and slow versions to find the emitter decision.

Writes JSON lines to experiments/probe_gather_tpu3.json and HLO texts
to experiments/logs/hlo_*.txt.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from graph_neural_networks_tpu.ops import ell as ell_lib

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "probe_gather_tpu3.json")
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


# --- step 0: bare probe formulation (known fast) -------------------------
@jax.jit
def v0_bare(x, idx, val):
    # x (BT,N,C), idx (BT,No,D), val (BT,No,D)
    BT, N, C = x.shape
    No, D = idx.shape[-2:]
    xg = jnp.take_along_axis(x, idx.reshape(BT, No * D, 1), axis=1)
    return jnp.einsum("bndc,bnd->bnc", xg.reshape(BT, No, D, C), val)


# --- step 1: same but negative gather axis --------------------------------
@jax.jit
def v1_negaxis(x, idx, val):
    BT, N, C = x.shape
    No, D = idx.shape[-2:]
    xg = jnp.take_along_axis(x, idx.reshape(BT, No * D, 1), axis=-2)
    return jnp.einsum("bndc,bnd->bnc", xg.reshape(BT, No, D, C), val)


# --- step 2: io reshaped from/to the 5-D (B,T,N,E,G) forms ---------------
@jax.jit
def v2_reshaped_io(x5, idx4, val5):
    # x5 (B,T,N,1,G), idx4 (B,T,N,D), val5 (B,T,1,N,D)
    B, T, N, E, G = x5.shape
    D = idx4.shape[-1]
    x = x5.reshape(B * T, N, E * G)
    idx = idx4.reshape(B * T, N, D)
    val = val5.reshape(B * T, E, N, D)[:, 0]
    y = v0_bare.__wrapped__(x, idx, val)
    return y.reshape(B, T, N, E, G)


# --- step 3: the library function verbatim --------------------------------
@jax.jit
def v3_library(x5, idx4, val5):
    return ell_lib.ell_shift_rows(x5, ell_lib.EllGso(idx4, val5))


# --- step 4: library but output left flat (no final 5-D reshape) ----------
@jax.jit
def v4_lib_flat_out(x5, idx4, val5):
    idx, val = idx4, val5
    *L, Nn, E, G = x5.shape
    No, D = idx.shape[-2:]
    Bf = int(np.prod(L)) if L else 1
    xf = x5.reshape((Bf, Nn, E * G))
    ixf = idx.reshape((Bf, No * D, 1))
    xg = jnp.take_along_axis(xf, ixf, axis=-2)
    vf = val.reshape((Bf, E, No, D)).astype(x5.dtype)
    return jnp.einsum("bndc,bnd->bnc", xg.reshape((Bf, No, D, E * G)),
                      vf[:, 0])


# --- step 5: v0 but fed by broadcast_to of the E axis (lsigf entry) -------
@jax.jit
def v5_broadcast_in(x4, idx4, val5):
    # x4 (B,T,G,N) -> broadcast E -> rows layout, like _lsigf_db_ell_rows
    B, T, G, N = x4.shape
    D = idx4.shape[-1]
    xe = jnp.broadcast_to(jnp.swapaxes(x4, -1, -2)[..., None, :],
                          (B, T, N, 1, G))
    return v4_lib_flat_out.__wrapped__(xe, idx4, val5)


def make(rng, B, T, N, D, G):
    x5 = jnp.asarray(rng.standard_normal((B, T, N, 1, G)), jnp.float32)
    idx4 = jnp.asarray(rng.integers(0, N, (B, T, N, D)), jnp.int32)
    val5 = jnp.asarray(rng.random((B, T, 1, N, D)) / D, jnp.float32)
    return x5, idx4, val5


def hlo_dump(name, fn, *args):
    try:
        txt = jax.jit(fn).lower(*args).compile().as_text()
        path = os.path.join(HERE, "logs", f"hlo_{name}.txt")
        with open(path, "w") as f:
            f.write(txt)
        # quick emitter fingerprint
        kinds = sorted({ln.strip().split("(")[0].split(" = ")[-1]
                        for ln in txt.splitlines() if "gather(" in ln})
        emit(hlo=name, path=path, gather_lines=kinds,
             n_dynamic_slice=txt.count("dynamic-slice"),
             n_gather=txt.count(" gather("),
             n_while=txt.count("while("))
    except Exception as e:
        emit(hlo=name, error=repr(e)[:300])


def main():
    emit(devices=str(jax.devices()))
    rng = np.random.default_rng(3)
    D, G = 16, 6

    for (B, T, N) in [(1, 8, 65536), (4, 16, 1024)]:
        x5, idx4, val5 = make(rng, B, T, N, D, G)
        BT = B * T
        x = x5.reshape(BT, N, G)
        idx = idx4.reshape(BT, N, D)
        val = val5.reshape(BT, N, D)
        edges = BT * N * D
        for name, fn, args in [
                ("v0_bare", v0_bare, (x, idx, val)),
                ("v1_negaxis", v1_negaxis, (x, idx, val)),
                ("v2_reshaped_io", v2_reshaped_io, (x5, idx4, val5)),
                ("v3_library", v3_library, (x5, idx4, val5)),
                ("v4_lib_flat_out", v4_lib_flat_out, (x5, idx4, val5)),
        ]:
            try:
                t = bench(fn, *args, reps=3)
                emit(tag=name, B=B, T=T, N=N, t_ms=t * 1e3,
                     gedges_s=edges / t / 1e9)
            except Exception as e:
                emit(tag=name, B=B, T=T, N=N, error=repr(e)[:300])
        x4 = jnp.asarray(rng.standard_normal((B, T, G, N)), jnp.float32)
        try:
            t = bench(v5_broadcast_in, x4, idx4, val5, reps=3)
            emit(tag="v5_broadcast_in", B=B, T=T, N=N, t_ms=t * 1e3,
                 gedges_s=edges / t / 1e9)
        except Exception as e:
            emit(tag="v5_broadcast_in", B=B, T=T, N=N, error=repr(e)[:300])

    # HLO fingerprints at the (4,16,1024) shape: fast vs slow
    x5, idx4, val5 = make(rng, 4, 16, 1024, D, G)
    x = x5.reshape(64, 1024, G)
    idx = idx4.reshape(64, 1024, D)
    val = val5.reshape(64, 1024, D)
    hlo_dump("v0_bare_64x1024", v0_bare.__wrapped__, x, idx, val)
    hlo_dump("v3_library_64x1024", v3_library.__wrapped__, x5, idx4, val5)
    # and the known-fast probe shape for contrast
    x5b, idx4b, val5b = make(rng, 1, 16, 1024, D, G)
    hlo_dump("v3_library_16x1024", v3_library.__wrapped__,
             x5b, idx4b, val5b)
    xb = x5b.reshape(16, 1024, G)
    idxb = idx4b.reshape(16, 1024, D)
    valb = val5b.reshape(16, 1024, D)
    hlo_dump("v0_bare_16x1024", v0_bare.__wrapped__, xb, idxb, valb)

    emit(done=True)


if __name__ == "__main__":
    main()
