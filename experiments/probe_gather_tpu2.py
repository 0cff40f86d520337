"""Gather probe phase 2 (see probe_gather_tpu.py for phase 1).

Phase-1 findings on v5e: batched row gather (ONE leading batch dim)
with C=6 runs ~434 GB/s at N<=4096; C=8 is ~180x slower; flat (no
batch dim) collapses between 16k and 65k operand rows. This phase maps
(a) the N threshold for the 1-batch-dim form, (b) the C edge, (c) the
leading-dims effect (2 batch dims reproduced the original slowness?),
and benches two composite formulations: C-chunked gathers (wide
features as several narrow fast-path gathers) and bucketed masked
multi-pass (huge N as P fast-path gathers over row blocks + select).

Writes JSON lines to experiments/probe_gather_tpu2.json.
"""

import json
import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_gather_tpu2.json")
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
def rows_batched(x, idx, val):
    BT, N, C = x.shape
    No, D = idx.shape[-2:]
    xg = jnp.take_along_axis(x, idx.reshape(BT, No * D, 1), axis=1)
    return jnp.einsum("bndc,bnd->bnc", xg.reshape(BT, No, D, C), val)


@jax.jit
def rows_2batch(x, idx, val):
    """Same but with TWO leading dims (B, T) — the original ell_shift
    call shape."""
    B, T, N, C = x.shape
    No, D = idx.shape[-2:]
    xg = jnp.take_along_axis(x, idx.reshape(B, T, No * D, 1), axis=2)
    return jnp.einsum("btndc,btnd->btnc", xg.reshape(B, T, No, D, C), val)


@partial(jax.jit, static_argnames="cchunk")
def rows_cchunked(x, idx, val, cchunk=6):
    """Wide C as several narrow gathers that each ride the fast path."""
    BT, N, C = x.shape
    No, D = idx.shape[-2:]
    ixr = idx.reshape(BT, No * D, 1)
    outs = []
    for c0 in range(0, C, cchunk):
        xg = jnp.take_along_axis(x[:, :, c0:c0 + cchunk], ixr, axis=1)
        outs.append(xg)
    xg = jnp.concatenate(outs, axis=-1).reshape(BT, No, D, C)
    return jnp.einsum("bndc,bnd->bnc", xg, val)


@partial(jax.jit, static_argnames="nblock")
def rows_bucketed(x, idx, val, nblock=4096):
    """Huge N as P masked gathers over row blocks of nblock rows each;
    every gather's operand is small enough for the fast path."""
    BT, N, C = x.shape
    No, D = idx.shape[-2:]
    P = N // nblock
    ixf = idx.reshape(BT, No * D)
    acc = jnp.zeros((BT, No * D, C), x.dtype)
    for p in range(P):
        lo = p * nblock
        loc = jnp.clip(ixf - lo, 0, nblock - 1)
        xg = jnp.take_along_axis(x[:, lo:lo + nblock], loc[..., None],
                                 axis=1)
        m = ((ixf >= lo) & (ixf < lo + nblock)).astype(x.dtype)
        acc = acc + xg * m[..., None]
    return jnp.einsum("bndc,bnd->bnc", acc.reshape(BT, No, D, C), val)


def make(rng, lead, N, No, D, C):
    x = jnp.asarray(rng.standard_normal(lead + (N, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, lead + (No, D)), jnp.int32)
    val = jnp.asarray(rng.random(lead + (No, D)) / D, jnp.float32)
    return x, idx, val


def main():
    emit(devices=str(jax.devices()))
    rng = np.random.default_rng(2)
    D = 16

    def run(tag, fn, lead, N, No, C, reps=5, check=None, **kw):
        x, idx, val = make(rng, lead, N, No, D, C)
        f = (lambda a, b, c: fn(a, b, c, **kw)) if kw else fn
        try:
            t = bench(f, x, idx, val, reps=reps)
            edges = int(np.prod(lead)) * No * D
            rec = dict(tag=tag, lead=list(lead), N=N, No=No, C=C,
                       t_ms=t * 1e3, gedges_s=edges / t / 1e9, **kw)
            if check is not None:
                rec["max_err"] = float(jnp.max(jnp.abs(
                    f(x, idx, val) - check(x, idx, val))))
            emit(**rec)
        except Exception as e:
            emit(tag=tag, lead=list(lead), N=N, No=No, C=C,
                 error=repr(e)[:200])

    # (a) N threshold, 1 batch dim, C=6
    for N in (8192, 16384, 32768, 65536):
        run("rows_batched", rows_batched, (16,), N, N, 6,
            reps=3 if N >= 32768 else 5)

    # (b) C edge at N=4096
    for C in (1, 2, 4, 5, 7, 8, 16, 32):
        run("rows_batched", rows_batched, (16,), 4096, 4096, C, reps=3)

    # (c) leading-dims effect
    run("rows_2batch", rows_2batch, (2, 8), 1024, 1024, 6, reps=3)
    run("rows_2batch", rows_2batch, (2, 8), 4096, 4096, 6, reps=3)

    # (d) wide C via chunked narrow gathers
    for C, cc in ((32, 6), (32, 4), (64, 6)):
        run("rows_cchunked", rows_cchunked, (16,), 4096, 4096, C,
            reps=3, check=rows_batched, cchunk=cc)

    # (e) huge N via bucketed masked multi-pass
    run("rows_bucketed", rows_bucketed, (16,), 65536, 65536, 6,
        reps=3, check=rows_batched, nblock=4096)
    run("rows_bucketed", rows_bucketed, (16,), 65536, 65536, 6,
        reps=3, nblock=8192)
    run("rows_bucketed", rows_bucketed, (16,), 65536, 65536, 6,
        reps=3, nblock=16384)

    emit(done=True)


if __name__ == "__main__":
    main()
