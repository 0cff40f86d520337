"""Probe: which gather formulation is fast on TPU for the ELL shift?

Context (experiments/bench_ell_tpu_r2.json): XLA's row-gather rides a
fast path at N=256 (dispatch floor) but collapses ~400x at N>=1024 —
some rewrite (gather->one-hot/select) has an operand-size threshold.
This probes: the threshold location, batched vs flattened-global gather,
promise_in_bounds, lane width (C), index-count dependence, an explicit
blocked one-hot matmul, and whether Pallas/Mosaic compiles jnp.take.

One process, all jits batched (axon tunnel recompiles per process).
Operands passed as jit ARGUMENTS (closure constants -> HTTP 413).
Writes JSON lines to experiments/probe_gather_tpu.json.
"""

import json
import os
import sys
import time
import traceback
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_gather_tpu.json")
out_f = open(OUT, "w", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def bench(fn, *args, reps=10):
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


# ---- formulations: x (BT, N, C), idx (BT, No, D), val (BT, No, D) ----

@jax.jit
def rows_batched(x, idx, val):
    BT, N, C = x.shape
    No, D = idx.shape[-2:]
    xg = jnp.take_along_axis(x, idx.reshape(BT, No * D, 1), axis=1)
    return jnp.einsum("bndc,bnd->bnc", xg.reshape(BT, No, D, C), val)


@jax.jit
def flat_global(x, idx, val):
    BT, N, C = x.shape
    No, D = idx.shape[-2:]
    g = (idx + (jnp.arange(BT, dtype=idx.dtype) * N)[:, None, None])
    xg = jnp.take(x.reshape(BT * N, C), g.reshape(-1), axis=0)
    return jnp.einsum("bndc,bnd->bnc", xg.reshape(BT, No, D, C), val)


@jax.jit
def flat_pib(x, idx, val):
    BT, N, C = x.shape
    No, D = idx.shape[-2:]
    g = (idx + (jnp.arange(BT, dtype=idx.dtype) * N)[:, None, None])
    xg = jnp.take(x.reshape(BT * N, C), g.reshape(-1), axis=0,
                  mode="promise_in_bounds", unique_indices=False,
                  indices_are_sorted=False)
    return jnp.einsum("bndc,bnd->bnc", xg.reshape(BT, No, D, C), val)


@partial(jax.jit, static_argnames="chunk")
def onehot_chunked(x, idx, val, chunk=2048):
    """y[m] = sum_d val[m,d] x[idx[m,d]] via blocked one-hot matmuls:
    FLOPs = BT*No*D*N*C but all on the MXU, no gather op at all."""
    BT, N, C = x.shape
    No, D = idx.shape[-2:]
    idf = idx.reshape(BT, -1, chunk)            # (BT, nch, chunk)
    vlf = val.reshape(BT, -1, chunk)
    iota = jnp.arange(N, dtype=idx.dtype)

    def step(_, inp):
        ic, vc = inp                            # (BT, chunk)
        oh = (ic[..., None] == iota).astype(x.dtype)   # (BT, chunk, N)
        y = jnp.einsum("bcn,bnf->bcf", oh, x)
        return 0., y * vc[..., None]

    _, ys = jax.lax.scan(step, 0.,
                         (jnp.moveaxis(idf, 1, 0), jnp.moveaxis(vlf, 1, 0)))
    ys = jnp.moveaxis(ys, 0, 1).reshape(BT, No, D, C)
    return ys.sum(axis=2)


def pallas_take(x, idx):
    """Does Mosaic lower jnp.take along sublanes inside a kernel?"""
    BT, N, C = x.shape
    ND = idx.shape[-1]

    def kern(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take(x_ref[0], i_ref[0], axis=0)[None]

    return pl.pallas_call(
        kern,
        grid=(BT,),
        in_specs=[pl.BlockSpec((1, N, C), lambda b: (b, 0, 0)),
                  pl.BlockSpec((1, ND), lambda b: (b, 0))],
        out_specs=pl.BlockSpec((1, ND, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BT, ND, C), x.dtype),
    )(x, idx)


pallas_take_j = jax.jit(pallas_take)


def make(rng, BT, N, No, D, C, dtype=np.float32):
    x = jnp.asarray(rng.standard_normal((BT, N, C)), dtype)
    idx = jnp.asarray(rng.integers(0, N, (BT, No, D)), jnp.int32)
    val = jnp.asarray(rng.random((BT, No, D)) / D, dtype)
    return x, idx, val


def main():
    emit(devices=str(jax.devices()))
    rng = np.random.default_rng(1)
    BT, D = 16, 16

    def run(tag, fn, N, No, C, reps=10, check_against=None, **kw):
        x, idx, val = make(rng, BT, N, No, D, C)
        try:
            t = bench(fn, x, idx, val, reps=reps, **kw) if not kw else None
            if kw:  # static kwargs path (onehot chunk)
                f = lambda a, b, c: fn(a, b, c, **kw)
                t = bench(f, x, idx, val, reps=reps)
            ged = BT * No * D / t / 1e9
            rec = dict(tag=tag, N=N, No=No, C=C, t_ms=t * 1e3,
                       gedges_s=ged, **kw)
            if check_against is not None:
                ref = check_against(x, idx, val)
                got = (fn(x, idx, val, **kw) if kw else fn(x, idx, val))
                rec["max_err"] = float(jnp.max(jnp.abs(ref - got)))
            emit(**rec)
        except Exception as e:
            emit(tag=tag, N=N, No=No, C=C, error=repr(e))

    # 1. threshold mapping for the current batched row gather
    for N in (256, 512, 768, 1024, 2048, 4096):
        run("rows_batched", rows_batched, N, N, 6,
            reps=20 if N <= 512 else 5)

    # 2. index-count dependence: big operand, few indices
    run("rows_batched_small_idx", rows_batched, 1024, 64, 6, reps=20)

    # 3. flattened global 2D gather (no batch dims)
    run("flat_global", flat_global, 1024, 1024, 6, reps=5,
        check_against=rows_batched)
    run("flat_pib", flat_pib, 1024, 1024, 6, reps=5)
    run("flat_global", flat_global, 4096, 4096, 6, reps=5)
    run("flat_pib", flat_pib, 4096, 4096, 6, reps=5)

    # 4. lane-width dependence
    for C in (8, 128):
        run(f"rows_batched_C{C}", rows_batched, 1024, 1024, C, reps=5)
        run(f"flat_global_C{C}", flat_global, 1024, 1024, C, reps=5)

    # 5. blocked one-hot matmul (HBM cost = BT*No*D*N floats — expect a
    # win only at moderate N unless built in VMEM)
    run("onehot", onehot_chunked, 1024, 1024, 6, reps=5,
        check_against=rows_batched, chunk=2048)
    run("onehot", onehot_chunked, 4096, 4096, 6, reps=2, chunk=512)

    # 6. big-N endpoints for the best XLA variants
    run("flat_global", flat_global, 65536, 65536, 8, reps=3)
    run("flat_pib", flat_pib, 65536, 65536, 8, reps=3)

    # 7. pallas jnp.take compile probe
    for N, C in ((1024, 8), (4096, 8)):
        x, idx, _ = make(rng, BT, N, N, D, C)
        idf = idx.reshape(BT, -1)
        try:
            t = bench(pallas_take_j, x, idf, reps=5)
            ref = jnp.take_along_axis(x, idf[..., None], axis=1)
            err = float(jnp.max(jnp.abs(pallas_take_j(x, idf) - ref)))
            emit(tag="pallas_take", N=N, C=C, t_ms=t * 1e3,
                 gedges_s=BT * N * D / t / 1e9, max_err=err)
        except Exception as e:
            emit(tag="pallas_take", N=N, C=C,
                 error="".join(traceback.format_exception_only(e)).strip())

    emit(done=True)


if __name__ == "__main__":
    main()
