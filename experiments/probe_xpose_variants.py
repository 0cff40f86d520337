"""table_transpose Mosaic-lowering fix: race kernel variants on TPU.

The round-4 kernel (ops.gridwin.table_transpose) fails Mosaic lowering
on real TPU: `xt[:, :F, :].reshape(TH, FC)` is an "unsupported shape
cast, vector<64x7x32xf32> -> vector<64x224xf32>" (collapsing unaligned
minor dims). This probe compiles + times candidate restructurings at
the production 262k-quad geometry (H=65536, C=32) for F=7 (payload-
free) and F=25 (fused-policy payload), all bit-checked against the XLA
reference transpose:

  v0_current   the r4 kernel (expected to FAIL lowering)
  vA_perh      per-h (C,128) 2-D transpose + per-f row concats
               (2-D ops only, python-unrolled over the h tile)
  vC_matmul    C sublane-strided slices -> (TH, C*F) lane concat ->
               ONE (TH,CF)x(CF,W) one-hot MXU matmul that applies the
               (c,f) -> f*C+c lane permutation
  vE_concat    r4 kernel body with the final reshape replaced by an
               F-way concat of (TH, C) middle-dim slices
  xla          jnp.swapaxes reference (the relayout the kernel is
               supposed to beat)

Writes experiments/probe_xpose_variants.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "probe_xpose_variants.json"), "w",
             buffering=1)
REPEAT = 10


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def round_trip():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,))
    float(f(x)[0])   # scalar d2h: forces the tunnel out of
    jax.block_until_ready(f(x))   # fire-and-forget mode (CLAUDE.md)
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(fn, *args, rt=0.0):
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPEAT):
            r = g(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0 - rt)
    return max(best, 0.0) / REPEAT * 1e3


# -- kernel bodies ----------------------------------------------------

def k_v0(TH, C, F, W):
    FC = F * C

    def kernel(mm_ref, out_ref):
        x = mm_ref[:]
        xt = jnp.swapaxes(x.reshape(TH, C, 128), 1, 2)   # (TH, 128, C)
        out = xt[:, :F, :].reshape(TH, FC)
        if FC < W:
            out = jnp.concatenate(
                [out, jnp.zeros((TH, W - FC), x.dtype)], axis=1)
        out_ref[:] = out

    return kernel


def k_vA(TH, C, F, W):
    FC = F * C

    def kernel(mm_ref, out_ref):
        x = mm_ref[:]
        rows = []
        for h in range(TH):
            bt = x[h * C:(h + 1) * C, :].T               # (128, C)
            row = jnp.concatenate(
                [bt[f:f + 1, :] for f in range(F)], axis=1)  # (1, FC)
            if FC < W:
                row = jnp.concatenate(
                    [row, jnp.zeros((1, W - FC), x.dtype)], axis=1)
            rows.append(row)
        out_ref[:] = jnp.concatenate(rows, axis=0)

    return kernel


def k_vC(TH, C, F, W):
    def kernel(mm_ref, e_ref, out_ref):
        x = mm_ref[:]
        parts = [jax.lax.slice(x, (c, 0), (TH * C, 128), (C, 1))[:, :F]
                 for c in range(C)]
        xa = jnp.concatenate(parts, axis=1)              # (TH, C*F)
        out_ref[:] = jax.lax.dot_general(
            xa, e_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)

    return kernel


def k_vE(TH, C, F, W):
    FC = F * C

    def kernel(mm_ref, out_ref):
        x = mm_ref[:]
        xt = jnp.swapaxes(x.reshape(TH, C, 128), 1, 2)   # (TH, 128, C)
        parts = [xt[:, f, :] for f in range(F)]          # (TH, C) each
        if FC < W:
            parts.append(jnp.zeros((TH, W - FC), x.dtype))
        out_ref[:] = jnp.concatenate(parts, axis=1)

    return kernel


def k_vP(TH, C, F, W):
    # transpose with the FULL 128 feature lanes (aligned minor dims
    # throughout), then lane-slice the first F*C: the flatten collapses
    # (128, C) — both native tile sizes — instead of the unaligned
    # (F, C) collapse that v0 dies on
    FC = F * C

    def kernel(mm_ref, out_ref):
        x = mm_ref[:]
        xt = jnp.swapaxes(x.reshape(TH, C, 128), 1, 2)   # (TH, 128, C)
        full = xt.reshape(TH, 128 * C)                   # lane f*C+c
        out = full[:, :W]
        if FC < W:   # zero the pad lanes (they hold feature F's block)
            lane = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1)
            out = jnp.where(lane < FC, out, 0.0)
        out_ref[:] = out

    return kernel


def k_vS(TH, C, F, W):
    # per-h 2-D transpose + per-f DIRECT stores into the output ref at
    # static offsets (no vector concats, so no offset-mismatch relayout)
    def kernel(mm_ref, out_ref):
        out_ref[:] = jnp.zeros((TH, W), mm_ref.dtype)
        for h in range(TH):
            bt = mm_ref[h * C:(h + 1) * C, :].T          # (128, C)
            for f in range(F):
                out_ref[h:h + 1, f * C:(f + 1) * C] = bt[f:f + 1, :]

    return kernel


def call_simple(body, mm, C, F, W, TH):
    H = mm.shape[0] // C
    return pl.pallas_call(
        body(TH, C, F, W),
        grid=(H // TH,),
        in_specs=[pl.BlockSpec((TH * C, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), mm.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(mm)


def call_vC(mm, C, F, W, TH):
    H = mm.shape[0] // C
    CF = C * F
    E = np.zeros((CF, W), np.float32)
    for c in range(C):
        for f in range(F):
            E[c * F + f, f * C + c] = 1.0
    Ed = jnp.asarray(E)
    return pl.pallas_call(
        k_vC(TH, C, F, W),
        grid=(H // TH,),
        in_specs=[pl.BlockSpec((TH * C, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CF, W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), mm.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(mm, Ed)


def xla_ref(mm, C, F, W):
    H = mm.shape[0] // C
    m3 = mm.reshape(H, C, 128)[:, :, :F]
    out = jnp.swapaxes(m3, 1, 2).reshape(H, F * C)
    if F * C < W:
        out = jnp.concatenate(
            [out, jnp.zeros((H, W - F * C), mm.dtype)], axis=1)
    return out


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    emit(devices=str(jax.devices()), repeat=REPEAT)
    rt = 0.0 if smoke else round_trip()
    emit(tag="round_trip_ms", t_ms=rt * 1e3)
    rng = np.random.default_rng(0)
    C = 32
    H = 1024 if smoke else 65536          # 262k quad-scheme table
    for F_n in (7, 25):
        W = -(-F_n * C // 128) * 128
        mm = jnp.asarray(rng.standard_normal((H * C, 128)), jnp.float32)
        want = jax.jit(lambda m: xla_ref(m, C, F_n, W))(mm)
        t_x = timeit(lambda m: xla_ref(m, C, F_n, W), mm, rt=rt)
        emit(tag="xla", F=F_n, t_ms=t_x)
        for name, fn, ths in (
                ("v0_current",
                 lambda m, th: call_simple(k_v0, m, C, F_n, W, th), (64,)),
                ("vA_perh",
                 lambda m, th: call_simple(k_vA, m, C, F_n, W, th),
                 (8, 16, 32)),
                ("vC_matmul",
                 lambda m, th: call_vC(m, C, F_n, W, th), (32, 64, 256)),
                ("vE_concat",
                 lambda m, th: call_simple(k_vE, m, C, F_n, W, th),
                 (32, 64)),
                ("vP_full128",
                 lambda m, th: call_simple(k_vP, m, C, F_n, W, th),
                 (16, 64)),
                ("vS_store",
                 lambda m, th: call_simple(k_vS, m, C, F_n, W, th),
                 (8, 16)),
        ):
            for th in ths:
                row = {"tag": "variant", "name": name, "F": F_n,
                       "tile_h": th}
                try:
                    if smoke:
                        with pltpu.force_tpu_interpret_mode():
                            got = jax.jit(
                                lambda m: fn(m, th))(mm)
                            t = -1.0
                    else:
                        got = jax.jit(lambda m: fn(m, th))(mm)
                        jax.block_until_ready(got)
                        t = timeit(lambda m: fn(m, th), mm, rt=rt)
                    row["exact"] = bool(jnp.all(got == want))
                    row["t_ms"] = t
                    row["ok"] = row["exact"]
                except Exception as e:
                    row["ok"] = False
                    txt = str(e)
                    pos = txt.find("Mosaic failed")
                    row["error"] = (txt[pos:pos + 300] if pos >= 0
                                    else repr(e)[:300])
                emit(**row)
    emit(done=True)


if __name__ == "__main__":
    main()
