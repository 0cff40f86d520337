"""Can a Pallas kernel beat XLA's row gather on TPU?

XLA's take_along_axis costs ~7-8 ns per gathered row (flat in N and
row width, bench_ell_tpu_r2.json) — about 7 cycles/row on one v5e
TensorCore, i.e. already latency-bound. Candidates:

  A. xla_take          — baseline jnp.take_along_axis
  B. pallas_smem_loop  — idx scalar-prefetched; fori over rows,
                         dynamic VMEM slice per row
  C. pallas_take       — jnp.take(x, idx) inside the kernel (Mosaic
                         dynamic_gather lowering, if supported)
  D. pallas_onehot     — per 128-source-block one-hot matmul on MXU
  E. xla_onehot_mm     — one-hot matmul in plain XLA (MXU, O(N^2/128))

Shapes: x (N, W) f32, idx (M,) int32 uniform, M = N*D.
Writes experiments/probe_pallas_gather.json.
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
out_f = open(os.path.join(HERE, "probe_pallas_gather.json"), "w", buffering=1)
REPEAT = 20


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def timeit(fn, *args):
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPEAT):
            r = g(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best / REPEAT * 1e3


# ---------------------------------------------------------------- variants
def xla_take(x, idx):
    return jnp.take_along_axis(x, idx[:, None], axis=0)


def make_pallas_smem_loop(N, W, M, mt=2048):
    def kernel(idx_ref, x_ref, o_ref):
        j = pl.program_id(0)

        def body(m, _):
            o_ref[m, :] = x_ref[idx_ref[j * mt + m], :]
            return 0
        jax.lax.fori_loop(0, mt, body, 0)

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(M // mt,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((mt, W), lambda j, i: (j, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((M, W), x.dtype),
        )(idx, x)
    return run


def make_pallas_take(N, W, M, mt=4096):
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            grid=(M // mt,),
            in_specs=[
                pl.BlockSpec((N, W), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mt,), lambda j: (j,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((mt, W), lambda j: (j, 0)),
            out_shape=jax.ShapeDtypeStruct((M, W), x.dtype),
        )(x, idx)
    return run


def make_pallas_onehot(N, W, M, ot=256):
    # per output tile: loop over source blocks of 128, build one-hot
    # (ot,128) for indices in that block, matmul with x block (128,W)
    nsb = N // 128

    def kernel(x_ref, idx_ref, o_ref):
        idx = idx_ref[:]                      # (ot,)
        acc = jnp.zeros((ot, W), jnp.float32)

        def body(b, acc):
            lo = b * 128
            loc = idx - lo                    # (ot,)
            oh = (loc[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (ot, 128), 1))
            oh = oh.astype(jnp.float32)
            return acc + jnp.dot(oh, x_ref[pl.ds(lo, 128), :],
                                 preferred_element_type=jnp.float32)
        acc = jax.lax.fori_loop(0, nsb, body, acc)
        o_ref[:] = acc

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            grid=(M // ot,),
            in_specs=[
                pl.BlockSpec((N, W), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ot,), lambda j: (j,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ot, W), lambda j: (j, 0)),
            out_shape=jax.ShapeDtypeStruct((M, W), x.dtype),
        )(x, idx)
    return run


def main():
    emit(devices=str(jax.devices()), repeat=REPEAT)
    _ = float(jnp.sum(jnp.ones((8, 8))))
    rng = np.random.default_rng(0)
    for N, W, D in [(16384, 8, 32), (16384, 128, 32), (65536, 8, 32),
                    (4096, 128, 16)]:
        M = N * D
        x = jnp.asarray(rng.normal(size=(N, W)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, size=(M,)), jnp.int32)
        ref = np.asarray(jax.jit(xla_take)(x, idx))
        t0 = timeit(xla_take, x, idx)
        emit(tag="xla_take", N=N, W=W, M=M, t_ms=t0,
             ns_per_row=t0 * 1e6 / M)
        for name, maker in [("pallas_smem_loop", make_pallas_smem_loop),
                            ("pallas_take", make_pallas_take),
                            ("pallas_onehot", make_pallas_onehot)]:
            try:
                run = maker(N, W, M)
                got = np.asarray(run(x, idx))
                ok = bool(np.array_equal(got, ref))
                t = timeit(run, x, idx)
                emit(tag=name, N=N, W=W, M=M, t_ms=t,
                     ns_per_row=t * 1e6 / M, ok=ok,
                     speedup=t0 / t)
            except Exception as e:  # noqa
                emit(tag=name, N=N, W=W, error=str(e)[:300])
    emit(done=True)


if __name__ == "__main__":
    main()
