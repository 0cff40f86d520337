"""Prototype the round-6 cell-centric candidate fetch: can a Pallas
kernel stream a slot-tile's 3x3-neighborhood union as THREE contiguous
row-span DMAs instead of per-agent row gathers?

Context (probe_eval_itemize_r5 + probe_gather_variants_r5): the 262k
eval step is dominated by the per-agent candidate gather (33.4 ms —
1M rows at W=896; inherent, not layout), while a contiguous stream of
the same table is ~0.7 GB = HBM-bandwidth work. Under ABSOLUTE
(non-modular) cell indexing, slots h..h+TH-1 of one row-block have
their 3x3 neighborhoods inside three contiguous spans
[h-Gx-1, h-Gx+TH+1), [h-1, h+TH+1), [h+Gx-1, h+Gx+TH+1). This probe
measures a kernel that DMAs those spans per tile and reduces them
(sum over the 9 candidate rows per slot — a stand-in for the window
math), checked against an XLA take-based reference, vs the per-agent
gather cost at the same total candidate volume.

Writes experiments/probe_span_fetch_r5.json.
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
out_f = open(os.path.join(HERE, "probe_span_fetch_r5.json"), "w",
             buffering=1)
REPEAT = 10


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def round_trip():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,))
    float(f(x)[0])
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


def make_span_kernel(TH, W, Gx):
    # DMA slice lengths on dim 0 must be multiples of the (8,128)
    # tiling — round the span up and over-fetch a few rows
    SP = -(-(TH + 2) // 8) * 8

    def kernel(tbl_ref, out_ref, s0, s1, s2, sem0, sem1, sem2):
        i = pl.program_id(0)
        h0 = (i * TH) + Gx + 1          # slots offset by the halo pad
        dmas = []
        for span, sem, base in ((s0, sem0, h0 - Gx - 1),
                                (s1, sem1, h0 - 1),
                                (s2, sem2, h0 + Gx - 1)):
            d = pltpu.make_async_copy(
                tbl_ref.at[pl.ds(base, SP), :], span, sem)
            d.start()
            dmas.append(d)
        # wait all three, then reduce: out[j] = sum of the 9 window
        # rows of slot j (3 consecutive rows in each span)
        for d in dmas:
            d.wait()
        acc = (s0[0:TH, :] + s0[1:TH + 1, :] + s0[2:TH + 2, :]
               + s1[0:TH, :] + s1[1:TH + 1, :] + s1[2:TH + 2, :]
               + s2[0:TH, :] + s2[1:TH + 1, :] + s2[2:TH + 2, :])
        out_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("TH", "Gx", "interpret"))
def span_reduce(tbl_halo, *, TH, Gx, interpret=False):
    """tbl_halo: (H + 2*(Gx+1) padded, W) — table with Gx+1 halo rows
    on each side. Returns (H, W): out[h] = sum of rows {h-1,h,h+1} +
    {h-Gx-1,..} + {h+Gx-1,..} (the 3x3 union reduce)."""
    Hp, W = tbl_halo.shape
    H = Hp - 2 * (Gx + 1) - 8
    Ht = H // TH
    SP = -(-(TH + 2) // 8) * 8
    return pl.pallas_call(
        make_span_kernel(TH, W, Gx),
        grid=(Ht,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TH, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), tbl_halo.dtype),
        scratch_shapes=[
            pltpu.VMEM((SP, W), tbl_halo.dtype),
            pltpu.VMEM((SP, W), tbl_halo.dtype),
            pltpu.VMEM((SP, W), tbl_halo.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=bool(interpret),
    )(tbl_halo)


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    emit(devices=str(jax.devices()))
    rt = 0.0 if smoke else round_trip()
    emit(tag="rt_ms", t_ms=rt * 1e3)
    rng = np.random.default_rng(0)
    N = 262144 if not smoke else 4096
    H = 65536 if not smoke else 1024
    Gx = 256 if not smoke else 32
    W = 896
    TH = 16
    tbl = rng.standard_normal((H, W)).astype(np.float32)
    halo = np.concatenate([np.zeros((Gx + 1, W), np.float32), tbl,
                           np.zeros((Gx + 1 + 8, W), np.float32)])
    tbl_d = jnp.asarray(halo)

    # XLA reference of the same reduce (shifted adds on the padded
    # table — itself a fair streamed-baseline)
    def xla_ref(th):
        out = jnp.zeros((H, W), th.dtype)
        for d in (-Gx - 1, -Gx, -Gx + 1, -1, 0, 1, Gx - 1, Gx, Gx + 1):
            out = out + jax.lax.dynamic_slice(
                th, (Gx + 1 + d, 0), (H, W))
        return out

    want = jax.jit(xla_ref)(tbl_d)
    got = span_reduce(tbl_d, TH=TH, Gx=Gx, interpret=smoke)
    exact = bool(jnp.all(got == want))
    emit(tag="exact", exact=exact)
    t_span = timeit(lambda t: span_reduce(t, TH=TH, Gx=Gx,
                                          interpret=smoke),
                    tbl_d, rt=rt)
    t_xla = timeit(xla_ref, tbl_d, rt=rt)

    # the per-agent gather this replaces at equal candidate volume:
    # 9 window rows per agent would be 9N rows; the CURRENT quad
    # scheme gathers 4N rows — time 4N as the deployed baseline
    idx = jnp.asarray(rng.integers(0, H, size=4 * N), jnp.int32)
    t_gather = timeit(
        lambda t, i: jnp.take(t, i, axis=0), jnp.asarray(tbl), idx,
        rt=rt)
    emit(tag="span_fetch", H=H, W=W, TH=TH,
         span_kernel_ms=t_span, xla_shift_ms=t_xla,
         per_agent_gather_4N_ms=t_gather, exact=exact,
         note="span kernel replaces BOTH the 4N-row gather and the "
              "window fetch; the real v3 kernel would add the mask/"
              "state math on the fetched spans")
    emit(done=True)


if __name__ == "__main__":
    main()
