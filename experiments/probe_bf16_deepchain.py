"""Deep-chain bf16 band-kernel measurement (VERDICT r4 item 6).

The r4 finding: blocked-dispatch protocols leak RT/iters per op, which
at ~24 ms RT inflated the bf16 band number by ~15 us/shift ("bf16 at
60% of peak" was mostly tunnel round-trip). The honest protocol chains
MANY shifts in one dispatched fori_loop, measures the tunnel RT with a
null dispatch, and subtracts it; at 512-deep chains the per-shift
residual of the RT is 24 ms / 512 = 47 ns — negligible. This probe is
the missing artifact for the quoted 25.7 us/shift / 3,111 G edges/s
claim (TODO.md r4): it measures f32 and bf16 at several chain depths
so the depth-convergence is visible in the data.

Writes experiments/probe_bf16_deepchain.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "probe_bf16_deepchain.json"), "w",
             buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def main():
    smoke = "--smoke" in sys.argv
    ctx = None
    if smoke:
        jax.config.update("jax_platforms", "cpu")
        from jax.experimental.pallas import tpu as pltpu
        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
    emit(devices=str(jax.devices()))
    from bench import make_graph, measure_peak, _tunnel_rt
    from graph_neural_networks_tpu.ops import spmm
    N, R, bw = 4096, 512, 256
    S, nnz = make_graph(N, 0.01, bw)
    rng = np.random.default_rng(0)
    bs = 128
    s_band, w = spmm.dense_to_band(S, bs)
    nb = s_band.shape[0]
    ct = spmm.auto_col_tile(N, bs)
    rt = _tunnel_rt()
    emit(tag="rt_ms", t_ms=rt * 1e3)
    for dtname, dt, prec in (
            ("f32", jnp.float32, jax.lax.Precision.HIGHEST),
            ("bf16", jnp.bfloat16, jax.lax.Precision.DEFAULT)):
        sb = jnp.asarray(s_band, dt)
        x = jnp.asarray(rng.random((R, N)), dt)
        flops = 2 * R * nb * (2 * w + 1) * bs * bs
        # depths must keep the chain long vs the tunnel RT (~24 ms):
        # at depth 512 a bf16 chain is ~13 ms — RT-subtraction noise
        # still ~10% — so go deeper; the first run's 32/128-deep rows
        # were pure RT noise (one even "beat" the roofline)
        for depth in ((2,) if smoke else (512, 2048, 4096)):
            @jax.jit
            def run(x):
                return jax.lax.fori_loop(
                    0, depth,
                    lambda i, z: spmm.band_matmul(
                        z, sb, n_cols=N, w=w, col_tile=ct,
                        precision=prec), x)

            run(x).block_until_ready()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run(x).block_until_ready()
                best = min(best,
                           max(time.perf_counter() - t0 - rt, 1e-9))
            t_shift = best / depth
            peak = 0.0 if smoke else measure_peak(dtname)
            emit(tag="chain", dtype=dtname, depth=depth,
                 t_shift_us=t_shift * 1e6,
                 edges_per_s=R * nnz / t_shift,
                 g_edges_per_s=R * nnz / t_shift / 1e9,
                 roofline_pct=(100.0 * flops / t_shift / peak
                               if peak else None))
    emit(done=True)


if __name__ == "__main__":
    main()
