"""TPU: flash band attention — parity vs XLA band path + layer bench.

Configs mirror RESULTS.md round-2 attention bench (N=2048 parity-speed
point; N=16384 scale point where dense attention cannot run).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from graph_neural_networks_tpu.ops import (attention_band as ab,  # noqa: E402
                                           attention_flash as af,
                                           filters, gso as gso_lib)
import bench  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)

# ---- parity on real TPU (small) ----
N, bw, P, F, G, B = 512, 64, 2, 8, 4, 2
S, _ = bench.make_graph(N, 0.02, bw, seed=3)
g = gso_lib.as_gso(S, mode="band")
slab5 = filters._slab5(g)
x = jnp.asarray(rng.standard_normal((B, G, N)), jnp.float32)
a = jnp.asarray(rng.standard_normal((P, 1, 2 * F)) * .3, jnp.float32)
W_p = jnp.asarray(rng.standard_normal((P, 1, F, G)) * .3, jnp.float32)

os.environ["GNT_NO_FLASH"] = "1"
want = np.asarray(ab.graph_attention_band(x, a, W_p, slab5, g.band_w))
gw = jax.grad(lambda x, a, W: jnp.sum(
    ab.graph_attention_band(x, a, W, slab5, g.band_w) ** 2),
    argnums=(0, 1, 2))(x, a, W_p)
del os.environ["GNT_NO_FLASH"]

got = np.asarray(af.graph_attention_band_flash(x, a, W_p, slab5, g.band_w))
err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
emit(step="parity_fwd_tpu", err=float(err), ok=bool(err < 1e-3))

gf = jax.grad(lambda x, a, W: jnp.sum(
    af.graph_attention_band_flash(x, a, W, slab5, g.band_w) ** 2),
    argnums=(0, 1, 2))(x, a, W_p)
for got_g, want_g, name in zip(gf, gw, ("x", "a", "W")):
    e = float(np.abs(np.asarray(got_g) - np.asarray(want_g)).max()
              / (np.abs(np.asarray(want_g)).max() + 1e-9))
    emit(step=f"parity_grad_{name}", err=e, ok=e < 1e-3)

# ---- bench: GAT layer fwd (and fwd+bwd) at the RESULTS configs ----
for Nb, bwb, Bb in ((2048, 256, 8), (16384, 256, 8)):
    Sb, nnz = bench.make_graph(Nb, 0.01, bwb, seed=1)
    gb = gso_lib.as_gso(Sb, mode="band")
    slab = filters._slab5(gb)
    Pb, Fb, Gb = 2, 32, 32
    xb = jnp.asarray(rng.standard_normal((Bb, Gb, Nb)), jnp.float32)
    ab_ = jnp.asarray(rng.standard_normal((Pb, 1, 2 * Fb)) * .1, jnp.float32)
    Wb = jnp.asarray(rng.standard_normal((Pb, 1, Fb, Gb)) * .1, jnp.float32)

    flash_f = jax.jit(lambda x: af.graph_attention_band_flash(
        x, ab_, Wb, slab, gb.band_w))
    flash_g = jax.jit(jax.grad(lambda x: jnp.sum(
        af.graph_attention_band_flash(x, ab_, Wb, slab, gb.band_w) ** 2)))
    t_f = timeit(lambda: flash_f(xb))
    t_g = timeit(lambda: flash_g(xb))
    emit(step="flash_layer", N=Nb, B=Bb, fwd_ms=t_f * 1e3,
         fwdbwd_ms=t_g * 1e3)

    os.environ["GNT_NO_FLASH"] = "1"
    try:
        xla_f = jax.jit(lambda x: ab.graph_attention_band(
            x, ab_, Wb, slab, gb.band_w))
        t_x = timeit(lambda: xla_f(xb))
        emit(step="xla_layer", N=Nb, B=Bb, fwd_ms=t_x * 1e3,
             speedup=t_x / t_f)
        xla_g = jax.jit(jax.grad(lambda x: jnp.sum(
            ab.graph_attention_band(x, ab_, Wb, slab, gb.band_w) ** 2)))
        t_xg = timeit(lambda: xla_g(xb))
        emit(step="xla_layer_bwd", N=Nb, B=Bb, fwdbwd_ms=t_xg * 1e3,
             speedup=t_xg / t_g)
    except Exception as ex:  # noqa: BLE001
        emit(step="xla_layer_fail", N=Nb, err=repr(ex)[:200])
    finally:
        del os.environ["GNT_NO_FLASH"]

print("DONE", flush=True)
