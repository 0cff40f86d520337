"""Probe the scatter-free (gather) grid-table build vs the element
scatter at N=262144, payload widths P=0 and P=18 (the fused-policy
payload), on TPU.

Itemized: sort+rank prefix (shared), searchsorted src map, fs128 pad,
H*C-row gather, Pallas table_transpose (and the XLA swapaxes transpose
it replaces), plus end-to-end build parity (bit-exact) and a full grid
env step under each builder.

Timing protocol: queue REPEAT dispatches, block once, and subtract the
tunnel round-trip (null-dispatch min) — CLAUDE.md measurement notes.

Writes experiments/probe_build_gather.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from graph_neural_networks_tpu.data import flocking as F
from graph_neural_networks_tpu.ops import gridwin

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "probe_build_gather.json"), "w",
             buffering=1)
REPEAT = 10


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def round_trip():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,))
    float(f(x)[0])   # scalar d2h: force the tunnel into sync mode
    jax.block_until_ready(f(x))
    best = float("inf")
    for _ in range(20):
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


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    emit(devices=str(jax.devices()), repeat=REPEAT)
    rt = round_trip()
    emit(tag="round_trip_ms", t_ms=rt * 1e3)
    rng = np.random.default_rng(0)
    N = 4096 if smoke else 262144
    r = 2.0
    H, Gx, Gy, C = F._grid_geometry(N, None, 32, 2)
    emit(tag="geometry", H=H, Gx=Gx, Gy=Gy, C=C, slots=H * C)
    # ~flocking density: the round-3/4 probes use the Flocking.large
    # initial condition scale (~sqrt(N) box at fixed density)
    side = 3.0 * np.sqrt(N)
    px = jnp.asarray(rng.uniform(0, side, N), jnp.float32)
    py = jnp.asarray(rng.uniform(0, side, N), jnp.float32)
    vx = jnp.asarray(rng.normal(size=N), jnp.float32)
    vy = jnp.asarray(rng.normal(size=N), jnp.float32)
    v0 = jnp.asarray(rng.normal(size=N), jnp.float32)
    pay = jnp.asarray(rng.normal(size=(N, 18)), jnp.float32)
    inv_s = 1.0 / (2 * r)

    for P, payk in ((0, dict(v=v0)), (18, dict(v=v0, pay=pay))):
        args = (px, py, vx, vy)
        bld = lambda b: (lambda *a: F._grid_build_table(
            *a, inv_s, H, Gx, Gy, C, builder=b, **payk))
        t_sc = timeit(lambda *a: bld("scatter")(*a)[0], *args, rt=rt)
        t_ga = timeit(lambda *a: bld("gather")(*a)[0], *args, rt=rt)
        t_fu = timeit(lambda *a: bld("fused")(*a)[0], *args, rt=rt)
        a = jax.jit(bld("scatter"))(*args)
        b = jax.jit(bld("gather"))(*args)
        c = jax.jit(bld("fused"))(*args)
        exact = bool(jnp.all(a[0] == b[0])) and bool(a[3]) == bool(b[3])
        exact_fu = bool(jnp.all(a[0] == c[0]))
        emit(tag="build", P=P, scatter_ms=t_sc, gather_ms=t_ga,
             fused_ms=t_fu, speedup=t_sc / t_ga,
             speedup_fused=t_sc / t_fu, exact=exact,
             exact_fused=exact_fu, ok=bool(a[3]))

        # itemization of the gather build
        Fn = 7 + P
        W = -(-Fn * C // 128) * 128
        iota = jnp.arange(N, dtype=jnp.int32)

        def prefix(px, py):
            cx = jnp.floor(px * inv_s).astype(jnp.int32)
            cy = jnp.floor(py * inv_s).astype(jnp.int32)
            h = F._grid_hash(cx, cy, Gx, Gy)
            return jax.lax.sort_key_val(h, iota)

        hs, order = jax.jit(prefix)(px, py)
        t_pre = timeit(prefix, px, py, rt=rt)

        def srcmap(hs):
            starts = jnp.searchsorted(
                hs, jnp.arange(H, dtype=hs.dtype)).astype(jnp.int32)
            counts = jnp.concatenate(
                [starts[1:], jnp.full((1,), N, jnp.int32)]) - starts
            src = starts[:, None] + jnp.arange(C, dtype=jnp.int32)[None]
            return jnp.where(
                jnp.arange(C, dtype=jnp.int32)[None]
                < jnp.minimum(counts, C)[:, None], src, N)

        src = jax.jit(srcmap)(hs)
        t_src = timeit(srcmap, hs, rt=rt)

        feats = [px, py, vx, vy, jnp.ones_like(px),
                 iota.astype(px.dtype), v0]
        f = jnp.stack(feats, axis=-1)
        if P:
            f = jnp.concatenate([f, pay], axis=-1)

        def padfs(f, order):
            fs = jnp.take(f, order, axis=0)
            return jnp.zeros((N + 1, 128), f.dtype).at[:N, :Fn].set(fs)

        fs128 = jax.jit(padfs)(f, order)
        t_pad = timeit(padfs, f, order, rt=rt)
        t_gat = timeit(
            lambda fs, s: jnp.take(fs, s.reshape(-1), axis=0),
            fs128, src, rt=rt)
        mm = jnp.take(fs128, src.reshape(-1), axis=0)
        t_xp = timeit(lambda m: gridwin.table_transpose(m, C=C, F=Fn),
                      mm, rt=rt)

        def xla_xpose(mm):
            m3 = mm.reshape(H, C, 128)[:, :, :Fn]
            out = jnp.swapaxes(m3, 1, 2).reshape(H, Fn * C)
            if Fn * C < W:
                out = jnp.concatenate(
                    [out, jnp.zeros((H, W - Fn * C), mm.dtype)], axis=1)
            return out

        t_xx = timeit(xla_xpose, mm, rt=rt)
        exact_xp = bool(jnp.all(
            gridwin.table_transpose(mm, C=C, F=Fn) == xla_xpose(mm)))
        emit(tag="items", P=P, prefix_ms=t_pre, srcmap_ms=t_src,
             pad_ms=t_pad, gather_ms=t_gat, pallas_xpose_ms=t_xp,
             xla_xpose_ms=t_xx, xpose_exact=exact_xp,
             sum_ms=t_pre + t_src + t_pad + t_gat + t_xp)

    # full grid env step (lam fold, payload 18) under each builder
    pos = jnp.stack([px, py])[None]
    vel = jnp.stack([vx, vy])[None]

    def step(builder):
        os.environ["GNT_BUILD"] = builder
        try:
            fn = lambda p, v, vv, pp: F._jnp_env_step_grid(
                p, v, r, 64, vv, lam_iters=0, cell_cap=C,
                cell_factor=2, payload=pp)
            t = timeit(fn, pos, vel, v0[None], pay[None], rt=rt)
            out = jax.jit(fn)(pos, vel, v0[None], pay[None])
            return t, bool(out[-1])
        finally:
            os.environ.pop("GNT_BUILD", None)

    t_s, ok_s = step("scatter")
    t_g, ok_g = step("gather")
    t_f, ok_f = step("fused")
    emit(tag="env_step_pay18", scatter_ms=t_s, gather_ms=t_g,
         fused_ms=t_f, speedup=t_s / t_g, speedup_fused=t_s / t_f,
         ok=(ok_s, ok_g, ok_f))
    emit(done=True)


if __name__ == "__main__":
    main()
