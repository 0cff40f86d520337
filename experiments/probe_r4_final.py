"""Round-4 final TPU probes.

1. 1M-agent closed-loop rollout on the quad+fold stack (VERDICT #1's
   "1M step <= ~2 s" target; r3 was 3.62 s/step) — marginal-step
   method, all outputs consumed.
2. Fused-policy feasibility measurements (TODO round-5 idea): the
   payload-shift fusion would widen the table/gather and add a bigger
   build scatter; measure those primitives so the design can be
   decided on numbers:
     a. gather 4N rows at W=1024 (the 7+18-feature fused table),
     b. fancy scatter of (N, 25) features,
     c. the policy's current ELL register gather from an f32 source
        vs a bf16 source (physical table 134 MB -> 67 MB: does the
        table-size effect halve the per-row cost?).

Writes experiments/probe_r4_final.json.
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
from graph_neural_networks_tpu.models import architectures_time as archt

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "probe_r4_final.json"), "w", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def rt_measure():
    z = jnp.ones((8, 8))
    float(jnp.sum(z))
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        float(jnp.sum(z))
        best = min(best, time.perf_counter() - t0)
    return best


def bench(fn, *args, iters=10):
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    rt = rt_measure()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = g(*args)
        jax.block_until_ready(r)
        best = min(best, max(time.perf_counter() - t0 - rt, 1e-9))
    return best / iters * 1e3


def bench_once(fn, *args):
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        r = g(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    emit(devices=str(jax.devices()), rt_ms=rt_measure() * 1e3)

    # ---- 1. the 1M-agent rollout ----------------------------------------
    N, D, B = 1048576, 32, 1
    env = F.Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                 samplingTime=0.01,
                                 rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, B, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    pos = jnp.asarray(ip, jnp.float32)
    vel = jnp.asarray(iv, jnp.float32)
    net = archt.LocalGNN_DB(dimNodeSignals=[6, 32], nFilterTaps=[4],
                            bias=True, nonlinearity="tanh",
                            dimReadout=[2], dimEdgeFeatures=1)
    params = net.init(jax.random.PRNGKey(1), N=64, T=4)
    init_fn, step_fn = env._chunked_pieces(
        net.causal_window, net, D, None, 0, step_mode=True,
        env_grid=True)

    def chain(T):
        def f(params, pos, vel):
            carry, ys = jax.lax.scan(
                lambda c, _: step_fn(params, c),
                init_fn(pos, vel)[0], None, length=T)
            return sum(jnp.sum(jnp.asarray(l, jnp.float32))
                       for l in jax.tree_util.tree_leaves((carry, ys)))
        return f
    t3 = bench_once(chain(3), params, pos, vel)
    t13 = bench_once(chain(13), params, pos, vel)
    step_ms = (t13 - t3) / 10
    emit(tag="swarm_1M_fold", t_chain3_ms=t3, t_chain13_ms=t13,
         step_ms=step_ms, agent_steps_per_s=N / (step_ms / 1e3))

    # exactness flag at 1M (one step)
    v0 = jnp.ones((B, N), jnp.float32) / np.sqrt(N)
    *_, okv = jax.jit(lambda p, v, vv: F._jnp_env_step_grid(
        p, v, 2.0, D, vv, lam_iters=0))(pos, vel, v0)
    emit(tag="swarm_1M_ok", ok=bool(okv))
    del pos, vel

    # ---- 2. fused-policy feasibility primitives -------------------------
    N2 = 262144
    rng = np.random.default_rng(0)
    H = 65536
    for W in (256, 1024):
        table = jnp.asarray(rng.random((H, W)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, H, 4 * N2), jnp.int32)
        t = bench(lambda tb, ix: jnp.sum(
            jnp.take(tb, ix, axis=0)[:, :1]), table, idx)
        emit(tag=f"gather_4N_W{W}", t_ms=t,
             table_mb=H * W * 4 / 2 ** 20)
    for nf in (7, 25):
        C, W = 32, 128 * ((7 * 32 + (nf - 7) * 32 + 127) // 128)
        hs = np.sort(rng.integers(0, H, N2)).astype(np.int64)
        rankl = rng.integers(0, C, N2)
        base = jnp.asarray(hs * W + rankl, jnp.int32)
        posm = base[:, None] + (jnp.arange(nf, dtype=jnp.int32) * C)[None]
        fs = jnp.asarray(rng.random((N2, nf)), jnp.float32)
        t = bench(lambda p, f: jnp.zeros((H * W,), jnp.float32)
                  .at[p].set(f, mode="drop")[0], posm, fs)
        emit(tag=f"fancy_scatter_{nf}f_W{W}", t_ms=t)
    # policy ELL register gather, f32 vs bf16 source
    Dp = 32
    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        src = jnp.asarray(rng.random((1, N2, 18)), dt)
        ix = jnp.asarray(rng.integers(0, N2, (1, N2 * Dp, 1)), jnp.int32)
        t = bench(lambda s, i: jnp.sum(
            jnp.take_along_axis(s, i, axis=-2)[..., 0]
            .astype(jnp.float32)), src, ix)
        emit(tag=f"ell_reg_gather_{name}", t_ms=t, rows=N2 * Dp)
    emit(done=True)


if __name__ == "__main__":
    main()
