"""TPU bench: the chunked swarm env step — where does the 310 ms/step
at N=16384 go, and does the blocked two-stage top-k help at moderate N?
(At N>16384 the blocked form is already the default — the single-stage
giant-lane sort is the suspected device-faulter.)

Sync-mode protocol per experiments/bench_ell_tpu.py.
Writes JSON lines to experiments/bench_swarm_env_tpu.json.
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

from graph_neural_networks_tpu.data import flocking as F

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bench_swarm_env_tpu.json")
out_f = open(OUT, "w", buffering=1)
REPEAT = 10


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def device_time(fn, *args, iters=3):
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best / REPEAT


@partial(jax.jit, static_argnames=("chunk", "d_max"))
def env_chain(pos, vel, v0, chunk, d_max):
    """REPEAT chained env steps (library defaults for this N)."""
    r = 2.0

    def step(i, carry):
        pos, vel, v = carry
        idx, valn, st, v = F._jnp_env_step_chunked(
            pos, vel, r, d_max, chunk, v, lam_iters=8)
        # tiny dependence so the loop cannot be elided
        pos = pos + 0.0 * st[:, :2]
        return (pos, vel, v)

    out = jax.lax.fori_loop(0, REPEAT, step, (pos, vel, v0))
    return out[0]


@partial(jax.jit, static_argnames=("chunk", "d_max", "block"))
def topk_only_chain(mf, d_max, chunk, block):
    def step(i, acc):
        scores = mf + 0.0 * acc          # data-dependence: no DCE/hoist
        if block:
            v, ix = F._topk_blocked(scores, d_max, block)
        else:
            v, ix = jax.lax.top_k(scores, d_max)
        return acc + v.sum()

    return jax.lax.fori_loop(0, REPEAT, step, jnp.zeros(()))


def main():
    emit(devices=str(jax.devices()), repeat=REPEAT)
    _ = float(jnp.sum(jnp.ones((8, 8))))
    rng = np.random.default_rng(0)

    N, B, D = 16384, 1, 32
    env = F.Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                                 samplingTime=0.01,
                                 rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, B, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    pos = jnp.asarray(ip, jnp.float32)
    vel = jnp.asarray(iv, jnp.float32)
    v0 = jnp.ones((B, N), jnp.float32) / np.sqrt(N)

    # full env step (current defaults: single-stage top_k at 16384)
    for chunk in (4096, 2048):
        t = device_time(env_chain, pos, vel, v0, chunk, D)
        emit(tag="env_step", N=N, chunk=chunk, t_ms=t * 1e3)

    # bare top-k over one chunk's scores: single vs blocked
    mf = (jnp.asarray(rng.random((B, 4096, N)), jnp.float32)
          < 0.002).astype(jnp.float32)
    t1 = device_time(topk_only_chain, mf, D, 4096, 0)
    emit(tag="topk_single", rows=4096, N=N, t_ms=t1 * 1e3)
    t2 = device_time(topk_only_chain, mf, D, 4096, 2048)
    emit(tag="topk_blocked", rows=4096, N=N, t_ms=t2 * 1e3,
         speedup=t1 / t2)

    emit(done=True)


if __name__ == "__main__":
    main()
