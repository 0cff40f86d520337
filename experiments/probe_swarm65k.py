"""Bisect the N=65536 chunked-env TPU failure (large_swarm_tpu2.py:
'UNAVAILABLE: TPU device error' at N>=65536 while N=16384 runs fine).

Components tried in isolation, cheapest first, each guarded: bare
top_k at the failing shape, one chunked env step (no scan), ELL matvec
power iteration, then a T=5 rollout; chunk 4096 and 2048 variants.

Writes JSON lines to experiments/probe_swarm65k.json.
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
from graph_neural_networks_tpu.data.flocking import Flocking
from graph_neural_networks_tpu.models import architectures_time as archt

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "probe_swarm65k.json")
out_f = open(OUT, "w", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def guard(tag, fn):
    t0 = time.perf_counter()
    try:
        r = fn()
        jax.block_until_ready(r)
        emit(tag=tag, ok=True, t_s=time.perf_counter() - t0)
        return True
    except Exception as e:
        emit(tag=tag, ok=False, t_s=time.perf_counter() - t0,
             error=repr(e)[:300])
        return False


def main():
    emit(devices=str(jax.devices()))
    _ = float(jnp.sum(jnp.ones((8, 8))))
    rng = np.random.default_rng(0)
    N = 65536

    env = Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                               samplingTime=0.01,
                               rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, 1, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    pos = jnp.asarray(ip, jnp.float32)
    vel = jnp.asarray(iv, jnp.float32)
    v0 = jnp.ones((1, N), jnp.float32) / np.sqrt(N)

    # 1. SAFE path first: one chunked env step (now uses the blocked
    # two-stage top-k at this N); the suspected faulter runs LAST so a
    # re-fault cannot block the information we need most.
    ok = False
    for chunk in (4096, 2048):
        step = jax.jit(lambda p, v, vp, c=chunk: F._jnp_env_step_chunked(
            p, v, 2.0, 32, c, vp, lam_iters=8))
        ok = guard(f"env_step_chunk{chunk}", lambda: step(pos, vel, v0))
        if ok:
            break

    # 2. short rollout on the safe path
    if ok:
        arch = archt.LocalGNN_DB([6, 16], [3], True, "tanh", [2], 1)
        params = arch.init(jax.random.PRNGKey(0), N=32, T=3)
        policy = lambda p, xw, Sw: arch.apply(
            p, jnp.asarray(xw, jnp.float32), Sw)
        roll = env._scan_rollout(5, arch.causal_window, policy,
                                 ell_degree=32, lam_method="power",
                                 env_chunk=4096, lam_iters=8)
        guard("rollout_T5", lambda: roll(params, pos, vel))

    # 3. LAST: the suspected faulter — bare single-stage top_k at
    # (1, 4096, 65536). May wedge the chip for hours; gated behind an
    # env var so routine reruns don't risk losing the device.
    if os.environ.get("PROBE_RUN_FAULTER") == "1":
        x = jnp.asarray(rng.random((1, 4096, N)), jnp.float32)
        guard("topk_single_4096x65536",
              lambda: jax.jit(lambda a: jax.lax.top_k(a, 32))(x))
    else:
        emit(tag="topk_single_4096x65536", skipped=True,
             note="set PROBE_RUN_FAULTER=1 to run the suspected faulter")

    emit(done=True)


if __name__ == "__main__":
    main()
