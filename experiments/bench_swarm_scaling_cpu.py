"""Sharded-swarm machinery on the 8-device virtual CPU mesh: identical
closed-loop trajectories at 1/2/4/8 graph shards, with per-shard
workspace accounting (real multi-chip hardware is unavailable in this
container — this validates the decomposition the way
bench_scaling_cpu_r2.json does for the static-graph path; CPU wall
times are NOT TPU-representative and are recorded only for shape).

Writes experiments/bench_swarm_scaling_cpu.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from graph_neural_networks_tpu import parallel as par  # noqa: E402
from graph_neural_networks_tpu.data.flocking import Flocking  # noqa: E402
from graph_neural_networks_tpu.models import (  # noqa: E402
    architectures_time as archt)

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bench_swarm_scaling_cpu.json")


def main():
    N, B, T, D = 64, 2, 8, 16
    env = Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                               samplingTime=0.01,
                               rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, B, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    arch = archt.LocalGNN_DB([6, 16], [3], True, "tanh", [2], 1)
    params = arch.init(jax.random.PRNGKey(0), N=32, T=3)
    policy = lambda p, xw, Sw: arch.apply(
        p, jnp.asarray(xw, jnp.float32), Sw)
    w = arch.causal_window

    results = []
    ref = None
    for shards in (1, 2, 4, 8):
        mesh = par.make_mesh((8 // shards, shards))
        pos_p, vel_p, n_orig = par.pad_swarm(ip, iv, mesh)
        roll = par.sharded_swarm_rollout(
            T, w, policy, env.commRadius, env.samplingTime,
            env.accelMax, d_max=D, mesh=mesh, n_orig=n_orig,
            lam_iters=32)
        t0 = time.perf_counter()
        pos, vel, *_ = roll(params, pos_p, vel_p)
        jax.block_until_ready(vel)
        t = time.perf_counter() - t0
        pos = np.asarray(pos)[..., :N]
        if ref is None:
            ref = pos
            max_dev = 0.0
        else:
            max_dev = float(np.abs(pos - ref).max())
        Np = pos_p.shape[-1] // shards
        rec = dict(shards=shards, N=N, T=T,
                   per_shard_rows=Np,
                   per_shard_env_workspace_floats=B * 2 * Np * N,
                   per_shard_ell_floats=B * Np * D * 2,
                   max_dev_vs_1shard=max_dev,
                   wall_s_incl_compile=t)
        results.append(rec)
        print(json.dumps(rec), flush=True)
        assert max_dev < 1e-4, max_dev

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
