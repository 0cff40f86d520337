"""262k sharded EVAL-mode rollout on chip at n_parts=1 (VERDICT r4 #5
done-criterion): the mesh cost rollout — fused step-mode policy,
d_max=0 env (no selection block), sharded window-lambda — measured as
the marginal scan step through `sharded_swarm_rollout(
return_cost=True)` on a 1-device mesh, vs the single-chip
`rollout_cost` at the same config.

Writes experiments/probe_sharded_eval_262k.json.
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
out_f = open(os.path.join(HERE, "probe_sharded_eval_262k.json"), "w",
             buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    emit(devices=str(jax.devices()))
    float(jnp.zeros(8).sum())
    from jax.sharding import Mesh
    from graph_neural_networks_tpu import parallel as par
    from graph_neural_networks_tpu.data.flocking import Flocking
    from graph_neural_networks_tpu.models import architectures_time as archt

    N = 2048 if smoke else 262144
    D = 32
    env = Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                               samplingTime=0.01,
                               rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, 1, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    net = archt.LocalGNN_DB([6, 32], [4], True, "tanh", [2], 1)
    params = net.init(jax.random.PRNGKey(1), N=64, T=4)
    mesh = Mesh(np.array(jax.devices()[:1]), ("graph",))
    pos_p, vel_p, n_orig = par.pad_swarm(ip, iv, mesh)

    def t_roll(T):
        roll = par.sharded_swarm_rollout(
            T, net.causal_window, net, env.commRadius,
            env.samplingTime, env.accelMax, d_max=D, mesh=mesh,
            n_orig=n_orig, lam_iters=0, env_grid=True, step_mode=True,
            return_cost=True)
        out = roll(params, pos_p, vel_p)
        cf = float(out[0])            # scalar d2h = real barrier
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = roll(params, pos_p, vel_p)
            float(out[0])
            best = min(best, time.perf_counter() - t0)
        return best * 1e3, cf, bool(out[-1])

    t_s, cf_s, ok_s = t_roll(5)
    t_l, cf_l, ok_l = t_roll(25)
    step = (t_l - t_s) / 20
    emit(tag="sharded_eval_262k", n_parts=1, t5_ms=t_s, t25_ms=t_l,
         step_ms=step, ok=ok_s and ok_l, cost_t25=cf_l,
         agent_steps_per_s=N / (step / 1e3))

    # single-chip reference at the same config
    env.rollout_ell_degree = D
    env.rollout_lam_method = "power"
    env.rollout_env_grid = True
    t0 = time.perf_counter()
    cf1, _ = env.rollout_cost(ip, iv, 0.25, net, params,
                              lam_iters=0)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    cf1, _ = env.rollout_cost(ip, iv, 0.25, net, params,
                              lam_iters=0)
    t_single = time.perf_counter() - t0
    emit(tag="single_chip_rollout_cost", T=25,
         t_s=round(t_single, 3), t_with_compile_s=round(t_first, 1),
         cost=cf1,
         rel_cost_diff=abs(cf_l - cf1) / max(abs(cf1), 1e-9))
    emit(done=True)


if __name__ == "__main__":
    main()
