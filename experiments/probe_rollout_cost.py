"""Probe the on-device evaluation path (Flocking.rollout_cost) vs
compute_trajectory + host evaluate at N=262144, T=50 on TPU.

The trajectory path materializes (B,T,2,N) pos/vel (+ accel/states)
and pulls them f64 through the device tunnel (~25 MB/s this session);
rollout_cost accumulates the cost in the scan carry and pulls two
scalars. Both use the fused grid rollout; costs must agree to f32
tolerance.

Writes experiments/probe_rollout_cost.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "probe_rollout_cost.json"), "w",
             buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    emit(devices=str(jax.devices()))
    from graph_neural_networks_tpu.data.flocking import Flocking
    from graph_neural_networks_tpu.models import (
        architectures_time as archt)
    N = 2048 if smoke else 262144
    T_s = 0.2 if smoke else 0.5            # duration (dt=0.01)
    env = Flocking.for_rollout(N, commRadius=2.0, repelDist=1.0,
                               samplingTime=0.01,
                               rng=np.random.default_rng(0))
    ip, iv = env.compute_initial_positions(
        N, 1, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    net = archt.LocalGNN_DB([6, 32], [4], True, "tanh", [2], 1)
    params = net.init(jax.random.PRNGKey(1), N=64, T=4)
    kw = dict(ell_degree=32, env_grid=True,
              history_window=net.causal_window)

    # on-device cost (compile, then timed)
    t0 = time.perf_counter()
    cf, ce = env.rollout_cost(ip, iv, T_s, net, params, lam_iters=0,
                              **kw)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    cf, ce = env.rollout_cost(ip, iv, T_s, net, params, lam_iters=0,
                              **kw)
    t_cost = time.perf_counter() - t0
    emit(tag="rollout_cost", cost_full=cf, cost_end=ce,
         t_s=round(t_cost, 3), t_with_compile_s=round(t_compile, 1))

    # trajectory + host evaluate (one timed pass; d2h dominates).
    # return_graphs="auto" matches what evaluate_flocking passes — the
    # comparison charges the trajectory path only for pos/vel/accel/
    # states, not the ELL graph stack eval never reads.
    t0 = time.perf_counter()
    _, vel, *_ = env.compute_trajectory(ip, iv, T_s, archit=net,
                                        params=params, lam_iters=0,
                                        return_graphs="auto", **kw)
    cf_ref = float(env.evaluate(vel=vel))
    ce_ref = float(env.evaluate(vel=vel[:, -1:]))
    t_traj = time.perf_counter() - t0
    emit(tag="trajectory_eval", cost_full=cf_ref, cost_end=ce_ref,
         t_s=round(t_traj, 3),
         rel_err=abs(cf - cf_ref) / max(abs(cf_ref), 1e-9),
         speedup=t_traj / t_cost)
    emit(done=True)


if __name__ == "__main__":
    main()
