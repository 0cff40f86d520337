"""Large-swarm transfer: train a decentralized controller on a small
swarm, deploy it closed-loop on a much bigger one.

Graph filters are N-independent (permutation equivariance — the
reference's transferability story, architectures.py changeGSO), so the
controller trained at --trainAgents transfers verbatim. The big-swarm
evaluation uses the O(N·deg) machinery end-to-end:
``Flocking.for_rollout`` (no host-side O(T·N²) expert generation), ELL
graph histories (``--ellDegree``), the chunked env step
(``--envChunk``: states + graph built in row chunks, warm-started
power-iteration lambda_max) — no (N,N) allocation anywhere, so swarms
of 16k+ agents run on one chip.

Run:  python examples/largeswarm.py [--quick] [--cpu]
         [--deployAgents 4096] [--envChunk 1024] [--ellDegree 32]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--saveDir", default="experiments/largeswarm")
    ap.add_argument("--trainAgents", type=int, default=None)
    ap.add_argument("--deployAgents", type=int, default=None)
    ap.add_argument("--ellDegree", type=int, default=32)
    ap.add_argument("--envGrid", action="store_true", default=True,
                    help="O(N*k) cell-list env step (default; quad "
                         "2x2-window scheme since round 4)")
    ap.add_argument("--no-envGrid", dest="envGrid", action="store_false")
    ap.add_argument("--cellCap", type=int, default=None,
                    help="cell capacity (default: the quad scheme's 32)")
    ap.add_argument("--lamIters", type=int, default=0,
                    help="power iterations per step; 0 = the zero-pass "
                         "Rayleigh fold on the grid env (round 4, "
                         "fidelity probe_lambda_fidelity.json)")
    ap.add_argument("--envChunk", type=int, default=None,
                    help="row-chunk size for the O(N*deg) env step "
                         "(default: deployAgents//8, 0 disables)")
    ap.add_argument("--duration", type=float, default=None,
                    help="deployment rollout duration in seconds")
    ap.add_argument("--largeTrain", action="store_true",
                    help="train with Flocking.large: expert supervision "
                         "generated on-device, EllGso graph storage — "
                         "O(N*deg) end-to-end, so --trainAgents can be "
                         "thousands too")
    ap.add_argument("--deviceStore", action="store_true",
                    help="train with Flocking.large_device + the "
                         "device-resident trainer store (round 5): "
                         "only (pos, vel) live anywhere, supervision "
                         "is recomputed on device per batch, nothing "
                         "O(T*N*D) is stored or pulled — the 262k+ "
                         "TRAINING regime (requires the grid env)")
    ap.add_argument("--nTrain", type=int, default=None)
    ap.add_argument("--nEpochs", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--trainDuration", type=float, default=None,
                    help="training-trajectory duration in seconds")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from graph_neural_networks_tpu import data as D
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.data.flocking import Flocking
    from graph_neural_networks_tpu.models import architectures_time as archt

    rng = np.random.default_rng(args.seed)
    if args.quick:
        n_train_agents, duration, dt = 12, 1.0, 0.1
        nTrain, nValid, nTest, nEpochs, batch = 40, 8, 8, 3, 10
        F, K = [6, 16], [3]
        n_deploy, deploy_T_s = 64, 1.0
    else:
        n_train_agents, duration, dt = 50, 2.0, 0.01
        nTrain, nValid, nTest, nEpochs, batch = 400, 20, 20, 30, 20
        F, K = [6, 64], [3]
        n_deploy, deploy_T_s = 4096, 1.0
    if args.trainAgents is not None:
        n_train_agents = args.trainAgents
    if args.deployAgents is not None:
        n_deploy = args.deployAgents
    if args.duration is not None:
        deploy_T_s = args.duration
    if args.nTrain is not None:
        nTrain = args.nTrain
        nValid = nTest = max(nTrain // 4, 1)
    if args.nEpochs is not None:
        nEpochs = args.nEpochs
    if args.batch is not None:
        batch = args.batch
    if args.trainDuration is not None:
        duration = args.trainDuration
    env_chunk = args.envChunk
    if env_chunk is None and not args.envGrid:
        env_chunk = max(n_deploy // 8, 1)
    if env_chunk == 0:
        env_chunk = None
    env_grid = None
    if args.envGrid:
        # True = the quad (2x2 side-2r) scheme defaults; an explicit
        # --cellCap keeps the 3x3 side-r scheme at that capacity
        env_grid = True if args.cellCap is None else (None, args.cellCap)

    # -- 1. train (standard pipeline, or O(N*deg) end-to-end) ---------------
    mode = ("Flocking.large_device" if args.deviceStore
            else "Flocking.large" if args.largeTrain else "standard")
    print(f"== train: {n_train_agents} agents ({mode}) ==")
    if args.deviceStore:
        assert env_grid, "--deviceStore requires the grid env"
        data = Flocking.large_device(
            n_train_agents, commRadius=2.0, repelDist=1.0,
            nTrain=nTrain, nValid=nValid, nTest=nTest,
            duration=duration, samplingTime=dt,
            ell_degree=args.ellDegree, rng=rng, env_grid=env_grid)
    elif args.largeTrain:
        data = Flocking.large(n_train_agents, commRadius=2.0,
                              repelDist=1.0, nTrain=nTrain, nValid=nValid,
                              nTest=nTest, duration=duration,
                              samplingTime=dt, ell_degree=args.ellDegree,
                              rng=rng,
                              # O(N) expert generation + rollouts on the
                              # cell-list grid (round 4)
                              env_grid=env_grid if env_grid else None)
    else:
        data = D.Flocking(nAgents=n_train_agents, commRadius=2.0,
                          repelDist=1.0, nTrain=nTrain, nValid=nValid,
                          nTest=nTest, duration=duration, samplingTime=dt,
                          rng=rng)
    arch = archt.LocalGNN_DB(F, K, True, "tanh", [2], 1)
    model = T.Model(arch, T.losses.mse_loss, {"name": "ADAM", "lr": 5e-4},
                    T.TrainerFlocking, T.evaluate_flocking,
                    name="LocalGNNxfer", saveDir=args.saveDir,
                    seed=args.seed, N=min(n_train_agents, 64), T=3)
    t_tr0 = time.perf_counter()
    train_kw = {}
    if args.largeTrain or args.deviceStore:
        train_kw["ellDegree"] = args.ellDegree
    if args.deviceStore:
        train_kw["deviceStore"] = True
    train_out = model.train(data, nEpochs, batch, validationInterval=20,
                            probExpert=0.993, **train_kw)
    t_train = time.perf_counter() - t_tr0
    print(f"  training wall-clock {t_train:.1f}s "
          f"({t_train / nEpochs:.1f}s/epoch)")
    if args.deviceStore:
        # scalars-only evaluation: closed-loop test cost via
        # rollout_cost vs the grid expert's cost on the same split —
        # nothing O(T*N) pulled at any scale
        from graph_neural_networks_tpu.data.flocking import (
            evaluate_cost_device)
        vt = data.getData("vel", "test")
        expert_cost = float(evaluate_cost_device(
            jnp.asarray(vt, jnp.float32)))
        cf, ce = data.rollout_cost(
            data.getData("initPos", "test"),
            data.getData("initVel", "test"), duration, arch,
            model.params, lam_iters=args.lamIters)
        print(f"  closed-loop test cost {cf:.4f} (end {ce:.5f}) vs "
              f"grid expert {expert_cost:.4f} "
              f"({cf / max(expert_cost, 1e-9):.3f}x)")
        res = {"costBestFull": cf, "costBestEnd": ce,
               "expert": expert_cost,
               "best_valid": float(np.min(train_out["costValid"]))}
    else:
        res = model.evaluate(data)
    print(f"  small-swarm closed-loop cost: {res['costBestFull']:.4f}")

    # -- 2. deploy big: same params, env-only construction ------------------
    print(f"== deploy: {n_deploy} agents (ellDegree={args.ellDegree}, "
          f"{'cell-list grid env' if env_grid else f'envChunk={env_chunk}'}) ==")
    env = Flocking.for_rollout(n_deploy, commRadius=2.0, repelDist=1.0,
                               samplingTime=dt,
                               rng=np.random.default_rng(args.seed + 1))
    ip, iv = env.compute_initial_positions(
        n_deploy, 2, env.commRadius, minDist=env.initMinDist,
        geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
    params = model.params        # trainer reloads 'Best' after training
    if args.deviceStore:
        # scalars-only deployment eval (the O(T*N) trajectory pull
        # through the tunnel would dominate at this scale)
        env.rollout_ell_degree = args.ellDegree
        env.rollout_lam_method = "power"
        env.rollout_env_grid = env_grid
        t0 = time.perf_counter()
        cf_d, ce_d = env.rollout_cost(ip, iv, deploy_T_s, arch, params,
                                      lam_iters=args.lamIters)
        t_roll = time.perf_counter() - t0
        T_steps = len(np.arange(0, deploy_T_s, dt))
        print(f"  {T_steps}-step closed loop (scalars-only): "
              f"{t_roll:.2f}s, velocity-variance cost {cf_d:.4f} "
              f"(end {ce_d:.5f})")
        return {"cost_small": res["costBestFull"], "cost_big": cf_d,
                "expert": res.get("expert")}
    policy = lambda p, xw, Sw: arch.apply(p, jnp.asarray(xw, jnp.float32),
                                          Sw)
    t0 = time.perf_counter()
    # step-mode rollout: the architecture carries its own tap registers
    # (one graph shift per layer per env step — round 3)
    pos, vel, accel, states, graphs = env.compute_trajectory(
        ip, iv, deploy_T_s, archit=arch, params=params,
        history_window=arch.causal_window, ell_degree=args.ellDegree,
        env_chunk=env_chunk, env_grid=env_grid, lam_method="power",
        lam_iters=args.lamIters,
        return_graphs="auto")   # deploy eval only reads pos/vel
    t_roll = time.perf_counter() - t0
    cost = float(env.evaluate(vel=vel))
    T_steps = vel.shape[1]
    print(f"  {T_steps}-step closed loop: {t_roll:.2f}s "
          f"({2 * n_deploy * T_steps / t_roll:,.0f} agent-steps/s incl. "
          f"compile), velocity-variance cost {cost:.4f}")
    print(f"  dense graph history would be "
          f"{2 * T_steps * n_deploy ** 2 * 4 / 2 ** 30:.1f} GiB; "
          f"ELL is {2 * T_steps * n_deploy * args.ellDegree * 8 / 2 ** 20:.0f} MiB")
    return {"cost_small": res["costBestFull"], "cost_big": cost}


if __name__ == "__main__":
    main()
