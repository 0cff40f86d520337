"""On-chip train-step time: precision='bf16' vs f32 (Trainer._step).

Production-ish sizes (the reference tasks' N~100 is dispatch-bound, so
kernel precision is invisible there): dense SelectionGNN at N=2048 and
band-mode at N=4096. Device time via a fori chain of the jitted step
(the tunnel's dispatch otherwise masks the kernels).

Writes experiments/bench_bf16_train.json.
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
out_f = open(os.path.join(HERE, "bench_bf16_train.json"), "w", buffering=1)
REPEAT = 10


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


def banded_graph(rng, N, bw, dens):
    W = np.zeros((N, N))
    nnz_per_row = max(2, int(dens * bw))
    for i in range(N):
        js = i - bw // 2 + rng.integers(0, bw, nnz_per_row)
        js = np.clip(js, 0, N - 1)
        W[i, js] = rng.random(len(js))
    W = (W + W.T) / 2
    np.fill_diagonal(W, 0)
    return W / np.max(np.abs(np.linalg.eigvalsh(W)))


def main():
    emit(devices=str(jax.devices()), repeat=REPEAT)
    _ = float(jnp.sum(jnp.ones((8, 8))))
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.models import architectures as archs

    rng = np.random.default_rng(0)
    for tag, N, B, gso_mode, dims, taps in [
            ("dense_n2048", 2048, 64, "dense", [1, 64, 64], [5, 5]),
            ("band_n4096", 4096, 32, "band", [1, 64, 64], [5, 5])]:
        S = banded_graph(rng, N, 256, 0.05)
        arch = archs.SelectionGNN(dims, taps, True, "relu", [N, N],
                                  "NoPool", [1, 1], [5], S,
                                  gsoMode=gso_mode)
        params = arch.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.standard_normal((B, 1, N)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 5, B))

        class FakeData:
            pass

        rec = {"tag": tag, "N": N, "B": B, "gso_mode": gso_mode}
        for prec in (None, "bf16"):
            m = T.Model(arch, T.losses.cross_entropy_loss,
                        {"name": "ADAM", "lr": 1e-3}, T.Trainer,
                        T.evaluate, name="b", saveDir="/tmp/bf16b",
                        seed=0)
            tr = T.Trainer.__new__(T.Trainer)
            # build just the step function via a minimal Trainer
            import types
            tr.model = m
            tr.precision = prec
            tr._needs_rng = False
            tr.mesh = None

            def fwd(p, xx, aux, key=None, tr=tr):
                return m.archit.split_forward(p, xx)[0]
            tr._forward = fwd
            T.Trainer._build_step(tr)
            opt_state = m.optimizer.init(params)
            step = tr._step_fn
            key = jax.random.PRNGKey(0)

            def chain(params, opt_state, x, y):
                def body(i, c):
                    p, o = c
                    p, o, loss = step(p, o, x, y, None, key)
                    return (p, o)
                return jax.lax.fori_loop(0, REPEAT, body,
                                         (params, opt_state))
            g = jax.jit(chain)
            r = g(params, opt_state, x, y)
            jax.block_until_ready(r)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                r = g(params, opt_state, x, y)
                jax.block_until_ready(r)
                best = min(best, time.perf_counter() - t0)
            rec[f"ms_{prec or 'f32'}"] = best / REPEAT * 1e3
        rec["speedup"] = rec["ms_f32"] / rec["ms_bf16"]
        emit(**rec)


if __name__ == "__main__":
    main()
