"""TPU e2e sanity: train a GAT (attentionMode='band') with the flash
kernels vs the XLA band path — identical loss trajectories expected
(the flash path is exact-parity)."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from graph_neural_networks_tpu.models import architectures as archs  # noqa
from graph_neural_networks_tpu.utils import graph as gt  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(0)
N, C = 200, 4
G = gt.Graph("SBM", N, {"nCommunities": C, "probIntra": 0.6,
                        "probInter": 0.05}, rng=rng)
S = G.W / np.max(np.abs(np.linalg.eigvalsh(G.W)))

# source-localization-style data
srcs = rng.integers(0, N, 256)
ts = rng.integers(1, 8, 256)
Sn = S / 1.0
X = np.zeros((256, 1, N), np.float32)
for i, (s0, t) in enumerate(zip(srcs, ts)):
    v = np.zeros(N)
    v[s0] = 1.0
    for _ in range(t):
        v = v @ Sn
    X[i, 0] = v
Y = (srcs % C).astype(np.int32)


def make(flash: bool, n_steps: int = 30):
    if flash:
        os.environ.pop("GNT_NO_FLASH", None)
    else:
        os.environ["GNT_NO_FLASH"] = "1"
    arch = archs.GraphAttentionNetwork(
        [1, 16, 16], [2, 2], "relu", [N, N], "NoPool", [1, 1], [C],
        True, S, order="rcm", attentionMode="band")
    params = arch.init(jax.random.PRNGKey(0))
    core, ctx = arch.core, arch.ctx
    opt = optax.adam(5e-3)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, x, y):
        def loss(p):
            logits = core.apply(p, x, ctx)[0]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        l, g = jax.value_and_grad(loss)(params)
        upd, ost = opt.update(g, ost)
        return optax.apply_updates(params, upd), ost, l

    losses = []
    xd, yd = jnp.asarray(X), jnp.asarray(Y)
    for it in range(n_steps):
        params, ost, l = step(params, ost, xd, yd)
        losses.append(float(l))
    if flash:
        pass
    else:
        del os.environ["GNT_NO_FLASH"]
    return losses


lf = make(True, n_steps=300)
lx = make(False)
emit(step="flash_train", first=lf[0], last=lf[-1])
emit(step="xla_train", first=lx[0], last=lx[-1])
diff = max(abs(a - b) for a, b in zip(lf[:30], lx))
emit(step="trajectory_diff", max_abs=diff, ok=bool(diff < 1e-3))
emit(step="flash_learns", last=lf[-1], ok=bool(lf[-1] < 0.7 * lf[0]))
print("DONE", flush=True)
