"""Worker process for the multi-process multihost test.

Usage: python multihost_worker.py <coordinator_port> <num_procs> <pid>

Runs the REAL multi-process branch of parallel.multihost on CPU (one
local CPU device per process, localhost coordinator) — the exact code
path a TPU pod uses: jax.distributed.initialize, a mesh spanning
processes, per-host batch slicing, and
jax.make_array_from_process_local_data — then one data-parallel train
step on a SelectionGNN. Prints one JSON line with the results.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
jax.config.update("jax_platforms", "cpu")   # sitecustomize overrides env

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    port, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from graph_neural_networks_tpu.parallel import multihost as mh

    info = mh.initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    assert info["process_count"] == nproc, info
    assert info["devices"] == nproc * info["local_devices"], info

    mesh = mh.make_pod_mesh(graph_parallelism=1)
    from jax.sharding import PartitionSpec as P

    # deterministic global data; each process loads only ITS slice
    rng = np.random.default_rng(0)
    B, N, F0, C = 8, 24, 3, 4
    xs = rng.standard_normal((B, F0, N)).astype(np.float32)
    ys = rng.integers(0, C, B)
    sl = mh.per_host_batch_slice(B)
    x_global = mh.shard_host_data(mesh, xs[sl], P("data"))
    y_global = mh.shard_host_data(mesh, ys[sl], P("data"))
    assert x_global.shape == (B, F0, N)

    # one DP train step on a real architecture
    from graph_neural_networks_tpu.utils import graph as gt
    from graph_neural_networks_tpu.models import architectures as arch
    G = gt.Graph("SBM", N, {"nCommunities": 2, "probIntra": 0.9,
                            "probInter": 0.2},
                 rng=np.random.default_rng(1))
    net = arch.SelectionGNN(dimNodeSignals=[F0, 8], nFilterTaps=[3],
                            bias=True, nonlinearity="relu",
                            nSelectedNodes=[N], poolingFunction="NoPool",
                            poolingSize=[1], dimLayersMLP=[C],
                            GSO=G.S / np.max(np.linalg.eigvalsh(G.S)))
    params = net.init(jax.random.PRNGKey(0))

    def loss_fn(p, x, y):
        logits = net.core.apply(p, x, net.ctx)[0]
        onehot = jax.nn.one_hot(y, C)
        return -jnp.mean(jnp.sum(
            jax.nn.log_softmax(logits) * onehot, axis=-1))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    loss, grads = grad_fn(params, x_global, y_global)
    loss = float(loss)

    # reference: full-batch loss computed single-device on raw numpy
    loss_ref = float(loss_fn(params, jnp.asarray(xs), jnp.asarray(ys)))
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in
                               jax.tree_util.tree_leaves(grads))))
    print(json.dumps({"pid": pid, "process_count": info["process_count"],
                      "devices": info["devices"], "loss": loss,
                      "loss_ref": loss_ref, "gnorm": gnorm}), flush=True)


if __name__ == "__main__":
    main()
