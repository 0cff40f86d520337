"""Distributed training demo: data-parallel batch x node-sharded graph.

Trains a 2-layer LSIGF classifier on source localization over a
('data','graph') device mesh: the batch shards across 'data' (GSPMD
inserts the gradient psum), the node axis shards across 'graph' with the
ring halo-exchange SpMM (two ICI ppermutes per shift). Runs on any
device count — e.g. 8 virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed.py --cpu

On a real pod slice, replace the mesh with parallel.make_pod_mesh() (the
'graph' axis stays inside each host's ICI domain).

Multi-process mode (one process per host; the TPU-pod launch shape) —
e.g. a 2-process CPU cluster on one machine:

    python examples/distributed.py --cpu --num-processes 2 \
        --process-id 0 --coordinator localhost:9633 &
    python examples/distributed.py --cpu --num-processes 2 \
        --process-id 1 --coordinator localhost:9633

Each process initializes jax.distributed, loads only ITS batch slice
(parallel.per_host_batch_slice) and assembles global arrays with
jax.make_array_from_process_local_data (parallel.shard_host_data).
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--data-par", type=int, default=None)
    ap.add_argument("--graph-par", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--coordinator", default="localhost:9633")
    args = ap.parse_args()
    if args.cpu:
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        if args.num_processes == 1 and \
                "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graph_neural_networks_tpu import parallel as par
    from graph_neural_networks_tpu.parallel import multihost as mh
    from graph_neural_networks_tpu.ops import filters
    from graph_neural_networks_tpu.utils import graph as gt

    multiproc = args.num_processes > 1
    if multiproc:
        info = mh.initialize_multihost(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes, process_id=args.process_id)
        print(f"process {info['process_index']}/{info['process_count']}: "
              f"{info['local_devices']} local / {info['devices']} devices")

    n_dev = jax.device_count()
    n_graph = args.graph_par or \
        ((4 if n_dev % 4 == 0 else 1) if not multiproc
         else len(jax.local_devices()))
    n_data = args.data_par or n_dev // n_graph
    mesh = (mh.make_pod_mesh(n_graph) if multiproc
            else par.make_mesh((n_data, n_graph)))
    print(f"devices: {n_dev}; mesh: data={n_data} x graph={n_graph}")

    # task: source localization on a ring-of-clusters graph (banded after
    # RCM, so the halo path engages)
    rng = np.random.default_rng(args.seed)
    C = 4
    N = 32 * n_graph
    W = np.zeros((N, N))
    comm = N // C
    for c in range(C):
        lo = c * comm
        blk = rng.random((comm, comm)) < 0.4
        blk = np.triu(blk, 1)
        W[lo:lo + comm, lo:lo + comm] = blk + blk.T
    for c in range(C - 1):  # chain communities
        W[(c + 1) * comm - 1, (c + 1) * comm] = 1
        W[(c + 1) * comm, (c + 1) * comm - 1] = 1
    S = W / np.max(np.abs(np.linalg.eigvalsh(W)))
    part = par.partition_nodes(S, n_graph)
    sgso = par.ShardedGso(mesh, part)
    print(f"partition: N={N} -> {n_graph} blocks of {part.block_size}, "
          f"ring={sgso.uses_ring}")

    # data: diffused deltas from per-community sources
    sources = [c * comm for c in range(C)]
    P_mat = gt.matrix_powers(S, 6)
    n_samples = 2048
    src = rng.integers(0, C, n_samples)
    t = rng.integers(0, 6, n_samples)
    X = P_mat[t, :, np.asarray(sources)[src]][:, None, None, :]  # B,E,G,N
    X = X / (np.linalg.norm(X, axis=-1, keepdims=True) + 1e-9)
    X = part.pad_signal(X).astype(np.float32)
    Y = src

    # model: 2 LSIGF layers through the sharded shift + flatten readout
    K, F0, F1 = 3, 1, 16
    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "h1": jax.random.normal(k1, (F1, 1, K, F0)) * 0.3,
        "h2": jax.random.normal(k2, (F1, 1, K, F1)) * 0.3,
        # position-aware flatten readout: an invariant (pooled) readout
        # cannot distinguish isomorphic communities (equivariance!)
        "w": jax.random.normal(k3, (F1 * part.n_padded, C)) * 0.05,
    }
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def forward(p, x):
        z = filters.lsigf(p["h1"], sgso, x[:, 0])      # B x F1 x Np
        z = filters.lsigf(p["h2"], sgso, jax.nn.relu(z))
        z = jax.nn.relu(z)
        return z.reshape(z.shape[0], -1) @ p["w"]

    def step(p, s, xb, yb):
        def loss(p):
            return optax.softmax_cross_entropy_with_integer_labels(
                forward(p, xb), yb).mean()
        l, g = jax.value_and_grad(loss)(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, l

    x_spec = P("data", None, None, "graph")
    y_spec = P("data")
    repl = NamedSharding(mesh, P())

    def put_batch(xb, yb):
        # per-host loading: each process materializes only ITS slice
        if multiproc:
            sl = mh.per_host_batch_slice(len(yb))
            return (mh.shard_host_data(mesh, np.asarray(xb[sl]), x_spec),
                    mh.shard_host_data(mesh, np.asarray(yb[sl]), y_spec))
        return (jax.device_put(jnp.asarray(xb), NamedSharding(mesh, x_spec)),
                jax.device_put(jnp.asarray(yb), NamedSharding(mesh, y_spec)))

    batch = 256
    with mesh:
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        step_jit = jax.jit(step)
        for epoch in range(16):
            perm = rng.permutation(n_samples)   # same seed on every host
            for i in range(0, n_samples, batch):
                idx = perm[i:i + batch]
                xb, yb = put_batch(X[idx], Y[idx])
                params, opt_state, l = step_jit(params, opt_state, xb, yb)
            if epoch % 2 == 1:
                xb, _ = put_batch(X, Y)
                logits = jax.jit(forward)(params, xb)
                if multiproc:
                    from jax.experimental import multihost_utils
                    logits = multihost_utils.process_allgather(
                        logits, tiled=True)
                else:
                    logits = np.asarray(logits)
                acc = float((np.argmax(np.asarray(logits), 1) == Y).mean())
                print(f"epoch {epoch + 1}: loss {float(l):.4f} "
                      f"train acc {acc:.3f}")
    assert acc > 0.9, "distributed training failed to learn"
    print("distributed training OK")


if __name__ == "__main__":
    main()
