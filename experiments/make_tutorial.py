"""Build + execute docs/tutorial.ipynb: the narrated end-to-end tutorial
(the reference ships a ~99k-char narrated notebook; this is the
equivalent teaching artifact for the TPU-native framework). Executes
top-to-bottom on CPU (8 virtual devices) in CI-able time and stores the
outputs. Regenerate with: python experiments/make_tutorial.py
"""

import nbformat as nbf
from nbclient import NotebookClient

nb = nbf.v4.new_notebook()
C = []
md = lambda s: C.append(nbf.v4.new_markdown_cell(s))
code = lambda s: C.append(nbf.v4.new_code_cell(s))

md("""# Graph neural networks, the TPU way

A narrated end-to-end walk-through of `graph_neural_networks_tpu` — the
same story as the reference library's tutorial (source localization on a
stochastic block model), told on the JAX/XLA/Pallas substrate, and then
the parts the reference does not have: sparse kernels, sharding across a
device mesh, time-varying graphs at swarm scale, and serving.

Everything below runs on CPU (with an 8-device virtual mesh for the
sharding sections); on a TPU host, skip the first cell and the same code
runs on the chip, with the Pallas kernels engaged.

**The one idea to keep in mind.** This library is built around the
*graph shift operator* (GSO): a matrix `S` whose sparsity pattern is the
graph (adjacency, Laplacian, or a normalization of either). A *graph
filter* is a polynomial in it, `y = Σ_k h_k · x S^k`: k applications of
`S` aggregate information from k-hop neighborhoods, and the learnable
coefficients `h_k` weigh the hops. Every architecture in the zoo is
layers of such filters with pointwise nonlinearities in between —
permutation-equivariant by construction, which is why a model trained on
one graph transfers to another.""")

code("""# CPU mode with an 8-device virtual mesh (skip on a TPU host).
# XLA_FLAGS must be set before jax initializes; the jax_platforms config
# call forces CPU even where a sitecustomize registers an accelerator.
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.devices()""")

md("""## 1. The problem: source localization

A diffusion starts at one of C community "source" nodes of a graph and
spreads for an unknown number of steps `t`: we observe
`x = (W/λmax)^t δ_src` and must recover which community seeded it. The
observation looks less and less like its source as `t` grows — structure
is the only signal, which is exactly what graph filters see.

## 2. Build a graph

`utils.graph.Graph` mirrors the reference's `graphTools.Graph`
(SURVEY.md §2.1): it generates or wraps an adjacency, and carries the
degree/Laplacian/GSO/eigendecomposition. We use a 5-community
stochastic block model on 60 nodes (small enough that every cell below
runs in seconds; the reference task uses N=100 with the same physics).""")

code("""import numpy as np
from graph_neural_networks_tpu.utils import graph as gt

rng = np.random.default_rng(42)
G = gt.Graph("SBM", 60, {"nCommunities": 5, "probIntra": 0.8,
                         "probInter": 0.2}, rng=rng)
S = G.W / np.max(np.abs(np.linalg.eigvalsh(G.W)))   # GSO = W / lambda_max
sources = gt.compute_source_nodes(G.A, 5)  # max-degree node per community
print(f"N={G.N}, edges={int(G.A.sum())//2}, sources={sources}")""")

md("""## 3. A dataset

`data.SourceLocalization` generates the diffusion samples
(reference `dataTools.py:473-592`): pick a source uniformly, a diffusion
time `t ~ U[0, tMax)`, and store the diffused signal with the source's
community index as the label. `expandDims` adds the feature axis —
signals are `batch × features × nodes` throughout, the reference's
convention.""")

code("""from graph_neural_networks_tpu import data as D
# normalize=True standardizes each node with training-set statistics —
# at larger diffusion times the raw template separation collapses to
# ~1e-6 and nothing learns without it (a round-2 diagnosis; the
# reference never trains past its default scale so never hits this)
data = D.SourceLocalization(G, nTrain=1500, nValid=200, nTest=200,
                            sourceNodes=sources, tMax=20, rng=rng,
                            normalize=True)
data.expandDims()
x_train, y_train = data.getSamples("train")
print(x_train.shape, y_train.shape, "labels:", np.unique(y_train))""")

md("""## 4. The filter, from first principles

`ops.filters.lsigf` is the graph convolution — the library's one hot
kernel (reference `graphML.py:83-176`). Let's verify it IS the
polynomial it claims to be, by computing `Σ_k h_k x S^k` by hand:""")

code("""import jax.numpy as jnp
from graph_neural_networks_tpu.ops import filters, gso as gso_lib

F_out, E, K, G_in = 2, 1, 3, 1
h = jnp.asarray(rng.standard_normal((F_out, E, K, G_in)), jnp.float32)
xb = jnp.asarray(x_train[:4], jnp.float32)          # (B, G, N)

y = filters.lsigf(h, gso_lib.as_gso(S), xb)

# by hand: y_f = sum_k h[f,0,k,0] * x @ S^k
Sk = [np.eye(G.N)]
for _ in range(K - 1):
    Sk.append(Sk[-1] @ S)
y_hand = np.stack([sum(float(h[f, 0, k, 0]) * x_train[:4, 0] @ Sk[k]
                       for k in range(K)) for f in range(F_out)], 1)
print("max |lsigf - by hand| =", np.abs(np.asarray(y) - y_hand).max())""")

md("""Permutation equivariance — the property the whole field rests on:
relabel the nodes and the filter output relabels with them. No retraining
needed for isomorphic graphs; this is also why selection pooling must
track node *orderings* rather than positions:""")

code("""perm = rng.permutation(G.N)
S_perm = S[np.ix_(perm, perm)]
y_perm = filters.lsigf(h, gso_lib.as_gso(S_perm), xb[:, :, perm])
print("equivariance gap:",
      np.abs(np.asarray(y_perm) - np.asarray(y)[:, :, perm]).max())""")

md("""## 5. An architecture

`SelectionGNN` (reference `architectures.py:49-479`) stacks
(filter → nonlinearity → selection pooling) and a readout MLP. The
constructor keeps the reference's kwarg names, so reference model dicts
move over unchanged. Under the hood it is one jitted functional program
`(params, x, ctx) -> logits` where `ctx` is a pytree of precomputed
structure arrays — "changing the GSO" is just rebuilding `ctx`, no
module surgery.""")

code("""from graph_neural_networks_tpu.models import architectures as archs
arch = archs.SelectionGNN(
    dimNodeSignals=[1, 16, 16], nFilterTaps=[5, 5], bias=True,
    nonlinearity="relu",
    nSelectedNodes=[20, 10],            # keep top nodes by degree order
    poolingFunction="MaxPoolLocal", poolingSize=[6, 8],
    dimLayersMLP=[5], GSO=S, order="Degree")
params = arch.init(jax.random.PRNGKey(0))
print("parameters:", arch.parameter_count(params))""")

md("""## 6. Train

`training.Model` binds architecture + loss + optimizer + trainer +
evaluator (reference `model.py`); `Trainer` keeps the reference's
semantics — uneven last batch, per-epoch shuffle, validation every
`validationInterval` steps, best-on-validation checkpointing — and adds
the TPU-native parts: a single jitted train step, and (on accelerators)
*scanned dispatch*: all steps between two validation points run as ONE
`lax.scan` program, so a networked TPU pays one dispatch round-trip per
validation run instead of per step (measured 3.5× steady-state on the
v5e behind a tunnel).""")

code("""from graph_neural_networks_tpu import training as T
model = T.Model(arch, T.losses.cross_entropy_loss,
                {"name": "ADAM", "lr": 2e-3}, T.Trainer, T.evaluate,
                name="selGNN", saveDir="/tmp/tutorial_run", seed=0)
train_vars = model.train(data, nEpochs=30, batchSize=100,
                         validationInterval=15)
res = model.evaluate(data)
print({k: round(v, 3) for k, v in res.items()},
      "| chance error = 0.8")""")

md("""The checkpoints on disk follow the reference layout
(`savedModels/<name>{Archit,Optim}{Best,Last}.ckpt` as orbax-style
pytrees with params + optimizer state + step + PRNG key, so mid-run
resume reproduces the exact trajectory — `model.train(...,
resume=True)`).

Mixed precision is one kwarg: `model.train(..., precision='bf16')`
keeps f32 master params and runs the forward/backward (including the
GSO contraction) in bf16 — 1.5-2.5× per step on the MXU at production
sizes, with loss trajectories matching f32 (tests/test_training.py).

## 7. Transfer to a perturbed graph (`changeGSO`)

The filter taps never reference the graph — they are coefficients of a
polynomial in WHATEVER GSO the architecture currently holds. The
reference's transferability experiments re-use trained weights after
the graph changes (`architectures.py:322-420`); the classic stress test
is edge failures: drop a fraction of edges (a sensor network degrading)
and evaluate the SAME model on the SAME task with `changeGSO`:""")

code("""W_fail = gt.edge_fail_sampling(G.W, 0.05)     # drop 5% of edges iid
S_fail = W_fail / np.max(np.abs(np.linalg.eigvalsh(W_fail)))
arch.changeGSO(S_fail, nSelectedNodes=[20, 10], poolingSize=[6, 8])
x_t, y_t = data.getSamples("test")
yHat = np.asarray(arch(model.params, jnp.asarray(x_t, jnp.float32)))
err = float((yHat.argmax(1) != y_t).mean())
print(f"same weights on the degraded graph: error {err:.3f} "
      f"(trained-graph error {res['costBest']:.3f}, chance 0.8)")
arch.changeGSO(S, nSelectedNodes=[20, 10], poolingSize=[6, 8])  # back""")

md("""## 8. Sparse GSO modes

The reference stores `S` dense and shifts with dense matmuls — O(N²)
always. Here every Selection-family architecture takes `gsoMode=`:
`'dense'` (reference-scale), `'band'` (Pallas block-band kernel after a
bandwidth-minimizing ordering — the TPU fast path, 81-102% of the MXU
roofline at production sizes), `'bcsr'` (general block sparsity), or
`'edge'` (pure O(nnz) gather/segment-sum). Same parameters, same
outputs:""")

code("""outs = {}
for mode in ("dense", "edge"):
    a2 = archs.SelectionGNN(
        dimNodeSignals=[1, 16, 16], nFilterTaps=[5, 5], bias=True,
        nonlinearity="relu", nSelectedNodes=[20, 10],
        poolingFunction="MaxPoolLocal", poolingSize=[6, 8],
        dimLayersMLP=[5], GSO=S, order="Degree", gsoMode=mode)
    outs[mode] = np.asarray(a2(model.params,
                               jnp.asarray(x_train[:8], jnp.float32)))
print("dense vs edge-list forward gap:",
      np.abs(outs["dense"] - outs["edge"]).max())""")

md("""## 9. Shard it across a mesh

The reference is single-device; here node-sharding is one call. The
partitioner orders nodes (reverse Cuthill-McKee), splits them into
contiguous blocks, and stores only each shard's *band slab* of `S` —
the dense `E×N×N` never exists. Each shift exchanges only the
`w·128`-node halo with ring neighbors over ICI (`ppermute`); on this
virtual CPU mesh the same program runs with the same collectives.

For graphs with no usable band order (scattered edges),
`partition_nodes_bcsr` stores per-shard BCSR column slices instead —
per-shard memory proportional to its share of nonzero *blocks*,
independent of bandwidth.""")

code("""from graph_neural_networks_tpu import parallel as par
mesh = par.make_mesh((2, 4))            # 2-way data x 4-way graph
# order="rcm" would re-order nodes for bandwidth; selection pooling
# is position-semantic, so shard this arch with the identity order
arch.shard(mesh, 4, data_axis="data")
yHat_sh = np.asarray(arch(model.params,
                          jnp.asarray(x_train[:8], jnp.float32)))
print("sharded vs single-device forward gap:",
      np.abs(yHat_sh - outs["dense"]).max())
arch.changeGSO(S, nSelectedNodes=[20, 10], poolingSize=[6, 8])  # unshard""")

md("""Training composes with it: `model.train(..., mesh=mesh)` shards the
batch over the 'data' axis (GSPMD inserts the gradient all-reduce), and
hybrid data × graph sharding just works — the trainer's jitted step
partitions from the argument shardings. On a pod,
`parallel.multihost.initialize_multihost` + `make_pod_mesh` set the
same thing up across processes, with per-host data loading
(`per_host_batch_slice` + `shard_host_data`); see
`examples/distributed.py --num-processes`.

## 10. Time-varying graphs: the flocking swarm

The decentralized-controller family (`LocalGNN_DB`,
`GraphRecurrentNN_DB`, `AggregationGNN_DB`) takes a *different* GSO per
(sample, timestep) with unit-delay semantics: information travels one
hop per step. Dense storage is `(B,T,N,N)` — 800 GB for a 1000-agent
swarm over 200 steps. The ELL layout (`ops.ell.EllGso`) stores each
node's top-D in-neighbors instead: O(N·D) per step.

The flocking environment runs its whole closed loop (env step → policy
→ physics) as ONE compiled `lax.scan` — the reference round-trips
through the host every physics step. Two round-3 pieces make it scale:

* **step-mode policies**: every DB architecture exposes
  `rollout_init/rollout_step`, carrying its delayed-tap registers
  across environment steps — one graph shift per filter layer per step
  instead of re-forwarding over a history window (exact; it is the same
  recurrence `z_k(t) = S(t)·z_{k-1}(t-1)` that defines the filters);
* **a cell-list environment**: agents binned into communication-radius
  cells on a modular grid; each agent's neighbor search reads 9 cell
  rows instead of scanning all N — O(N·k) per step. On the v5e this
  runs a full closed-loop step for 262,144 agents in ~0.76 s (it was
  37.8 s in round 2).""")

code("""from graph_neural_networks_tpu.data import flocking as F
from graph_neural_networks_tpu.models import architectures_time as archt

env = F.Flocking.for_rollout(128, commRadius=2.0, repelDist=1.0,
                             samplingTime=0.05,
                             rng=np.random.default_rng(3))
ip, iv = env.compute_initial_positions(
    128, 2, env.commRadius, minDist=env.initMinDist,
    geometry="circular", xMaxInitVel=3.0, yMaxInitVel=3.0)
policy = archt.LocalGNN_DB(dimNodeSignals=[6, 16], nFilterTaps=[3],
                           bias=True, nonlinearity="tanh",
                           dimReadout=[2], dimEdgeFeatures=1)
pparams = policy.init(jax.random.PRNGKey(1), N=128, T=3)
pos, vel, acc, states, graphs = env.compute_trajectory(
    ip, iv, 1.0, archit=policy, params=pparams,
    ell_degree=16, env_grid=True, lam_iters=4,
    history_window=policy.causal_window)
print("trajectory:", pos.shape, "| flocking cost (untrained policy):",
      round(env.evaluate(vel=vel), 3))""")

md("""(An untrained policy flocks badly, of course — `examples/flocking.py`
trains it by imitating a centralized expert with DAGger, the reference's
protocol, and reaches within ~8% of the expert's cost.)

## 11. Serving

`serving.InferenceEngine` ahead-of-time compiles one fixed shape
(smaller batches are padded, larger rejected), optionally in bf16, and
the request path never traces. `export_model` writes StableHLO that
reloads with no model code.""")

code("""from graph_neural_networks_tpu import serving
eng = serving.InferenceEngine(arch, model.params,
                              (jnp.asarray(x_train[:8], jnp.float32),))
y_srv = np.asarray(eng(jnp.asarray(x_train[:3], jnp.float32)))
print("engine output:", y_srv.shape,
      "| matches jit forward:",
      bool(np.allclose(y_srv, outs["dense"][:3], atol=1e-5)))""")

md("""## 12. Where to go next

* `examples/` — the five reference task drivers (source localization,
  authorship, MovieLens, flocking with DAGger, epidemic GRNNs) plus the
  variants zoo, transfer, distributed, large-swarm, and 20news drivers.
* `docs/tutorial.md` — this walkthrough in prose; `docs/
  parallel_design.md` — the sharding/collective design and the scaling
  model; `docs/divergences.md` — the places this library deliberately
  differs from the reference (bug-for-bug compatibility is a non-goal).
* `MIGRATION.md` — the reference-user's switching guide.
* `tests/test_reference_parity.py` — activation-level equivalence with
  the original torch implementation, one functional at a time.
* `bench.py` — the SpMM roofline benchmark (`--sweep` for the grid).""")

nb["cells"] = C
nb["metadata"]["kernelspec"] = {
    "display_name": "Python 3", "language": "python", "name": "python3"}

client = NotebookClient(nb, timeout=1200, kernel_name="python3",
                        resources={"metadata": {"path": "/root/repo"}})
client.execute()
nbf.write(nb, "/root/repo/docs/tutorial.ipynb")
print("executed + written: docs/tutorial.ipynb")
