"""Diagnose the EDS/SpectralProxies 0.205 vs Degree 0.080 gap on
source localization (VERDICT r3 weak #6 / next #5).

Three questions, answered in order:
  1. PARITY — does our SelectionGNN forward match the torch reference
     with transplanted weights at the FULL driver config (N=100,
     F=[1,32,32], K=[5,5], pool [10,10], MaxPoolLocal alpha [6,8],
     MLP->5) for each ordering? If not, it's a composition bug.
  2. SEED VARIANCE — train our model for each ordering x 3 seeds: is
     0.205 vs 0.080 outside seed noise?
  3. REFERENCE BEHAVIOR — train the torch reference (same data, same
     config, ADAM 1e-3) with Degree and EDS: does the reference show
     the same ordering gap? If yes, it's an effect, not our bug.

Runs on CPU (torch reference is CPU-only; keeps the TPU free).
Writes experiments/diag_sourceloc_order.json.
"""

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
for _mod in ("hdf5storage", "gensim", "matplotlib", "matplotlib.pyplot"):
    try:
        __import__(_mod)
    except ImportError:
        sys.modules.setdefault(_mod, types.ModuleType(_mod))
for _alias, _type in (("int", int), ("bool", bool), ("float", float),
                      ("object", object)):
    if not hasattr(np, _alias):
        setattr(np, _alias, _type)

import torch
import alegnn.modules.architectures as ref_archs
import alegnn.utils.graphML as gml
import alegnn.utils.graphTools as ref_gt
# the reference resolves orderings via eval('Utils.graphTools.perm'+order)
# (architectures.py:210) — a stale module alias in the packaged layout;
# inject it so the reference's order= path runs at all
ref_archs.Utils = types.SimpleNamespace(graphTools=ref_gt)

from graph_neural_networks_tpu import data as D
from graph_neural_networks_tpu import training as T
from graph_neural_networks_tpu.models import architectures as archs
from graph_neural_networks_tpu.utils import graph as gt

HERE = os.path.dirname(os.path.abspath(__file__))
out_f = open(os.path.join(HERE, "diag_sourceloc_order.json"), "w",
             buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    out_f.write(json.dumps(kw) + "\n")


N, C = 100, 5
F, K, pool, alpha, mlp = [1, 32, 32], [5, 5], [10, 10], [6, 8], [5]
nTrain, nValid, nTest, nEpochs, batch = 8000, 200, 200, 40, 100


def build_graph(seed=0):
    rng = np.random.default_rng(seed)
    G = gt.Graph("SBM", N, {"nCommunities": C, "probIntra": 0.8,
                            "probInter": 0.2}, rng=rng)
    G.compute_gft()
    S = G.W / np.max(np.diag(G.E).real)
    sources = gt.compute_source_nodes(G.A, C)
    data = D.SourceLocalization(G, nTrain, nValid, nTest, sources,
                                tMax=25, rng=rng, normalize=True)
    data.expandDims()
    return G, S, sources, data


def make_ref(S, order):
    torch.manual_seed(0)
    return ref_archs.SelectionGNN(F, K, True, torch.nn.ReLU, pool,
                                  gml.MaxPoolLocal, alpha, mlp,
                                  S.reshape(1, N, N).astype(np.float32),
                                  order=order)


def transplant(ref, arch):
    """torch reference weights -> our param tree."""
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    p = {"params": {
        "GraphFilter_0": {"weight": jnp.asarray(sd["GFL.0.weight"]),
                          "bias": jnp.asarray(sd["GFL.0.bias"])},
        "GraphFilter_1": {"weight": jnp.asarray(sd["GFL.3.weight"]),
                          "bias": jnp.asarray(sd["GFL.3.bias"])},
        "MLP_0": {"TorchDense_0": {
            "kernel": jnp.asarray(sd["MLP.0.weight"].T),
            "bias": jnp.asarray(sd["MLP.0.bias"])}},
    }}
    return p


def main():
    emit(config=dict(N=N, C=C, F=F, K=K, pool=pool, alpha=alpha,
                     nEpochs=nEpochs, batch=batch))
    G, S, sources, data = build_graph(0)

    # ---- 1. transplanted-weights parity per ordering --------------------
    xs = np.asarray(data.samples["test"]["signals"][:32], np.float32)
    for order in ("Degree", "EDS", "SpectralProxies"):
        ref = make_ref(S, order)
        arch = archs.SelectionGNN(F, K, True, "relu", pool,
                                  "MaxPoolLocal", alpha, mlp, S,
                                  order=order)
        same_order = list(ref.order) == list(arch.order)
        p = transplant(ref, arch)
        ours = np.asarray(arch.apply(p, jnp.asarray(xs)))
        with torch.no_grad():
            theirs = ref(torch.tensor(xs)).numpy()
        diff = np.abs(ours - theirs).max() / (np.abs(theirs).max() + 1e-9)
        emit(tag="parity", order=order, same_order=same_order,
             rel_maxdiff=float(diff))

    # ---- 2. our training, ordering x seeds ------------------------------
    for order in ("Degree", "EDS", "SpectralProxies"):
        for seed in (0, 1, 2):
            arch = archs.SelectionGNN(F, K, True, "relu", pool,
                                      "MaxPoolLocal", alpha, mlp, S,
                                      order=order)
            model = T.Model(arch, T.losses.cross_entropy_loss,
                            {"name": "ADAM", "lr": 1e-3}, T.Trainer,
                            T.evaluate, name=f"diag{order}{seed}",
                            saveDir="/tmp/diag_sourceloc", seed=seed)
            t0 = time.time()
            model.train(data, nEpochs, batch, validationInterval=20,
                        doPrint=False)
            res = model.evaluate(data)
            emit(tag="ours", order=order, seed=seed,
                 errBest=float(res["costBest"]),
                 errLast=float(res["costLast"]),
                 train_s=round(time.time() - t0, 1))

    # ---- 3. reference training (torch, same data) ------------------------
    xTr = torch.tensor(np.asarray(data.samples["train"]["signals"],
                                  np.float32))
    yTr = torch.tensor(np.asarray(data.samples["train"]["targets"],
                                  np.int64))
    xTe = torch.tensor(np.asarray(data.samples["test"]["signals"],
                                  np.float32))
    yTe = np.asarray(data.samples["test"]["targets"], np.int64)
    for order in ("Degree", "EDS"):
        ref = make_ref(S, order)
        opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
        lossfn = torch.nn.CrossEntropyLoss()
        t0 = time.time()
        nB = nTrain // batch
        for ep in range(nEpochs):
            perm = torch.randperm(nTrain)
            for b in range(nB):
                sel = perm[b * batch:(b + 1) * batch]
                opt.zero_grad()
                out = ref(xTr[sel])
                loss = lossfn(out, yTr[sel])
                loss.backward()
                opt.step()
        with torch.no_grad():
            pred = ref(xTe).argmax(dim=1).numpy()
        err = float((pred != yTe).mean())
        emit(tag="reference", order=order, errLast=err,
             train_s=round(time.time() - t0, 1))
    emit(done=True)


if __name__ == "__main__":
    main()
