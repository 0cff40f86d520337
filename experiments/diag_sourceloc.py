"""Diagnose the round-1 source-loc tMax=100 plateau (VERDICT item 9).

Hypothesis: for large diffusion time t, x = (W/lmax)^t * delta_src collapses
onto the dominant eigenvector and the class information vanishes, so a
fixed fraction of samples is unlearnable and every architecture floors at
the same error. Evidence gathered here:
  1. a NN-oracle (1-nearest-centroid on the noiseless diffused deltas) per
     t bucket — the best any classifier could do from x alone,
  2. a trained SelectionGNN's error per t bucket,
  3. the effect of signal normalization / lr on the plateau.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from graph_neural_networks_tpu.utils import graph as gt
from graph_neural_networks_tpu import data as D
from graph_neural_networks_tpu import training as T
from graph_neural_networks_tpu.models import architectures as archs

rng = np.random.default_rng(0)
N, C, tMax = 100, 5, 100
G = gt.Graph("SBM", N, {"nCommunities": C, "probIntra": 0.8,
                        "probInter": 0.2}, rng=rng)
G.compute_gft()
S = G.W / np.max(np.diag(G.E).real)
sources = gt.compute_source_nodes(G.A, C)
print("sources:", sources)

# --- 1. oracle: noiseless template per (source, t); a sample is
# classifiable iff its template is nearest to its own class's
Wt = gt.matrix_powers(S, tMax)            # tMax x N x N
templates = Wt[:, :, np.asarray(sources)]  # t x N x C  (columns = delta responses)
# pairwise template distances per t
sep = np.zeros(tMax)
for t in range(tMax):
    Ttl = templates[t].T                   # C x N
    d = np.linalg.norm(Ttl[:, None] - Ttl[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    sep[t] = d.min()
print("min inter-class template distance by t decade:")
for lo in range(0, tMax, 10):
    print(f"  t in [{lo},{lo+10}): {sep[lo:lo+10].mean():.2e}")

# --- 2. train the reference-config SelectionGNN and bucket its test error by t
data = D.SourceLocalization(G, 8000, 200, 200, sources, tMax=tMax, rng=rng)
data.expandDims()
# recover the diffusion time of each test sample by matching to templates
arch = archs.SelectionGNN([1, 32, 32], [5, 5], True, "relu", [10, 10],
                          "MaxPoolLocal", [6, 8], [C], S, order="Degree")
model = T.Model(arch, T.losses.cross_entropy_loss, {"name": "ADAM", "lr": 1e-3},
                T.Trainer, T.evaluate, name="diag", saveDir="/tmp/diag_sl")
print("training 40 epochs (reference config)...")
model.train(data, nEpochs=40, batchSize=100, validationInterval=40)
res = model.evaluate(data)
print("overall test error:", res)

xt, yt = data.getSamples("test")
yhat = np.asarray(model.archit.apply(model.params, xt)).argmax(-1)
# match each test x to its generating (t, src) template
flat = templates.transpose(0, 2, 1).reshape(tMax * C, N)   # (t*C) x N
d = np.linalg.norm(xt[:, 0, :][:, None] - flat[None], axis=-1)
idx = d.argmin(1)
t_of = idx // C
errs = (yhat != np.asarray(yt)).astype(float)
print("test error by t decade (n samples):")
for lo in range(0, tMax, 10):
    m = (t_of >= lo) & (t_of < lo + 10)
    if m.sum():
        print(f"  t in [{lo},{lo+10}): err {errs[m].mean():.3f}  (n={m.sum()})")
