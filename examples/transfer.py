"""Transferability & robustness: train on one GSO, deploy on a
perturbed one (changeGSO + edgeFailSampling).

The GSP selling point (reference architectures.py:322-420 +
graphTools.py:1163): filter taps are polynomial coefficients of the GSO,
so the same parameters run on any graph. Here: train source localization
on an SBM, then evaluate zero-shot on copies of the graph with 5% / 15%
of edges randomly failed (the reference's robustness experiment).

Run:  python examples/transfer.py [--cpu]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from graph_neural_networks_tpu import data as D
    from graph_neural_networks_tpu import training as T
    from graph_neural_networks_tpu.models import architectures as archs
    from graph_neural_networks_tpu.utils import graph as gt

    rng = np.random.default_rng(args.seed)
    C = 4

    def make_task(N, seed):
        r = np.random.default_rng(seed)
        G = gt.Graph("SBM", N, {"nCommunities": C, "probIntra": 0.8,
                                "probInter": 0.2}, rng=r)
        G.compute_gft()
        S = G.W / np.max(np.diag(G.E).real)
        sources = gt.compute_source_nodes(G.A, C)
        data = D.SourceLocalization(G, 1500, 200, 400, sources, tMax=8,
                                    rng=r)
        data.expandDims()
        return S, data

    N = 40
    S, data = make_task(N, 1)

    # per-node readout so the output is N-independent
    arch = archs.LocalGNN([1, 16, 16], [4, 4], True, "relu", [N, N],
                          "NoPool", [1, 1], [C], S, order="Degree")
    model = T.Model(arch, _node_ce_loss(), {"name": "ADAM", "lr": 1e-3},
                    _NodeTrainer, _node_evaluate, name="transfer",
                    saveDir="experiments/transfer", seed=args.seed)
    print(f"training on N={N} ({model.nParameters} params)...")
    model.train(data, nEpochs=30, batchSize=50, validationInterval=15)
    results = {"clean": model.evaluate(data)["costBest"]}
    print(f"test error on training GSO:            {results['clean']:.4f}")

    # zero-shot on perturbed GSOs: same params, edges failed at random
    for p_fail in (0.05, 0.15):
        W_fail = gt.edge_fail_sampling(S, p_fail,
                                       rng=np.random.default_rng(3))
        arch.changeGSO(W_fail)
        err = model.evaluate(data)["costBest"]
        results[f"fail{p_fail}"] = err
        print(f"zero-shot, {int(p_fail*100):2d}% edges failed:         "
              f"{err:.4f} (chance {1 - 1 / C:.2f})")
    return results


def _node_ce_loss():
    """Readout gives per-node class scores (B, C, N); aggregate scores over
    nodes -> (B, C) logits for graph-level classification."""
    import jax.numpy as jnp
    import optax

    def loss(yHat, y):
        logits = jnp.mean(yHat, axis=-1)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y.astype(jnp.int32)).mean()
    return loss


def _node_evaluate(model, data, **kw):
    import jax.numpy as jnp
    import numpy as np
    xTest, yTest = data.getSamples("test")
    out = {}
    for label in ("Best", "Last"):
        try:
            model.load(label)
        except FileNotFoundError:
            continue
        yHat = model.archit.apply(model.params,
                                  jnp.asarray(xTest, jnp.float32))
        logits = np.asarray(yHat).mean(-1)
        out[f"cost{label}"] = float((np.argmax(logits, 1) != yTest).mean())
    return out


class _NodeTrainer:
    """Trainer using mean-over-nodes logits (graph classification with a
    per-node readout, the transferable formulation)."""

    def __new__(cls, model, data, nEpochs, batchSize, **kwargs):
        from graph_neural_networks_tpu.training.trainer import Trainer

        class _T(Trainer):
            def _valid_cost(self, params):
                import jax.numpy as jnp
                x, y = self.data.getSamples("valid")
                yHat = self.model.archit.split_forward(
                    params, jnp.asarray(x, jnp.float32))[0]
                logits = np.asarray(yHat).mean(-1)
                return float((np.argmax(logits, 1) != y).mean())

        return _T(model, data, nEpochs, batchSize, **kwargs)


if __name__ == "__main__":
    main()
