"""Model: binds architecture + loss + optimizer + trainer + evaluator.

Re-design of ``alegnn/modules/model.py``: owns the params/opt_state pytrees
(the architecture wrapper is stateless), counts parameters, and implements
the Best/Last checkpoint contract (model.py:106-129) via flax
serialization under ``saveDir/savedModels/``.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Callable, Optional

import jax
import numpy as np
import optax
from flax import serialization


def make_optimizer(spec) -> optax.GradientTransformation:
    """Build an optax optimizer from a spec dict
    ({'name': 'ADAM'|'SGD'|'RMSprop', 'lr': float, ...}) or pass an optax
    transformation through."""
    if isinstance(spec, optax.GradientTransformation):
        return spec
    name = spec["name"].upper()
    lr = spec.get("lr", spec.get("learningRate", 1e-3))
    if callable(spec.get("schedule")):
        lr = spec["schedule"]
    if name == "ADAM":
        return optax.adam(lr, b1=spec.get("beta1", 0.9),
                          b2=spec.get("beta2", 0.999))
    if name == "SGD":
        return optax.sgd(lr, momentum=spec.get("momentum", 0.0))
    if name == "RMSPROP":
        return optax.rmsprop(lr)
    raise ValueError(f"unknown optimizer: {name}")


class Model:

    def __init__(self, archit, loss: Callable, optimizer, trainer,
                 evaluator, name: str = "model", saveDir: str = "experiments",
                 seed: int = 0, **init_kwargs):
        self.archit = archit
        self.loss = loss
        self.optimizer_spec = optimizer
        self.optimizer = make_optimizer(optimizer)
        self.trainer = trainer
        self.evaluator = evaluator
        self.name = name
        self.saveDir = saveDir
        self.params = archit.init(jax.random.PRNGKey(seed), **init_kwargs)
        self.opt_state = self.optimizer.init(self.params)

    @property
    def nParameters(self) -> int:
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(self.params))

    n_parameters = nParameters

    def rebuild_optimizer(self, schedule=None):
        """Recreate the optimizer (e.g. to attach an LR-decay schedule)."""
        spec = self.optimizer_spec
        if schedule is not None and isinstance(spec, dict):
            spec = dict(spec, schedule=schedule)
        self.optimizer = make_optimizer(spec)
        self.opt_state = self.optimizer.init(self.params)

    # -- training / evaluation --------------------------------------------
    def train(self, data, nEpochs, batchSize, **kwargs):
        trainer = self.trainer(self, data, nEpochs, batchSize, **kwargs)
        return trainer.train()

    def evaluate(self, data, **kwargs):
        return self.evaluator(self, data, **kwargs)

    # -- checkpointing (Best/Last contract) --------------------------------
    def _ckpt_path(self, label: str) -> str:
        d = os.path.join(self.saveDir, "savedModels")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{self.name}{label}.ckpt")

    def save(self, label: str = "", extra: Optional[dict] = None) -> str:
        """Checkpoint params + optimizer state (+ optional training-loop
        state: step counters, PRNG keys, best-score bookkeeping — the
        mid-run resume contract, SURVEY.md §5)."""
        path = self._ckpt_path(label)
        blob = {
            "params": serialization.to_bytes(self.params),
            "opt_state": serialization.to_bytes(self.opt_state),
            "extra": extra,
        }
        with open(path, "wb") as f:
            pickle.dump(blob, f)
        return path

    def load(self, label: str = "") -> Optional[dict]:
        """Restore params/opt state; returns the saved training-loop state
        (or None)."""
        with open(self._ckpt_path(label), "rb") as f:
            blob = pickle.load(f)
        self.params = serialization.from_bytes(self.params, blob["params"])
        self.opt_state = serialization.from_bytes(self.opt_state,
                                                  blob["opt_state"])
        return blob.get("extra")

    def __repr__(self):
        return (f"Model(name={self.name!r}, "
                f"archit={type(self.archit).__name__}, "
                f"nParameters={self.nParameters})")
