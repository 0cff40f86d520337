"""Small host-side helpers: experiment bookkeeping and reproducibility.

Covers the reference's ``alegnn/utils/miscTools.py`` (num2filename,
saveSeed/loadSeed, writeVarValues) with a JAX-native notion of RNG state:
instead of pickling framework-global RNG state (miscTools.py:48-95), we
save/restore explicit ``jax.random`` key data + numpy Generator state.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Mapping

import numpy as np

__all__ = [
    "num2filename",
    "save_seed",
    "load_seed",
    "write_var_values",
    "append_jsonl",
]


def num2filename(x, d: str = "p") -> str:
    """Render a number as a filename-safe string, replacing the decimal
    point with `d` (reference miscTools.py:18-46). Integers lose the
    trailing '.0'."""
    if x == int(x):
        return str(int(x))
    return str(x).replace(".", d)


def save_seed(save_dir: str, *, numpy_rng: np.random.Generator | None = None,
              jax_key=None, filename: str = "randomSeedUsed.pkl") -> str:
    """Persist RNG state (numpy Generator bit-state and/or raw jax key data)
    so an experiment can be reproduced (reference miscTools.py:48-66)."""
    os.makedirs(save_dir, exist_ok=True)
    state: dict[str, Any] = {}
    if numpy_rng is not None:
        state["numpy"] = numpy_rng.bit_generator.state
    if jax_key is not None:
        state["jax_key_data"] = np.asarray(jax_key)
    path = os.path.join(save_dir, filename)
    with open(path, "wb") as f:
        pickle.dump(state, f)
    return path


def load_seed(load_dir: str, filename: str = "randomSeedUsed.pkl"):
    """Restore RNG state saved by :func:`save_seed`. Returns
    ``(numpy_rng | None, jax_key | None)`` (reference miscTools.py:68-95)."""
    with open(os.path.join(load_dir, filename), "rb") as f:
        state = pickle.load(f)
    numpy_rng = None
    if "numpy" in state:
        numpy_rng = np.random.default_rng()
        numpy_rng.bit_generator.state = state["numpy"]
    jax_key = None
    if "jax_key_data" in state:
        import jax.numpy as jnp
        jax_key = jnp.asarray(state["jax_key_data"])
    return numpy_rng, jax_key


def write_var_values(file_to_write: str, var_values: Mapping[str, Any]) -> None:
    """Append `name = value` lines to a hyperparameter log file
    (reference miscTools.py:98-111)."""
    d = os.path.dirname(file_to_write)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(file_to_write, "a") as f:
        for key, value in var_values.items():
            f.write(f"{key} = {value}\n")
        f.write("\n")


def append_jsonl(path: str, record: Mapping[str, Any]) -> None:
    """Append one JSON record per line (structured metrics log; the
    framework's replacement for ad-hoc pickles of trainVars)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record, default=float) + "\n")
