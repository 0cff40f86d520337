"""Observability: scalar/figure logging and TPU profiling helpers.

Replaces the reference's tensorboardX ``Visualizer`` (visualTools.py:11-65)
with a dependency-light logger: scalars go to JSONL (one record per call,
machine-readable) and figures to PNG; ``export_json`` mirrors the
reference's JSON export. Profiling helpers wrap ``jax.profiler`` and add
throughput counters (edges/s) for the SpMM-bound kernels.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Callable, Optional

import numpy as np

from graph_neural_networks_tpu.utils.misc import append_jsonl


class Visualizer:
    """Scalar/figure summary writer. name/save_dir mirror the reference
    ctor; scalars are appended to ``<save_dir>/<name>.jsonl``."""

    def __init__(self, save_dir: str, name: str = "run"):
        self.save_dir = save_dir
        self.name = name
        os.makedirs(save_dir, exist_ok=True)
        self.path = os.path.join(save_dir, f"{name}.jsonl")
        self._store: dict = {}

    def scalar_summary(self, mode: str, epoch: int, **values) -> None:
        rec = {"mode": mode, "epoch": int(epoch)}
        rec.update({k: float(v) for k, v in values.items()})
        append_jsonl(self.path, rec)
        self._store.setdefault(mode, []).append(rec)

    def figure_summary(self, tag: str, figure) -> str:
        out = os.path.join(self.save_dir, f"{self.name}_{tag}.png")
        figure.savefig(out)
        return out

    def histogram_summary(self, tag: str, values, epoch: int = 0) -> None:
        v = np.asarray(values).ravel()
        self.scalar_summary(f"hist/{tag}", epoch, mean=v.mean(),
                            std=v.std(), min=v.min(), max=v.max())

    def text_summary(self, tag: str, text: str) -> None:
        append_jsonl(self.path, {"mode": f"text/{tag}", "text": text})

    def export_json(self, path: Optional[str] = None) -> str:
        path = path or os.path.join(self.save_dir, f"{self.name}.json")
        with open(path, "w") as f:
            json.dump(self._store, f, default=float)
        return path


def enable_nan_debugging(enable: bool = True) -> None:
    """Turn on jax.debug_nans: any NaN produced under jit raises at the
    producing op (the framework's race/sanitizer analogue — SURVEY.md §5:
    computation is functional, so there are no data races by construction;
    numeric poisoning is the failure mode to trap)."""
    import jax
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 2,
          **kwargs) -> float:
    """Mean wall-time of a device computation (block_until_ready)."""
    import jax
    r = None
    for _ in range(warmup):
        r = fn(*args, **kwargs)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args, **kwargs)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def edges_per_second(n_edges: int, n_rows: int, n_shifts: int,
                     seconds: float) -> float:
    """Throughput counter for K-tap graph convolutions."""
    return n_rows * n_shifts * n_edges / seconds
