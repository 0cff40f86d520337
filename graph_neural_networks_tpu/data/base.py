"""Dataset base classes and array helpers.

Mirrors the reference's ``_data`` / ``_dataForClassification`` contracts
(dataTools.py:141-341): samples dict with train/valid/test splits,
getSamples with count/index selection, expandDims, astype, and the
classification error-rate evaluate.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

ZERO_TOL = 1e-9


def normalize_data(x: np.ndarray, ax: int) -> np.ndarray:
    """Standardize (zero mean, unit variance) along axis `ax`
    (reference dataTools.py:52-77)."""
    x = np.asarray(x, dtype=np.float64)
    mean = x.mean(axis=ax, keepdims=True)
    std = x.std(axis=ax, keepdims=True)
    std[std < ZERO_TOL] = 1.0
    return (x - mean) / std


def change_data_type(x, dtype):
    """Dtype bridge (numpy-only in this framework; reference
    dataTools.py:79-117 also bridged torch)."""
    if x is None:
        return None
    return np.asarray(x).astype(dtype)


def invert_tensor_ew(x: np.ndarray) -> np.ndarray:
    """Elementwise inverse that maps (near-)zeros to zero
    (reference dataTools.py:119-139)."""
    out = np.zeros_like(x, dtype=np.float64)
    mask = np.abs(x) > ZERO_TOL
    out[mask] = 1.0 / x[mask]
    return out


class Data:
    """Base dataset: train/valid/test splits of (signals, targets)."""

    def __init__(self):
        self.dataType = np.float64
        self.nTrain = None
        self.nValid = None
        self.nTest = None
        self.samples = {
            "train": {"signals": None, "targets": None},
            "valid": {"signals": None, "targets": None},
            "test": {"signals": None, "targets": None},
        }

    def getSamples(self, samplesType: str, *args):
        """All samples, a random subset (int arg), or specific indices
        (list/array arg). Reference dataTools.py:164-227."""
        assert samplesType in ("train", "valid", "test")
        x = self.samples[samplesType]["signals"]
        y = self.samples[samplesType]["targets"]
        if len(args) == 1:
            if isinstance(args[0], int):
                n_total = x.shape[0]
                idx = np.random.permutation(n_total)[:args[0]]
            else:
                idx = np.asarray(args[0])
            x = x[idx]
            y = y[idx]
        return x, y

    get_samples = getSamples

    def expandDims(self):
        """Insert the feature dimension: B x N -> B x 1 x N (and
        B x T x N -> B x T x 1 x N). Reference dataTools.py:229-245."""
        for t in ("train", "valid", "test"):
            x = self.samples[t]["signals"]
            if x is None:
                continue
            if x.ndim == 2:
                self.samples[t]["signals"] = x[:, None, :]
            elif x.ndim == 3:
                self.samples[t]["signals"] = x[:, :, None, :]

    expand_dims = expandDims

    def astype(self, dataType):
        """Change dtype of all splits; integer targets are preserved
        (reference dataTools.py:247-271)."""
        for t in ("train", "valid", "test"):
            for k in ("signals", "targets"):
                v = self.samples[t][k]
                if v is None:
                    continue
                if k == "targets" and np.issubdtype(np.asarray(v).dtype,
                                                    np.integer):
                    continue
                self.samples[t][k] = np.asarray(v).astype(dataType)
        self.dataType = dataType

    def to(self, device):  # device residency is handled at the jit boundary
        return self


class DataForClassification(Data):
    """Adds argmax error-rate evaluation (reference dataTools.py:310-341)."""

    def evaluate(self, yHat, y, tol: float = 1e-9) -> float:
        yHat = np.asarray(yHat)
        y = np.asarray(y)
        n = y.shape[0]
        yHat = np.argmax(yHat, axis=1)
        errors = np.abs(yHat - y) > tol
        return float(np.mean(errors))
