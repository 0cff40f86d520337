"""ctypes binding for the native graphcore library (native/graphcore.cpp).

Host-side graph structure kernels in C++: K-hop BFS neighborhoods,
Graclus matching, band/BCSR tiling. Every entry point has a pure-python
fallback in utils.graph / ops.spmm; `available()` reports whether the
shared library was found (build with ``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_SEARCHED = False


def _find_lib():
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    so_path = os.path.join(here, "native", "libgraphcore.so")
    if not os.path.exists(so_path):
        # best-effort build from source (make -C native)
        import subprocess
        try:
            subprocess.run(["make", "-C", os.path.join(here, "native")],
                           capture_output=True, timeout=120, check=False)
        except Exception:
            pass
    candidates = [
        so_path,
        os.environ.get("GRAPHCORE_LIB", ""),
    ]
    for path in candidates:
        if path and os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            i64 = ctypes.c_int64
            p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            p32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            lib.bfs_khop.restype = i64
            lib.bfs_khop.argtypes = [p64, p64, i64, i64, i64, i64, p64,
                                     ctypes.c_void_p, i64]
            lib.graclus_match.restype = i64
            lib.graclus_match.argtypes = [p64, p64, pd, pd, p64, i64, p64]
            lib.band_extract.restype = i64
            lib.band_extract.argtypes = [pf, i64, i64, i64, pf]
            lib.bcsr_count.restype = i64
            lib.bcsr_count.argtypes = [pf, i64, i64]
            lib.bcsr_extract.restype = None
            lib.bcsr_extract.argtypes = [pf, i64, i64, pf, p32, p32]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _find_lib() is not None


def bfs_khop(indptr: np.ndarray, indices: np.ndarray, n_nodes: int,
             k_hops: int, n_rows: int, nb: int):
    """K-hop neighborhoods over CSR adjacency. Returns (table, counts):
    table (n_rows, max_count) int64 self-padded, counts (n_rows,)."""
    lib = _find_lib()
    assert lib is not None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    counts = np.zeros(n_rows, np.int64)
    max_count = lib.bfs_khop(indptr, indices, n_nodes, k_hops, n_rows, nb,
                             counts, None, 0)
    out = np.empty((n_rows, max_count), np.int64)
    lib.bfs_khop(indptr, indices, n_nodes, k_hops, n_rows, nb, counts,
                 out.ctypes.data_as(ctypes.c_void_p), max_count)
    return out, counts


def graclus_match(indptr, indices, data, weights, visit_order, n_nodes):
    """One Graclus matching level; returns (cluster_id, n_clusters)."""
    lib = _find_lib()
    assert lib is not None
    cluster_id = np.zeros(n_nodes, np.int64)
    n_clusters = lib.graclus_match(
        np.ascontiguousarray(indptr, np.int64),
        np.ascontiguousarray(indices, np.int64),
        np.ascontiguousarray(data, np.float64),
        np.ascontiguousarray(weights, np.float64),
        np.ascontiguousarray(visit_order, np.int64), n_nodes, cluster_id)
    return cluster_id, int(n_clusters)


def band_extract(S: np.ndarray, block_size: int, w: int):
    """Band slab for ops.spmm.band_matmul; returns (slab, max_block_bw)."""
    lib = _find_lib()
    assert lib is not None
    S = np.ascontiguousarray(S, np.float32)
    n = S.shape[0]
    nb = -(-n // block_size)
    out = np.zeros((nb, (2 * w + 1) * block_size, block_size), np.float32)
    max_bw = lib.band_extract(S, n, block_size, w, out)
    return out, int(max_bw)


def bcsr_extract(S: np.ndarray, block_size: int):
    """BCSR tiles sorted by (col, row); returns (blocks, rows, cols)."""
    lib = _find_lib()
    assert lib is not None
    S = np.ascontiguousarray(S, np.float32)
    n = S.shape[0]
    nnzb = lib.bcsr_count(S, n, block_size)
    blocks = np.zeros((nnzb, block_size, block_size), np.float32)
    rows = np.zeros(nnzb, np.int32)
    cols = np.zeros(nnzb, np.int32)
    lib.bcsr_extract(S, n, block_size, blocks, rows, cols)
    return blocks, rows, cols
