"""Host-side graph partitioner for node-sharded execution.

Splits the (ordered) node set into P contiguous equal blocks (zero-padding
N up to a multiple of P), and computes halo metadata: for each block, which
neighboring blocks its in-edges come from. A locality-preserving ordering
(BFS/Cuthill-McKee-style) first minimizes the halo: after ordering, most
edges connect nearby nodes, so most blocks only talk to adjacent blocks
(the ring-exchange fast path in parallel.shift).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np
import scipy.sparse
import scipy.sparse.csgraph


@dataclass
class GraphPartition:
    """Node partition of an N-node graph into P contiguous blocks."""
    n_parts: int
    n_orig: int                    # original N
    n_padded: int                  # N rounded up to a multiple of P
    block_size: int
    order: np.ndarray              # (n_orig,) permutation applied to nodes
    S_perm: np.ndarray             # (E, n_padded, n_padded) permuted+padded GSO
    # block connectivity: needs[b] = sorted list of source blocks with edges
    # INTO block b (always includes b itself if it has intra-block edges)
    needs: List[np.ndarray] = field(default_factory=list)
    bandwidth: int = 0             # max |b_src - b_dst| over nonzero blocks

    @property
    def is_ring(self) -> bool:
        """True if one left/right neighbor exchange covers all halos."""
        return self.bandwidth <= 1

    def pad_signal(self, x: np.ndarray) -> np.ndarray:
        """Reorder (..., N) by the partition order and zero-pad to n_padded."""
        x = np.asarray(x)[..., self.order]
        pad = self.n_padded - self.n_orig
        if pad:
            x = np.concatenate(
                [x, np.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
        return x

    def unpad_signal(self, x: np.ndarray) -> np.ndarray:
        """Inverse of pad_signal (trims padding, undoes the order)."""
        x = np.asarray(x)[..., :self.n_orig]
        inv = np.empty_like(self.order)
        inv[self.order] = np.arange(self.n_orig)
        return x[..., inv]


def _rcm_order(S: np.ndarray) -> np.ndarray:
    """Reverse-Cuthill-McKee ordering on the union support (bandwidth
    minimization -> halo minimization)."""
    A = scipy.sparse.csr_matrix((np.abs(S).sum(axis=0) > 1e-9).astype(float))
    return np.asarray(
        scipy.sparse.csgraph.reverse_cuthill_mckee(A, symmetric_mode=False))


def partition_nodes(S, n_parts: int, order: str = "rcm") -> GraphPartition:
    """Partition the GSO's nodes into `n_parts` contiguous blocks.

    order: 'rcm' (locality-preserving, default), 'none' (keep given order).
    """
    S = np.asarray(S, dtype=np.float64)
    if S.ndim == 2:
        S = S[None]
    E, N, _ = S.shape
    if order == "rcm":
        perm = _rcm_order(S)
    else:
        perm = np.arange(N)
    Sp = S[:, perm][:, :, perm]
    block = -(-N // n_parts)
    n_pad = block * n_parts
    if n_pad > N:
        Spad = np.zeros((E, n_pad, n_pad))
        Spad[:, :N, :N] = Sp
        Sp = Spad
    # block-level connectivity
    supp = np.abs(Sp).sum(axis=0) > 1e-9
    needs = []
    bandwidth = 0
    for b in range(n_parts):
        cols = slice(b * block, (b + 1) * block)
        src_blocks = sorted({int(r // block)
                             for r in np.nonzero(supp[:, cols].any(axis=1))[0]})
        needs.append(np.asarray(src_blocks, dtype=np.int32))
        for sb in src_blocks:
            bandwidth = max(bandwidth, abs(sb - b))
    return GraphPartition(n_parts=n_parts, n_orig=N, n_padded=n_pad,
                          block_size=block, order=perm, S_perm=Sp,
                          needs=needs, bandwidth=bandwidth)
