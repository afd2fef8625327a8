"""Graph reordering for banded-SpMM execution.

A kNN graph in arbitrary cell order has neighbors scattered across the
whole index range, forcing SpMM into random gathers.  Reverse-Cuthill-
McKee ordering clusters each row's neighbors into a narrow index band,
after which the diffusion SpMM becomes: DMA one contiguous window of the
state per row block, then dense (band x window) MXU matmuls — the
``cna_tpu.ops.spmm_pallas`` kernel.  Edges outside the chosen window
halfwidth spill into the COO overflow (handled by scatter-add).

The permutation is computed once at graph import on host (scipy's RCM);
everything downstream (one-hot, NAM columns, obs write-back) works in the
permuted order and results are de-permuted only at the API boundary.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Reordering:
    """A cell-axis permutation: ``perm[new] = old`` and its inverse."""

    perm: np.ndarray
    inv: np.ndarray

    @property
    def n(self) -> int:
        return len(self.perm)


def rcm_ordering(a) -> Reordering:
    """Reverse-Cuthill-McKee ordering of a symmetric sparse graph."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    a = sp.csr_matrix(a)
    perm = np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return Reordering(perm=perm, inv=inv)


def permute_graph(a, ordering: Reordering):
    """Apply an ordering to both axes of a sparse matrix."""
    return a[ordering.perm][:, ordering.perm].tocsr()


def permute_graph_unsorted(a, ordering: Reordering):
    """Both-axes permutation WITHOUT re-sorting column indices.

    scipy's ``a[perm][:, perm]`` pays a per-row column sort (~10+ s at
    31M nnz on this host); consumers that only need row structure +
    remapped column ids (the halo plan builder walks edges in storage
    order) can skip it: row-permute is an indptr gather, column remap a
    single fancy index.  The result has ``sorted_indices == False``.
    """
    import scipy.sparse as sp

    a = sp.csr_matrix(a)[ordering.perm]
    a.indices = ordering.inv.astype(a.indices.dtype)[a.indices]
    return a


def bandwidth_profile(a, percentile=99.0):
    """(max |i-j| over edges, percentile of per-edge band distance)."""
    import scipy.sparse as sp

    coo = sp.coo_matrix(a)
    d = np.abs(coo.row - coo.col)
    if len(d) == 0:
        return 0, 0
    return int(d.max()), int(np.percentile(d, percentile))
