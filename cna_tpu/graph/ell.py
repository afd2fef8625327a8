"""Device-resident kNN graph in hybrid ELL + COO-overflow format.

The reference keeps the cell-cell graph as a scipy CSR matrix produced by
scanpy and fetched by ``get_connectivity`` (reference ``_nam.py:12-19``).
Here the graph is a first-class device object built for the TPU SpMM in
``cna_tpu.ops.spmm``:

* **ELL part** — fixed-width padded neighbor lists covering the bulk of
  rows, turning SpMM into a dense gather + contraction.  kNN-union graphs
  have tightly bounded *typical* degree, so a width at the ~98th
  percentile wastes little padding…
* **COO overflow** — …but hub rows (UMAP-union degree can be 20x the
  mean) would explode a pure-ELL width, so edges beyond the ELL width
  spill into a small COO tail handled by scatter-add.

``colsums`` is precomputed once at import time (reference ``_nam.py:28``):
``a.sum(axis=0) + self_weight`` — for the symmetric UMAP connectivity
graphs used in practice this equals the row sums.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllGraph:
    """Padded fixed-width sparse graph on device, with COO overflow.

    Attributes:
      indices: int32 (N, K); padded slots point at row 0 with weight 0.
      weights: (N, K) edge weights; 0 at padding.
      overflow_rows / overflow_cols: int32 (M,) COO edges beyond the ELL
        width (M = 0 for bounded-degree graphs); padding points at row 0
        with weight 0.
      overflow_weights: (M,) weights for the overflow edges.
      colsums_raw: (N,) column sums of the underlying matrix (WITHOUT any
        self-loop weight added; the diffusion layer adds ``self_weight``).
    """

    indices: jnp.ndarray
    weights: jnp.ndarray
    overflow_rows: jnp.ndarray
    overflow_cols: jnp.ndarray
    overflow_weights: jnp.ndarray
    colsums_raw: jnp.ndarray

    @property
    def n_cells(self) -> int:
        return self.indices.shape[0]

    @property
    def max_degree(self) -> int:
        return self.indices.shape[1]

    @property
    def n_overflow(self) -> int:
        return self.overflow_rows.shape[0]

    @property
    def n_rows(self) -> int:
        return self.colsums_raw.shape[0]

    @property
    def dtype(self):
        return self.weights.dtype

    def colsums(self, self_weight: float = 1.0):
        return self.colsums_raw + self_weight


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def from_scipy(a, dtype=None, pad_to: int = 8,
               width_percentile: float = 98.0) -> EllGraph:
    """Convert a scipy sparse matrix (rows = cells) to hybrid ELL on device.

    The row structure of ``a`` drives the gather (matching ``a.dot(...)``
    semantics at reference ``_nam.py:33``); column sums are computed
    exactly from ``a`` so asymmetric inputs keep reference behavior.

    ``width_percentile`` sets the ELL width at that percentile of the
    degree distribution (rounded up to ``pad_to``); heavier rows spill
    into the COO overflow.
    """
    parts = _pack_ell_host(a, dtype=dtype, pad_to=pad_to,
                           width_percentile=width_percentile)
    return EllGraph(
        indices=jnp.asarray(parts["indices"]),
        weights=jnp.asarray(parts["weights"]),
        overflow_rows=jnp.asarray(parts["overflow_rows"]),
        overflow_cols=jnp.asarray(parts["overflow_cols"]),
        overflow_weights=jnp.asarray(parts["overflow_weights"]),
        colsums_raw=jnp.asarray(parts["colsums"]),
    )


def _pack_ell_host(a, dtype=None, pad_to: int = 8,
                   width_percentile: float = 98.0) -> dict:
    """Host-side ELL+COO pack of a scipy sparse matrix (numpy arrays)."""
    import scipy.sparse as sp

    a = sp.csr_matrix(a)
    n = a.shape[0]
    degrees = np.diff(a.indptr)
    maxdeg = int(degrees.max()) if n else 0
    k = int(np.percentile(degrees, width_percentile)) if n else 0
    k = _round_up(max(k, 1), pad_to)
    if _round_up(maxdeg, pad_to) <= 2 * k:
        k = _round_up(max(maxdeg, 1), pad_to)  # overflow not worth it

    if dtype is None:
        import jax

        dtype = np.float64 if jax.config.jax_enable_x64 else np.float32

    # flat scatter into the padded (n, k) layout; int32 throughout and a
    # single flat index keep the one-time pack fast at ~100M-edge scale
    rows = np.repeat(np.arange(n, dtype=np.int32), degrees)
    offsets = (np.arange(a.nnz, dtype=np.int64)
               - np.repeat(a.indptr[:-1].astype(np.int64), degrees))

    in_ell = offsets < k
    indices = np.zeros(n * k, dtype=np.int32)
    weights = np.zeros(n * k, dtype=dtype)
    flat = rows[in_ell].astype(np.int64) * k + offsets[in_ell]
    indices[flat] = a.indices[in_ell]
    weights[flat] = a.data[in_ell].astype(dtype)
    indices = indices.reshape(n, k)
    weights = weights.reshape(n, k)

    ov = ~in_ell
    m = _round_up(int(ov.sum()), pad_to) if ov.any() else 0
    overflow_rows = np.zeros(m, dtype=np.int32)
    overflow_cols = np.zeros(m, dtype=np.int32)
    overflow_weights = np.zeros(m, dtype=dtype)
    if m:
        cnt = int(ov.sum())
        overflow_rows[:cnt] = rows[ov]
        overflow_cols[:cnt] = a.indices[ov]
        overflow_weights[:cnt] = a.data[ov].astype(dtype)

    colsums = np.asarray(a.sum(axis=0)).ravel().astype(dtype)
    return dict(indices=indices, weights=weights,
                overflow_rows=overflow_rows, overflow_cols=overflow_cols,
                overflow_weights=overflow_weights, colsums=colsums)


def from_arrays(indices, weights, colsums_raw, overflow_rows=None,
                overflow_cols=None, overflow_weights=None) -> EllGraph:
    weights = jnp.asarray(weights)
    empty_i = jnp.zeros((0,), dtype=jnp.int32)
    empty_w = jnp.zeros((0,), dtype=weights.dtype)
    return EllGraph(
        indices=jnp.asarray(indices, dtype=jnp.int32),
        weights=weights,
        overflow_rows=(jnp.asarray(overflow_rows, dtype=jnp.int32)
                       if overflow_rows is not None else empty_i),
        overflow_cols=(jnp.asarray(overflow_cols, dtype=jnp.int32)
                       if overflow_cols is not None else empty_i),
        overflow_weights=(jnp.asarray(overflow_weights)
                          if overflow_weights is not None else empty_w),
        colsums_raw=jnp.asarray(colsums_raw),
    )
