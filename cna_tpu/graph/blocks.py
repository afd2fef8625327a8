"""Block-dense graph format: SpMM as batched MXU matmuls.

Row-gather SpMM on TPU is bounded by tile granularity (~1/8 of HBM peak
for f32: every gathered (1, S) row drags its whole (8, 128) tile).  kNN
graphs are cluster-structured, so after a locality reordering most edges
fall in a small set of (row-block, col-block) pairs.  Storing those pairs
as DENSE B x B tiles turns diffusion into:

    gather col-blocks of the state   (contiguous 256-row reads — no waste)
    batched (B x B) @ (B x S) matmul (MXU at peak)
    segment-sum over row-blocks      (sorted, contiguous)

The dense tiles waste FLOPs on zeros (a few % density is typical), but
MXU FLOPs are ~100x cheaper than scattered HBM reads, so the trade wins
by an order of magnitude for atlas-scale graphs.  Out-of-pattern formats
degrade gracefully: every nonzero lands in SOME pair; a poor ordering
just yields more pairs (more FLOPs/traffic), never wrong results.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockGraph:
    """Block-sparse dense-tile graph on device.

    Attributes:
      tiles: (P, B, B) dense edge-weight tiles; tiles[p][i, j] is the
        weight of edge (pair_rows[p]*B + i, pair_cols[p]*B + j).
      pair_rows / pair_cols: int32 (P,) block coordinates, sorted by row.
      colsums_raw: (N_padded,) exact column sums of the underlying matrix
        (0 on padding rows).
      n_cells: true (unpadded) cell count.  Static metadata.
    """

    tiles: jnp.ndarray
    pair_rows: jnp.ndarray
    pair_cols: jnp.ndarray
    colsums_raw: jnp.ndarray
    n_cells: int = dataclasses.field(metadata=dict(static=True))

    @property
    def block_size(self) -> int:
        return self.tiles.shape[1]

    @property
    def n_blocks(self) -> int:
        return self.colsums_raw.shape[0] // self.tiles.shape[1]

    @property
    def n_pairs(self) -> int:
        return self.tiles.shape[0]

    @property
    def n_rows(self) -> int:
        return self.colsums_raw.shape[0]

    @property
    def dtype(self):
        return self.tiles.dtype

    def colsums(self, self_weight: float = 1.0):
        return self.colsums_raw + self_weight


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HybridGraph:
    """Dense tiles for heavy block pairs + ELL for stray edges.

    kNN graphs under a locality ordering put 60-90% of edges into a small
    set of heavy (row-block, col-block) pairs; the rest are long-range
    strays that would explode a pure block-dense pair count.  The hybrid
    splits at an edge-coverage target: heavy pairs run as batched MXU
    matmuls (streaming reads), strays through the row-gather ELL path.
    """

    block: BlockGraph
    ell: "object"  # EllGraph of the stray edges over the padded rows
    colsums_raw: jnp.ndarray  # (N_padded,) of the FULL matrix
    n_cells: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_rows(self) -> int:
        return self.colsums_raw.shape[0]

    @property
    def dtype(self):
        return self.block.tiles.dtype

    def colsums(self, self_weight: float = 1.0):
        return self.colsums_raw + self_weight


def cluster_ordering(embedding, block_size=256, leaf_size=None, seed=0):
    """Locality ordering of cells: recursive median bisection (kd order).

    Recursively splits along the current subset's maximum-variance
    principal direction until leaves of ~``leaf_size`` cells, emitting
    leaves in traversal order.  Cells adjacent in embedding space land
    adjacent in the ordering, concentrating kNN edges near the reordered
    diagonal (far better than flat k-means, whose within-cluster order is
    random).  Returns a ``Reordering``.
    """
    from .reorder import Reordering

    emb = np.asarray(embedding, dtype=np.float64)
    n = emb.shape[0]
    if leaf_size is None:
        leaf_size = max(block_size // 4, 32)

    perm = np.empty(n, dtype=np.int64)
    out_pos = 0
    stack = [np.arange(n)]
    while stack:
        idx = stack.pop()
        if len(idx) <= leaf_size:
            perm[out_pos : out_pos + len(idx)] = idx
            out_pos += len(idx)
            continue
        sub = emb[idx]
        center = sub.mean(axis=0)
        centered = sub - center
        # leading principal direction via a few power iterations
        rng = np.random.RandomState(seed)
        v = rng.randn(sub.shape[1])
        for _ in range(4):
            v = centered.T @ (centered @ v)
            v_norm = np.linalg.norm(v)
            if v_norm == 0:
                break
            v = v / v_norm
        proj = centered @ v
        half = len(idx) // 2
        order = np.argpartition(proj, half)
        # push right half first so the left half is emitted first
        stack.append(idx[order[half:]])
        stack.append(idx[order[:half]])
    assert out_pos == n

    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)
    return Reordering(perm=perm, inv=inv)


def from_scipy_hybrid(a, block_size=64, coverage=0.85, dtype=None,
                      min_pair_nnz=None) -> HybridGraph:
    """Convert a locality-ordered sparse matrix to the hybrid format.

    Pairs are kept dense until ``coverage`` of edges are covered (or all
    pairs with >= ``min_pair_nnz`` edges if given); the remainder goes to
    an ELL stray graph over the same padded row space.
    """
    import scipy.sparse as sp

    from .ell import from_scipy

    a = sp.csr_matrix(a)
    n = a.shape[0]
    b = block_size
    n_blocks = -(-n // b)
    n_pad = n_blocks * b

    coo = a.tocoo()
    key = (coo.row // b).astype(np.int64) * n_blocks + coo.col // b
    uniq, pair_of_edge, counts = np.unique(key, return_inverse=True,
                                           return_counts=True)
    if min_pair_nnz is None:
        order = np.argsort(counts)[::-1]
        cum = np.cumsum(counts[order]) / max(coo.nnz, 1)
        cut = int(np.searchsorted(cum, coverage)) + 1
        min_pair_nnz = counts[order][min(cut - 1, len(order) - 1)]
    dense_pair = counts >= min_pair_nnz
    dense_edge = dense_pair[pair_of_edge]

    a_dense = sp.csr_matrix(
        (coo.data[dense_edge], (coo.row[dense_edge], coo.col[dense_edge])),
        shape=(n_pad, n_pad))
    a_stray = sp.csr_matrix(
        (coo.data[~dense_edge], (coo.row[~dense_edge], coo.col[~dense_edge])),
        shape=(n_pad, n_pad))

    block = from_scipy_blocks(a_dense, block_size=b, dtype=dtype)
    ell = from_scipy(a_stray, dtype=dtype)

    if dtype is None:
        import jax as _jax

        dtype = np.float64 if _jax.config.jax_enable_x64 else np.float32
    colsums = np.zeros(n_pad, dtype=dtype)
    colsums[:n] = np.asarray(a.sum(axis=0)).ravel().astype(dtype)
    return HybridGraph(block=block, ell=ell,
                       colsums_raw=jnp.asarray(colsums), n_cells=n)


def from_scipy_blocks(a, block_size=256, dtype=None) -> BlockGraph:
    """Convert a scipy sparse matrix (already locality-ordered) to
    block-dense tiles on device."""
    import scipy.sparse as sp

    if dtype is None:
        import jax as _jax

        dtype = np.float64 if _jax.config.jax_enable_x64 else np.float32

    a = sp.csr_matrix(a)
    n = a.shape[0]
    b = block_size
    n_blocks = -(-n // b)
    n_pad = n_blocks * b

    coo = a.tocoo()
    br, bc = coo.row // b, coo.col // b
    pair_key = br.astype(np.int64) * n_blocks + bc
    uniq, pair_of_edge = np.unique(pair_key, return_inverse=True)
    p = len(uniq)
    pair_rows = (uniq // n_blocks).astype(np.int32)
    pair_cols = (uniq % n_blocks).astype(np.int32)

    tiles = np.zeros((p, b, b), dtype=dtype)
    tiles[pair_of_edge, coo.row % b, coo.col % b] = coo.data.astype(dtype)

    colsums = np.zeros(n_pad, dtype=dtype)
    colsums[:n] = np.asarray(a.sum(axis=0)).ravel().astype(dtype)

    return BlockGraph(
        tiles=jnp.asarray(tiles),
        pair_rows=jnp.asarray(pair_rows),
        pair_cols=jnp.asarray(pair_cols),
        colsums_raw=jnp.asarray(colsums),
        n_cells=n,
    )
