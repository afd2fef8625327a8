"""Sparse(graph) x dense SpMM for random-walk diffusion, TPU-first.

The reference's entire compiled hot path is one line of scipy CSR matvec
(``_nam.py:33``: ``a.dot(s/colsums) + self_weight*s/colsums``).  On TPU
the graph lives in hybrid ELL + COO-overflow form (``cna_tpu.graph.ell``):
the bulk of edges sit in fixed-width padded neighbor lists, turning SpMM
into a dense row gather plus a small contraction that XLA maps onto
vector units at HBM bandwidth; hub-row overflow edges are applied with a
scatter-add.

Two execution strategies for the ELL part:

* fused gather+einsum — best when the materialized gather (N*K*S
  elements) fits comfortably in HBM;
* row-blocked variant via ``lax.map`` — bounds peak memory to
  ``block_rows*K*S`` for atlas-scale inputs.

A Pallas kernel for the bandwidth-limited regime lives in
``cna_tpu.ops.spmm_pallas``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ell_spmm(indices, weights, x, block_rows: int | None = None):
    """Compute ``y[i] = sum_k weights[i, k] * x[indices[i, k]]``.

    Args:
      indices: int32 (N, K) neighbor row ids; padded entries may point
        anywhere (weight must be 0 there).
      weights: (N, K) edge weights, 0 at padding.
      x: (N, S) dense right-hand side.
      block_rows: if given, process rows in chunks of this size to bound
        the (block_rows, K, S) gather buffer.

    Returns: (N, S) dense result.
    """
    n = indices.shape[0]
    if block_rows is None or block_rows >= n:
        return _ell_spmm_full(indices, weights, x)
    return _ell_spmm_blocked(indices, weights, x, block_rows)


def _ell_spmm_full(indices, weights, x):
    gathered = jnp.take(x, indices, axis=0)  # (N, K, S)
    return jnp.einsum(
        "nk,nks->ns", weights, gathered, preferred_element_type=x.dtype
    )


def _ell_spmm_blocked(indices, weights, x, block_rows):
    n, k = indices.shape
    nblocks = -(-n // block_rows)
    pad = nblocks * block_rows - n
    if pad:
        indices = jnp.pad(indices, ((0, pad), (0, 0)))
        weights = jnp.pad(weights, ((0, pad), (0, 0)))
    idx_b = indices.reshape(nblocks, block_rows, k)
    w_b = weights.reshape(nblocks, block_rows, k)

    def one_block(args):
        idx, w = args
        g = jnp.take(x, idx, axis=0)  # (block_rows, K, S)
        return jnp.einsum("nk,nks->ns", w, g, preferred_element_type=x.dtype)

    out = jax.lax.map(one_block, (idx_b, w_b))
    out = out.reshape(nblocks * block_rows, x.shape[1])
    return out[:n] if pad else out


def coo_spmm_add(out, rows, cols, weights, x):
    """Scatter-add COO edges: ``out[rows] += weights * x[cols]``.

    Padding edges must have weight 0 (they then contribute nothing
    regardless of their row/col).  Used for the hub-row overflow tail.
    """
    if rows.shape[0] == 0:
        return out
    contrib = weights[:, None] * jnp.take(x, cols, axis=0)  # (M, S)
    return out.at[rows].add(contrib)


def graph_spmm(graph, x, block_rows: int | None = None):
    """Full hybrid SpMM: ELL bulk + COO overflow (``y = A @ x``)."""
    y = ell_spmm(graph.indices, graph.weights, x, block_rows=block_rows)
    return coo_spmm_add(
        y, graph.overflow_rows, graph.overflow_cols, graph.overflow_weights, x
    )


def _auto_block(n, k, s, budget=1 << 28):
    """Row-block size bounding the (block, K, S) gather buffer."""
    per_row = max(k * s, 1)
    if n * per_row <= budget:
        return None
    return max(1024, budget // per_row)


def bucket_spmm(graph, x):
    """Degree-bucketed SpMM: per-bucket gather+einsum, concatenated.

    ``graph`` is a ``cna_tpu.graph.buckets.BucketEllGraph`` whose rows are
    degree-sorted; each bucket is padded only to its own width, so total
    gather traffic is ~nnz tiles instead of N*K_p98 (scatter-free: hub
    rows live in a small wide bucket instead of a COO overflow).
    """
    outs = []
    for idx, w in zip(graph.indices, graph.weights):
        nb, kb = idx.shape
        if kb == 0 or nb == 0:
            outs.append(jnp.zeros((nb, x.shape[1]), x.dtype))
        else:
            outs.append(ell_spmm(idx, w, x,
                                 block_rows=_auto_block(nb, kb,
                                                        x.shape[1])))
    return jnp.concatenate(outs, axis=0)


def sorted_ext_spmm(graph, x):
    """SpMM of a ``graph.device.SortedExtGraph``: uniform direct ELL +
    in-degree-bucketed mirror columns + tiny COO spill.

    The bucket outputs are produced in mirror-degree-sorted row order
    and restored to compact order with ONE (N, S) row gather — no
    scatter anywhere on the hot path (the spill COO is capped at ~1e-4
    of the mirror edges at build time)."""
    y = ell_spmm(graph.direct_indices, graph.direct_weights, x,
                 block_rows=_auto_block(*graph.direct_indices.shape,
                                        x.shape[1]))
    outs = []
    for idx, w in zip(graph.ext_indices, graph.ext_weights):
        nb, kb = idx.shape
        if kb == 0 or nb == 0:
            outs.append(jnp.zeros((nb, x.shape[1]), x.dtype))
        else:
            outs.append(ell_spmm(idx, w, x,
                                 block_rows=_auto_block(nb, kb,
                                                        x.shape[1])))
    if outs:
        y = y + jnp.concatenate(outs, axis=0)[graph.inv_pi]
    return coo_spmm_add(y, graph.overflow_rows, graph.overflow_cols,
                        graph.overflow_weights, x)


def block_spmm(graph, x, pair_chunk: int = 2048):
    """Block-dense SpMM: ``y = A @ x`` from (P, B, B) dense tiles.

    Per pair p: ``y[rows[p]] += tiles[p] @ x[cols[p]]`` — a contiguous
    block gather, a batched MXU matmul, and a sorted scatter-add.  Pairs
    are processed in chunks to bound the gathered buffer; padding pairs
    (zero tiles pointing at block 0) contribute nothing.
    """
    import jax

    b = graph.block_size
    s_dim = x.shape[1]
    xb = x.reshape(-1, b, s_dim)
    n_blocks = xb.shape[0]
    p = graph.tiles.shape[0]

    if p <= pair_chunk:
        gathered = jnp.take(xb, graph.pair_cols, axis=0)  # (P, B, S)
        prod = jnp.einsum("pij,pjs->pis", graph.tiles, gathered,
                          preferred_element_type=x.dtype)
        out = jax.ops.segment_sum(prod, graph.pair_rows,
                                  num_segments=n_blocks,
                                  indices_are_sorted=True)
        return out.reshape(x.shape)

    nchunks = -(-p // pair_chunk)
    pad = nchunks * pair_chunk - p
    tiles = jnp.pad(graph.tiles, ((0, pad), (0, 0), (0, 0)))
    rows = jnp.pad(graph.pair_rows, (0, pad))
    cols = jnp.pad(graph.pair_cols, (0, pad))
    tiles_c = tiles.reshape(nchunks, pair_chunk, b, b)
    rows_c = rows.reshape(nchunks, pair_chunk)
    cols_c = cols.reshape(nchunks, pair_chunk)

    def body(out, chunk):
        t_c, r_c, c_c = chunk
        gathered = jnp.take(xb, c_c, axis=0)
        prod = jnp.einsum("pij,pjs->pis", t_c, gathered,
                          preferred_element_type=x.dtype)
        out = out.at[r_c].add(prod)
        return out, None

    out0 = jnp.zeros_like(xb)
    out, _ = jax.lax.scan(body, out0, (tiles_c, rows_c, cols_c))
    return out.reshape(x.shape)


def diffusion_step(s, graph, colsums, self_weight, block_rows=None):
    """One lazy-random-walk diffusion step (format-dispatched).

    Reference ``diffuse_stepwise`` body (``_nam.py:28,33``):
    ``colsums = a.sum(axis=0) + self_weight`` and
    ``s' = a @ (s/colsums) + self_weight * s/colsums``.
    With a symmetric graph, row i of ``a`` holds i's neighbor weights, so
    the update is a weighted average over neighbors of the column-scaled
    state plus a scaled self-loop.
    """
    from ..graph.blocks import BlockGraph, HybridGraph
    from ..graph.buckets import BucketEllGraph
    from ..graph.device import SortedExtGraph
    from .spmm_pallas import BandedGraph, banded_spmm

    t = s / colsums[:, None]
    if isinstance(graph, SortedExtGraph):
        return sorted_ext_spmm(graph, t) + self_weight * t
    if isinstance(graph, BucketEllGraph):
        return bucket_spmm(graph, t) + self_weight * t
    if isinstance(graph, BandedGraph):
        return banded_spmm(graph, t) + self_weight * t
    if isinstance(graph, HybridGraph):
        return (block_spmm(graph.block, t) + graph_spmm(graph.ell, t)
                + self_weight * t)
    if isinstance(graph, BlockGraph):
        return block_spmm(graph, t) + self_weight * t
    return graph_spmm(graph, t, block_rows=block_rows) + self_weight * t
