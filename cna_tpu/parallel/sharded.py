"""GSPMD-sharded pipeline stages over a (cells, perms) mesh.

Design (SURVEY §2.3/§5.7): sharding annotations + jit; XLA inserts the
collectives.  For DIFFUSION this module is the *fallback*: the gather
reads remote rows of the scaled state, which XLA lowers to an all-gather
of the (N, S) state per step — exact, and fine intra-host over ICI, but
it moves the whole state regardless of how many rows each shard actually
references.  The production ``association(mesh=)``/``nam_arrays(mesh=)``
path runs diffusion through the explicit halo exchange instead
(``parallel.halo`` wired in ``tools._nam``), which ships only boundary
rows; this GSPMD step remains for graph formats that have no halo plan.

The permutation-null stage shards the Nnull axis: each device scores its
own null columns (projector matmul + cumulative F-tests) with no
cross-device traffic until the final tiny gather of min-p scalars.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import ftest, moments, spmm
from . import mesh as meshlib


def shard_graph(graph, mesh):
    """Place graph arrays on the mesh: ELL rows over ``cells``, overflow
    and colsums replicated (overflow is tiny; colsums are read at
    arbitrary indices by the gather)."""
    rows = meshlib.cell_rows(mesh)
    repl = meshlib.replicated(mesh)
    return jax.tree.map(
        lambda x: x,
        type(graph)(
            indices=jax.device_put(graph.indices, rows),
            weights=jax.device_put(graph.weights, rows),
            overflow_rows=jax.device_put(graph.overflow_rows, repl),
            overflow_cols=jax.device_put(graph.overflow_cols, repl),
            overflow_weights=jax.device_put(graph.overflow_weights, repl),
            colsums_raw=jax.device_put(graph.colsums_raw, repl),
        ),
    )


@jax.jit
def _diffusion_step_sharded(s, graph, colsums, self_weight):
    # s arrives row-sharded over cells; the jnp.take gather makes XLA
    # all-gather the scaled state, compute shard-local rows, and keep the
    # output row-sharded (propagated from s's sharding).
    return spmm.diffusion_step(s, graph, colsums, self_weight)


def diffusion_step(s, graph, colsums, self_weight, mesh):
    s = jax.device_put(s, meshlib.cell_rows(mesh))
    return _diffusion_step_sharded(
        s, graph, colsums, jnp.asarray(self_weight, dtype=s.dtype))


@jax.jit
def _null_stats_sharded(u, m_proj, y_cols, ks, r):
    return ftest.minp_stats_batch(u, m_proj, y_cols, ks, r)


def null_minp(u, m_proj, y_cols, ks, r, mesh):
    """Score permutation-null columns, sharded over the perms axis."""
    y_cols = jax.device_put(y_cols, meshlib.perm_cols(mesh))
    u = jax.device_put(jnp.asarray(u), meshlib.replicated(mesh))
    m_proj = jax.device_put(jnp.asarray(m_proj), meshlib.replicated(mesh))
    return _null_stats_sharded(u, m_proj, y_cols, jnp.asarray(ks), r)


@jax.jit
def _null_ncorrs_sharded(namresid, m_proj, y_cols):
    z = m_proj @ y_cols
    z = moments.scale_by_std(z, ddof=1, axis=0)
    return jnp.abs(namresid.T @ z) / namresid.shape[0]


def null_ncorrs(namresid, m_proj, y_cols, mesh):
    """The dominant FLOP block (cells x S) @ (S x Nnull), sharded over
    cells (rows of the output) and perms (columns)."""
    namresid = jax.device_put(jnp.asarray(namresid), meshlib.cell_cols(mesh))
    y_cols = jax.device_put(jnp.asarray(y_cols), meshlib.perm_cols(mesh))
    m_proj = jax.device_put(jnp.asarray(m_proj), meshlib.replicated(mesh))
    return _null_ncorrs_sharded(namresid, m_proj, y_cols)


@partial(jax.jit, static_argnames=("r",))
def association_step(s, graph, colsums, self_weight, c_counts, u, m_proj,
                     y_cols, ks, r):
    """One fused "training step" of the full pipeline for compile checks:
    diffusion update + stopping statistic + null min-p batch + the local
    null-coefficient matmul.  All shardings are inherited from the input
    placements (cells for s/graph, perms for y_cols)."""
    s_new = spmm.diffusion_step(s, graph, colsums, self_weight)
    snormed = s_new / c_counts[None, :]  # (cells, S), rows sharded
    medkurt = jnp.median(moments.kurtosis(snormed, axis=1))
    nam = snormed - snormed.mean(axis=0, keepdims=True)
    k_sel, minps, _ = ftest.minp_stats_batch(u, m_proj, y_cols, ks, r)
    z = moments.scale_by_std(m_proj @ y_cols, ddof=1, axis=0)
    nullnc = jnp.abs(nam @ z) / nam.shape[0]  # (cells, Nnull)
    return s_new, medkurt, minps, nullnc


@partial(jax.jit, static_argnames=("k", "key_block", "n"))
def _knn_sharded(q, x, k, key_block, n):
    """Blocked exact kNN with query rows sharded over the cells axis.

    Every op in the merge (distance matmul, top_k, take_along_axis) is
    row-parallel, so GSPMD partitions the whole scan over the query
    sharding with zero collectives beyond the one-time key replication.
    """
    sq_norms = jnp.sum(x * x, axis=1)
    q_norms = jnp.sum(q * q, axis=1, keepdims=True)
    nblocks = x.shape[0] // key_block

    def body(carry, b):
        best_d, best_i = carry
        start = b * key_block
        xb = jax.lax.dynamic_slice_in_dim(x, start, key_block, axis=0)
        nb = jax.lax.dynamic_slice_in_dim(sq_norms, start, key_block, axis=0)
        negd = -(q_norms + nb[None, :] - 2.0 * (q @ xb.T))
        idx = (start + jnp.arange(key_block)).astype(jnp.int32)
        negd = jnp.where((idx < n)[None, :], negd, -jnp.inf)
        cat_d = jnp.concatenate([best_d, negd], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(idx[None, :], negd.shape)], axis=1)
        top_d, pos = jax.lax.top_k(cat_d, k)
        return (top_d, jnp.take_along_axis(cat_i, pos, axis=1)), None

    init = (jnp.full((q.shape[0], k), -jnp.inf, q.dtype),
            jnp.zeros((q.shape[0], k), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(body, init, jnp.arange(nblocks))
    return best_d, best_i


def sharded_knn(points, k, mesh, key_block: int = 8192):
    """Exact self-kNN data-parallel over the mesh's ``cells`` axis.

    Queries are row-sharded; the key set is replicated (the one
    all-gather-equivalent placement).  Returns host (indices (N, k)
    int32, distances (N, k)) in the ``knn_search`` contract.

    This is the multi-chip scale-out of graph construction: per-device
    work is N^2/D distances, so a v5p-16 runs the 1M x 1M exact search
    ~8x faster than one chip.  (On CPU test meshes the same program runs
    under 8 virtual devices.)
    """
    import numpy as np

    x = jnp.asarray(points)
    n, d = x.shape
    n_dev = mesh.devices.size
    # pad queries so the row shard divides evenly; keys pad to key_block
    q_pad = -(-n // (8 * n_dev)) * (8 * n_dev)
    k_pad = -(-n // key_block) * key_block
    q = jnp.pad(x, ((0, q_pad - n), (0, 0)))
    xk = jnp.pad(x, ((0, k_pad - n), (0, 0)))
    q = jax.device_put(q, meshlib.cell_rows(mesh))
    xk = jax.device_put(xk, meshlib.replicated(mesh))
    neg_d, idx = _knn_sharded(q, xk, k, key_block, n)
    dists = jnp.sqrt(jnp.maximum(-neg_d[:n], 0.0))
    return np.asarray(idx[:n]), np.asarray(dists)
