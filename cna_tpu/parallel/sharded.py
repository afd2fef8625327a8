"""Sharded execution of the CNA pipeline over a (cells, perms) mesh.

Design (SURVEY §2.3/§5.7): GSPMD sharding annotations + jit; XLA inserts
the collectives.  The diffusion gather reads remote rows of the scaled
state — with the state row-sharded over ``cells``, XLA lowers this to an
all-gather of the (N, S) state per step, which is exact and rides ICI.
(A halo-exchange shard_map variant that moves only boundary rows is the
planned optimization for multi-host DCN meshes.)

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
