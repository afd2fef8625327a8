"""kNN graph + UMAP fuzzy-simplicial-set connectivities, on device.

Replaces the load-bearing external preprocessing path the reference
assumes (``sc.pp.neighbors``; see reference demo.ipynb cell 29 and
``_nam.py:12-19`` which reads its output).  The produced
``obsp['connectivities']`` follows the same construction as umap-learn's
``fuzzy_simplicial_set`` (reimplemented from the UMAP paper's definitions):

1. per-point adaptive kernel: ``rho_i`` = distance to nearest neighbor,
   ``sigma_i`` solved by bisection so the smoothed neighbor weights sum to
   ``log2(n_neighbors)``;
2. directed membership strengths ``exp(-(d_ij - rho_i)+ / sigma_i)``;
3. probabilistic-union symmetrization ``A + A^T - A o A^T``.

Steps 1-2 are one vmapped XLA program; the kNN itself is the blocked
MXU search in ``cna_tpu.pp.knn``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .knn import knn_search

_SMOOTH_K_TOLERANCE = 1e-5
_MIN_K_DIST_SCALE = 1e-3


@partial(jax.jit, static_argnames=("n_iter",))
def smooth_knn_dist(dists, target, n_iter=64):
    """Solve for (rho, sigma) per point given ascending kNN distances.

    ``dists``: (N, k) including the self distance 0 in column 0.
    ``target``: scalar, log2(n_neighbors).
    Follows umap-learn's ``smooth_knn_dist`` with local_connectivity=1:
    rho = smallest nonzero distance; sigma by 64-step bisection on
    ``sum_{j>=1} exp(-(d_ij - rho)+ / sigma) = target`` with the
    d <= rho terms contributing exactly 1.
    """
    nonzero = jnp.where(dists > 0, dists, jnp.inf)
    rho = jnp.min(nonzero, axis=1)
    rho = jnp.where(jnp.isfinite(rho), rho, 0.0)

    d_shift = dists[:, 1:] - rho[:, None]  # skip self column

    def psum(sigma):
        terms = jnp.where(d_shift > 0, jnp.exp(-d_shift / sigma[:, None]), 1.0)
        return jnp.sum(terms, axis=1)

    def body(_, state):
        lo, hi, mid = state
        val = psum(mid)
        done = jnp.abs(val - target) < _SMOOTH_K_TOLERANCE
        too_big = val > target
        new_hi = jnp.where(~done & too_big, mid, hi)
        new_lo = jnp.where(~done & ~too_big, mid, lo)
        new_mid = jnp.where(
            done,
            mid,
            jnp.where(
                too_big,
                (lo + new_hi) / 2.0,
                jnp.where(jnp.isinf(new_hi), mid * 2.0, (new_lo + new_hi) / 2.0),
            ),
        )
        return new_lo, new_hi, new_mid

    n = dists.shape[0]
    state = (
        jnp.zeros(n, dtype=dists.dtype),
        jnp.full(n, jnp.inf, dtype=dists.dtype),
        jnp.ones(n, dtype=dists.dtype),
    )
    _, _, sigma = jax.lax.fori_loop(0, n_iter, body, state)

    # clamp tiny sigmas relative to the mean local distance scale
    mean_d_local = jnp.mean(dists, axis=1)
    mean_d_global = jnp.mean(dists)
    sigma = jnp.where(
        rho > 0,
        jnp.maximum(sigma, _MIN_K_DIST_SCALE * mean_d_local),
        jnp.maximum(sigma, _MIN_K_DIST_SCALE * mean_d_global),
    )
    return rho, sigma


@jax.jit
def membership_strengths(dists, rho, sigma, indices=None):
    """Directed edge weights exp(-(d - rho)+ / sigma); self edges get 0.

    The self edge is identified by INDEX (``indices[i, j] == i``), as in
    umap-learn — with duplicate points the self entry can tie-break into
    any distance-0 column, not necessarily column 0.  When ``indices``
    is omitted, column 0 is assumed to be self (true for distinct
    points, the common case)."""
    w = jnp.exp(-jnp.maximum(dists - rho[:, None], 0.0) / sigma[:, None])
    if indices is None:
        return w.at[:, 0].set(0.0)
    self_edge = indices == jnp.arange(dists.shape[0], dtype=indices.dtype)[:, None]
    return jnp.where(self_edge, 0.0, w)


def _fuzzy_union_edges(indices, w):
    """Probabilistic-union symmetrization directly on kNN edge lists.

    Equivalent to scipy's ``A + A^T - A o A^T`` on the directed strength
    matrix, but via ONE radix sort of undirected canonical edge keys
    ``min(i,j)*n + max(i,j)``: a directed kNN edge appears at most once
    per direction, so after sorting, mutual pairs are adjacent —
    ``a + b - a*b`` is an adjacent-element merge, all sequential memory.
    (The scipy route was ~10 s at 100k cells; a previous searchsorted
    reverse-lookup was dominated by 15M cache-missing binary searches at
    1M cells.)

    Returns COO arrays (rows, cols, vals) with each symmetric edge
    present in BOTH directions exactly once.
    """
    n, k = indices.shape
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = np.asarray(indices).ravel().astype(np.int64)
    vals = np.asarray(w).ravel()
    nz = vals != 0  # drops self edges (strength 0) and pruned entries
    rows, cols, vals = rows[nz], cols[nz], vals[nz]

    # canonical undirected key + a direction bit: after one sort, each
    # undirected edge's (i->j) then (j->i) entries sit adjacent, with
    # duplicate directed entries (COO semantics: they sum) in one run
    dirbit = (rows > cols).astype(np.int64)
    key = (np.minimum(rows, cols) * n + np.maximum(rows, cols)) * 2 + dirbit
    order = np.argsort(key)
    k_s = key[order]
    v_s = vals[order]

    m = len(k_s)
    if m == 0:  # e.g. n_neighbors=1: only self edges, all strength 0
        empty_i = np.zeros(0, dtype=np.int32)
        return (empty_i, empty_i.copy(), np.zeros(0, dtype=vals.dtype))
    first = np.empty(m, dtype=bool)
    first[0] = True
    np.not_equal(k_s[1:], k_s[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    run_sum = np.add.reduceat(v_s, starts)  # per (edge, direction) weight
    kk = k_s[starts] >> 1  # canonical undirected key per run

    g = len(kk)
    cfirst = np.empty(g, dtype=bool)
    cfirst[0] = True
    np.not_equal(kk[1:], kk[:-1], out=cfirst[1:])
    cstarts = np.flatnonzero(cfirst)
    csizes = np.diff(np.append(cstarts, g))
    a = run_sum[cstarts]
    b = np.where(csizes == 2, run_sum[np.minimum(cstarts + 1, g - 1)], 0.0)

    ku = kk[cstarts]
    ru = (ku // n).astype(np.int32)
    cu = (ku % n).astype(np.int32)
    # diagonal entries (weight-0 in real kNN output, hence normally
    # dropped above, but kept for exact A + A^T - A o A^T semantics):
    # A_ii appears in one run with dirbit 0, and its transpose partner
    # is itself — and it must be emitted once, not mirrored
    diag = ru == cu
    w_sym = np.where(diag, a + a - a * a, a + b - a * b)
    out_rows = np.concatenate([ru, cu[~diag]])
    out_cols = np.concatenate([cu, ru[~diag]])
    out_vals = np.concatenate([w_sym, w_sym[~diag]])
    return (out_rows, out_cols, out_vals)


def fuzzy_connectivities(indices, dists):
    """Symmetric fuzzy-union connectivity matrix from kNN lists.

    Returns a scipy CSR (N x N): ``A + A^T - A o A^T``.

    rho/sigma come from the vmapped on-device bisection; the membership
    strengths themselves are evaluated host-side from the (already
    host-resident) distances — the formula is one exp over N*k values,
    and pulling the (N, k) weight matrix back through the tunneled d2h
    path would cost more than recomputing it (CLAUDE.md: d2h ~8 MB/s).
    """
    idx_np = np.asarray(indices)
    d_np = np.asarray(dists)
    n, k = idx_np.shape
    rho, sigma = smooth_knn_dist(jnp.asarray(d_np),
                                 jnp.log2(jnp.asarray(float(k))))
    rho_np = np.asarray(rho)
    sig_np = np.asarray(sigma)
    w = np.exp(-np.maximum(d_np - rho_np[:, None], 0.0) / sig_np[:, None])
    w[idx_np == np.arange(n)[:, None]] = 0.0  # self edges, by index

    rows, cols, vals = _fuzzy_union_edges(idx_np, w)
    result = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    result.eliminate_zeros()
    return result


def neighbors(data, n_neighbors=15, n_pcs=None, use_rep=None, key_added=None,
              method="auto"):
    """Build the cell-cell graph: kNN + fuzzy connectivities.

    Drop-in for the role ``sc.pp.neighbors`` plays upstream of the
    reference: writes ``obsp['distances']`` (directed kNN distances),
    ``obsp['connectivities']`` (symmetric fuzzy weights, what
    ``cna_tpu.tl`` diffusion consumes), and ``uns['neighbors']`` metadata.

    Representation: ``obsm[use_rep]`` if given, else ``obsm['X_pca']``
    (computed on the fly from ``data.X`` when absent), truncated to
    ``n_pcs`` components.
    """
    from .pca import device_rep

    if use_rep is None:
        if "X_pca" not in data.obsm:
            from .pca import pca

            pca(data, n_comps=min(50, data.n_vars))
        rep = data.obsm["X_pca"]
    else:
        rep = data.obsm[use_rep]
    rep = device_rep(data, rep)  # skip d2h->h2d when pp.pca just ran
    if n_pcs is not None:
        rep = rep[:, :n_pcs]

    from ..utils.profiling import global_profiler

    _prof = global_profiler()
    with _prof.phase("knn", cells=data.n_obs):
        indices, dists = knn_search(rep, n_neighbors, method=method)
        # pull both (N, k) arrays exactly once; everything downstream
        # (distances CSR, fuzzy union) is host-side
        indices = np.asarray(indices)
        dists = np.asarray(dists)

    n = data.n_obs
    with _prof.phase("fuzzy_graph", cells=n):
        # rows are already grouped: build the CSR directly from the kNN
        # layout (indptr is arithmetic) instead of a COO coalesce sort
        kk = n_neighbors - 1
        indptr = np.arange(0, n * kk + 1, kk, dtype=np.int64)
        dist_mat = sp.csr_matrix(
            (dists[:, 1:].ravel().copy(),
             indices[:, 1:].ravel().astype(np.int32), indptr),
            shape=(n, n))
        dist_mat.sort_indices()

        conn = fuzzy_connectivities(indices, dists)

    data.obsp["distances"] = dist_mat
    data.obsp["connectivities"] = conn
    data.uns["neighbors"] = {
        "connectivities_key": "connectivities",
        "distances_key": "distances",
        "params": {"n_neighbors": n_neighbors, "method": "umap",
                   "knn_method": method,
                   "metric": "euclidean"},
    }
    return conn
