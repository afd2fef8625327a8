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
    matrix, but via a sorted-key reverse-edge lookup instead of sparse
    matrix arithmetic — ~10x faster at atlas scale (the scipy route was
    ~10 s at 100k cells and grows superlinearly with transpose+multiply).

    Returns COO arrays (rows, cols, vals) with each symmetric edge
    present in BOTH directions exactly once.
    """
    n, k = indices.shape
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = np.asarray(indices).ravel().astype(np.int64)
    vals = np.asarray(w).ravel()
    nz = vals != 0
    rows, cols, vals = rows[nz], cols[nz], vals[nz]

    key = rows * n + cols
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    vals_sorted = vals[order]

    rev_key = cols * n + rows
    pos = np.searchsorted(key_sorted, rev_key)
    pos_c = np.minimum(pos, len(key_sorted) - 1)
    has_rev = (pos < len(key_sorted)) & (key_sorted[pos_c] == rev_key)
    s_ji = np.where(has_rev, vals_sorted[pos_c], 0.0)
    w_sym = vals + s_ji - vals * s_ji

    # mutual edges appear once per direction already; one-directional
    # edges contribute their mirrored copy explicitly
    one_way = ~has_rev
    out_rows = np.concatenate([rows, cols[one_way]])
    out_cols = np.concatenate([cols, rows[one_way]])
    out_vals = np.concatenate([w_sym, w_sym[one_way]])
    return (out_rows.astype(np.int32), out_cols.astype(np.int32), out_vals)


def fuzzy_connectivities(indices, dists):
    """Symmetric fuzzy-union connectivity matrix from kNN lists.

    Returns a scipy CSR (N x N): ``A + A^T - A o A^T``.
    """
    n, k = indices.shape
    d = jnp.asarray(dists)
    rho, sigma = smooth_knn_dist(d, jnp.log2(jnp.asarray(float(k))))
    w = np.asarray(membership_strengths(
        d, rho, sigma, jnp.asarray(np.asarray(indices, dtype=np.int32))))

    rows, cols, vals = _fuzzy_union_edges(np.asarray(indices), w)
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

    indices, dists = knn_search(rep, n_neighbors, method=method)

    n = data.n_obs
    rows = np.repeat(np.arange(n), n_neighbors - 1)
    dist_mat = sp.csr_matrix(
        (dists[:, 1:].ravel(), (rows, indices[:, 1:].ravel())), shape=(n, n))

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
