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


@jax.jit
def _union_chunk(idx_chunk, w_chunk, indices, w, row0):
    """Fuzzy union + mutuality mask for one row chunk of the kNN lists.

    For directed edge (i, j) with strength a = w[i, s]: the reverse
    strength b = w[j, t] where indices[j, t] == i (0 if j's list lacks
    i) is found with one gather of j's neighbor list + an equality
    mask — no sort.  Returns (a + b - a*b, b-was-present).
    """
    nbr_idx = indices[idx_chunk]  # (B, k, k) row-gather
    nbr_w = w[idx_chunk]          # (B, k, k)
    i_of_edge = row0 + jnp.arange(idx_chunk.shape[0], dtype=jnp.int32)
    match = nbr_idx == i_of_edge[:, None, None]
    b = jnp.sum(jnp.where(match, nbr_w, 0.0), axis=-1)  # (B, k)
    # emission plan, decided edge-by-edge so each undirected pair lands
    # in the matrix exactly once per direction even when one side's
    # strength underflowed to 0: the side with a > 0 owns the entry,
    # and also owns the mirror unless the partner emits it itself
    pos = w_chunk > 0
    mirror = pos & ~(b > 0)
    code = pos.astype(jnp.int8) + 2 * mirror.astype(jnp.int8)
    return w_chunk + b - w_chunk * b, code


def fuzzy_union_device(indices_dev, w_dev, chunk_rows=65_536):
    """Symmetrized fuzzy-union strengths aligned to the kNN edge list.

    Returns (w_sym (N, k) float, code (N, k) int8) on device:
    ``w_sym[i, s] = a + b - a*b`` for the directed edge
    i -> indices[i, s]; ``code`` bit 0 says "emit (i, j, w_sym)", bit 1
    says "also emit the mirror (j, i, w_sym)" (set exactly when the
    partner's own row will not emit it).  Because both a and b are
    elements of the SAME device weight array and a+b-a*b is evaluated
    identically from either side, the resulting matrix is float-exact
    symmetric.  Row chunks bound the two (B, k, k) gather buffers at
    ~60 MB each for k=15 (advisor r3: the old 262144-row default put
    them at ~236 MB apiece).  TPU
    row-gather granularity makes this ~2 x (N fetches x 4KB-tile)
    traffic (see CLAUDE.md row-gather invariant) — ~1 s per pass at 1M
    cells, vs ~15-20 s for the host radix-sort union it replaces.
    Requires each row's neighbor list to be duplicate-free (true of
    every kNN search in ``pp.knn``)."""
    n = indices_dev.shape[0]
    outs = []
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        outs.append(_union_chunk(
            indices_dev[lo:hi], w_dev[lo:hi], indices_dev, w_dev,
            jnp.asarray(lo, jnp.int32)))
    if len(outs) == 1:
        return outs[0]
    return (jnp.concatenate([o[0] for o in outs], axis=0),
            jnp.concatenate([o[1] for o in outs], axis=0))


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

    The whole pipeline (rho/sigma bisection, membership strengths, and
    the union itself via the gather-based mutual match in
    ``fuzzy_union_device``) runs on device; the host only pulls the
    (N, k) symmetric weights + emission codes (75 MB at 1M cells) and
    assembles the CSR with boolean gathers — no host sort.  (The
    previous host radix-sort union cost ~15-20 s at 1M cells on this
    box's throttled CPU; see ``_fuzzy_union_edges``, kept as the
    reference implementation for parity tests.)
    """
    idx_np = np.asarray(indices)
    n, k = idx_np.shape
    idx_dev = jnp.asarray(idx_np)
    d_dev = jnp.asarray(dists)
    rho, sigma = smooth_knn_dist(d_dev, jnp.log2(jnp.asarray(float(k))))
    w_dev = membership_strengths(d_dev, rho, sigma, idx_dev)
    w_sym_dev, code_dev = fuzzy_union_device(idx_dev, w_dev)
    w_sym = np.asarray(w_sym_dev)
    code = np.asarray(code_dev)

    rows2d = np.broadcast_to(np.arange(n, dtype=np.int32)[:, None], (n, k))
    direct = (code & 1).astype(bool)
    mirror = (code & 2).astype(bool)
    out_rows = np.concatenate([rows2d[direct], idx_np[mirror]])
    out_cols = np.concatenate([idx_np[direct], rows2d[mirror]])
    out_vals = np.concatenate([w_sym[direct], w_sym[mirror]])
    result = sp.csr_matrix((out_vals, (out_rows, out_cols)), shape=(n, n))
    result.eliminate_zeros()
    return result


def _device_knn(rep, k, method):
    """Device-resident kNN lists for the non-IVF methods (identity cell
    order): the Pallas exact kernel or the blocked XLA search, with
    results left ON device for the fuzzy/ELL stages."""
    from .knn import _knn_query_block

    x = jnp.asarray(rep, dtype=jnp.float32)
    n = x.shape[0]
    if method == "pallas":
        from ..ops.knn_pallas import knn_pallas

        interpret = jax.devices()[0].platform != "tpu"
        negd, idx = knn_pallas(x, k, interpret=interpret)
        return idx, jnp.sqrt(jnp.maximum(-negd, 0.0))
    key_block = 8192
    nkb = -(-n // key_block)
    pad = nkb * key_block - n
    x_padded = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    sq = jnp.sum(x_padded * x_padded, axis=1)
    outs = [
        _knn_query_block(x[s:s + 4096], x_padded, sq, k, key_block, n,
                         method=method)
        for s in range(0, n, 4096)
    ]
    negd = jnp.concatenate([o[0] for o in outs])
    idx = jnp.concatenate([o[1] for o in outs])
    return idx, jnp.sqrt(jnp.maximum(-negd, 0.0))


def _neighbors_device(data, rep, n_neighbors, method, resolved):
    """Graph build with ZERO (N, k)-sized host transfers.

    kNN lists stay on device (the IVF fine index in compact layout
    order, or the exact/approx searches in identity order); the fuzzy
    union and the symmetric-ELL pack (``graph.device.build_sym_ell``)
    consume them in place.  What lands in ``obsp`` are lazy faces that
    materialize scipy matrices only if something actually asks for
    them — ``tl.association`` never does (it takes the packed graph +
    reordering straight from ``DeviceConnectivities``).  Round-3 spent
    12-18 s of the 1M graph build pulling and re-assembling what this
    path never moves.
    """
    from ..graph.device import DeviceConnectivities, LazyDistances, \
        build_sym_ell
    from ..graph.reorder import Reordering
    from ..utils.profiling import global_profiler
    from .ivf import ivf_knn_device

    _prof = global_profiler()
    n = data.n_obs
    with _prof.phase("knn", cells=n):
        if resolved == "ivf":
            res = ivf_knn_device(rep, n_neighbors)
            idx_dev, d_dev, order = res.indices, res.dists, res.order
        else:
            idx_dev, d_dev = _device_knn(rep, n_neighbors, resolved)
            order = np.arange(n, dtype=np.int32)
    with _prof.phase("fuzzy_graph", cells=n):
        rho, sigma = smooth_knn_dist(
            d_dev, jnp.log2(jnp.asarray(float(n_neighbors))))
        w = membership_strengths(d_dev, rho, sigma, idx_dev)
        w_sym, code = fuzzy_union_device(idx_dev, w)
        ell = build_sym_ell(idx_dev, w_sym, code)
        if resolved == "ivf":
            inv = np.empty(n, dtype=order.dtype)
            inv[order] = np.arange(n, dtype=order.dtype)
            ordering = Reordering(perm=order, inv=inv)
        else:
            ordering = None  # identity: skip the permutation machinery
        conn = DeviceConnectivities(ell, ordering, n)

    data.obsp["connectivities"] = conn
    data.obsp["distances"] = LazyDistances(idx_dev, d_dev, order)
    data.uns["neighbors"] = {
        "connectivities_key": "connectivities",
        "distances_key": "distances",
        "params": {"n_neighbors": n_neighbors, "method": "umap",
                   "knn_method": method,
                   "knn_method_resolved": resolved,
                   "metric": "euclidean"},
    }
    if resolved == "ivf":
        # recall provenance for benchmarks/audits: the operating point
        # is a CHOSEN spot on a measured recall-vs-probes curve
        data.uns["neighbors"]["ivf"] = {
            "u": res.u,
            "coverage": res.u * res.index.g / max(n, 1),
            "verify_recall": res.recall,
            "pilot_curve": list(res.history),
        }
    return conn


def neighbors(data, n_neighbors=15, n_pcs=None, use_rep=None, key_added=None,
              method="auto"):
    """Build the cell-cell graph: kNN + fuzzy connectivities.

    Drop-in for the role ``sc.pp.neighbors`` plays upstream of the
    reference: writes ``obsp['distances']`` (directed kNN distances),
    ``obsp['connectivities']`` (symmetric fuzzy weights, what
    ``cna_tpu.tl`` diffusion consumes), and ``uns['neighbors']`` metadata.
    On the IVF path (``method='ivf'``, or 'auto' at atlas scale) both
    obsp entries are device-resident lazy objects — scipy matrices
    materialize on demand, and ``tl`` consumes the device graph directly.

    Representation: ``obsm[use_rep]`` if given, else ``obsm['X_pca']``
    (computed on the fly from ``data.X`` when absent), truncated to
    ``n_pcs`` components.
    """
    from .knn import resolve_method
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

    resolved = resolve_method(data.n_obs, method)
    # the device-resident graph path serves every method on TPU (host
    # transfers are the cost there) and the IVF path on any backend
    # (tested end to end on CPU in interpret mode); the CPU golden path
    # keeps the host CSR assembly it has always been validated on
    if resolved == "ivf" or jax.devices()[0].platform == "tpu":
        return _neighbors_device(data, rep, n_neighbors, method, resolved)

    from ..utils.profiling import global_profiler

    _prof = global_profiler()
    with _prof.phase("knn", cells=data.n_obs):
        indices, dists = knn_search(rep, n_neighbors, method=resolved)
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
                   "knn_method_resolved": resolved,
                   "metric": "euclidean"},
    }
    return conn
