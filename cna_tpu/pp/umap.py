"""UMAP 2-D embedding layout, on device.

The reference leans on ``sc.tl.umap`` for the embedding its plotting
layer draws (reference ``plotting/_umap.py`` via ``sc.pl.umap``; built in
demo.ipynb cell 29).  This is a from-scratch JAX implementation of the
published UMAP layout algorithm (McInnes et al.): spectral initialization
from the fuzzy graph, then SGD on the cross-entropy surrogate with
per-edge sampling schedules and uniform negative sampling — vectorized
over all edges per epoch inside one ``lax.fori_loop`` program instead of
umap-learn's sequential Numba loop.

Differences from umap-learn (documented, intentional):
* edges are processed batch-synchronously per epoch (displacements
  scatter-added), not in sequential order — standard for accelerator
  ports of UMAP;
* the RNG is JAX's counter-based PRNG, so layouts match umap-learn in
  quality, not bit-for-bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _fit_ab(spread=1.0, min_dist=0.1):
    """Least-squares fit of the rational attraction curve 1/(1+a d^2b)
    to the desired fuzzy kernel (umap's find_ab_params)."""
    from scipy.optimize import curve_fit

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2 * b))

    xv = np.linspace(0, spread * 3, 300)
    yv = np.ones_like(xv)
    mask = xv >= min_dist
    yv[mask] = np.exp(-(xv[mask] - min_dist) / spread)
    params, _ = curve_fit(curve, xv, yv)
    return float(params[0]), float(params[1])


def spectral_init(conn, n_components=2, seed=0, tol=1e-4, maxiter=None):
    """Spectral layout: the ``n_components`` smallest non-trivial
    eigenvectors of the normalized graph Laplacian.

    Solver: LOBPCG (block, preconditioner-free — the normalized
    Laplacian has unit diagonal, so the natural Jacobi preconditioner is
    the identity), seeded with the known nullspace direction
    ``D^{1/2} 1`` plus a deterministic random block.  This replaces
    ARPACK ``eigsh(which='SM')``, which without shift-invert is
    notoriously slow/non-convergent at atlas scale.  Falls back to a
    random layout ONLY on solver error, with a loud warning — never
    silently.

    Returns (embedding (N, n_components) float32, mode string:
    'spectral' | 'spectral-unconverged' | 'random').
    """
    import warnings

    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    n = conn.shape[0]
    deg = np.asarray(conn.sum(axis=1)).ravel()
    deg[deg == 0] = 1
    d_inv_sqrt = sp.diags(1.0 / np.sqrt(deg))
    lap = (sp.identity(n) - d_inv_sqrt @ conn @ d_inv_sqrt).tocsr()
    k = n_components + 1
    if maxiter is None:
        maxiter = 200
    mode = "spectral"
    try:
        rng = np.random.RandomState(seed)
        x0 = np.empty((n, k))
        x0[:, 0] = np.sqrt(deg)  # exact nullspace of the normalized L
        x0[:, 1:] = rng.standard_normal((n, k - 1))
        x0 /= np.linalg.norm(x0, axis=0, keepdims=True)
        with warnings.catch_warnings():
            # lobpcg warns about its own exhausted-maxiter condition; we
            # quantify convergence ourselves via the residuals below
            warnings.simplefilter("ignore")
            vals, vecs = spl.lobpcg(lap, x0, tol=tol, maxiter=maxiter,
                                    largest=False)
        order = np.argsort(vals)
        vals, vecs = vals[order], vecs[:, order]
        resid = np.linalg.norm(lap @ vecs - vecs * vals[None, :], axis=0)
        if np.any(resid[1:k] > 1e-2):
            mode = "spectral-unconverged"
            warnings.warn(
                "pp.umap spectral initialization did not fully converge "
                f"(residual norms {resid[1:k]}); using the partially "
                "converged eigenvectors, which still beat a random "
                "layout. Consider raising maxiter/tol.")
        emb = vecs[:, 1:k]
    except Exception as err:  # solver failure, not slow convergence
        warnings.warn(
            "pp.umap spectral initialization FAILED "
            f"({type(err).__name__}: {err}); falling back to a RANDOM "
            "initial layout. The embedding will likely be poor — check "
            "the connectivity graph.")
        mode = "random"
        rng = np.random.RandomState(seed)
        emb = rng.uniform(-10, 10, (n, n_components))
    expansion = 10.0 / max(np.abs(emb).max(), 1e-12)
    return (emb * expansion).astype(np.float32), mode


def _segment_structure(heads, tails, n):
    """Static accumulation structure for the scatter-free SGD epoch.

    TPU scatters cost ~0.9 s per 1e7 elements (CLAUDE.md); the three
    per-epoch (E, 2) scatter-adds dominated the 500k layout at
    3.1 s/epoch (UMAP_PROFILE r4).  The per-row sums are instead
    computed with the sort-into-segments trick proven in
    ``graph.device``: edges are stored HEAD-SORTED; the (static)
    argsort of [heads ‖ tails] turns both endpoint updates into one
    segment-sum over a cumulative sum — an (N+1,)-bounds gather of the
    running cumsum, a subtract, and a DENSE (N, 2) add.  Zero scatters.

    Returns host arrays:
      h_sort: (E,) permutation sorting edges by head (applied once to
        the edge arrays at build).
      both_src: (2E,) edge index feeding the combined attract pass
        (entries >= E mean "tail end: negate move").
      both_bounds: (N+1,) segment bounds of the combined sorted keys.
      head_bounds: (N+1,) segment bounds of the (sorted) heads — reused
        by the negative-sampling accumulation.
    """
    h_sort = np.argsort(heads, kind="stable")
    heads_s = heads[h_sort]
    tails_s = tails[h_sort]
    e = len(heads_s)
    keys = np.concatenate([heads_s, tails_s])
    ord_ = np.argsort(keys, kind="stable")
    keys_sorted = keys[ord_]
    rows = np.arange(n + 1)
    both_bounds = np.searchsorted(keys_sorted, rows).astype(np.int32)
    head_bounds = np.searchsorted(heads_s, rows).astype(np.int32)
    return (h_sort.astype(np.int32), ord_.astype(np.int32),
            both_bounds, head_bounds, e)


def _segment_delta(move_sorted, bounds):
    """Per-row sums of ``move_sorted`` (segment-sorted (M, 2)) via
    cumulative sum + boundary differences: returns (N, 2)."""
    c0 = jnp.concatenate(
        [jnp.zeros((1, move_sorted.shape[1]), move_sorted.dtype),
         jnp.cumsum(move_sorted, axis=0)])
    return c0[bounds[1:]] - c0[bounds[:-1]]


def _optimize_layout(pos0, heads, tails, epochs_per_sample, key, a, b,
                     n_epochs, initial_alpha=1.0, negative_sample_rate=5):
    """SGD over the UMAP objective, macro-batched into epoch segments.

    One ``fori_loop`` over ALL epochs is a single device dispatch whose
    runtime grows with N*epochs — at atlas scale that is a multi-minute
    program, exactly what reproducibly crashes the tunneled TPU worker
    (CLAUDE.md).  Epochs are therefore dispatched in segments sized to a
    few seconds each (identical numerics: the segment boundary only cuts
    the loop, state threads through).  Segments queue asynchronously; no
    host sync between them.
    """
    e = heads.shape[0]
    n = pos0.shape[0]
    heads = np.asarray(heads)
    tails = np.asarray(tails)
    h_sort, ord_idx, both_bounds, head_bounds, _ = _segment_structure(
        heads, tails, n)
    heads_d = jnp.asarray(heads[h_sort])
    tails_d = jnp.asarray(tails[h_sort])
    eps_edge = jnp.asarray(
        np.asarray(epochs_per_sample)[h_sort]).astype(pos0.dtype)
    ord_d = jnp.asarray(ord_idx)
    bb_d = jnp.asarray(both_bounds)
    hb_d = jnp.asarray(head_bounds)

    # ~2e8 gather/cumsum elements per segment ≈ seconds per dispatch
    per_epoch = e * (4 + negative_sample_rate)
    seg = int(np.clip(2e8 // max(per_epoch, 1), 1, n_epochs))
    state = (pos0, eps_edge, key)
    for e0 in range(0, n_epochs, seg):
        e1 = min(e0 + seg, n_epochs)
        state = _optimize_segment(state, heads_d, tails_d, eps_edge,
                                  ord_d, bb_d, hb_d, a, b,
                                  n_epochs, e0, e1, initial_alpha,
                                  negative_sample_rate)
    return state[0]


@partial(jax.jit, static_argnames=("n_epochs", "epoch0", "epoch1",
                                   "negative_sample_rate"))
def _optimize_segment(state, heads, tails, eps_edge, ord_idx,
                      both_bounds, head_bounds, a, b, n_epochs,
                      epoch0, epoch1, initial_alpha=1.0,
                      negative_sample_rate=5):
    """Epochs [epoch0, epoch1) of the UMAP SGD, all edges vectorized.

    ``heads``/``tails``/``eps_edge`` are head-sorted; the endpoint
    updates run scatter-free through ``_segment_delta`` (see
    ``_segment_structure``)."""
    n = state[0].shape[0]
    e = heads.shape[0]
    eps = 1e-3
    clip = lambda x: jnp.clip(x, -4.0, 4.0)

    def epoch_body(i, state):
        pos, eons, key = state
        alpha = initial_alpha * (1.0 - i / n_epochs)
        active = eons <= i  # (E,) edges due this epoch

        ph = pos[heads]  # (E, 2)
        pt = pos[tails]
        diff = ph - pt
        d2 = jnp.sum(diff * diff, axis=1)
        # attractive gradient coefficient
        grad_coeff = (-2.0 * a * b * d2 ** (b - 1.0)
                      / (a * d2 ** b + 1.0))
        grad_coeff = jnp.where(d2 > 0, grad_coeff, 0.0)
        move = clip(grad_coeff[:, None] * diff) * alpha
        move = jnp.where(active[:, None], move, 0.0)
        # +move at heads, -move at tails, in one segment pass
        mv_all = jnp.concatenate([move, -move])[ord_idx]
        pos = pos + _segment_delta(mv_all, both_bounds)

        # negative sampling: repel heads from random points
        key, sub = jax.random.split(key)
        negs = jax.random.randint(
            sub, (e, negative_sample_rate), 0, n)
        ph = pos[heads]
        pn = pos[negs]  # (E, R, 2)
        diffn = ph[:, None, :] - pn
        d2n = jnp.sum(diffn * diffn, axis=2)
        rep_coeff = (2.0 * b) / ((eps + d2n) * (a * d2n ** b + 1.0))
        moven = clip(rep_coeff[:, :, None] * diffn).sum(axis=1) * alpha
        moven = jnp.where(active[:, None], moven, 0.0)
        # edges are head-sorted, so moven is already segment-sorted
        pos = pos + _segment_delta(moven, head_bounds)

        eons = jnp.where(active, eons + eps_edge, eons)
        return (pos, eons, key)

    return jax.lax.fori_loop(epoch0, epoch1, epoch_body, state)


def umap(data, n_components=2, n_epochs=None, min_dist=0.1, spread=1.0,
         negative_sample_rate=5, seed=0, key_added="X_umap"):
    """Compute a UMAP embedding of the cells into ``data.obsm[key_added]``.

    Requires ``data.obsp['connectivities']`` (run ``pp.neighbors`` first).
    """
    conn = data.obsp.get("connectivities")
    if conn is None:
        raise KeyError("run cna_tpu.pp.neighbors before pp.umap")
    import scipy.sparse as sp

    if not sp.issparse(conn):  # device-resident graph: materialize
        conn = conn.tocsr()

    coo = sp.coo_matrix(sp.triu(conn, k=1) + sp.triu(conn.T, k=1))
    # symmetric graph: keep each undirected edge once (upper triangle)
    coo.sum_duplicates()
    w = coo.data.astype(np.float32)
    n = conn.shape[0]
    if n_epochs is None:
        n_epochs = 500 if n <= 10_000 else 200

    # umap's per-edge sampling schedule: stronger edges update more often
    w = np.where(w < w.max() / float(n_epochs), 0.0, w)
    keep = w > 0
    heads = coo.row[keep].astype(np.int32)
    tails = coo.col[keep].astype(np.int32)
    eps_edge = w.max() / w[keep]

    a, b = _fit_ab(spread=spread, min_dist=min_dist)
    pos0, init_mode = spectral_init(conn, n_components=n_components,
                                    seed=seed)

    pos = _optimize_layout(
        jnp.asarray(pos0), jnp.asarray(heads), jnp.asarray(tails),
        jnp.asarray(eps_edge), jax.random.key(seed),
        a, b, n_epochs=int(n_epochs),
        negative_sample_rate=negative_sample_rate)
    data.obsm[key_added] = np.asarray(pos)
    data.uns["umap"] = {
        "params": {"a": a, "b": b, "n_epochs": int(n_epochs),
                   "min_dist": min_dist, "spread": spread, "seed": seed},
        "init": init_mode,
    }
    return data.obsm[key_added]
