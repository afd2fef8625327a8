"""UMAP 2-D embedding layout, on device.

The reference leans on ``sc.tl.umap`` for the embedding its plotting
layer draws (reference ``plotting/_umap.py`` via ``sc.pl.umap``; built in
demo.ipynb cell 29).  This is a from-scratch JAX implementation of the
published UMAP layout algorithm (McInnes et al.): spectral (or PCA)
initialization from the fuzzy graph, then SGD on the cross-entropy
surrogate with per-edge sampling schedules and uniform negative
sampling — edges grouped by power-of-two visit period and processed
batch-synchronously on their due epochs inside ``lax.fori_loop``
programs instead of umap-learn's sequential Numba loop (see
``_period_structure`` for the measured rationale).

Differences from umap-learn (documented, intentional):
* edges are processed batch-synchronously per due epoch (scatter-free
  segment accumulation), not in sequential order — standard for
  accelerator ports of UMAP;
* per-edge visit rates are quantized to powers of two (error <=
  sqrt(2) on the schedule heuristic);
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


def _bucket_up(v: int) -> int:
    """Quarter-octave shape bucket (stable compiled shapes across
    datasets of similar size)."""
    step = max((1 << max(int(v) - 1, 0).bit_length()) // 4, 8)
    return ((int(v) + step - 1) // step) * step


def _period_structure(heads, tails, eps_edge, n, max_period=256):
    """Static due-edge structure for the scatter-free SGD epoch.

    Two measured facts shape this (UMAP_PROFILE 500k, r5): TPU scatters
    cost ~0.9 s per 1e7 elements, and the batch-all-edges epoch computes
    every edge every epoch while the published sequential algorithm
    visits an edge only when its ``epochs_per_sample`` schedule says so
    (~20% of edges per epoch on fuzzy kNN graphs) — a single CPU thread
    beat the all-edges TPU epoch ~7x on visit economy alone.

    Both fixed at once:

    * visit periods are quantized to powers of two (visit-rate error
      <= sqrt(2), immaterial next to the schedule's own heuristic role)
      and edges grouped by period — at epoch i only groups with
      ``(i+1) % period == 0`` run, inside ``lax.cond`` branches that
      skip the work entirely when inactive;
    * within each group, edges are head-sorted and ALL endpoint updates
      (attract +move at heads, −move at tails, negative-sample repulsion
      at heads) run scatter-free through ONE segment pass: a (static)
      argsort of [heads ‖ tails ‖ heads] turns the accumulation into one
      cumulative sum + boundary-diff + DENSE (N+1, 2) add (the
      sort-into-segments trick from ``graph.device``);
    * negative samples are drawn as R-row windows from a per-epoch
      shuffled position buffer (the classic fixed negative-table
      scheme): one (N, 2) gather per epoch replaces the (E, R, 2)
      arbitrary-row gather, measured 4.4x cheaper at 500k.

    Each group is padded to a quarter-octave size with dummy edges on
    the sentinel row ``n`` (position duplicates row 0's start; d2 = 0
    kills the attract gradient, and the dummy's negative kicks land on
    the sentinel row, which is sliced off) so compiled shapes are stable
    across similar datasets.

    Returns a list of per-group dicts (host arrays) ordered by period.
    """
    eps = np.maximum(np.asarray(eps_edge, np.float64), 1.0)
    p = np.clip(2 ** np.round(np.log2(eps)), 1,
                max_period).astype(np.int64)
    order = np.lexsort((heads, p))
    groups = []
    for period in np.unique(p):
        sel = order[p[order] == period]
        e_g = len(sel)
        e_pad = _bucket_up(e_g)
        h = np.full(e_pad, n, np.int32)
        t = np.full(e_pad, n, np.int32)
        h[:e_g] = heads[sel]
        t[:e_g] = tails[sel]
        keys = np.concatenate([h, t, h])
        ord_ = np.argsort(keys, kind="stable").astype(np.int32)
        bounds = np.searchsorted(
            keys[ord_], np.arange(n + 2)).astype(np.int32)
        groups.append({
            "period": int(period),
            "heads": h, "tails": t, "ord": ord_, "bounds": bounds,
        })
    return groups


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
    n = pos0.shape[0]
    heads = np.asarray(heads)
    tails = np.asarray(tails)
    groups = _period_structure(heads, tails,
                               np.asarray(epochs_per_sample), n)
    periods = tuple(g["period"] for g in groups)
    groups_dev = tuple(
        (jnp.asarray(g["heads"]), jnp.asarray(g["tails"]),
         jnp.asarray(g["ord"]), jnp.asarray(g["bounds"]))
        for g in groups)
    # static negative table: a fixed random permutation of the cells,
    # re-gathered from the CURRENT positions once per epoch and read in
    # R-row windows (every window entry is a uniform random cell)
    rng_neg = np.random.RandomState(0x5eed)
    nw = max(n // negative_sample_rate, 1)
    neg_perm = jnp.asarray(rng_neg.permutation(n)[
        : nw * negative_sample_rate].astype(np.int32))
    # sentinel row n absorbs dummy-edge updates; sliced off at the end
    pos = jnp.concatenate(
        [pos0, jnp.zeros((1, pos0.shape[1]), pos0.dtype)])

    # ~2e8 gather/cumsum elements per segment ≈ seconds per dispatch
    # (expected per-epoch visits = sum over groups of E_g / period)
    per_epoch = sum(
        (len(g["heads"]) / g["period"]) * (4 + negative_sample_rate)
        for g in groups)
    seg = int(np.clip(2e8 // max(int(per_epoch), 1), 1, n_epochs))
    state = (pos, key)
    for e0 in range(0, n_epochs, seg):
        e1 = min(e0 + seg, n_epochs)
        # epoch bounds ride as DYNAMIC operands: every segment (and
        # every n_epochs) reuses ONE compiled program — static bounds
        # recompiled per segment (measured 725 vs 291 ms/epoch at
        # 12 vs 48 epochs purely from per-segment compile overhead)
        state = _optimize_segment(state, groups_dev, neg_perm, a, b,
                                  jnp.float32(n_epochs),
                                  jnp.int32(e0), jnp.int32(e1),
                                  initial_alpha,
                                  negative_sample_rate, periods)
    return state[0][:n]


@partial(jax.jit, static_argnames=("negative_sample_rate", "periods"))
def _optimize_segment(state, groups_dev, neg_perm, a, b, n_epochs,
                      epoch0, epoch1, initial_alpha=1.0,
                      negative_sample_rate=5, periods=()):
    """Epochs [epoch0, epoch1) of the UMAP SGD.

    Edges live in per-period groups (``_period_structure``); a group
    runs only on its due epochs, inside ``lax.cond`` so off-epochs cost
    nothing.  All endpoint accumulation is scatter-free, attract and
    repulsion forces are computed on the epoch's starting positions and
    applied in one segment pass per group."""
    eps = 1e-3
    r_neg = negative_sample_rate
    clip = lambda x: jnp.clip(x, -4.0, 4.0)

    def epoch_body(i, state):
        pos, key = state
        alpha = initial_alpha * (1.0 - i / n_epochs)
        # per-epoch negative table refresh: (Nw, R, 2) windows of the
        # current positions in a fixed random order
        ptab = pos[neg_perm].reshape(-1, r_neg, pos.shape[1])
        nw = ptab.shape[0]

        # every group's forces are computed from the SAME epoch-start
        # positions and summed into one delta — the group phases are
        # then independent dataflow XLA can overlap, instead of a
        # serial latency chain of sequential pos updates (measured: the
        # sequential form was latency-bound, ~0.6 s/epoch at 500k with
        # R=1 vs R=5 nearly identical)
        delta = jnp.zeros_like(pos)
        for period, (heads, tails, ord_idx, bounds) in zip(
                periods, groups_dev):
            key, sub = jax.random.split(key)

            def run(sub, heads=heads, tails=tails, ord_idx=ord_idx,
                    bounds=bounds):
                e_g = heads.shape[0]
                ph = pos[heads]  # (Eg, 2)
                pt = pos[tails]
                diff = ph - pt
                d2 = jnp.sum(diff * diff, axis=1)
                grad_coeff = (-2.0 * a * b * d2 ** (b - 1.0)
                              / (a * d2 ** b + 1.0))
                grad_coeff = jnp.where(d2 > 0, grad_coeff, 0.0)
                move = clip(grad_coeff[:, None] * diff) * alpha

                # negative sampling: R-row window of the shuffled table
                bases = jax.random.randint(sub, (e_g,), 0, nw)
                pn = ptab[bases]  # (Eg, R, 2)
                diffn = ph[:, None, :] - pn
                d2n = jnp.sum(diffn * diffn, axis=2)
                rep_coeff = (2.0 * b) / ((eps + d2n)
                                         * (a * d2n ** b + 1.0))
                moven = clip(rep_coeff[:, :, None] * diffn).sum(
                    axis=1) * alpha

                # +move at heads, -move at tails, +moven at heads — one
                # cumulative-sum segment pass over [E ‖ E ‖ E]
                mv_all = jnp.concatenate([move, -move, moven])[ord_idx]
                return _segment_delta(mv_all, bounds)

            if period == 1:
                delta = delta + run(sub)
            else:
                delta = delta + jax.lax.cond(
                    (i + 1) % period == 0, run,
                    lambda sub: jnp.zeros_like(pos), sub)
        return (pos + delta, key)

    return jax.lax.fori_loop(epoch0, epoch1, epoch_body, state)


_SPECTRAL_AUTO_MAX_N = 200_000


def umap(data, n_components=2, n_epochs=None, min_dist=0.1, spread=1.0,
         negative_sample_rate=5, seed=0, key_added="X_umap",
         init="auto"):
    """Compute a UMAP embedding of the cells into ``data.obsm[key_added]``.

    Requires ``data.obsp['connectivities']`` (run ``pp.neighbors`` first).

    ``init``: 'spectral' (umap-learn's default; host LOBPCG — measured
    250 s at 500k cells on this class of host), 'pca' (first two PCA
    components, O(1) when ``obsm['X_pca']`` exists — the standard
    at-scale alternative), 'random', or 'auto' (spectral up to 200k
    cells, then pca).
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
    if init == "auto":
        init = ("spectral" if n <= _SPECTRAL_AUTO_MAX_N
                or "X_pca" not in getattr(data, "obsm", {})
                else "pca")
    if init == "pca":
        emb = np.asarray(data.obsm["X_pca"])[:, :n_components]
        emb = emb - emb.mean(axis=0, keepdims=True)
        pos0 = (emb * (10.0 / max(np.abs(emb).max(), 1e-12))).astype(
            np.float32)
        init_mode = "pca"
    elif init == "random":
        rng = np.random.RandomState(seed)
        pos0 = rng.uniform(-10, 10, (n, n_components)).astype(np.float32)
        init_mode = "random"
    else:
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
