"""IVF (inverted-file) approximate kNN — sub-quadratic search on device.

Brute-force kNN (``cna_tpu.ops.knn_pallas``) is exact but O(N^2): ~3 s at
100k cells on one v5e and ~minutes at 1M.  Atlas-scale search needs an
index.  CPU stacks use graph-based NN-descent (pynndescent, what scanpy
runs); that algorithm is pointer-chasing and maps poorly onto the MXU.
IVF-flat is the TPU-shaped alternative (the structure GPU FAISS uses):

Two implementations share the idea:

* **TPU (and ``pallas_interpret=True``)** — the two-level fine-block
  index in ``cna_tpu.pp.ivf_fine``: k-means clusters of ~96 rows packed
  into 128-row blocks, per-block own-centroid probe tables, the Pallas
  scorer in ``ops.ivf_pallas`` (VMEM-resident packed-id top-k, 16
  candidate blocks per grid step), results device-resident in compact
  layout order.  This module's ``ivf_knn`` wraps it with the host
  (indices, distances) contract; ``ivf_knn_device`` exposes the
  device-resident result that ``pp.neighbors`` consumes.
* **XLA (CPU and any non-TPU backend)** — this module's single-level
  slot structure: cells sorted by cluster id, clusters cut into <= M
  row slots, each slot scored against its ``nprobe`` nearest clusters
  with ``jax.lax.approx_max_k`` per probe (~0.99 recall within the
  probed set) and an exact merge; clusters ~n/1024.

Total compute ~ N * coverage * N * D MACs — linear in N for fixed
cluster geometry.  Overall recall ~= probe coverage, which a pilot
calibrates against a measured exact-truth sample per dataset (with a
held-out verification half in both implementations).
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_clusters", "iters"))
def _kmeans_fit(x, init_idx, n_clusters, iters):
    """Lloyd's algorithm; returns centroids (C, D)."""
    cent = x[init_idx]

    def step(cent, _):
        d2 = (jnp.sum(x * x, axis=1, keepdims=True)
              - 2.0 * (x @ cent.T)
              + jnp.sum(cent * cent, axis=1)[None, :])
        cid = jnp.argmin(d2, axis=1)
        sums = jax.ops.segment_sum(x, cid, num_segments=n_clusters)
        cnts = jax.ops.segment_sum(jnp.ones(x.shape[0], x.dtype), cid,
                                   num_segments=n_clusters)
        new = sums / jnp.maximum(cnts, 1.0)[:, None]
        # keep empty clusters where they were
        new = jnp.where(cnts[:, None] > 0, new, cent)
        return new, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    return cent


@jax.jit
def _assign(x, cent):
    d2 = (jnp.sum(x * x, axis=1, keepdims=True)
          - 2.0 * (x @ cent.T)
          + jnp.sum(cent * cent, axis=1)[None, :])
    return jnp.argmin(d2, axis=1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "m", "chunk", "probe_chunk"))
def _score_slots(x_sorted, slot_starts, slot_counts, probe_starts,
                 probe_counts, k, m, chunk, probe_chunk=16):
    """Top-k of each sorted cell against its slot's probe candidates.

    x_sorted: (N_pad, D) cells in cluster order (rows >= N are inf-far).
    slot_starts/counts: (S,) row range of each slot.
    probe_starts/counts: (S, P) row ranges of the probed slots.
    Returns (negd (S, M, k), idx (S, M, k)) in SORTED row coordinates.

    HBM-traffic note: the (M, M) per-probe distance tile is reduced to
    (M, k) by ``approx_max_k`` IMMEDIATELY, inside a ``probe_chunk``-wide
    inner map; only then are probes merged with one exact top-k over the
    small (M, P*k) candidate set.  A previous formulation concatenated
    all probes into an (M, P*M) slab and transposed it before one giant
    approx_max_k — at 1M cells that slab is ~1.5 GB per slot and its
    materialize + transpose + reduce cost ~5.6 TB of HBM traffic; the
    per-probe reduction does ~2.8 TB and no transpose (measured ~2x).
    """
    p = probe_starts.shape[1]
    xn = jnp.sum(x_sorted * x_sorted, axis=1)
    kr = min(k, m)

    def one_slot(args):
        s0, c0, ps, pc = args
        q = jax.lax.dynamic_slice_in_dim(x_sorted, s0, m, axis=0)  # (M, D)
        qn = jax.lax.dynamic_slice_in_dim(xn, s0, m, axis=0)

        def one_probe(j):
            st = ps[j]
            cand = jax.lax.dynamic_slice_in_dim(x_sorted, st, m, axis=0)
            cn = jax.lax.dynamic_slice_in_dim(xn, st, m, axis=0)
            negd = 2.0 * (q @ cand.T) - qn[:, None] - cn[None, :]
            valid = jnp.arange(m, dtype=jnp.int32)[None, :] < pc[j]
            negd = jnp.where(valid, negd, -jnp.inf)
            bd, bpos = jax.lax.approx_max_k(negd, kr, recall_target=0.99)
            return bd, st + bpos.astype(jnp.int32)  # sorted coordinates

        negs_k, cols_k = jax.lax.map(one_probe, jnp.arange(p),
                                     batch_size=min(probe_chunk, p))
        negs_k = jnp.moveaxis(negs_k, 0, 1).reshape(m, p * kr)  # (M, P*k)
        cols_k = jnp.moveaxis(cols_k, 0, 1).reshape(m, p * kr)
        # exact merge of the per-probe winners, descending
        od, opos = jax.lax.top_k(negs_k, k)
        oi = jnp.take_along_axis(cols_k, opos, axis=1)
        return od, oi

    s = slot_starts.shape[0]
    negd, idx = jax.lax.map(
        one_slot, (slot_starts, slot_counts, probe_starts, probe_counts),
        batch_size=chunk)
    return negd, idx


def exact_knn_sample(x, q_ix, k, exact=True):
    """Reference kNN indices of the rows ``q_ix`` of ``x`` against all
    of ``x`` — blocked (|q| x N) distance matmuls on device, cheap
    relative to an index build.

    ``exact=False`` reduces each key block with ``approx_max_k`` at
    width 2k before the exact merge: the per-row truth set then has
    recall >= ~0.999 itself (PartialReduce at recall_target 0.99
    essentially never drops the LARGEST entries of a block, and the
    2k margin absorbs what it does drop), so a recall estimate against
    it is biased by well under 0.1%% — while the measurement runs ~10x
    faster (the exact path's cost is 123 full-width ``lax.top_k``
    calls, ~9 s at 1M cells; the approx path is PartialReduce + a
    60-wide merge)."""
    from .knn import _knn_query_block

    n = x.shape[0]
    # wide key blocks: the scan cost is per-iteration op overhead, not
    # FLOPs (measured 6s at 1M with 8192-wide blocks vs ~2s at 32768) —
    # scale the block to the dataset so big builds amortize the
    # overhead and small test datasets don't pay padding
    key_block = (131_072 if n > 262_144
                 else 32_768 if n > 32_768 else 8_192)
    nkb = -(-n // key_block)
    x_dev = jnp.asarray(x)
    x_pad = jnp.pad(x_dev, ((0, nkb * key_block - n), (0, 0)))
    sq = jnp.sum(x_pad * x_pad, axis=1)
    kq = k if exact else min(2 * k, key_block)
    _, true_idx = _knn_query_block(x_dev[jnp.asarray(q_ix)], x_pad, sq, kq,
                                   key_block, n,
                                   method="exact" if exact else "approx")
    return np.asarray(true_idx)[:, :k]


def _recall_against(indices_rows, true_rows, k):
    hits = 0
    for row, truth in zip(indices_rows, true_rows):
        hits += len(np.intersect1d(row, truth, assume_unique=False))
    return hits / (len(true_rows) * k)


def measured_recall(x, indices, k, sample=512, seed=0, exact=True):
    """Recall@k of ``indices`` against exact kNN on a random query sample."""
    n = x.shape[0]
    rng = np.random.RandomState(seed)
    m = min(sample, n)
    q_ix = rng.choice(n, m, replace=False)
    true_idx = exact_knn_sample(x, q_ix, k, exact=exact)
    return _recall_against(indices[q_ix], true_idx, k)



def ivf_knn_device(points, k, **kw):
    """Device-resident IVF kNN (two-level fine-block index): returns a
    ``FineSearchResult`` with (indices, dists) ON DEVICE in compact
    layout coordinates plus the ``order`` permutation.  The atlas-scale
    entry point for ``pp.neighbors`` — nothing (N, k)-sized crosses the
    tunnel.  See ``cna_tpu.pp.ivf_fine``.
    """
    from .ivf_fine import ivf_knn_fine

    return ivf_knn_fine(points, k, **kw)


def ivf_knn(points, k, n_clusters=None, nprobe=24, kmeans_iters=None,
            kmeans_sample=524_288, slot_rows=None, seed=0,
            min_recall=0.9, recall_sample=512, use_pallas=None,
            pallas_interpret=False):
    """Approximate self-kNN via an on-device IVF-flat index.

    Returns (indices (N, k) int32, distances (N, k) float32) sorted by
    increasing distance, each point its own first neighbor (the contract
    of ``knn_search``).

    Recall depends on the data's metric structure (true of every ANN
    index).  Rather than documenting a caveat, the index MEASURES it:
    recall@k is estimated against an exact-kNN sample and the probe
    count is calibrated on a slot-subsample pilot before the full
    search; while the measured recall is below ``min_recall`` the search
    re-runs with an escalated probe count.  A warning is raised if the
    floor is unreachable.  Set ``min_recall=None`` to disable.  Use
    ``method='pallas'`` (exact, O(N^2)) if in doubt.

    Two scoring paths:

    * **TPU (default on TPU; also ``pallas_interpret=True``)** — the
      two-level fine-block index in ``cna_tpu.pp.ivf_fine``: probe
      lists name g=128-row fine blocks ranked per slot by closest
      approach (per-query-grade selection), scored by the Pallas kernel
      in ``ops.ivf_pallas``; results stay on device (this wrapper pulls
      them once for the host contract).
    * **XLA (CPU and any non-TPU backend)** — the
      ``approx_max_k``-based ``_score_slots`` with data-adaptive slot
      rows, coarser clusters (c ~ n/1024).
    """
    from ..utils.profiling import global_profiler

    _prof = global_profiler()
    x = np.asarray(points, dtype=np.float32)
    n, d = x.shape
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        g = slot_rows if slot_rows is not None else 128
        res = ivf_knn_device(
            x, k, seed=seed, min_recall=min_recall,
            recall_sample=recall_sample, g=g, n_clusters=n_clusters,
            kmeans_sample=kmeans_sample,
            kmeans_iters=kmeans_iters or 8,
            interpret=pallas_interpret or None)
        idx_c = np.asarray(res.indices)
        d_c = np.asarray(res.dists)
        order = res.order
        indices = np.empty((n, k), np.int32)
        dists = np.empty((n, k), np.float32)
        indices[order] = order[idx_c]
        dists[order] = d_c
        return indices, dists
    if n_clusters is None:
        n_clusters = int(np.clip(n // 1024, 16, 8192))
    c = int(min(n_clusters, max(n // 8, 1)))
    if kmeans_iters is None:
        kmeans_iters = 8
    x_dev = jnp.asarray(x)

    # --- 1. centroids (fit on a subsample for huge N) ---
    with _prof.phase("ivf_kmeans", cells=n):
        rng = np.random.RandomState(seed)
        fit_x = x_dev
        if n > kmeans_sample:
            sub = rng.choice(n, kmeans_sample, replace=False)
            fit_x = x_dev[jnp.asarray(np.sort(sub))]
        init_idx = jnp.asarray(
            rng.choice(fit_x.shape[0], c, replace=False).astype(np.int32))
        cent = _kmeans_fit(fit_x, init_idx, c, kmeans_iters)
        cid = np.asarray(_assign(x_dev, cent))

    # --- 2. slot structure (shared by both scoring paths) ---
    order = np.argsort(cid, kind="stable").astype(np.int32)
    sizes = np.bincount(cid, minlength=c)
    if slot_rows is not None:
        m = slot_rows
    else:
        m = int(np.ceil(1.25 * n / c / 8) * 8)
    nslots_c = np.maximum(-(-sizes // m), 1).astype(np.int64)
    slot_cluster = np.repeat(np.arange(c, dtype=np.int64), nslots_c)
    s = len(slot_cluster)
    cluster_slot0 = np.concatenate([[0], np.cumsum(nslots_c)[:-1]])
    slot_within = np.arange(s, dtype=np.int64) - cluster_slot0[slot_cluster]
    slot_counts = np.clip(sizes[slot_cluster] - slot_within * m,
                          0, m).astype(np.int32)
    starts_of_cluster = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    # slot position in the cluster-PACKED (argsort) coordinate system —
    # pilot bookkeeping below uses these regardless of scoring layout
    slot_sorted_start = (starts_of_cluster[slot_cluster]
                         + slot_within * m).astype(np.int64)
    dummy_slot = s  # one extra count-0 slot pads probe lists / batches

    def _round_up(v, mult):
        return ((int(v) + mult - 1) // mult) * mult

    def _pow2_up(v):
        return 1 << max(int(v) - 1, 0).bit_length()

    def _bucket_up(v):
        """Quarter-octave shape bucket (..., 128, 160, 192, 224, 256,
        320, ...): pilot rounds / nprobe escalations with nearby probe
        counts reuse the SAME compiled program (each fresh shape costs a
        20-60 s tunnel compile — unbucketed shapes were the round-2 cold
        blowup, 1457 s at 100k cells) while padded dummy probes waste
        <= 25% of the scoring FLOPs."""
        step = max(_pow2_up(v) // 4, 8)
        return _round_up(v, step)

    # --- probe caps ---
    np_mem_cap = max(int(1.5e9 / max(2 * m * min(k, m) * 4, 1)), 8)
    np_max = int(min(c, np_mem_cap))
    np_eff = int(min(nprobe, np_max))

    # --- cluster-to-cluster probe ranking (top-np_max only) ---
    # float64 on host: the cancellation-prone |a|^2+|b|^2-2ab formula in
    # f32 can perturb near-equal probe ranks far from the origin
    # (advisor r3); the c x c matrix is tiny, so f64 costs nothing.
    cn_host = np.asarray(cent).astype(np.float64)
    cc = (cn_host * cn_host).sum(axis=1)
    cd2 = cc[:, None] + cc[None, :] - 2.0 * (cn_host @ cn_host.T)
    if np_max < c - 1:
        part = np.argpartition(cd2, np_max, axis=1)[:, : np_max + 1]
        sub = np.take_along_axis(cd2, part, axis=1)
        probe_order = np.take_along_axis(part, np.argsort(sub, axis=1),
                                         axis=1)
    else:
        probe_order = np.argsort(cd2, axis=1)

    # --- 3. device layout (cluster-sorted rows + a dummy tail slot) ---
    dummy_start = n
    n_rows = max(int(slot_sorted_start.max()) if s else 0,
                 dummy_start) + m
    x_sorted = np.zeros((n_rows, d), np.float32)
    x_sorted[:n] = x[order]
    x_sorted_dev = jnp.asarray(x_sorted)
    slot_starts_x = np.append(slot_sorted_start.astype(np.int32),
                              np.int32(dummy_start))
    slot_counts_x = np.append(slot_counts, np.int32(0))
    cand_to_orig = np.concatenate(
        [order, np.zeros(n_rows - n, np.int32)])
    slot_layout_start = slot_sorted_start

    def _build_probe_ids(np_eff, query_clusters):
        """(Q, P) slot-id probe lists for the np_eff nearest clusters of
        each query cluster, padded with the dummy slot.  Fully
        vectorized (np.repeat/cumsum ragged expansion) — the previous
        per-(slot, probe) Python loop was O(ns * nprobe)."""
        pc = probe_order[np.asarray(query_clusters)][:, :np_eff]
        cnts = nslots_c[pc]  # (Q, np_eff) slots contributed per probe
        tot = cnts.sum(axis=1)
        p_bucket = _bucket_up(int(tot.max()) if len(tot) else 1)
        q_n = len(pc)
        out = np.full((q_n, p_bucket), dummy_slot, np.int32)
        reps = cnts.ravel()
        colstart = np.cumsum(cnts, axis=1) - cnts  # exclusive, per row
        flat_total = int(reps.sum())
        intra2 = (np.arange(flat_total, dtype=np.int64)
                  - np.repeat(np.cumsum(reps) - reps, reps))
        rows_flat = np.repeat(np.arange(q_n * np_eff) // np_eff, reps)
        cols_flat = np.repeat(colstart.ravel(), reps) + intra2
        vals = np.repeat(cluster_slot0[pc.ravel()], reps) + intra2
        out[rows_flat, cols_flat] = vals.astype(np.int32)
        return out

    def _score_subset(np_eff, slot_ids):
        """Score ``slot_ids`` at ``np_eff``; returns slot-major raw
        (negd_s, idx_s) in LAYOUT coordinates.

        Macro-batched: one moderate program dispatched ns/batch times
        beats one giant program over every slot — a single multi-minute
        dispatch is exactly what the tunneled runtime kills (measured:
        the full 1M-cell search as ONE program reproducibly crashed the
        TPU worker), and per-batch d2h pulls overlap the next batch's
        compute instead of serializing after one monolithic wait."""
        sel = np.asarray(slot_ids, np.int64)
        ns_real = len(sel)
        probe_ids = _build_probe_ids(np_eff, slot_cluster[sel])
        p_bucket = probe_ids.shape[1]
        batch = 256 if ns_real > 256 else _round_up(ns_real, 64)
        ns = _round_up(ns_real, batch)
        probe_pad = np.full((ns, p_bucket), dummy_slot, np.int32)
        probe_pad[:ns_real] = probe_ids
        sel_pad = np.concatenate(
            [sel, np.full(ns - ns_real, dummy_slot, np.int64)])

        handles = []
        probe_chunk = 16
        per_slot = (probe_chunk * m * m
                    + 2 * p_bucket * m * min(k, m))
        chunk = max(1, min(batch, int(2.2e8 // max(per_slot, 1)) or 1))
        if chunk > 1:  # power-of-two bucket: reuse compiled programs
            chunk = _pow2_up(chunk + 1) // 2
        for lo in range(0, ns, batch):
            hi = lo + batch
            handles.append(_score_slots(
                x_sorted_dev,
                jnp.asarray(slot_starts_x[sel_pad[lo:hi]]),
                jnp.asarray(slot_counts_x[sel_pad[lo:hi]]),
                jnp.asarray(slot_starts_x[probe_pad[lo:hi]]),
                jnp.asarray(slot_counts_x[probe_pad[lo:hi]]),
                k, m, chunk, probe_chunk))
        if len(handles) == 1:
            negd_s, idx_s = handles[0]
            return np.asarray(negd_s[:ns_real]), np.asarray(idx_s[:ns_real])
        pulled = [(np.asarray(nd), np.asarray(ix)) for nd, ix in handles]
        negd_s = np.concatenate([p[0] for p in pulled])[:ns_real]
        idx_s = np.concatenate([p[1] for p in pulled])[:ns_real]
        return negd_s, idx_s

    cand_clip = len(cand_to_orig) - 1

    def _search(np_eff):
        with _prof.phase(f"ivf_search(nprobe={np_eff})", cells=n):
            negd_s, idx_s = _score_subset(np_eff, np.arange(s))

        # --- 4. unsort back to input order (vectorized: one validity
        # mask flattens all slots at once) ---
        valid = np.arange(m, dtype=np.int32)[None, :] < slot_counts[:, None]
        rows_layout = (slot_layout_start[:, None] + np.arange(m))[valid]
        rows_orig = cand_to_orig[rows_layout]
        indices = np.zeros((n, k), np.int32)
        dists = np.zeros((n, k), np.float32)
        indices[rows_orig] = cand_to_orig[np.clip(idx_s[valid], 0,
                                                  cand_clip)]
        dists[rows_orig] = np.sqrt(np.maximum(-negd_s[valid], 0.0))

        # contract: self is the first neighbor at distance 0
        self_col = indices == np.arange(n)[:, None]
        has_self = self_col.any(axis=1)
        # ensure self present (a top-k tie may rarely drop it)
        indices[:, 0] = np.where(has_self, indices[:, 0], np.arange(n))
        first = np.where(has_self, self_col.argmax(axis=1), 0)
        rr = np.arange(n)
        # swap self into column 0
        tmp_i, tmp_d = indices[rr, first].copy(), dists[rr, first].copy()
        indices[rr, first] = indices[:, 0]
        dists[rr, first] = dists[:, 0]
        indices[:, 0] = tmp_i
        dists[:, 0] = np.where(has_self, tmp_d, 0.0)
        dists[:, 0] = 0.0
        # re-sort columns 1.. by distance (swap may have unordered them)
        body_ord = np.argsort(dists[:, 1:], axis=1, kind="stable")
        indices[:, 1:] = np.take_along_axis(indices[:, 1:], body_ord, axis=1)
        dists[:, 1:] = np.take_along_axis(dists[:, 1:], body_ord, axis=1)
        return indices, dists

    # --- 5. calibrate nprobe on a slot subsample, search, verify ---
    if min_recall is not None and s >= 128:
        # PILOT: each candidate nprobe is scored on a random ~6% slot
        # subsample (bounded below at 32 slots) and its recall measured
        # on queries drawn from those slots — so the expensive full
        # search runs ONCE, at a calibrated nprobe.  Between pilot
        # rounds the next candidate comes from the empirical power law
        # recall ~ nprobe^alpha, clamped to [1.5x, 4x] growth.
        rng_p = np.random.RandomState(seed + 17)
        n_pilot = min(s, max(32, s // 16))
        ps_ids = np.sort(rng_p.choice(s, n_pilot, replace=False))
        ps_ids = ps_ids[slot_counts[ps_ids] > 0]
        pilot_cells_sorted = np.concatenate([
            np.arange(slot_sorted_start[si],
                      slot_sorted_start[si] + slot_counts[si])
            for si in ps_ids])
        q_sorted = rng_p.choice(
            pilot_cells_sorted,
            min(recall_sample, len(pilot_cells_sorted)), replace=False)
        q_orig = order[q_sorted]
        with _prof.phase("ivf_exact_truth"):
            true_idx = exact_knn_sample(x, q_orig, k, exact=False)
        # map each sampled query to (pilot slot row, offset)
        slot_of_q = np.searchsorted(slot_sorted_start[ps_ids], q_sorted,
                                    side="right") - 1
        off_of_q = q_sorted - slot_sorted_start[ps_ids][slot_of_q]

        history = []
        pilot_stop = None  # 'cap' | 'plateau' when recall floor unmet
        # the recall-0.9 coverage is ~11-16% of clusters at the TPU
        # path's granularity and similar for the XLA path's coarser
        # clusters (measured; see BENCH notes) — start the pilot at 10%
        # and let the power law close the gap in fine steps
        # hold out half the truth queries for post-search verification
        # (advisor r3: calibrating AND verifying on the same sample is
        # winner's-curse-biased — the selected nprobe is the first whose
        # SAMPLE recall clears the floor)
        half = len(q_orig) // 2
        cal_ix = np.arange(len(q_orig)) < half
        np_c = max(np_eff, min(c // 8, np_max))
        while True:
            with _prof.phase(f"ivf_pilot(nprobe={np_c})"):
                _, idx_p = _score_subset(np_c, ps_ids)
            got = cand_to_orig[np.clip(idx_p[slot_of_q, off_of_q], 0,
                                       cand_clip)]
            rec = _recall_against(got[cal_ix], true_idx[cal_ix], k)
            history.append((np_c, rec))
            if rec >= min_recall or np_c >= np_max:
                if rec < min_recall:
                    pilot_stop = "cap"  # hit the probe-count cap
                print(f"# pp.ivf pilot: recall@{k} = {rec:.3f} at "
                      f"nprobe={np_c}; searching", file=sys.stderr)
                break
            if len(history) >= 2:
                (np0, r0), (np1, r1) = history[-2], history[-1]
                if r1 - r0 < 0.005:
                    pilot_stop = "plateau"  # escalation buys nothing
                    break
                alpha = np.log(r1 / max(r0, 1e-9)) / np.log(np1 / np0)
                alpha = float(np.clip(alpha, 0.15, 1.0))
            else:
                alpha = 0.37
            jump = (min_recall / max(rec, 1e-9)) ** (1.0 / alpha)
            # growth clamp: 1.5x floor far from the target bounds pilot
            # rounds, but NEAR the target it overshoots the calibrated
            # nprobe by up to 50% — and the full search pays that
            # directly (measured: 730 vs ~590 needed, +24% search time).
            # Within 0.05 of the floor, allow fine 1.15x steps.
            min_jump = 1.15 if rec >= min_recall - 0.05 else 1.5
            np_c = int(min(np_max, max(np_c * min(max(jump, min_jump), 4.0),
                                       np_c + 1)))
            print(f"# pp.ivf pilot: recall@{k} = {rec:.3f} < {min_recall} "
                  f"at nprobe={history[-1][0]}; trying {np_c}",
                  file=sys.stderr)
        np_eff = np_c
        # post-search checks use the HELD-OUT half only
        truth = (q_orig[~cal_ix], true_idx[~cal_ix])
    else:
        pilot_stop = None
        truth = None

    prev_rec = -1.0
    while True:
        indices, dists = _search(np_eff)
        if min_recall is None:
            return indices, dists
        with _prof.phase("ivf_recall_check"):
            if truth is not None:
                # the pilot already paid for an exact-truth sample on
                # random slots' cells; the full search is checked
                # against its HELD-OUT half instead of buying a second
                # sample (the calibration half would be biased)
                rec = _recall_against(indices[truth[0]], truth[1], k)
            else:
                rec = measured_recall(x, indices, k, sample=recall_sample,
                                      seed=seed, exact=False)
        if rec >= min_recall:
            return indices, dists
        plateaued = (prev_rec >= 0 and (rec - prev_rec) < 0.005) or \
            pilot_stop == "plateau"  # pilot proved the floor unreachable
        if np_eff >= np_max or plateaued:
            import warnings

            reason = ("recall has plateaued (expander-regime data)"
                      if plateaued else
                      f"nprobe is at its probe-count cap ({np_max} of "
                      f"{c} clusters)")
            warnings.warn(
                f"pp.ivf: measured recall@{k} = {rec:.3f} < min_recall = "
                f"{min_recall} and {reason}. Use method='pallas' (exact) "
                "if this matters for your analysis.")
            return indices, dists
        new_np = int(min(2 * np_eff, np_max))
        print(f"# pp.ivf: measured recall@{k} = {rec:.3f} < {min_recall}; "
              f"escalating nprobe {np_eff} -> {new_np}",
              file=sys.stderr)
        prev_rec = rec
        np_eff = new_np
