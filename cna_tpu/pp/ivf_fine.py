"""Two-level IVF-flat kNN: fine-block probe ranking, device-resident.

Round-3 measurements (CLAUDE.md) showed IVF recall on atlas data is
limited by PROBE SELECTION, not scoring: ranking probe lists by the
query's own-cluster centroid needs ~19% candidate coverage for recall
0.9 at ~1000-row clusters, while true per-query ranking reaches 0.997
at 12.5% — and finer ranking granularity closes most of the gap (~7%
coverage at ~60-row clusters).  But naive fine clusters make SCORING
slow: per-grid-step fixed costs eat the Pallas kernel below 256-row
tiles.  This module decouples the two granularities:

* **candidates** live in fine g=128-row blocks (clusters of ~96 points,
  padded up to block multiples) — the probe-selection granularity;
* **queries** are scored one block (128 rows) at a time, each grid step
  scoring 16 candidate blocks (a 2048-wide tile).  The r4 kernel
  micro-bench (scripts/kernel_micro.py) showed the 128-row query tile
  is FASTER per candidate visit than 512-row tiles (~0.5e-10 vs
  ~0.55-1e-10 s/visit; lower VMEM pressure) — so the tightest
  tile-regular query group costs nothing;
* probe lists rank ALL fine blocks per query block by **own-centroid
  distance** — one (F, F) centroid matmul + top_k for the whole index,
  computed once per probe count and consumed directly by the scoring
  kernel's scalar prefetch.  (A measured selection-ceiling study chose
  this statistic: closest-approach/min-over-queries loses ~25% budget
  efficiency to outlier queries, per-query ranking would halve the
  budget again but cannot feed a tile-regular kernel.)  No host
  round-trip anywhere in the search.

Results stay on device in COMPACT LAYOUT coordinates (cells sorted by
kd-ordered fine cluster): the kernel emits compact neighbor ids via a
prefetched block-offset table, and ``finalize`` produces (indices,
dists) device arrays plus the ``order`` permutation.  Downstream graph
construction (``pp.neighbors``) consumes these directly; only the
~KB-scale pilot samples ever cross the tunnel (d2h here is ~8 MB/s with
a one-time ~60 s setup — round 3's search spent more time pulling its
(N, k) results than computing them).

Recall is MEASURED, not assumed: a pilot on a slot subsample calibrates
the probe count ``u`` against exact-kNN truth, with the truth sample
split into calibrate/verify halves so the final check is not biased by
the calibration's winner's curse (advisor r3 finding).

Replaces the role pynndescent/scanpy play upstream of the reference
(reference demo.ipynb cell 29; ``_nam.py:12-19`` reads the result).
"""

from __future__ import annotations

import dataclasses
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ivf_pallas import (CANDS_PER_STEP, score_blocks_pallas,
                              score_blocks_xla)

_DUMMY_CENTROID = 1e15  # squared distance ~1e30 stays finite in f32


def _round_up(v: int, m: int) -> int:
    return ((int(v) + m - 1) // m) * m


def _pow2_up(v: int) -> int:
    return 1 << max(int(v) - 1, 0).bit_length()


def _bucket16(v: int) -> int:
    """Quarter-octave shape bucket rounded to a CANDS_PER_STEP multiple:
    probe-count escalations with nearby u reuse the SAME compiled
    programs (each fresh shape costs a 20-60 s tunnel compile; see the
    round-2 cold-blowup note in ``pp.ivf``)."""
    step = max(_pow2_up(v) // 4, CANDS_PER_STEP)
    step = _round_up(step, CANDS_PER_STEP)
    return _round_up(v, step)


# ---------------------------------------------------------------------------
# k-means with a matmul update (no TPU scatter)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_clusters", "iters", "chunk"))
def _kmeans_fit_matmul(x, valid, init_idx, n_clusters, iters, chunk):
    """Lloyd's algorithm at fine cluster counts, TPU-shaped.

    ``jax.ops.segment_sum`` lowers to a TPU scatter (~0.9 s per 1e7
    elements; CLAUDE.md) which dominates Lloyd at c ~ 10k.  Here the
    update is a ONE-HOT MATMUL instead: per row chunk, d2 -> argmin ->
    bf16 one-hot (exact 0/1) -> ``oh.T @ x`` accumulated in f32 on the
    MXU.  ~2x the assignment FLOPs, zero scatters: measured-class cost
    ~tens of ms per iteration at 524k x 10k x 20.

    ``x``: (n_pad, d) rows, zero-padded; ``valid``: (n_pad,) row mask.
    """
    cent0 = x[init_idx]
    nch = x.shape[0] // chunk
    xr = x.reshape(nch, chunk, x.shape[1])
    vr = valid.reshape(nch, chunk)
    iot = jnp.arange(n_clusters, dtype=jnp.int32)[None, :]

    def step(cent, _):
        cn = jnp.sum(cent * cent, axis=1)[None, :]

        def chunk_upd(carry, inp):
            sums, cnts = carry
            xb, vb = inp
            d2 = cn - 2.0 * (xb @ cent.T)
            cid = jnp.argmin(d2, axis=1).astype(jnp.int32)
            oh = ((cid[:, None] == iot) & vb[:, None]).astype(jnp.bfloat16)
            sums = sums + jax.lax.dot_general(
                oh, xb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cnts = cnts + jnp.sum(oh.astype(jnp.float32), axis=0)
            return (sums, cnts), None

        (sums, cnts), _ = jax.lax.scan(
            chunk_upd,
            (jnp.zeros((n_clusters, x.shape[1]), jnp.float32),
             jnp.zeros((n_clusters,), jnp.float32)),
            (xr, vr))
        new = sums / jnp.maximum(cnts, 1.0)[:, None]
        return jnp.where(cnts[:, None] > 0, new, cent), None

    cent, _ = jax.lax.scan(step, cent0, None, length=iters)
    return cent


@partial(jax.jit, static_argnames=("chunk",))
def _assign_chunked(x, cent, chunk):
    """argmin-distance cluster of every row, in row chunks so the (B, C)
    distance tile stays bounded at fine cluster counts."""
    nch = x.shape[0] // chunk
    cn = jnp.sum(cent * cent, axis=1)[None, :]

    def one(xb):
        d2 = cn - 2.0 * (xb @ cent.T)
        return jnp.argmin(d2, axis=1).astype(jnp.int32)

    return jax.lax.map(one, x.reshape(nch, chunk, x.shape[1])).reshape(-1)


def _kd_order(pts: np.ndarray, leaf: int = 8) -> np.ndarray:
    """Spatial ordering of points by recursive widest-axis median
    bisection — consecutive entries are spatial neighbors, so packing
    consecutive fine blocks into a query slot keeps the slot tight (a
    loose slot inflates its closest-approach probe union)."""
    n = len(pts)
    out = np.empty(n, dtype=np.int64)
    pos = 0
    stack = [np.arange(n)]
    while stack:
        seg = stack.pop()
        if len(seg) <= leaf:
            out[pos:pos + len(seg)] = seg
            pos += len(seg)
            continue
        sub = pts[seg]
        ax = int(np.argmax(sub.var(axis=0)))
        half = len(seg) // 2
        part = np.argpartition(sub[:, ax], half)
        stack.append(seg[part[half:]])
        stack.append(seg[part[:half]])
    return out


# ---------------------------------------------------------------------------
# index build
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FineIndex:
    """Device fine-block layout + host bookkeeping.

    Compact coordinates: cells sorted by (kd-ordered fine cluster,
    within-cluster position); ``order[r]`` is the ORIGINAL id of compact
    row r; ``layout_rows[r]`` its row in the padded (F_pad*g) layout.
    """

    x4: jnp.ndarray            # (F_pad, g, d_pad) f32
    cents: jnp.ndarray         # (F_pad, d_pad) block centroids
    blk_counts: np.ndarray     # (F_pad,) live rows per block
    blk_counts_dev: jnp.ndarray
    blk_csum_dev: jnp.ndarray  # (F_pad,) exclusive cumsum = compact offsets
    layout_rows: np.ndarray    # (N,) layout row of compact row r
    order: np.ndarray          # (N,) original id of compact row r
    g: int
    q_blocks: int
    n: int
    d_pad: int
    f_real: int                # real (non-dummy) blocks

    @property
    def f_pad(self) -> int:
        return int(self.x4.shape[0])

    @property
    def n_slots(self) -> int:
        return self.f_pad // self.q_blocks

    def slot_compact_range(self, s: int) -> tuple:
        """Compact row range [lo, hi) covered by slot ``s``."""
        b0 = s * self.q_blocks
        lo = int(self._csum_host[b0])
        hi = lo + int(self.blk_counts[b0:b0 + self.q_blocks].sum())
        return lo, hi

    _csum_host: np.ndarray = None


@partial(jax.jit, static_argnames=("s1", "m", "d_pad"))
def _build_x4(x_dev, gather_idx, s1, m, d_pad):
    """Block layout built ON device: one row-gather of the already-
    resident points (h2d ships only the 4-byte/row index vector),
    zero-padded to the Mosaic lane width."""
    g = x_dev[gather_idx]
    g = jnp.pad(g, ((0, 0), (0, d_pad - g.shape[1])))
    return g.reshape(s1, m, d_pad).astype(jnp.float32)


@jax.jit
def _block_centroids(x4, counts_dev):
    """Masked per-block centroid; count-0 (dummy) blocks are pushed to
    ``_DUMMY_CENTROID`` so ranking places them last."""
    g = x4.shape[1]
    live = (jnp.arange(g, dtype=jnp.int32)[None, :]
            < counts_dev[:, None])  # (F, g)
    s = jnp.sum(x4 * live[:, :, None], axis=1)
    c = s / jnp.maximum(counts_dev, 1)[:, None].astype(x4.dtype)
    return jnp.where((counts_dev > 0)[:, None], c,
                     jnp.asarray(_DUMMY_CENTROID, x4.dtype))


def build_fine_index(x_dev, n, d, seed=0, g=128, q_blocks=1,
                     target_rows=96, n_clusters=None,
                     kmeans_sample=524_288, kmeans_iters=8,
                     profiler=None) -> FineIndex:
    """Fit fine k-means, lay the points out in kd-ordered g-row blocks."""
    from ..utils.profiling import global_profiler

    prof = profiler or global_profiler()
    if n_clusters is None:
        n_clusters = int(np.clip(n // target_rows, 4, 65536))
    c = int(min(n_clusters, max(n // 4, 1)))
    rng = np.random.RandomState(seed)

    with prof.phase("ivf_kmeans", cells=n):
        n_fit = min(n, kmeans_sample)
        sub = (np.sort(rng.choice(n, n_fit, replace=False))
               if n_fit < n else None)
        fit_x = x_dev[jnp.asarray(sub)] if sub is not None else x_dev
        # chunk so the (chunk, C) f32 distance tile stays ~<=1.4 GB
        chunk = int(np.clip(_pow2_up(int(3.5e8 // max(c, 1)) + 1) // 2,
                            256, 32_768))
        n_pad = _round_up(n_fit, chunk)
        if n_pad > n_fit:
            fit_x = jnp.pad(fit_x, ((0, n_pad - n_fit), (0, 0)))
        valid = jnp.arange(n_pad, dtype=jnp.int32) < n_fit
        init_idx = jnp.asarray(
            rng.choice(n_fit, c, replace=False).astype(np.int32))
        cent = _kmeans_fit_matmul(fit_x, valid, init_idx, c, kmeans_iters,
                                  chunk)
        n_pad_all = _round_up(n, chunk)
        x_for_assign = (jnp.pad(x_dev, ((0, n_pad_all - n), (0, 0)))
                        if n_pad_all > n else x_dev)
        cid = np.asarray(_assign_chunked(x_for_assign, cent, chunk))[:n]
        cent_host = np.asarray(cent)

    with prof.phase("ivf_layout", cells=n):
        # kd-order clusters so consecutive blocks (and the slots that
        # group them) are spatial neighbors
        kd_perm = _kd_order(cent_host)             # rank -> cluster
        rank_of = np.empty(c, dtype=np.int64)
        rank_of[kd_perm] = np.arange(c)
        order = np.argsort(rank_of[cid], kind="stable").astype(np.int32)

        sizes_r = np.bincount(rank_of[cid], minlength=c)  # by rank
        nblk = -(-sizes_r // g)                    # 0 for empty clusters
        f_real = int(nblk.sum())
        # quarter-octave bucket: F_pad (hence x4/cents/probe shapes and
        # every downstream compiled program) is IDENTICAL across nearby
        # dataset sizes and k-means seeds — without this, each dataset
        # recompiled the whole search (~30-60 s/shape via the tunnel;
        # the 1M r4 probe spent 100+ s of its "warm" run recompiling)
        f_pad = _bucket16(f_real + 1)
        blk0 = np.concatenate([[0], np.cumsum(nblk)[:-1]])

        # per sorted row: block + intra position
        starts = np.concatenate([[0], np.cumsum(sizes_r)[:-1]])
        p = np.arange(n, dtype=np.int64)
        row_rank = rank_of[cid[order]]             # nondecreasing
        within_cluster = p - starts[row_rank]
        blk = blk0[row_rank] + within_cluster // g
        intra = within_cluster % g
        layout_rows = (blk * g + intra).astype(np.int32)

        blk_cluster = np.repeat(np.arange(c), nblk)        # (f_real,)
        within_blk = np.arange(f_real) - blk0[blk_cluster]
        blk_counts = np.zeros(f_pad, np.int32)
        blk_counts[:f_real] = np.clip(
            sizes_r[blk_cluster] - within_blk * g, 0, g)
        blk_csum = np.zeros(f_pad, np.int64)
        np.cumsum(blk_counts[:-1], out=blk_csum[1:])

        gather_idx = np.zeros(f_pad * g, np.int32)
        gather_idx[layout_rows] = order
        d_pad = max(128, _round_up(d, 128))
        x4 = _build_x4(x_dev, jnp.asarray(gather_idx), f_pad, g, d_pad)
        blk_counts_dev = jnp.asarray(blk_counts)
        cents = _block_centroids(x4, blk_counts_dev)

    return FineIndex(
        x4=x4, cents=cents, blk_counts=blk_counts,
        blk_counts_dev=blk_counts_dev,
        blk_csum_dev=jnp.asarray(blk_csum.astype(np.int32)),
        layout_rows=layout_rows, order=order, g=g, q_blocks=q_blocks,
        n=n, d_pad=d_pad, f_real=f_real, _csum_host=blk_csum)


# ---------------------------------------------------------------------------
# probe ranking (on device)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("u",))
def _rank_blocks_centroid(cents, u):
    """(F_pad, u) probe table: every block's u nearest blocks by
    CENTROID distance, one (F, F) matmul + top_k for the whole index.

    Ranking-statistic choice is measured, not guessed (20k archetype
    data, selection-ceiling study, r4): per-block own-centroid ranking
    covers true-neighbor blocks at ~25% less candidate budget than
    closest-approach over a 512-row slot (min-over-queries is dragged by
    outlier queries; a 4-block slot dilutes the list 1.07x further), and
    the kernel micro-bench showed 128-row query tiles are FASTER per
    candidate visit than 512-row tiles (VMEM pressure) — so the tight
    group costs nothing and the ranking needs no per-query matmul at
    all.  Each block's own id ranks first (distance 0), guaranteeing
    self-coverage.  Dummy blocks sit at ``_DUMMY_CENTROID`` so their
    squared distance overflows to +inf and they rank last."""
    cn = jnp.sum(cents * cents, axis=1)
    d2 = cn[:, None] - 2.0 * (cents @ cents.T) + cn[None, :]
    # approx_max_k, not lax.top_k: the full-width sort of the (F, F)
    # table cost ~10 s at F=8192 on the v5e (top-k ops are the TPU trap,
    # CLAUDE.md); PartialReduce is ~free and probe LIST MEMBERSHIP is
    # what matters — a ~2% membership perturbation at the far tail is
    # inside the pilot's measured-recall calibration loop anyway.  The
    # own block (distance 0, the max) always survives the reduction.
    if u <= d2.shape[1] // 4:
        _, probe = jax.lax.approx_max_k(-d2, u, recall_target=0.97)
    else:
        _, probe = jax.lax.top_k(-d2, u)
    return probe.astype(jnp.int32)


# ---------------------------------------------------------------------------
# search
# ---------------------------------------------------------------------------


def _index_replicas(index: FineIndex, devices):
    """Per-device copies of the scoring operands (x4/counts/csum), built
    once and cached on the index.  Slot scoring has no cross-slot
    communication, so multi-device search is pure data parallelism over
    batches — each device scores its share against a full replica
    (536 MB at 1M cells: comfortably resident per chip)."""
    cache = getattr(index, "_replicas", None)
    key = tuple(id(d) for d in devices)
    if cache is not None and cache[0] == key:
        return cache[1]
    reps = {
        d: (jax.device_put(index.x4, d),
            jax.device_put(index.blk_counts_dev, d),
            jax.device_put(index.blk_csum_dev, d))
        for d in devices
    }
    object.__setattr__(index, "_replicas", (key, reps))
    return reps


def _score_slots(index: FineIndex, u: int, slot_ids: np.ndarray, k: int,
                 interpret: bool, probe_cache: dict, devices=None,
                 scorer: str = "pallas"):
    """Score a set of query slots at probe count ``u``; returns a list
    of ((negd, idx) device handles, real slot count) batches.

    The (F_pad, u) probe table is computed once per ``u`` on device
    (``probe_cache`` spans pilot rounds and the full search) and sliced
    per batch.  Macro-batched: one moderate program dispatched
    repeatedly beats one giant program over every slot — a single
    multi-minute dispatch is exactly what the tunneled runtime kills
    (measured; CLAUDE.md), and batches pipeline against each other.
    Batch size is capped so the scalar-prefetched (batch, u) probe
    matrix stays well inside the ~1 MB SMEM budget (no lower clamp:
    advisor r3 flagged that a floor can blow the budget at large u).
    """
    sel = np.asarray(slot_ids, np.int64)
    ns_real = len(sel)
    batch = max(1, min(512, int(480_000 // (4 * max(u, 1)))))
    batch = max(_pow2_up(batch + 1) // 2, 1)
    batch = min(batch, _pow2_up(ns_real))  # don't pad tiny selections up
    if u not in probe_cache:
        table = _rank_blocks_centroid(index.cents, u)
        if index.q_blocks > 1:
            # probe list of a multi-block slot: its first block's table
            # row (blocks in a slot are kd-adjacent, lists nearly equal)
            table = table[::index.q_blocks][: index.n_slots]
        probe_cache[u] = table
    table = probe_cache[u]
    reps = _index_replicas(index, devices) if devices else None
    out = []
    pad_slot = index.n_slots - 1
    for bi, lo in enumerate(range(0, ns_real, batch)):
        hi = min(lo + batch, ns_real)
        sel_b = np.full(batch, pad_slot, np.int64)
        sel_b[: hi - lo] = sel[lo:hi]
        sel_dev = jnp.asarray(sel_b.astype(np.int32))
        probe_b = table[sel_dev]
        if devices:
            # round-robin data parallelism: batch bi runs on device
            # bi % D; computation follows operand placement (no
            # collectives — slot scoring is embarrassingly parallel)
            dev = devices[bi % len(devices)]
            x4_d, cnt_d, csum_d = reps[dev]
            sel_dev = jax.device_put(sel_dev, dev)
            probe_b = jax.device_put(probe_b, dev)
        else:
            x4_d, cnt_d, csum_d = (index.x4, index.blk_counts_dev,
                                   index.blk_csum_dev)
        if scorer == "xla":
            negd, idx = score_blocks_xla(
                x4_d, sel_dev, probe_b, cnt_d, csum_d, k, g=index.g,
                q_blocks=index.q_blocks)
        else:
            negd, idx = score_blocks_pallas(
                x4_d, sel_dev, probe_b, cnt_d, csum_d, k, g=index.g,
                q_blocks=index.q_blocks, interpret=interpret)
        if devices:
            negd = jax.device_put(negd, devices[0])
            idx = jax.device_put(idx, devices[0])
        out.append((negd, idx, hi - lo))
    return out


@partial(jax.jit, static_argnames=("n",))
def _finalize(negd_flat, idx_flat, layout_rows, n):
    """Compact-row extraction + the self-neighbor contract, on device.

    Row-gathers the N live layout rows (no scalar gathers: neighbor ids
    are already compact, emitted by the kernel), then enforces "self
    first at distance 0" with full-width selects — the results are
    already distance-sorted (descending neg-d2), and the self entry is
    at distance ~0, so swapping it into column 0 exchanges equal keys
    and preserves sortedness.
    """
    negd = negd_flat[layout_rows]
    idx = idx_flat[layout_rows]
    d = jnp.sqrt(jnp.maximum(-negd, 0.0))
    rr = jnp.arange(n, dtype=jnp.int32)[:, None]
    col = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
    selfcol = idx == rr
    has_self = jnp.any(selfcol, axis=1, keepdims=True)
    fi = jnp.sum(jnp.where(selfcol, col, 0), axis=1, keepdims=True)
    idx0 = idx[:, :1]
    d0 = d[:, :1]
    swap = (col == fi) & has_self & (fi > 0)
    out_i = jnp.where(col == 0, rr, jnp.where(swap, idx0, idx))
    out_d = jnp.where(col == 0, 0.0, jnp.where(swap, d0, d))
    return out_i.astype(jnp.int32), out_d


def _pull_sample_rows(batches, sel_slots: np.ndarray, index: FineIndex,
                      q_compact: np.ndarray, k: int):
    """Neighbor ids (host, compact coords) for the sampled compact rows,
    pulled from per-batch device outputs — KB-scale d2h only.

    ``sel_slots`` is the (sorted) slot-id list the batches were launched
    over; every sampled row must belong to one of those slots."""
    lr = index.layout_rows[q_compact]
    mq = index.q_blocks * index.g
    slot_of = lr // mq
    within = lr % mq
    pos_of = np.searchsorted(sel_slots, slot_of)  # position in launch order
    got = np.empty((len(q_compact), k), np.int64)
    starts = np.cumsum([0] + [cnt for _, _, cnt in batches])
    # gather row-sets are padded to power-of-two buckets: a
    # data-dependent shape here compiled a FRESH tiny program per batch
    # per run (~1.5 s each through the tunnel's remote AOT — measured
    # 11.7 s of a 26 s warm 1M build before this)
    for bi, (_, idx_dev, cnt) in enumerate(batches):
        in_b = (pos_of >= starts[bi]) & (pos_of < starts[bi] + cnt)
        if not in_b.any():
            continue
        qi = np.flatnonzero(in_b)
        rows = (pos_of[qi] - starts[bi]) * mq + within[qi]
        rows_pad = np.zeros(_pow2_up(max(len(rows), 16)), np.int64)
        rows_pad[: len(rows)] = rows
        pulled = np.asarray(idx_dev.reshape(-1, k)[jnp.asarray(rows_pad)])
        got[qi] = pulled[: len(rows)]
    return got


def _recall_against(rows, truth, k):
    hits = 0
    for row, t in zip(rows, truth):
        hits += len(np.intersect1d(row, t, assume_unique=False))
    return hits / max(len(truth) * k, 1)


@dataclasses.dataclass
class FineSearchResult:
    """Device-resident kNN in compact coordinates + the permutation."""

    indices: jnp.ndarray   # (N, k) int32, compact coords
    dists: jnp.ndarray     # (N, k) f32 ascending, self first
    order: np.ndarray      # (N,) original id of compact row r
    index: FineIndex
    u: int                 # final probe count (fine blocks)
    recall: float          # held-out verify-sample recall (-1 if unmeasured)
    history: tuple = ()    # pilot (u, calibration-recall) points


def ivf_knn_fine(points, k, seed=0, min_recall=0.9, recall_sample=512,
                 g=128, q_blocks=1, n_clusters=None, target_rows=96,
                 kmeans_sample=524_288, kmeans_iters=8, u0=None,
                 interpret=None, devices=None,
                 profiler=None) -> FineSearchResult:
    """Two-level IVF self-kNN; returns device results (module docstring).

    ``u0`` seeds the probe count (fine blocks); the pilot calibrates it
    against a measured exact-truth sample whose held-out half also
    verifies the full search (``min_recall=None`` disables both).
    """
    from ..utils.profiling import global_profiler

    prof = profiler or global_profiler()
    # device inputs stay on device (an (N, d) d2h pull at 1M costs ~10 s
    # through the tunnel); hosts arrays ship once as f32
    x_dev = jnp.asarray(points, dtype=jnp.float32)
    n, d = x_dev.shape
    # scorer resolution: the Mosaic kernel on TPU, its plain-XLA twin
    # elsewhere (same index / probe tables / pilot; scoring only).
    # ``interpret=True`` forces the Pallas kernel through the
    # interpreter — the kernel-verification path, not a fast CPU mode.
    if interpret:
        scorer = "pallas"
    elif jax.devices()[0].platform == "tpu":
        scorer, interpret = "pallas", False
    else:
        scorer, interpret = "xla", False
    index = build_fine_index(
        x_dev, n, d, seed=seed, g=g, q_blocks=q_blocks,
        n_clusters=n_clusters, target_rows=target_rows,
        kmeans_sample=kmeans_sample, kmeans_iters=kmeans_iters,
        profiler=prof)
    f = index.f_real
    s = index.n_slots
    probe_cache = {}  # u -> (F_pad, u) device probe table
    u_max = min(_bucket16(f), index.f_pad - index.f_pad % CANDS_PER_STEP)
    u_max = max(u_max, CANDS_PER_STEP)
    if u0 is None:
        u0 = int(0.08 * f)  # measured 1M starting point (recall ~0.8)
    u = int(np.clip(_bucket16(max(u0, CANDS_PER_STEP)), CANDS_PER_STEP,
                    u_max))

    # ---- pilot: calibrate u on a slot subsample; truth split in half so
    # verification is independent of calibration (advisor r3) ----
    truth_cal = truth_ver = None
    pilot_stop = None
    history = []
    if min_recall is not None and s >= 96:
        from .ivf import exact_knn_sample

        rng_p = np.random.RandomState(seed + 17)
        n_pilot = min(s, max(24, s // 16))
        ps_ids = np.sort(rng_p.choice(s, n_pilot, replace=False))
        ranges = [index.slot_compact_range(int(si)) for si in ps_ids]
        pilot_cells = np.concatenate(
            [np.arange(lo, hi) for lo, hi in ranges if hi > lo])
        n_q = min(recall_sample, len(pilot_cells))
        q_compact = rng_p.choice(pilot_cells, n_q, replace=False)
        with prof.phase("ivf_exact_truth"):
            true_idx = exact_knn_sample(x_dev, index.order[q_compact], k,
                                        exact=False)
        half = n_q // 2
        cal_q, ver_q = q_compact[:half], q_compact[half:]
        truth_cal, truth_ver = true_idx[:half], true_idx[half:]

        while True:
            with prof.phase(f"ivf_pilot(u={u})"):
                with prof.phase(f"ivf_pilot_score(u={u})"):
                    batches = _score_slots(index, u, ps_ids, k,
                                           interpret, probe_cache,
                                           devices=devices, scorer=scorer)
                with prof.phase(f"ivf_pilot_pull(u={u})"):
                    got_c = _pull_sample_rows(batches, ps_ids, index,
                                              cal_q, k)
            rec = _recall_against(index.order[got_c], truth_cal, k)
            history.append((u, rec))
            if rec >= min_recall or u >= u_max:
                if rec < min_recall:
                    pilot_stop = "cap"
                print(f"# pp.ivf pilot: recall@{k} = {rec:.3f} at "
                      f"u={u} fine blocks ({u * g / n:.1%} coverage); "
                      "searching", file=sys.stderr)
                break
            if len(history) >= 2:
                (u0_, r0), (u1_, r1) = history[-2], history[-1]
                if r1 - r0 < 0.005:
                    pilot_stop = "plateau"
                    break
                alpha = np.log(r1 / max(r0, 1e-9)) / np.log(u1_ / u0_)
                alpha = float(np.clip(alpha, 0.15, 1.0))
            else:
                alpha = 0.37
            jump = (min_recall / max(rec, 1e-9)) ** (1.0 / alpha)
            min_jump = 1.15 if rec >= min_recall - 0.05 else 1.5
            new_u = int(min(u_max,
                            max(u * min(max(jump, min_jump), 4.0), u + 1)))
            new_u = min(_bucket16(new_u), u_max)
            print(f"# pp.ivf pilot: recall@{k} = {rec:.3f} < {min_recall}"
                  f" at u={u}; trying {new_u}", file=sys.stderr)
            u = new_u

    # ---- full search, verified on the held-out half ----
    prev_rec = -1.0
    final_rec = -1.0
    while True:
        with prof.phase(f"ivf_search(u={u})", cells=n):
            batches = _score_slots(index, u, np.arange(s), k, interpret,
                                   probe_cache, devices=devices,
                                   scorer=scorer)
            negd_flat = jnp.concatenate(
                [negd[:cnt] for negd, _, cnt in batches]).reshape(-1, k)
            idx_flat = jnp.concatenate(
                [idx[:cnt] for _, idx, cnt in batches]).reshape(-1, k)
            indices_dev, dists_dev = _finalize(
                negd_flat, idx_flat, jnp.asarray(index.layout_rows), n)
        if min_recall is None:
            return FineSearchResult(indices_dev, dists_dev, index.order,
                                    index, u, -1.0, tuple(history))
        with prof.phase("ivf_recall_check"):
            if truth_ver is not None and len(truth_ver):
                got = np.asarray(indices_dev[jnp.asarray(ver_q)])
                rec = _recall_against(index.order[got], truth_ver, k)
            else:
                from .ivf import measured_recall

                # small index (no pilot): materialize to host and
                # measure on a fresh sample
                idx_host = np.empty((n, k), np.int32)
                idx_host[index.order] = index.order[
                    np.asarray(indices_dev)]
                rec = measured_recall(x_dev, idx_host, k,
                                      sample=recall_sample, seed=seed,
                                      exact=False)
        final_rec = rec
        if rec >= min_recall:
            return FineSearchResult(indices_dev, dists_dev, index.order,
                                    index, u, final_rec, tuple(history))
        plateaued = (prev_rec >= 0 and (rec - prev_rec) < 0.005) or \
            pilot_stop == "plateau"
        if u >= u_max or plateaued:
            import warnings

            reason = ("recall has plateaued (expander-regime data)"
                      if plateaued else
                      f"the probe count is at its cap ({u} of {f} fine "
                      "blocks)")
            warnings.warn(
                f"pp.ivf: measured recall@{k} = {rec:.3f} < min_recall = "
                f"{min_recall} and {reason}. Use method='pallas' (exact) "
                "if this matters for your analysis.")
            return FineSearchResult(indices_dev, dists_dev, index.order,
                                    index, u, final_rec, tuple(history))
        new_u = min(_bucket16(int(min(2 * u, u_max))), u_max)
        print(f"# pp.ivf: measured recall@{k} = {rec:.3f} < {min_recall}; "
              f"escalating u {u} -> {new_u}", file=sys.stderr)
        prev_rec = rec
        u = new_u
