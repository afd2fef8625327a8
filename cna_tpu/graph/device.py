"""Device-resident symmetric fuzzy graph with a lazy scipy-CSR face.

Round 3 built the UMAP fuzzy union on device but still pulled the
(N, k) weights to the host, assembled a scipy CSR, and re-packed it to a
device ELL inside ``tl.association`` — 12-18 s at 1M cells, almost all
of it tunnel d2h (~8 MB/s) plus host assembly (SURVEY §7; VERDICT r3).
This module keeps the graph ON DEVICE end to end:

* ``build_sym_ell`` turns the fuzzy-union edge codes
  (``pp.neighbors.fuzzy_union_device``) into a hybrid ELL + COO-overflow
  ``EllGraph`` without leaving the device.  The directed (N, k) kNN
  layout IS the ELL body for edges each row emits itself; the MIRROR
  edges (partner rows that must carry an edge their own kNN list lacks,
  ~20-40% of directed edges on UMAP-union graphs) are grouped by target
  row with one ``lax.sort`` and scattered once into extra ELL columns —
  a one-time O(nnz) sort instead of a per-diffusion-step scatter, with
  the rare hub overrun spilling to the COO tail.
* ``DeviceConnectivities`` is what ``pp.neighbors`` stores in
  ``obsp['connectivities']``: ``tl`` consumers take the packed
  ``EllGraph`` + cell ``Reordering`` directly (zero host work), while
  anything expecting the AnnData convention (a scipy matrix in obsp —
  reference ``_nam.py:12-19``) transparently materializes a CSR in the
  ORIGINAL cell order on first access.

Coordinates: the EllGraph lives in the IVF search's compact layout
order (``Reordering.perm[compact] = original``); materialization
de-permutes.  See ``pp.ivf_fine`` for why that order exists.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .ell import EllGraph
from .reorder import Reordering


def _round_up(v: int, m: int) -> int:
    return ((int(v) + m - 1) // m) * m


def _bucket_up(v: int) -> int:
    step = max((1 << max(int(v) - 1, 0).bit_length()) // 4, 8)
    return _round_up(max(v, 1), step)


@jax.jit
def _mirror_sort(idx, w_sym, code):
    """Group mirror edges by TARGET row with one multi-operand sort.

    Mirror edge for (i -> j = idx[i, s]): row j must carry (j, i) with
    the symmetric weight, but j's own kNN list lacks i.  Non-mirror
    entries get the sentinel key n and sort to the tail.  ``lax.sort``
    carries (src, weight) as payloads — no post-sort gathers.
    """
    n, k = idx.shape
    code = code.astype(jnp.int32)
    mir = (code & 2) > 0
    tgt = jnp.where(mir, idx, jnp.int32(n)).ravel()
    src = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, k)).ravel()
    wv = jnp.where(mir, w_sym, 0.0).ravel()
    tgt_s, src_s, w_s = jax.lax.sort((tgt, src, wv), num_keys=1)
    direct_w = jnp.where((code & 1) > 0, w_sym, 0.0)
    return (tgt_s, src_s, w_s, jnp.sum(mir.astype(jnp.int32)), direct_w,
            jnp.sum(direct_w, axis=1))


_KX_CANDS = (8, 16, 32, 64, 128)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SortedExtGraph:
    """Symmetric fuzzy graph as [uniform direct ELL] + [in-degree-
    bucketed mirror columns], fully device-built.

    The directed kNN part has bounded width k (fill ~85-90%), but the
    MIRROR in-degree is heavily hub-skewed (q98 ~ 64 at 1M cells vs
    mean ~4-5): one global mirror width either explodes gather traffic
    (width-79 plain ELL ~ 4x the bucketed fetches) or the padded gather
    buffer itself (the r4 northstar OOM'd on an (N, 79, 200) gather).
    Mirror entries are LEFT-PACKED per row by construction, so rows can
    be degree-sorted and sliced into per-width buckets with no row
    compaction; per step the bucket outputs concatenate in sorted order
    and one (N, S) row gather restores compact order.

      direct_indices/weights: (N, k) — neighbor ids in COMPACT space.
      ext_indices/weights: per-bucket (N_b, K_b), rows ascending by
        mirror in-degree (ids in compact space).
      inv_pi: (N,) — y_ext_compact = y_ext_sorted[inv_pi].
      overflow_*: tiny COO spill for rows beyond the widest bucket.
      colsums_raw: (N,) compact order.
    """

    direct_indices: jnp.ndarray
    direct_weights: jnp.ndarray
    ext_indices: tuple
    ext_weights: tuple
    inv_pi: jnp.ndarray
    overflow_rows: jnp.ndarray
    overflow_cols: jnp.ndarray
    overflow_weights: jnp.ndarray
    colsums_raw: jnp.ndarray

    @property
    def n_cells(self) -> int:
        return self.direct_indices.shape[0]

    @property
    def n_rows(self) -> int:
        return self.colsums_raw.shape[0]

    @property
    def max_degree(self) -> int:
        return self.direct_indices.shape[1] + max(
            (int(i.shape[1]) for i in self.ext_indices), default=0)

    @property
    def n_overflow(self) -> int:
        return self.overflow_rows.shape[0]

    @property
    def dtype(self):
        return self.direct_weights.dtype

    def colsums(self, self_weight: float = 1.0):
        return self.colsums_raw + self_weight

    def padded_area(self) -> int:
        return (int(np.prod(self.direct_indices.shape))
                + sum(int(np.prod(i.shape)) for i in self.ext_indices))


@jax.jit
def _runpos_and_spill(tgt_s, n):
    """Per-entry position within its target-row run (sorted input), and
    the spill count for each candidate mirror-column width."""
    mlen = tgt_s.shape[0]
    ar = jnp.arange(mlen, dtype=jnp.int32)
    change = jnp.concatenate(
        [jnp.ones((1,), bool), tgt_s[1:] != tgt_s[:-1]])
    run_start = jax.lax.cummax(jnp.where(change, ar, 0))
    pos = ar - run_start
    ok = tgt_s < n
    cands = jnp.asarray(_KX_CANDS, jnp.int32)
    spills = jnp.sum((pos[None, :] >= cands[:, None]) & ok[None, :], axis=1)
    return pos, spills


@partial(jax.jit, static_argnames=("n", "kx"))
def _scatter_ext(tgt_s, src_s, w_s, pos, n, kx):
    """One-time scatter of the grouped mirror edges into (n, kx) extra
    ELL columns; masked entries land on a trash row that is sliced off."""
    ok = (tgt_s < n) & (pos < kx)
    row = jnp.where(ok, tgt_s, n)
    col = jnp.where(ok, pos, 0)
    ext_i = jnp.zeros((n + 1, kx), jnp.int32).at[row, col].set(src_s)
    ext_w = jnp.zeros((n + 1, kx), w_s.dtype).at[row, col].set(
        jnp.where(ok, w_s, 0.0))
    return ext_i[:n], ext_w[:n], jnp.sum(ext_w[:n], axis=1)


@partial(jax.jit, static_argnames=("n", "kx"))
def _spill_sort(tgt_s, src_s, w_s, pos, n, kx):
    """Compact the (rare) hub overrun — mirror edges beyond ``kx`` per
    row — to a COO prefix with a second keyed sort."""
    sp_m = (tgt_s < n) & (pos >= kx)
    key = jnp.where(sp_m, tgt_s, jnp.int32(n))
    return jax.lax.sort(
        (key, src_s, jnp.where(sp_m, w_s, 0.0)), num_keys=1)


@partial(jax.jit, static_argnames=("n",))
def _spill_colsums(rows, weights, n):
    return jnp.zeros((n,), weights.dtype).at[rows].add(weights)


def build_sym_ell(idx_dev, w_sym, code, dtype=None,
                  max_spill_frac=0.02, ell_max_kx=16):
    """Symmetric fuzzy-union graph, built on device.

    idx_dev: (N, k) int32 kNN lists (self first) — row coordinates and
        neighbor values in the SAME coordinate system.
    w_sym / code: the aligned symmetric weights and emission codes from
        ``fuzzy_union_device`` (bit 0: row owns the entry; bit 1: row
        must also mirror it to the partner).

    Returns an ``EllGraph`` (direct + mirror columns concatenated) when
    a narrow mirror width (<= ``ell_max_kx``, spill <= ``max_spill_frac``
    of mirror edges) suffices, else a ``SortedExtGraph`` whose mirror
    columns are in-degree-bucketed (hub-skewed graphs: one global width
    either multiplies gather traffic ~4x or OOMs the gather buffer —
    see the class docstring).
    """
    n, k = idx_dev.shape
    tgt_s, src_s, w_s, m_dev, direct_w, direct_sums = _mirror_sort(
        idx_dev, w_sym, code)
    m = int(m_dev)  # scalar pull
    if dtype is None:
        from ..config import default_float

        dtype = default_float()
    if m == 0:
        return EllGraph(
            indices=idx_dev,
            weights=direct_w.astype(dtype),
            overflow_rows=jnp.zeros((0,), jnp.int32),
            overflow_cols=jnp.zeros((0,), jnp.int32),
            overflow_weights=jnp.zeros((0,), dtype),
            colsums_raw=direct_sums.astype(dtype))

    m_pad = min(_bucket_up(m), n * k)
    tgt_s, src_s, w_s = tgt_s[:m_pad], src_s[:m_pad], w_s[:m_pad]
    pos, spills_dev = _runpos_and_spill(tgt_s, n)
    spills = np.asarray(spills_dev)
    kx = _KX_CANDS[-1]
    spill = int(spills[-1])
    for cand, sp_count in zip(_KX_CANDS, spills):
        if sp_count <= max_spill_frac * m:
            kx = cand
            spill = int(sp_count)
            break
    ell_shaped = kx <= ell_max_kx
    if not ell_shaped:
        # bucketed path: wide columns are near-free, so push the spill
        # (a per-diffusion-step scatter) to ~zero instead
        for cand, sp_count in zip(_KX_CANDS, spills):
            if sp_count <= max(1024, 1e-4 * m):
                kx = cand
                spill = int(sp_count)
                break

    ext_i, ext_w, ext_sums = _scatter_ext(tgt_s, src_s, w_s, pos, n, kx)
    colsums = (direct_sums + ext_sums).astype(dtype)

    if spill:
        key_sp, src_sp, w_sp = _spill_sort(tgt_s, src_s, w_s, pos, n, kx)
        spad = min(_bucket_up(spill), m_pad)
        rows = jnp.where(key_sp[:spad] < n, key_sp[:spad], 0)
        wts = jnp.where(key_sp[:spad] < n, w_sp[:spad], 0.0).astype(dtype)
        colsums = colsums + _spill_colsums(rows, wts, n)
        overflow = (rows, src_sp[:spad], wts)
    else:
        overflow = (jnp.zeros((0,), jnp.int32), jnp.zeros((0,), jnp.int32),
                    jnp.zeros((0,), dtype))

    if ell_shaped:
        return EllGraph(
            indices=jnp.concatenate([idx_dev, ext_i], axis=1),
            weights=jnp.concatenate([direct_w, ext_w],
                                    axis=1).astype(dtype),
            overflow_rows=overflow[0], overflow_cols=overflow[1],
            overflow_weights=overflow[2], colsums_raw=colsums)

    # --- in-degree-bucketed mirror columns ---
    from .buckets import plan_buckets

    indeg = np.asarray(jnp.sum((ext_w > 0).astype(jnp.int32), axis=1))
    pi = np.argsort(indeg, kind="stable").astype(np.int32)
    plan = plan_buckets(indeg[pi], max_buckets=4, pad_to=8)
    pi_dev = jnp.asarray(pi)
    ext_i_s = ext_i[pi_dev]
    ext_w_s = ext_w[pi_dev].astype(dtype)
    # SHAPE-STABLE bucket slices: the raw (start, end, width) plan is
    # data-dependent, and every distinct slice shape compiles a fresh
    # program for the slice AND for each downstream per-bucket SpMM —
    # measured ~0.5 s per slice compile plus multi-second diffusion
    # recompiles through the tunnel on EVERY new dataset (the r4 bench's
    # "warm" graph/assoc regressions).  Row counts round up to the
    # quarter-octave bucket (slices anchored so the padded range still
    # covers the bucket's rows — overlap rows are computed twice and the
    # inv_pi gather picks the canonical copy) and widths round up to the
    # _KX_CANDS grid (extra columns are zero-weight for these rows).
    buckets_i, buckets_w = [], []
    concat_pos = np.empty(n, np.int64)
    cum = 0
    for start, end, width in plan:
        width = min(int(width), kx)
        if width:
            # quarter-octave width grid (8,16,24,32,40,48,...,128):
            # shape-stable like _KX_CANDS but bounds the padded-width
            # overhead at 25% (the pow2-ish cands grid rounded 33->64,
            # nearly doubling that bucket's per-step gather area)
            width = min(_bucket_up(width), kx)
        nb_pad = min(_bucket_up(end - start), n)
        start_eff = max(0, min(start, n - nb_pad))
        buckets_i.append(
            ext_i_s[start_eff:start_eff + nb_pad, :width])
        buckets_w.append(
            ext_w_s[start_eff:start_eff + nb_pad, :width])
        concat_pos[start:end] = cum + (np.arange(start, end) - start_eff)
        cum += nb_pad
    inv_pi = np.empty(n, np.int64)
    inv_pi[pi] = concat_pos
    inv_pi = inv_pi.astype(np.int32)
    return SortedExtGraph(
        direct_indices=idx_dev, direct_weights=direct_w.astype(dtype),
        ext_indices=tuple(buckets_i), ext_weights=tuple(buckets_w),
        inv_pi=jnp.asarray(inv_pi),
        overflow_rows=overflow[0], overflow_cols=overflow[1],
        overflow_weights=overflow[2], colsums_raw=colsums)


class DeviceConnectivities:
    """``obsp['connectivities']`` face of a device-resident graph.

    ``tl`` consumers (``get_device_graph``) use ``.ell``/``.ordering``
    directly; scipy-style access (``tocsr``, slicing, ``.shape``, any
    CSR attribute) materializes a host CSR in ORIGINAL cell order once
    and delegates thereafter.
    """

    def __init__(self, ell: EllGraph, ordering, n: int):
        """``ordering=None`` means the graph is already in the caller's
        cell order (identity) — consumers skip the permutation machinery
        entirely (``tl._nam`` then runs its plain non-reordered path)."""
        self.ell = ell
        self.ordering = ordering
        self._n = n
        self._csr = None

    @property
    def shape(self):
        return (self._n, self._n)

    @property
    def dtype(self):
        return np.dtype(str(jnp.zeros((), self.ell.weights.dtype).dtype))

    def content_digest(self):
        """Cheap device-side content summary for checkpoint
        fingerprinting — avoids materializing/pulling the (N, K) arrays
        (documented as a summary, not a cryptographic content hash)."""
        if isinstance(self.ell, SortedExtGraph):
            w = self.ell.direct_weights
            i = self.ell.direct_indices
        else:
            w = self.ell.weights
            i = self.ell.indices
        i = i.astype(jnp.float64 if w.dtype == jnp.float64
                     else jnp.float32)
        sums = jnp.stack([
            jnp.sum(w), jnp.sum(w * w), jnp.sum(i * w),
            jnp.asarray((w > 0).sum(), w.dtype),
            jnp.sum(self.ell.colsums_raw),
        ])
        perm_bytes = (np.ascontiguousarray(self.ordering.perm).tobytes()
                      if self.ordering is not None else b"identity")
        parts = [np.asarray(sums).tobytes(), perm_bytes,
                 repr((self.shape, self.ell.max_degree,
                       self.ell.n_overflow)).encode()]
        return parts

    def tocsr(self):
        if self._csr is None:
            import scipy.sparse as sp

            ell = self.ell
            perm = (self.ordering.perm if self.ordering is not None
                    else np.arange(self._n))  # perm[compact] = original
            parts = []  # (rows_compact, cols_compact, vals)
            if isinstance(ell, SortedExtGraph):
                idx = np.asarray(ell.direct_indices)
                w = np.asarray(ell.direct_weights)
                rows = np.broadcast_to(
                    np.arange(self._n)[:, None], idx.shape)
                keep = w > 0
                parts.append((rows[keep], idx[keep], w[keep]))
                # concat positions may exceed n (shape-stable bucket
                # padding duplicates overlap rows); -1 marks positions
                # whose row is canonical elsewhere — their copies drop
                inv_pi = np.asarray(ell.inv_pi)
                total = sum(int(b.shape[0]) for b in ell.ext_indices)
                pi = np.full(total, -1, dtype=np.int64)
                pi[inv_pi] = np.arange(self._n)
                start = 0
                for bi, bw in zip(ell.ext_indices, ell.ext_weights):
                    bi, bw = np.asarray(bi), np.asarray(bw)
                    if bi.size:
                        rr = np.broadcast_to(
                            pi[start:start + bi.shape[0], None], bi.shape)
                        keep = (bw > 0) & (rr >= 0)
                        parts.append((rr[keep], bi[keep], bw[keep]))
                    start += bi.shape[0]
            else:
                idx = np.asarray(ell.indices)
                w = np.asarray(ell.weights)
                rows = np.broadcast_to(
                    np.arange(self._n)[:, None], idx.shape)
                keep = w > 0
                parts.append((rows[keep], idx[keep], w[keep]))
            if ell.n_overflow:
                orows = np.asarray(ell.overflow_rows)
                ocols = np.asarray(ell.overflow_cols)
                ow = np.asarray(ell.overflow_weights)
                okeep = ow > 0
                parts.append((orows[okeep], ocols[okeep], ow[okeep]))
            r = perm[np.concatenate([p[0] for p in parts])]
            c = perm[np.concatenate([p[1] for p in parts])]
            v = np.concatenate([p[2] for p in parts])
            csr = sp.csr_matrix((v, (r, c)), shape=self.shape)
            csr.sum_duplicates()
            self._csr = csr
        return self._csr

    def toarray(self):
        return self.tocsr().toarray()

    def __getitem__(self, key):
        return self.tocsr()[key]

    def __getattr__(self, name):
        # only called for attributes not found on self: delegate to the
        # materialized CSR (scipy API compatibility)
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self.tocsr(), name)

    def __repr__(self):
        state = "materialized" if self._csr is not None else "device"
        return (f"<DeviceConnectivities {self._n}x{self._n}, "
                f"ELL width {self.ell.max_degree}, "
                f"{self.ell.n_overflow} overflow edges, {state}>")


class LazyDistances:
    """``obsp['distances']`` face: directed kNN distances, materialized
    as a host CSR (original cell order, self column dropped) on first
    scipy-style access — the (N, k) pulls are deferred off the
    graph-build critical path."""

    def __init__(self, idx_dev, d_dev, order: np.ndarray):
        self._idx = idx_dev
        self._d = d_dev
        self._order = order
        self._csr = None

    @property
    def shape(self):
        n = len(self._order)
        return (n, n)

    def tocsr(self):
        if self._csr is None:
            import scipy.sparse as sp

            idx = np.asarray(self._idx)[:, 1:]
            d = np.asarray(self._d)[:, 1:]
            perm = self._order
            rows = np.broadcast_to(perm[:, None], idx.shape).ravel()
            cols = perm[idx].ravel()
            csr = sp.csr_matrix((d.ravel(), (rows, cols)), shape=self.shape)
            csr.sort_indices()
            self._csr = csr
        return self._csr

    def toarray(self):
        return self.tocsr().toarray()

    def __getitem__(self, key):
        return self.tocsr()[key]

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self.tocsr(), name)
