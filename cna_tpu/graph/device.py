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
                  max_spill_frac=0.02) -> EllGraph:
    """Hybrid-ELL ``EllGraph`` of the symmetric fuzzy union, on device.

    idx_dev: (N, k) int32 kNN lists (self first) — row coordinates and
        neighbor values in the SAME coordinate system.
    w_sym / code: the aligned symmetric weights and emission codes from
        ``fuzzy_union_device`` (bit 0: row owns the entry; bit 1: row
        must also mirror it to the partner).
    The mirror-column width is the smallest of ``_KX_CANDS`` that leaves
    <= ``max_spill_frac`` of mirror edges to the COO overflow.
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
    for cand, sp_count in zip(_KX_CANDS, spills):
        if sp_count <= max_spill_frac * m:
            kx = cand
            spill = int(sp_count)
            break
    else:
        spill = int(spills[-1])

    ext_i, ext_w, ext_sums = _scatter_ext(tgt_s, src_s, w_s, pos, n, kx)
    indices = jnp.concatenate([idx_dev, ext_i], axis=1)
    weights = jnp.concatenate([direct_w, ext_w], axis=1).astype(dtype)
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

    return EllGraph(
        indices=indices, weights=weights,
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
        w = self.ell.weights
        i = self.ell.indices.astype(jnp.float64 if w.dtype == jnp.float64
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
            idx = np.asarray(ell.indices)
            w = np.asarray(ell.weights)
            perm = (self.ordering.perm if self.ordering is not None
                    else np.arange(self._n))  # perm[compact] = original
            rows = np.broadcast_to(perm[:, None], idx.shape)
            cols = perm[idx]
            keep = w > 0
            r, c, v = rows[keep], cols[keep], w[keep]
            if ell.n_overflow:
                orows = perm[np.asarray(ell.overflow_rows)]
                ocols = perm[np.asarray(ell.overflow_cols)]
                ow = np.asarray(ell.overflow_weights)
                okeep = ow > 0
                r = np.concatenate([r, orows[okeep]])
                c = np.concatenate([c, ocols[okeep]])
                v = np.concatenate([v, ow[okeep]])
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
