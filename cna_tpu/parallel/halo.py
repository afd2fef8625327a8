"""Halo-exchange diffusion: cell-sharded SpMM with explicit collectives.

The GSPMD path (``parallel.sharded``) lets XLA all-gather the full
(N, S) diffusion state every step — simple and correct, but it moves the
whole state over the interconnect regardless of how many rows each shard
actually references.  This module is the explicit alternative (SURVEY
§5.7): each shard owns a contiguous cell block; per step it sends only
the **ghost rows** its neighbors reference, via one ``all_to_all`` inside
``shard_map``, then runs a purely local ELL SpMM against
[own rows ‖ received ghosts].

The exchange plan (which rows each shard pair needs) is computed once on
host from the CSR structure in a handful of vectorized passes (one sort
over the cross-shard edges — no per-pair Python loops), so plan builds
stay in seconds at atlas scale.

The exchange itself is MULTI-ROUND ``ppermute`` over ring offsets, not
one padded ``all_to_all``: round r ships each shard's ghosts for the
consumer r positions ahead, padded only to that OFFSET's max pair
(rounds with no traffic are dropped from the program entirely).  On a
locality-ordered partition almost all ghosts flow between ADJACENT
shards, so offsets 1 and D-1 carry the bulk and the padded volume stays
within ~2x the true ghost bytes — the round-3 single-``all_to_all``
design padded every pair to the GLOBAL max and shipped 9.5x the ghost
bytes at 16 shards and 23x at 32 (VERDICT r3), exactly where a v5p-16
would run.  The plan only pays off when the cell axis is
locality-ordered first (``tools._nam.get_halo_plan`` applies a cluster
ordering before building) — on expander-like graphs it degenerates
towards an all-gather — never worse in bytes than the dense exchange by
more than the padding factor.

The local SpMM is **degree-bucketed**, matching the single-device
default (``graph.buckets``, measured 2.7x/step over plain ELL on skewed
UMAP-union graphs): rows are degree-sorted within each shard and packed
into a few contiguous ELL buckets, each padded only to its own max
degree — so gather traffic tracks nnz instead of rows x max-degree, and
hub rows (UMAP-union degree reaches ~20x the mean) land in a tiny wide
bucket instead of forcing the whole shard wide.  Bucket boundaries are
chosen once on the max-over-shards sorted-degree profile (the same DP
as ``graph.buckets.plan_buckets``), so every shard shares one static
bucket geometry — the shard_map body stays SPMD.  Per-bucket outputs
are concatenated in degree-sorted order and mapped back to the true row
order by one per-shard gather (its traffic is one state-width row per
cell — K-fold smaller than the gather it saves).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from . import mesh as meshlib


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Per-shard exchange plan + locally-remapped degree-bucketed graph.

    Shapes (D = shards, Nd = rows per shard, N_b/K_b = rows and width of
    degree bucket b with sum_b N_b = Nd, G = padded per-pair ghost count):

      bucket_indices: tuple of (D, N_b, K_b) int32 — ELL neighbor ids of
        the rows in degree bucket b, remapped into the extended local
        layout [0, Nd + sum G): own rows first, then ghosts grouped by
        exchange round.  Rows are degree-sorted within each shard;
        bucket b covers sorted positions [start_b, end_b) on EVERY
        shard (one static geometry, SPMD-compatible), padded only to
        that bucket's max degree.
      bucket_weights: matching (D, N_b, K_b) edge weights (0 = padding).
      row_pos: (D, Nd) int32 — degree-sorted position of each true
        shard-local row; the step's final per-shard gather maps the
        concatenated per-bucket outputs back to true row order.
      out_permuted: static; False when the sort is the identity (uniform
        degrees) and the final gather is skipped.
      send_rounds: tuple of (D, G_t) int32 — one entry per exchange
        round; ``send_rounds[t][j]`` = rows (local to shard j) that the
        consumer ``(j + offset_t) % D`` needs (padding resends row 0,
        ignored downstream).  Row ids are TRUE local rows (the layout
        ``s`` is in), not sorted positions.
      rounds: static tuple of (offset, participating-producers) pairs.
        A ``ppermute`` moves bytes ONLY for listed pairs, so each offset
        is split into size buckets: light pairs ride a small-G round,
        the few heavy pairs a large-G round — total wire bytes track the
        ragged ghost sum instead of D * max-pair (rounds a producer is
        not listed in transmit nothing for it, whatever its send array
        holds).
      colsums: (D, Nd) column-sum normalizer rows owned by each shard.
      n_cells: true cell count (before shard padding).
      n_ghosts: true (unpadded) ghost rows exchanged per step.
    """

    bucket_indices: tuple
    bucket_weights: tuple
    row_pos: jnp.ndarray
    send_rounds: tuple
    colsums: jnp.ndarray
    n_cells: int = dataclasses.field(metadata=dict(static=True))
    n_ghosts: int = dataclasses.field(default=0, metadata=dict(static=True))
    rounds: tuple = dataclasses.field(default=(),
                                      metadata=dict(static=True))
    out_permuted: bool = dataclasses.field(default=True,
                                           metadata=dict(static=True))

    @property
    def n_shards(self) -> int:
        return self.colsums.shape[0]

    @property
    def shard_rows(self) -> int:
        return self.colsums.shape[1]

    @property
    def dtype(self):
        return self.bucket_weights[0].dtype

    def padded_area(self) -> int:
        """Per-shard gather fetches per SpMM step (rows x bucket width,
        summed over buckets) — the traffic the degree bucketing bounds
        near nnz/D instead of Nd x max-degree."""
        return sum(int(i.shape[1]) * int(i.shape[2])
                   for i in self.bucket_indices)

    def ghost_fraction(self) -> float:
        """True (unpadded) ghost rows exchanged per step, as a fraction of
        all cells.  << 1 on locality-ordered graphs means the halo moves
        only boundary rows; -> (D-1) means the plan has degenerated to an
        all-gather and the GSPMD path would move the same bytes."""
        return self.n_ghosts / max(self.n_cells, 1)

    def exchange_stats(self, s_cols: int, itemsize: int = 4) -> dict:
        """Per-step interconnect traffic of this plan vs the dense
        (GSPMD all-gather) exchange, for an (N, ``s_cols``) state.

        Returns bytes moved: ``ghost`` (true boundary rows), ``padded``
        (what the fixed-shape all_to_all actually ships, incl. padding),
        and ``allgather`` (the dense alternative: every shard receives
        every remote row)."""
        d, nd = self.colsums.shape
        row = s_cols * itemsize
        # ppermute ships bytes only for LISTED producer->consumer pairs
        padded_rows = sum(
            int(s.shape[1]) * len(js)
            for s, (_, js) in zip(self.send_rounds, self.rounds))
        return {
            "ghost_bytes": self.n_ghosts * row,
            "padded_bytes": padded_rows * row,
            "allgather_bytes": d * (d - 1) * nd * row,
            "ghost_fraction": self.ghost_fraction(),
            "rounds": len(self.rounds),
        }


def _round_up(x: int, m: int) -> int:
    return ((int(x) + m - 1) // m) * m


def build_halo_plan_csr(a, n_shards, colsums=None, pad_to=8,
                        max_buckets=6, dtype=None) -> HaloPlan:
    """Build the exchange plan from a scipy sparse matrix.

    ``a``: (N, N) sparse graph, rows = consumers (``a.dot(s)`` semantics,
    reference ``_nam.py:33``).  The caller is responsible for any
    locality ordering of the cell axis — the plan blocks rows in the
    order given.  ``colsums``: (N,) normalizers (computed from ``a``
    when omitted).

    All passes are vectorized: one ``np.unique`` over the cross-shard
    edges discovers every (consumer, producer, row) ghost at once; ELL
    remapping is a single ``searchsorted`` over nnz.
    """
    import scipy.sparse as sp

    a = sp.csr_matrix(a)
    n = a.shape[0]
    if colsums is None:
        colsums = np.asarray(a.sum(axis=0)).ravel()
    colsums = np.asarray(colsums)
    if dtype is None:
        dtype = np.float64 if jax.config.jax_enable_x64 else np.float32

    d = int(n_shards)
    nd = _round_up(-(-n // d), pad_to)
    n_pad = nd * d

    deg = np.diff(a.indptr)
    nnz = a.nnz
    # int32 edge arrays: these (nnz,)-sized passes are the plan-build
    # cost at 1M cells on this throttled host — halving the bytes
    # roughly halves them (n and d*nd both fit comfortably)
    etype = np.int32 if d * nd < (1 << 31) else np.int64
    rows = np.repeat(np.arange(n, dtype=etype), deg)
    cols = a.indices.astype(etype, copy=False)
    vals = a.data
    pos = (np.arange(nnz, dtype=etype)
           - np.repeat(a.indptr[:-1].astype(etype), deg))

    cons = rows // nd
    prod = cols // nd
    cross = cons != prod

    # --- ghost discovery: one unique over (consumer, referenced col) ---
    ck = cons[cross] * n_pad + cols[cross]
    uk = np.unique(ck)
    n_ghosts = len(uk)
    ucons = uk // n_pad
    ucol = uk % n_pad
    uprod = ucol // nd
    pair = (ucons * d + uprod).astype(np.int64)  # non-decreasing
    counts = np.bincount(pair, minlength=d * d).reshape(d, d)  # [cons, prod]
    seg_start = np.concatenate([[0], np.cumsum(counts.ravel())[:-1]])

    # Rounds: per ring offset r, pair (p -> (p+r)%d) ships p's ghosts.
    # ppermute moves bytes only for LISTED pairs, so each offset splits
    # into up to two SIZE BUCKETS — light pairs padded to the light max,
    # the few heavy pairs to the heavy max — bringing wire bytes close
    # to the ragged ghost sum instead of d * global-max (the r3 design
    # shipped 9.5x the ghost bytes at 16 shards; per-offset single
    # rounds still shipped 3.4x on the 100k manifold).
    jj = np.arange(d)
    rounds = []        # (offset, producers-tuple)
    round_sizes = []   # padded G per round
    bucket_of = np.zeros((d, d), dtype=np.int64)  # [offset, producer] -> t
    for r in range(1, d):
        c_r = counts[(jj + r) % d, jj] if d > 1 else np.zeros(1, np.int64)
        live = np.flatnonzero(c_r > 0)
        if len(live) == 0:
            continue
        hi = int(c_r[live].max())
        lo_cap = _round_up(int(np.percentile(c_r[live], 66)), pad_to)
        heavy = live[c_r[live] > lo_cap]
        light = live[c_r[live] <= lo_cap]
        split = (len(heavy) and len(light)
                 and len(light) * (hi - lo_cap) > d * pad_to)
        if split:
            for js, cap in ((light, lo_cap),
                            (heavy, _round_up(hi, pad_to))):
                bucket_of[r, js] = len(rounds)
                rounds.append((int(r), tuple(int(j) for j in js)))
                round_sizes.append(cap)
        else:
            bucket_of[r, live] = len(rounds)
            rounds.append((int(r), tuple(int(j) for j in live)))
            round_sizes.append(_round_up(hi, pad_to))
    rounds = tuple(rounds)
    base_of_bucket = nd + np.concatenate(
        [[0], np.cumsum(round_sizes)[:-1]]) if rounds else np.zeros(0)

    send_rounds = tuple(np.zeros((d, g), dtype=np.int32)
                        for g in round_sizes)
    if n_ghosts:
        pos_in_seg = (np.arange(n_ghosts, dtype=np.int64)
                      - seg_start[pair])
        u_round = (ucons - uprod) % d
        u_bucket = bucket_of[u_round, uprod]
        for t in range(len(rounds)):
            in_t = u_bucket == t
            send_rounds[t][uprod[in_t], pos_in_seg[in_t]] = (
                ucol[in_t] - uprod[in_t] * nd).astype(np.int32)

    # --- remap every edge into the extended local layout ---
    ext_idx = np.empty(nnz, dtype=np.int64)
    own = ~cross
    ext_idx[own] = cols[own] - cons[own] * nd
    if n_ghosts:
        gpos = np.searchsorted(uk, ck)  # exact: every ck is in uk
        ext_idx[cross] = (base_of_bucket[u_bucket[gpos]]
                          + (gpos - seg_start[pair[gpos]]))

    # --- degree-bucketed local pack (module docstring): rows sorted by
    # degree within each shard; one static bucket geometry chosen by the
    # same DP as the single-device format (graph.buckets.plan_buckets)
    # on the max-over-shards sorted-degree profile ---
    from ..graph.buckets import plan_buckets

    deg_pad = np.zeros(n_pad, dtype=np.int64)
    deg_pad[:n] = deg
    deg_sh = deg_pad.reshape(d, nd)
    order_in_shard = np.argsort(deg_sh, axis=1, kind="stable")  # (d, nd)
    sorted_deg = np.take_along_axis(deg_sh, order_in_shard, axis=1)
    # columnwise max of ascending rows is ascending — a valid DP profile
    profile = sorted_deg.max(axis=0)
    bplan = plan_buckets(profile, max_buckets=max_buckets, pad_to=pad_to)
    row_pos = np.empty((d, nd), dtype=np.int32)
    np.put_along_axis(row_pos, order_in_shard,
                      np.broadcast_to(np.arange(nd, dtype=np.int32),
                                      (d, nd)), axis=1)
    out_permuted = bool(
        (order_in_shard != np.arange(nd, dtype=order_in_shard.dtype)).any())

    # per edge: sorted position of its row, then its bucket; ONE flat
    # scatter for all buckets (per-bucket boolean masks cost ~6 extra
    # nnz-sized passes at 1M on this throttled host)
    s0_arr = np.asarray([s0 for s0, _, _ in bplan], dtype=np.int64)
    nb_arr = np.asarray([e0 - s0 for s0, e0, _ in bplan], dtype=np.int64)
    wb_arr = np.asarray([wb for *_, wb in bplan], dtype=np.int64)
    area = d * nb_arr * wb_arr
    total_area = int(area.sum())
    base = np.concatenate([[0], np.cumsum(area)[:-1]])
    # int32 in-place arithmetic when the flat area allows it: the naive
    # int64 expression allocated ~6 nnz-sized temporaries and was
    # first-touch page-fault bound (measured 5.5 s at 1M on this host;
    # ~1 s this way)
    itype = np.int32 if total_area < (1 << 31) else np.int64
    pos_sorted = row_pos.reshape(-1)[rows]  # int32 (row_pos is int32)
    be = np.searchsorted(s0_arr, pos_sorted, side="right") - 1
    dest = (rows // nd).astype(itype, copy=False)
    dest *= nb_arr.astype(itype)[be]
    dest += pos_sorted.astype(itype, copy=False)
    dest -= s0_arr.astype(itype)[be]
    dest *= wb_arr.astype(itype)[be]
    dest += base.astype(itype)[be]
    dest += pos.astype(itype, copy=False)
    li_flat = np.zeros(total_area, dtype=np.int32)
    lw_flat = np.zeros(total_area, dtype=dtype)
    li_flat[dest] = ext_idx
    lw_flat[dest] = vals.astype(dtype)
    b_idx, b_w = [], []
    for b, (s0, e0, wb) in enumerate(bplan):
        sl = slice(int(base[b]), int(base[b] + area[b]))
        b_idx.append(jnp.asarray(li_flat[sl].reshape(d, e0 - s0, wb)))
        b_w.append(jnp.asarray(lw_flat[sl].reshape(d, e0 - s0, wb)))

    colsums_pad = np.ones(n_pad, dtype=dtype)
    colsums_pad[:n] = colsums.astype(dtype)

    return HaloPlan(
        bucket_indices=tuple(b_idx),
        bucket_weights=tuple(b_w),
        row_pos=jnp.asarray(row_pos),
        send_rounds=tuple(jnp.asarray(s) for s in send_rounds),
        colsums=jnp.asarray(colsums_pad.reshape(d, nd)),
        n_cells=n,
        n_ghosts=n_ghosts,
        rounds=rounds,
        out_permuted=out_permuted,
    )


def build_halo_plan(indices, weights, colsums, n_shards, pad_to=8) -> HaloPlan:
    """Build the exchange plan from host ELL arrays (``indices``/``weights``
    (N, K), ``colsums`` (N,)) — convenience wrapper over the CSR builder."""
    import scipy.sparse as sp

    indices = np.asarray(indices)
    weights = np.asarray(weights)
    n, k = indices.shape
    rows = np.repeat(np.arange(n), k)
    mask = np.asarray(weights).ravel() != 0
    a = sp.csr_matrix(
        (np.asarray(weights).ravel()[mask],
         (rows[mask], indices.ravel()[mask])), shape=(n, n))
    return build_halo_plan_csr(a, n_shards, colsums=np.asarray(colsums),
                               pad_to=pad_to, dtype=weights.dtype)


def place_plan(plan: HaloPlan, mesh) -> HaloPlan:
    """Shard the plan's arrays over the mesh's ``cells`` axis.

    Every per-shard leading axis (D) lines up with the cell shards:
    ``local_indices``/``local_weights``/``colsums`` row blocks live on the
    shard that computes them; ``send_idx`` is sharded over the PRODUCER
    axis so each shard holds exactly what it must send.
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from . import mesh as meshlib

    rows = NamedSharding(mesh, P(meshlib.CELLS))
    return dataclasses.replace(
        plan,
        bucket_indices=tuple(jax.device_put(i, rows)
                             for i in plan.bucket_indices),
        bucket_weights=tuple(jax.device_put(w, rows)
                             for w in plan.bucket_weights),
        row_pos=jax.device_put(plan.row_pos, rows),
        send_rounds=tuple(jax.device_put(s, rows)
                          for s in plan.send_rounds),
        colsums=jax.device_put(plan.colsums, rows),
    )


def _halo_step_local(t_local, b_idx, b_w, row_pos, send_rounds, rounds,
                     n_shards, out_permuted):
    """Per-shard body: multi-round ring exchange, bucketed SpMM on
    [own ‖ ghosts].

    Round r: this shard sends its (1, G_r) listed rows to the consumer r
    positions ahead via ``ppermute``; the receive lands at the static
    extended-layout offset the plan remapped edges to.  Empty offsets
    were dropped at plan build, so the program contains exactly the
    collectives the graph needs.  The SpMM runs one gather+einsum per
    degree bucket (padding tracks nnz, not max degree); the concatenated
    degree-sorted outputs are mapped back to true row order by a single
    gather when the sort is not the identity.
    """
    parts = [t_local]
    for sidx, (r, js) in zip(send_rounds, rounds):
        send = jnp.take(t_local, sidx[0], axis=0)  # (G_t, S)
        perm = [(j, (j + r) % n_shards) for j in js]
        parts.append(jax.lax.ppermute(send, meshlib.CELLS, perm))
    ext = jnp.concatenate(parts, axis=0)
    outs = [
        (jnp.zeros((i.shape[1], t_local.shape[1]), t_local.dtype)
         if i.shape[2] == 0 else
         jnp.einsum("nk,nks->ns", w[0], jnp.take(ext, i[0], axis=0),
                    preferred_element_type=t_local.dtype))
        for i, w in zip(b_idx, b_w)
    ]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    if out_permuted:
        # sorted position p holds the result of true row order[p]; true
        # row r's result therefore sits at position row_pos[r]
        out = jnp.take(out, row_pos[0], axis=0)
    return out


@partial(jax.jit, static_argnames=("mesh", "self_weight"))
def halo_diffusion_step(s, plan: HaloPlan, mesh, self_weight=1.0):
    """One diffusion step over the cells axis with explicit halo exchange.

    ``s``: (D*Nd, S) state in shard-padded layout (rows beyond
    ``plan.n_cells`` are zero padding).  Matches
    ``ops.spmm.diffusion_step`` exactly on the true rows.
    """
    d, nd = plan.colsums.shape
    colsums_flat = plan.colsums.reshape(-1) + self_weight
    t = s / colsums_flat[:, None]

    step = shard_map(
        partial(_halo_step_local, rounds=plan.rounds, n_shards=d,
                out_permuted=plan.out_permuted),
        mesh=mesh,
        in_specs=(P(meshlib.CELLS),
                  tuple(P(meshlib.CELLS) for _ in plan.bucket_indices),
                  tuple(P(meshlib.CELLS) for _ in plan.bucket_weights),
                  P(meshlib.CELLS),
                  # send lists shard over the PRODUCER axis (axis 0):
                  # shard j holds what it sends at every ring offset
                  tuple(P(meshlib.CELLS) for _ in plan.send_rounds)),
        out_specs=P(meshlib.CELLS),
        check_vma=False,
    )
    out = step(t, plan.bucket_indices, plan.bucket_weights, plan.row_pos,
               plan.send_rounds)
    return out + self_weight * t
