"""Pallas TPU kernel: IVF slot scoring at MXU speed.

The XLA formulation of IVF scoring (``pp.ivf._score_slots``) computes a
(m, m) squared-distance tile per (slot, probe) and reduces it with
``jax.lax.approx_max_k`` + a final ``lax.top_k`` merge.  Measured on one
v5e at the 1M-cell north-star shapes (m=1288, 224 probes/slot): the
distance matmuls with a fused max cost 1.1 s for the whole search, while
the same loop with ``approx_max_k`` costs 87 s and the full pipeline
152 s — the top-k ops force every distance tile through an HBM
round-trip (~3 TB) because TPU matmuls only fuse trivial elementwise
epilogues.

This kernel is the ``ops.knn_pallas`` design applied to the IVF
geometry: the (m, m) tile never leaves VMEM and the per-query running
top-k is merged in VMEM scratch with k argmax-extract-mask passes
(Mosaic has no top_k/sort; the extraction loop IS the TPU-native
top-k).  What makes it possible is a fixed slot layout:

* every slot holds exactly ``m`` rows at layout offset ``slot_id * m``
  (clusters are padded UP to a slot multiple when laid out), so both the
  query tile and each probed candidate tile are ordinary grid blocks of
  a (S, m, d_pad) array — no unaligned dynamic slices, no in-kernel DMA
  bookkeeping;
* the probe list is a (ns, P) array of slot IDS driven through scalar
  prefetch: the block index maps read it directly;
* dummy probes (count 0, padding up to the P shape bucket) skip the
  whole body via ``pl.when``.

Grid = (slots, probes), probe axis innermost so the query tile and the
running state stay resident across a slot's probes.  Outputs are exact
top-k within the probed candidate set (the XLA path's approx_max_k was
0.99-recall within it).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


# 11 low mantissa bits carry the within-tile column id across the 2m-wide
# probe-pair tile (=> m <= 1024); distances keep 12 mantissa bits of
# precision (rel. error <= 2^-12).
_ID_BITS = 11
_ID_MASK = (1 << _ID_BITS) - 1


def _score_kernel(pid_ref, scnt_ref, q_ref, cand_a_ref, cand_b_ref,
                  outd_ref, outi_ref, bestd_ref, besti_ref, *, k, m):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        bestd_ref[:] = jnp.full(bestd_ref.shape, -jnp.inf, jnp.float32)
        besti_ref[:] = jnp.zeros(besti_ref.shape, jnp.int32)

    # TWO probes per grid step: per-step fixed costs (grid sequencing,
    # scalar reads, the stage-2 state merge) were ~60% of the measured
    # 45 us/step at m=512 — amortizing them over a 2m-wide candidate
    # tile buys back most of that overhead for the same VPU visit count.
    sid_a = pid_ref[i, 2 * j]
    sid_b = pid_ref[i, 2 * j + 1]
    count_a = scnt_ref[sid_a]
    count_b = scnt_ref[sid_b]

    @pl.when(count_a + count_b > 0)
    def _():
        q = q_ref[0]         # (m, d_pad)
        cand_a = cand_a_ref[0]  # (m, d_pad)
        cand_b = cand_b_ref[0]
        qn = jnp.sum(q * q, axis=1, keepdims=True)
        cn_a = jnp.sum(cand_a * cand_a, axis=1, keepdims=True)
        cn_b = jnp.sum(cand_b * cand_b, axis=1, keepdims=True)
        cross_a = jnp.dot(q, cand_a.T, preferred_element_type=jnp.float32)
        cross_b = jnp.dot(q, cand_b.T, preferred_element_type=jnp.float32)
        negd = jnp.concatenate(
            [2.0 * cross_a - qn - cn_a.T,
             2.0 * cross_b - qn - cn_b.T], axis=1)  # (m, 2m)
        col = jax.lax.broadcasted_iota(jnp.int32, negd.shape, 1)
        in_a = col < m
        # logical combine, not where-on-bools (Mosaic can't select i1)
        live = (in_a & (col < count_a)) | (~in_a & ((col - m) < count_b))
        negd = jnp.where(live, negd, -jnp.inf)

        # --- pack the local column id into the low mantissa bits ---
        # The classic argmax-extract loop costs ~8 full-width VPU ops
        # per extracted element (max, argmax, lane-eq, masked id reduce,
        # re-mask).  Packing the 11-bit column id into the distance's
        # low mantissa makes every packed value UNIQUE within the tile,
        # so one max-reduce + one equality re-mask (~3 full-width ops)
        # extracts an element AND its id.  Costs the bottom 11 of 23
        # mantissa bits (relative distance error <= 2^-12 ~ 2.4e-4,
        # well under the f32-vs-f64 agreement tolerance and irrelevant
        # for neighbor ranking).  -inf must bypass the OR (its exponent
        # is all-ones; setting mantissa bits would turn it into NaN).
        bits = jax.lax.bitcast_convert_type(negd, jnp.int32)
        packed_bits = jnp.bitwise_or(
            jnp.bitwise_and(bits, jnp.int32(~(_ID_MASK))), col)
        packed = jnp.where(
            jnp.isfinite(negd),
            jax.lax.bitcast_convert_type(packed_bits, jnp.float32),
            -jnp.inf)

        # --- stage 1: top-k of THIS tile (full-width passes) ---
        tile_d = jnp.zeros((negd.shape[0], k), jnp.float32)
        slot_k = jax.lax.broadcasted_iota(jnp.int32, tile_d.shape, 1)
        for t in range(k):
            mx = jnp.max(packed, axis=1, keepdims=True)
            tile_d = jnp.where(slot_k == t, mx, tile_d)
            packed = jnp.where(packed == mx, -jnp.inf, packed)
        tile_bits = jax.lax.bitcast_convert_type(tile_d, jnp.int32)
        local = jnp.bitwise_and(tile_bits, jnp.int32(_ID_MASK))
        glob = jnp.where(local < m, sid_a * m + local,
                         sid_b * m + (local - m))
        tile_ids = jnp.where(jnp.isfinite(tile_d), glob, jnp.int32(0))

        # --- stage 2: merge tile winners into the running state ---
        # (m, 2k)-wide: the extraction loop here touches 30 lanes, not
        # the full tile, so its cost is negligible.
        bestd = bestd_ref[:]
        besti = besti_ref[:]
        cand_d = jnp.concatenate([bestd[:, :k], tile_d], axis=1)
        cand_i = jnp.concatenate([besti[:, :k], tile_ids], axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, cand_d.shape, 1)
        slot = jax.lax.broadcasted_iota(jnp.int32, bestd.shape, 1)
        for t in range(k):
            mx = jnp.max(cand_d, axis=1, keepdims=True)
            am = jnp.argmax(cand_d, axis=1, keepdims=True)
            hit = lane == am
            mi = jnp.max(jnp.where(hit, cand_i, -1), axis=1, keepdims=True)
            bestd = jnp.where(slot == t, mx, bestd)
            besti = jnp.where(slot == t, mi, besti)
            cand_d = jnp.where(hit, -jnp.inf, cand_d)
        bestd_ref[:] = bestd
        besti_ref[:] = besti

    @pl.when(j == nb - 1)
    def _():
        outd_ref[0] = bestd_ref[:]
        outi_ref[0] = besti_ref[:]


@partial(jax.jit, static_argnames=("k", "m", "interpret"))
def score_slots_pallas(x3, sel_ids, probe_ids, slot_counts, k, m,
                       interpret=False):
    """Exact top-k of each slot's rows against its probed slots' rows.

    x3: (S, m, d_pad) float32 — slot-blocked layout (slot s = rows
        [s*m, s*m + count) of the cluster-sorted point set; tail rows of
        a slot are layout padding whose values are never selected
        because every probe masks columns >= its count).
    sel_ids: (ns,) int32 — slot id scored by each output row.
    probe_ids: (ns, P) int32 — probed slot ids (a count-0 slot id =
        dummy, skipped; pad probe lists with one such slot).
    slot_counts: (S,) int32 — live row count of every slot.  Per-SLOT
        (not per-probe) so the scalar-prefetch SMEM footprint stays
        ~bytes-per-slot: prefetched operands share a 1 MB SMEM budget,
        which a (ns, P) count matrix blows at production shapes.
    Returns (negd (ns, m, k) descending, idx (ns, m, k)) with idx in
    layout coordinates (slot_id * m + column).  Rows of a query slot
    beyond its own live count hold garbage; callers mask them.  The
    returned neg-squared-distances are quantized to ~12 mantissa bits
    (the low bits carry extraction ids in-kernel); relative error
    <= 2^-12, immaterial for neighbor ranking and graph weights.
    """
    ns = sel_ids.shape[0]
    p = probe_ids.shape[1]
    if p % 2:
        raise ValueError("probe list width must be even (pad with a "
                         "count-0 dummy slot)")
    kpad = _round_up(max(k, 1), 128)
    d_pad = x3.shape[2]
    if 2 * m > _ID_MASK + 1:
        raise ValueError(f"slot rows m={m} exceeds the {_ID_BITS}-bit "
                         "packed-id capacity over a probe pair (1024)")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ns, p // 2),
        in_specs=[
            pl.BlockSpec((1, m, d_pad),
                         lambda i, j, sel, pid, scnt: (sel[i], 0, 0)),
            pl.BlockSpec((1, m, d_pad),
                         lambda i, j, sel, pid, scnt: (pid[i, 2 * j], 0, 0)),
            pl.BlockSpec((1, m, d_pad),
                         lambda i, j, sel, pid, scnt: (pid[i, 2 * j + 1],
                                                       0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, m, kpad),
                         lambda i, j, sel, pid, scnt: (i, 0, 0)),
            pl.BlockSpec((1, m, kpad),
                         lambda i, j, sel, pid, scnt: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, kpad), jnp.float32),
            pltpu.VMEM((m, kpad), jnp.int32),
        ],
    )

    def kernel(sel_ref, pid_ref, scnt_ref, q_ref, cand_a_ref, cand_b_ref,
               outd_ref, outi_ref, bestd_ref, besti_ref):
        del sel_ref
        _score_kernel(pid_ref, scnt_ref, q_ref, cand_a_ref, cand_b_ref,
                      outd_ref, outi_ref, bestd_ref, besti_ref, k=k, m=m)

    outd, outi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ns, m, kpad), jnp.float32),
            jax.ShapeDtypeStruct((ns, m, kpad), jnp.int32),
        ],
        interpret=interpret,
    )(sel_ids, probe_ids, slot_counts, x3, x3, x3)
    return outd[:, :, :k], outi[:, :, :k]
