"""Pallas TPU kernel: IVF fine-block scoring at MXU speed.

A naive XLA formulation of IVF scoring (the round-3 slot engine)
computes a per-(slot, probe) squared-distance tile and reduces it with
``jax.lax.approx_max_k`` + a final ``lax.top_k`` merge.  Measured on one
v5e at the 1M-cell north-star shapes: the distance matmuls with a fused
max cost 1.1 s for the whole search, while the same loop with
``approx_max_k`` costs 87 s and the full pipeline 152 s — the top-k ops
force every distance tile through an HBM round-trip (~3 TB) because TPU
matmuls only fuse trivial elementwise epilogues.  (That engine is gone;
``score_blocks_xla`` below is the non-TPU scorer for THIS kernel's
fine-block contract.)

This kernel keeps the distance tile in VMEM and merges the per-query
running top-k in VMEM scratch with k argmax-extract-mask passes (Mosaic
has no top_k/sort; the extraction loop IS the TPU-native top-k).  It is
the round-3 slot-pair kernel redesigned for **two-level fine-block
probing** (round-4): probe lists name fine g=128-row blocks instead of
512-row slots, because probe selection — not scoring — limits IVF
recall on this data (measured: recall-0.9 needs ~19% of candidates at
~1000-row ranking granularity but ~7% at ~100-row granularity; see
CLAUDE.md).  Geometry:

* the point set lives in a (F_pad, g, d_pad) fine-block layout — block
  ``b`` owns layout rows [b*g, b*g + count_b); clusters are padded up to
  a block multiple so every block is an ordinary grid block — no
  unaligned dynamic slices;
* a QUERY TILE is ``q_blocks`` consecutive fine blocks (one "slot",
  q_blocks*g = 512 rows by default) so the MXU operand stays large and
  the per-grid-step fixed cost (~25-30 us: sequencing, scalar reads,
  the stage-2 state merge) is amortized over many queries;
* each grid step scores CB=16 candidate fine blocks at once — a
  2048-wide tile, exactly the 11-bit packed-id capacity — fetched
  through 16 independent block operands whose index maps read the
  scalar-prefetched probe list;
* probe ids are fine-BLOCK ids; a count-0 block is a dummy (skipped via
  ``pl.when`` when a whole step is dummies, masked to -inf otherwise);
* output neighbor ids are emitted in COMPACT layout coordinates
  (``blk_csum[b] + within``) via a prefetched per-block offset table, so
  downstream graph construction never pays a host-side (or device
  scalar-gather) id translation.

Grid = (slots, probe_steps), probe axis innermost so the query tile and
running state stay resident across a slot's probes.  Outputs are exact
top-k within the probed candidate set.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


# 11 low mantissa bits carry the within-tile column id across the
# CB*g-wide candidate tile (=> CB*g <= 2048); distances keep 12 mantissa
# bits of precision (rel. error <= 2^-12).
_ID_BITS = 11
_ID_MASK = (1 << _ID_BITS) - 1

CANDS_PER_STEP = 16  # candidate fine blocks scored per grid step


def _score_kernel(pid_ref, scnt_ref, csum_ref, q_ref, cand_refs,
                  outd_ref, outi_ref, bestd_ref, besti_ref, *, k, g, cb,
                  q_blocks):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    mq = q_blocks * g
    w = cb * g
    lg = g.bit_length() - 1  # g is a power of two

    @pl.when(j == 0)
    def _():
        bestd_ref[:] = jnp.full(bestd_ref.shape, -jnp.inf, jnp.float32)
        besti_ref[:] = jnp.zeros(besti_ref.shape, jnp.int32)

    sids = [pid_ref[i, cb * j + t] for t in range(cb)]
    cnts = [scnt_ref[sids[t]] for t in range(cb)]
    total = cnts[0]
    for t in range(1, cb):
        total = total + cnts[t]

    @pl.when(total > 0)
    def _():
        q = q_ref[...].reshape(mq, q_ref.shape[-1])
        cand = jnp.concatenate([r[0] for r in cand_refs], axis=0)  # (W, d)
        qn = jnp.sum(q * q, axis=1, keepdims=True)
        cn = jnp.sum(cand * cand, axis=1, keepdims=True)
        cross = jnp.dot(q, cand.T, preferred_element_type=jnp.float32)
        negd = 2.0 * cross - qn - cn.T  # (mq, W)

        # --- column liveness: within-block offset < that block's count.
        # The cb-way count select runs on a (1, W) strip; the broadcast
        # against the full tile costs one compare + one where.
        col_r = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        blk_r = jax.lax.shift_right_logical(col_r, jnp.int32(lg))
        cnt_r = jnp.zeros((1, w), jnp.int32)
        for t in range(cb):
            cnt_r = jnp.where(blk_r == t, cnts[t], cnt_r)
        within_r = jnp.bitwise_and(col_r, jnp.int32(g - 1))
        live_r = within_r < cnt_r  # (1, W), broadcasts over rows
        col = jax.lax.broadcasted_iota(jnp.int32, negd.shape, 1)
        negd = jnp.where(live_r, negd, -jnp.inf)

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
            jnp.bitwise_and(bits, jnp.int32(~_ID_MASK)), col)
        packed = jnp.where(
            jnp.isfinite(negd),
            jax.lax.bitcast_convert_type(packed_bits, jnp.float32),
            -jnp.inf)

        # --- stage 1: top-k of THIS tile (full-width passes) ---
        tile_d = jnp.zeros((mq, k), jnp.float32)
        slot_k = jax.lax.broadcasted_iota(jnp.int32, tile_d.shape, 1)
        for t in range(k):
            mx = jnp.max(packed, axis=1, keepdims=True)
            tile_d = jnp.where(slot_k == t, mx, tile_d)
            packed = jnp.where(packed == mx, -jnp.inf, packed)
        tile_bits = jax.lax.bitcast_convert_type(tile_d, jnp.int32)
        local = jnp.bitwise_and(tile_bits, jnp.int32(_ID_MASK))
        # local tile id -> COMPACT layout id: csum[block] + within.
        # cb-way select on the small (mq, k) tile.
        lblk = jax.lax.shift_right_logical(local, jnp.int32(lg))
        lwithin = jnp.bitwise_and(local, jnp.int32(g - 1))
        glob = jnp.zeros_like(local)
        for t in range(cb):
            glob = jnp.where(lblk == t, csum_ref[sids[t]] + lwithin, glob)
        tile_ids = jnp.where(jnp.isfinite(tile_d), glob, jnp.int32(0))

        # --- stage 2: merge tile winners into the running state ---
        # (mq, 2k)-wide: the extraction loop here touches ~2k lanes, not
        # the full tile, so its cost is part of the per-step fixed cost.
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


@partial(jax.jit, static_argnames=("k", "g", "q_blocks", "cb",
                                   "interpret"))
def score_blocks_pallas(x4, sel_ids, probe_ids, blk_counts, blk_csum, k,
                        g=128, q_blocks=4, cb=CANDS_PER_STEP,
                        interpret=False):
    """Exact top-k of each slot's rows against its probed fine blocks.

    x4: (F_pad, g, d_pad) float32 — fine-block layout (block b = layout
        rows [b*g, b*g + count_b) of the cluster-sorted point set; tail
        rows of a block are padding whose values are never selected
        because every probe masks columns >= its count).
    sel_ids: (ns,) int32 — slot id scored by each output row; slot s
        owns query blocks [s*q_blocks, (s+1)*q_blocks).
    probe_ids: (ns, P) int32 — probed fine-BLOCK ids, P a multiple of
        CANDS_PER_STEP (a count-0 block id = dummy; whole-dummy steps
        are skipped, partial ones masked).
    blk_counts: (F_pad,) int32 — live row count of every block (scalar
        prefetch; per-BLOCK so the SMEM footprint stays ~bytes-per-block).
    blk_csum: (F_pad,) int32 — exclusive cumsum of live counts: the
        COMPACT layout offset of each block.  Output ids are emitted as
        ``blk_csum[b] + within`` so no downstream id translation exists.
    Returns (negd (ns, q_blocks*g, k) descending, idx (ns, q_blocks*g,
    k)) with idx in compact coordinates.  Query rows beyond a block's
    live count hold garbage; callers mask them.  The returned
    neg-squared-distances are quantized to ~12 mantissa bits (the low
    bits carry extraction ids in-kernel); relative error <= 2^-12,
    immaterial for neighbor ranking and graph weights.
    """
    ns = sel_ids.shape[0]
    p = probe_ids.shape[1]
    if p % cb:
        raise ValueError(f"probe list width must be a multiple of {cb} "
                         "(pad with a count-0 dummy block)")
    if g & (g - 1):
        raise ValueError("block rows g must be a power of two")
    if cb * g > _ID_MASK + 1:
        raise ValueError(f"candidate tile {cb}*{g} exceeds the "
                         f"{_ID_BITS}-bit packed-id capacity (2048)")
    kpad = _round_up(max(k, 1), 128)
    d_pad = x4.shape[2]
    mq = q_blocks * g

    def make_cand_spec(t):
        return pl.BlockSpec(
            (1, g, d_pad),
            lambda i, j, sel, pid, scnt, csum, t=t: (pid[i, cb * j + t],
                                                     0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ns, p // cb),
        in_specs=[
            pl.BlockSpec((q_blocks, g, d_pad),
                         lambda i, j, sel, pid, scnt, csum: (sel[i], 0, 0)),
        ] + [make_cand_spec(t) for t in range(cb)],
        out_specs=[
            pl.BlockSpec((1, mq, kpad),
                         lambda i, j, sel, pid, scnt, csum: (i, 0, 0)),
            pl.BlockSpec((1, mq, kpad),
                         lambda i, j, sel, pid, scnt, csum: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((mq, kpad), jnp.float32),
            pltpu.VMEM((mq, kpad), jnp.int32),
        ],
    )

    def kernel(sel_ref, pid_ref, scnt_ref, csum_ref, q_ref, *rest):
        cand_refs = rest[:cb]
        outd_ref, outi_ref, bestd_ref, besti_ref = rest[cb:]
        del sel_ref
        _score_kernel(pid_ref, scnt_ref, csum_ref, q_ref, cand_refs,
                      outd_ref, outi_ref, bestd_ref, besti_ref, k=k, g=g,
                      cb=cb, q_blocks=q_blocks)

    outd, outi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ns, mq, kpad), jnp.float32),
            jax.ShapeDtypeStruct((ns, mq, kpad), jnp.int32),
        ],
        interpret=interpret,
    )(sel_ids, probe_ids, blk_counts, blk_csum, *([x4] * (1 + cb)))
    return outd[:, :, :k], outi[:, :, :k]


@partial(jax.jit, static_argnames=("k", "g", "q_blocks", "cb"))
def score_blocks_xla(x4, sel_ids, probe_ids, blk_counts, blk_csum, k,
                     g=128, q_blocks=1, cb=CANDS_PER_STEP):
    """Plain-XLA twin of ``score_blocks_pallas`` — identical contract.

    The non-TPU scoring backend for the SAME fine-block index (one index
    structure, probe selection, pilot and recall machinery everywhere;
    only the inner scorer differs by platform).  Mirrors the kernel's
    structure: a scan over ``cb``-block candidate steps, each step one
    (mq, cb*g) distance tile reduced with an exact running ``top_k``
    merge; neighbor ids are emitted in compact coordinates via
    ``blk_csum`` exactly as the kernel does.  Distances here keep full
    f32 precision (no packed-id mantissa quantization).
    """
    ns, p = probe_ids.shape
    if p % cb:
        raise ValueError(f"probe list width must be a multiple of {cb}")
    mq = q_blocks * g
    d_pad = x4.shape[2]
    w = cb * g
    within = jnp.arange(w, dtype=jnp.int32) % g
    blk_of = jnp.arange(w, dtype=jnp.int32) // g

    def one_slot(args):
        sel, pid = args
        q = jax.lax.dynamic_slice_in_dim(
            x4, sel * q_blocks, q_blocks, axis=0).reshape(mq, d_pad)
        qn = jnp.sum(q * q, axis=1, keepdims=True)

        def step(carry, j):
            bd, bi = carry
            ids = jax.lax.dynamic_slice_in_dim(pid, j * cb, cb)
            cand = x4[ids].reshape(w, d_pad)
            cn = jnp.sum(cand * cand, axis=1)
            negd = 2.0 * (q @ cand.T) - qn - cn[None, :]
            live = within < blk_counts[ids][blk_of]
            negd = jnp.where(live[None, :], negd, -jnp.inf)
            comp = blk_csum[ids][blk_of] + within  # compact ids (w,)
            cat_d = jnp.concatenate([bd, negd], axis=1)
            cat_i = jnp.concatenate(
                [bi, jnp.broadcast_to(comp[None, :], (mq, w))], axis=1)
            td, tp = jax.lax.top_k(cat_d, k)
            ti = jnp.take_along_axis(cat_i, tp, axis=1)
            return (td, ti), None

        init = (jnp.full((mq, k), -jnp.inf, jnp.float32),
                jnp.zeros((mq, k), jnp.int32))
        (bd, bi), _ = jax.lax.scan(step, init, jnp.arange(p // cb))
        return bd, bi

    return jax.lax.map(one_slot, (sel_ids, probe_ids),
                       batch_size=min(8, max(ns, 1)))
