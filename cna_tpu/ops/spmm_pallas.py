"""Pallas TPU kernel: banded SpMM for locality-ordered diffusion graphs.

The diffusion hot loop (reference ``_nam.py:33``) is a sparse N x N graph
times a dense (N, S) state.  The default execution is the XLA row-gather
ELL path in ``cna_tpu.ops.spmm`` — on arbitrary graphs, random row
gathers at the TPU's (8, 128)-tile granularity are the binding constraint
and XLA already sits near that bound (CLAUDE.md: ~64 GB/s effective of a
~100 GB/s granularity ceiling), and Mosaic exposes no gather primitive
that could beat it.

When the cell ordering has metric locality (kd/RCM ordering of a
manifold-structured atlas; ``cna_tpu.graph.reorder``), most edges satisfy
``|i - j| <= W``.  This kernel exploits that structure instead of
gathering:

* grid over row tiles of ``R`` rows; per tile one **contiguous** DMA
  pulls the state slab ``x[slab_start : slab_start + R + 2W]`` into VMEM
  at full HBM bandwidth (``PrefetchScalarGridSpec`` prefetches the
  per-tile slab starts so the DMA can be issued immediately);
* the ELL contraction against slab-local neighbor indices is computed as
  K one-hot MXU matmuls ``(R x SLAB) @ (SLAB x S)`` — the TPU-native
  replacement for an in-VMEM gather;
* out-of-band edges (hub rows, long-range links) fall back to the COO
  scatter-add tail exactly like ELL overflow.

Pays off when the band fraction is high and S is large enough to amortize
the one-hot build; on the synthetic archetype benchmark graphs (p99 band
~0.4 N — no locality) the gather path remains the right default.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class BandedGraph:
    """ELL graph with slab-local indices for the banded Pallas kernel.

    Registered as a pytree (geometry ints are static metadata) so it can
    ride through jitted diffusion loops like the other graph formats.

    Attributes:
      lidx: int32 (N_pad, K) neighbor indices RELATIVE to the owning row
        tile's slab start; padding/out-of-band slots point at 0 with
        weight 0.
      weights: (N_pad, K) in-band edge weights.
      slab_starts: int32 (T,) absolute start row of each tile's slab.
      spill_indices/spill_weights: (N, K_spill) ELL tail of out-of-band
        edges, executed with the row-GATHER SpMM (real manifold graphs
        band only partially — 60-85% measured on kd-ordered 100k kNN
        graphs — and a gather beats a scatter-add for the remainder);
        per-row spill beyond K_spill falls through to the COO tail.
      overflow_rows/cols/weights: COO tail for the spill's own overflow.
      colsums_raw: (N,) column sums (no self weight), as in EllGraph.
      n_rows_true / row_tile / slab_rows: geometry.
    """

    lidx: jnp.ndarray
    weights: jnp.ndarray
    slab_starts: jnp.ndarray
    spill_indices: jnp.ndarray
    spill_weights: jnp.ndarray
    overflow_rows: jnp.ndarray
    overflow_cols: jnp.ndarray
    overflow_weights: jnp.ndarray
    colsums_raw: jnp.ndarray
    n_rows_true: int
    row_tile: int
    slab_rows: int

    @property
    def dtype(self):
        return self.weights.dtype

    @property
    def n_rows(self) -> int:
        return self.n_rows_true

    def colsums(self, self_weight: float = 1.0):
        return self.colsums_raw + self_weight

    def band_fraction(self) -> float:
        """Fraction of edges handled in-band (vs the spill/COO tails)."""
        in_band = float((np.asarray(self.weights) != 0).sum())
        total = in_band + float(
            (np.asarray(self.spill_weights) != 0).sum()) + float(
            (np.asarray(self.overflow_weights) != 0).sum())
        return in_band / max(total, 1.0)


jax.tree_util.register_dataclass(
    BandedGraph,
    data_fields=["lidx", "weights", "slab_starts", "spill_indices",
                 "spill_weights", "overflow_rows", "overflow_cols",
                 "overflow_weights", "colsums_raw"],
    meta_fields=["n_rows_true", "row_tile", "slab_rows"],
)


def banded_from_scipy(a, row_tile: int = 256, window: int = 512,
                      dtype=None, width_percentile: float = 98.0
                      ) -> BandedGraph:
    """Pack a scipy sparse matrix straight into the banded format.

    Host-side throughout (no device round trip — packing an already
    device-resident EllGraph via ``banded_from_ell`` pulls its arrays
    back through d2h, which dominates on tunneled deployments).
    """
    from ..graph.ell import _pack_ell_host

    parts = _pack_ell_host(a, dtype=dtype,
                           width_percentile=width_percentile)
    return _banded_pack(parts["indices"], parts["weights"],
                        parts["overflow_rows"], parts["overflow_cols"],
                        parts["overflow_weights"], parts["colsums"],
                        row_tile, window)


def banded_from_ell(graph, row_tile: int = 256, window: int = 512,
                    dtype=None) -> BandedGraph:
    """Repack an ``EllGraph`` for the banded kernel.

    Edges with slab-local index outside ``[0, row_tile + 2*window)`` move
    to the COO tail (appended after the EllGraph's own overflow edges).
    """
    return _banded_pack(
        np.asarray(graph.indices), np.asarray(graph.weights),
        np.asarray(graph.overflow_rows), np.asarray(graph.overflow_cols),
        np.asarray(graph.overflow_weights),
        np.asarray(graph.colsums_raw), row_tile, window, dtype=dtype)


def _banded_pack(idx, w, ell_ov_r, ell_ov_c, ell_ov_w, colsums_raw,
                 row_tile, window, dtype=None) -> BandedGraph:
    n, k = idx.shape
    if dtype is None:
        dtype = w.dtype
    slab = row_tile + 2 * window
    n_pad = _round_up(max(n, 1), row_tile)
    t = n_pad // row_tile

    starts = np.clip(np.arange(t) * row_tile - window, 0,
                     max(n_pad - slab, 0)).astype(np.int32)
    row_tile_of = np.arange(n) // row_tile
    start_of_row = starts[row_tile_of]  # (n,)

    lidx = idx - start_of_row[:, None]
    in_band = (lidx >= 0) & (lidx < slab) & (w != 0)
    lidx = np.where(in_band, lidx, 0).astype(np.int32)
    wb = np.where(in_band, w, 0).astype(dtype)

    # out-of-band edges spill into a gather-ELL tail (width at the 98th
    # pct of per-row spill counts); the residue beyond that goes to COO
    oob = (~in_band) & (w != 0)
    counts = oob.sum(axis=1)
    if counts.any():
        k_sp = _round_up(max(int(np.percentile(counts, 98.0)), 1), 8)
        k_sp = min(k_sp, k)
        pos = np.cumsum(oob, axis=1) - 1  # spill slot within the row
        sel = oob & (pos < k_sp)
        spill_idx = np.zeros(n * k_sp, np.int32)
        spill_w = np.zeros(n * k_sp, dtype)
        sel_rows = np.nonzero(sel)[0].astype(np.int64)
        flat = sel_rows * k_sp + pos[sel]
        spill_idx[flat] = idx[sel]
        spill_w[flat] = w[sel]
        spill_idx = spill_idx.reshape(n, k_sp)
        spill_w = spill_w.reshape(n, k_sp)
        residue = oob & (pos >= k_sp)
    else:
        spill_idx = np.zeros((n, 0), np.int32)
        spill_w = np.zeros((n, 0), dtype)
        residue = oob

    rows = np.nonzero(residue)[0].astype(np.int32)
    cols = idx[residue].astype(np.int32)
    wo = w[residue].astype(dtype)
    ov_r = np.concatenate([np.asarray(ell_ov_r, np.int32), rows])
    ov_c = np.concatenate([np.asarray(ell_ov_c, np.int32), cols])
    ov_w = np.concatenate([np.asarray(ell_ov_w, dtype), wo])
    m = _round_up(len(ov_r), 8) if len(ov_r) else 0
    if m > len(ov_r):
        pad = m - len(ov_r)
        ov_r = np.pad(ov_r, (0, pad))
        ov_c = np.pad(ov_c, (0, pad))
        ov_w = np.pad(ov_w, (0, pad))

    if n_pad > n:
        lidx = np.pad(lidx, ((0, n_pad - n), (0, 0)))
        wb = np.pad(wb, ((0, n_pad - n), (0, 0)))

    return BandedGraph(
        lidx=jnp.asarray(lidx), weights=jnp.asarray(wb),
        slab_starts=jnp.asarray(starts),
        spill_indices=jnp.asarray(spill_idx),
        spill_weights=jnp.asarray(spill_w),
        overflow_rows=jnp.asarray(ov_r), overflow_cols=jnp.asarray(ov_c),
        overflow_weights=jnp.asarray(ov_w),
        colsums_raw=jnp.asarray(np.asarray(colsums_raw, dtype)),
        n_rows_true=n, row_tile=row_tile, slab_rows=slab,
    )


def _banded_kernel(starts_ref, lidx_ref, w_ref, x_hbm, out_ref, slab_ref,
                   sem, *, k, slab_rows):
    t = pl.program_id(0)
    start = starts_ref[t]
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(start, slab_rows), :], slab_ref, sem)
    dma.start()
    dma.wait()

    r = out_ref.shape[0]
    slab = slab_ref[:]  # (SLAB, S_pad)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, slab_rows), 1)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for j in range(k):
        oh = jnp.where(col == lidx_ref[:, j][:, None],
                       w_ref[:, j][:, None], 0.0).astype(jnp.float32)
        # HIGHEST: the default single-pass-bf16 MXU mode costs ~1e-3
        # relative error on the diffusion state; 3-pass f32 stays well
        # ahead of the gather path (measured 0.45s vs 3.8s per 1M-cell
        # step) while matching its numerics
        acc = acc + jnp.dot(oh, slab, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = acc.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("row_tile", "slab_rows", "interpret"))
def _banded_spmm_padded(lidx, w, starts, x_pad, row_tile, slab_rows,
                        interpret=False):
    n_pad, k = lidx.shape
    s_pad = x_pad.shape[1]
    t = n_pad // row_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((row_tile, k), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, k), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec((row_tile, s_pad), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, s_pad), x_pad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        partial(_banded_kernel, k=k, slab_rows=slab_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, s_pad), x_pad.dtype),
        interpret=interpret,
    )(starts, lidx, w, x_pad)


def banded_spmm(graph: BandedGraph, x, interpret: bool = False):
    """``y = A @ x`` for a banded-packed graph; (N, S) dense in/out.

    The in-band part runs in the Pallas kernel; the COO tail is applied
    with the same scatter-add as ELL overflow.  ``interpret=True`` runs
    the kernel in the Pallas interpreter (any backend) for testing; the
    XLA twin ``_banded_spmm_xla`` provides an independent cross-check.
    """
    from .spmm import coo_spmm_add

    n = graph.n_rows_true
    x = jnp.asarray(x)
    s = x.shape[1]
    s_pad = _round_up(max(s, 1), 128)
    n_pad = graph.lidx.shape[0]
    # slab starts are clipped to [0, n_pad - slab] at pack time, so every
    # window fits inside max(n_pad, slab_rows) rows (static — this can
    # run under an outer jit trace)
    x_rows = max(n_pad, graph.slab_rows)
    x_pad = jnp.zeros((x_rows, s_pad), x.dtype)
    x_pad = x_pad.at[:n, :s].set(x[:n])

    if not interpret and jax.default_backend() != "tpu":
        # Mosaic only lowers on TPU; elsewhere run the XLA twin (same
        # semantics, exercised against the kernel in tests)
        y_pad = _banded_spmm_xla(graph.lidx, graph.weights,
                                 graph.slab_starts, x_pad,
                                 graph.row_tile, graph.slab_rows)
    else:
        y_pad = _banded_spmm_padded(graph.lidx, graph.weights,
                                    graph.slab_starts, x_pad,
                                    graph.row_tile, graph.slab_rows,
                                    interpret=interpret)
    y = y_pad[:n, :s]
    if graph.spill_indices.shape[1]:
        from .spmm import ell_spmm

        y = y + ell_spmm(graph.spill_indices, graph.spill_weights, x[:n])
    return coo_spmm_add(y, graph.overflow_rows, graph.overflow_cols,
                        graph.overflow_weights, x[:n])


@partial(jax.jit, static_argnames=("row_tile", "slab_rows"))
def _banded_spmm_xla(lidx, w, starts, x_pad, row_tile, slab_rows):
    """Reference semantics of the kernel in plain XLA (for tests/CPU)."""
    n_pad, k = lidx.shape
    t = n_pad // row_tile
    lidx_t = lidx.reshape(t, row_tile, k)
    w_t = w.reshape(t, row_tile, k)

    def one_tile(args):
        li, wt, st = args
        slab = jax.lax.dynamic_slice_in_dim(x_pad, st, slab_rows, axis=0)
        g = jnp.take(slab, li, axis=0)  # (R, K, S)
        return jnp.einsum("rk,rks->rs", wt, g,
                          preferred_element_type=x_pad.dtype)

    y = jax.lax.map(one_tile, (lidx_t, w_t, starts))
    return y.reshape(n_pad, x_pad.shape[1])


def diffusion_step_banded(s, graph: BandedGraph, colsums, self_weight,
                          interpret: bool = False):
    """Lazy-random-walk step (reference ``_nam.py:28,33``) on the banded
    format: ``s' = A @ (s/colsums) + self_weight * s/colsums``."""
    t = s / colsums[:, None]
    return banded_spmm(graph, t, interpret=interpret) + self_weight * t
