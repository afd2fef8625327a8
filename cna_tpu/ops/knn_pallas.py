"""Pallas TPU kernel: exact k-nearest-neighbors at MXU speed.

The role scanpy delegates to pynndescent (approximate CPU kNN, upstream
of the reference at demo.ipynb cell 29) is a first-class on-device
primitive here.  The XLA formulation in ``cna_tpu.pp.knn`` pays for a
full ``lax.top_k`` over every (query_tile, key_block) slab — TPU top-k
is a multi-pass sort-network that dominates end-to-end graph build at
atlas scale (~minutes at 100k cells).  ``jax.lax.approx_max_k`` (the
PartialReduce op of the TPU-KNN paper) fixes the speed but gives up
recall.

This kernel gets recall 1.0 at approx-like speed by never leaving VMEM:

* grid = (query tiles, key blocks), key axis innermost;
* per step, the (Q_TILE, BLOCK) squared-distance tile is one MXU matmul
  plus rank-1 norm corrections, computed in registers;
* a running top-k of width k is merged in VMEM scratch via k
  argmax-extract-mask passes (Mosaic lowers max/argmax/where; it has no
  top_k/sort primitive — the extraction loop IS the TPU-native top-k);
* the (Q_TILE, k) result is written to HBM once per query tile, on the
  last key block.

Scaling: VPU work is 3k * N^2 comparisons, MXU work N^2 * D_pad MACs;
at N=100k, k=16 both sit in the hundreds of milliseconds — ~1000x the
XLA exact path, with byte traffic of N^2*D/Q_TILE (x re-reads) well
under HBM bandwidth.
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


def _knn_kernel(q_ref, x_ref, outd_ref, outi_ref, bestd_ref, besti_ref,
                *, k, n, block):
    b = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(b == 0)
    def _():
        bestd_ref[:] = jnp.full(bestd_ref.shape, -jnp.inf, jnp.float32)
        besti_ref[:] = jnp.zeros(besti_ref.shape, jnp.int32)

    q = q_ref[:]  # (QT, D)
    x = x_ref[:]  # (B, D)
    qn = jnp.sum(q * q, axis=1, keepdims=True)  # (QT, 1)
    xn = jnp.sum(x * x, axis=1, keepdims=True)  # (B, 1)
    cross = jnp.dot(q, x.T, preferred_element_type=jnp.float32)
    negd = 2.0 * cross - qn - xn.T  # = -(|q|^2 + |x|^2 - 2 q.x), (QT, B)
    col = jax.lax.broadcasted_iota(jnp.int32, negd.shape, 1) + b * block
    negd = jnp.where(col < n, negd, -jnp.inf)  # mask padding keys

    bestd = bestd_ref[:]  # (QT, KPAD)
    besti = besti_ref[:]
    # candidate set: current running top-k ++ this block's columns
    cand_d = jnp.concatenate([bestd[:, :k], negd], axis=1)  # (QT, k+B)
    cand_i = jnp.concatenate([besti[:, :k], col], axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, cand_d.shape, 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, bestd.shape, 1)
    for j in range(k):
        m = jnp.max(cand_d, axis=1, keepdims=True)  # (QT, 1)
        am = jnp.argmax(cand_d, axis=1, keepdims=True)  # (QT, 1)
        hit = lane == am
        # chosen key id via masked reduce (Mosaic has no lane gather)
        mi = jnp.max(jnp.where(hit, cand_i, -1), axis=1, keepdims=True)
        bestd = jnp.where(slot == j, m, bestd)
        besti = jnp.where(slot == j, mi, besti)
        cand_d = jnp.where(hit, -jnp.inf, cand_d)
    bestd_ref[:] = bestd
    besti_ref[:] = besti

    @pl.when(b == nb - 1)
    def _():
        outd_ref[:] = bestd
        outi_ref[:] = besti


def _knn_call(x_pad, k, n, q_tile, block, interpret):
    n_pad, d_pad = x_pad.shape
    grid = (n_pad // q_tile, n_pad // block)
    kpad = _round_up(max(k, 1), 128)
    return pl.pallas_call(
        partial(_knn_kernel, k=k, n=n, block=block),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d_pad), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d_pad), lambda i, b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, kpad), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, kpad), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, kpad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, kpad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_tile, kpad), jnp.float32),
            pltpu.VMEM((q_tile, kpad), jnp.int32),
        ],
        interpret=interpret,
    )(x_pad, x_pad)  # same buffer drives both the query and key streams


@partial(jax.jit,
         static_argnames=("k", "q_tile", "block", "interpret"))
def _knn_pallas_device(x, k, q_tile, block, interpret=False):
    """Pad on device (h2d ships only the raw (N, D) points) and run."""
    n, d = x.shape
    d_pad = _round_up(max(d, 1), 128)
    n_pad = _round_up(n, int(np.lcm(q_tile, block)))
    x_pad = jnp.pad(x.astype(jnp.float32),
                    ((0, n_pad - n), (0, d_pad - d)))
    outd, outi = _knn_call(x_pad, k, n, q_tile, block, interpret)
    return outd[:n, :k], outi[:n, :k]


def knn_pallas(points, k, q_tile: int = 256, block: int = 2048,
               interpret: bool = False):
    """Exact self-kNN of ``points`` ((N, D) array) on TPU via Pallas.

    Returns (neg_sq_dists (N, k) float32 descending, indices (N, k)
    int32) — the same contract as the XLA search in ``cna_tpu.pp.knn``
    (each point is its own first neighbor at distance 0).

    ``interpret=True`` runs the kernel in the Pallas interpreter (any
    backend) for testing.
    """
    if isinstance(points, jax.Array):
        x = points.astype(jnp.float32)  # stays on device
    else:
        x = jnp.asarray(np.asarray(points, dtype=np.float32))
    return _knn_pallas_device(x, k, q_tile, block, interpret)
