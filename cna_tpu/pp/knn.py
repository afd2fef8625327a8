"""Exact k-nearest-neighbor search on device.

The reference outsources kNN to scanpy/pynndescent (approximate, CPU).
Here kNN is a first-class on-device primitive: blocked brute force —
squared distances ``|q|^2 + |x|^2 - 2 q.x`` where the cross term is an
MXU matmul, with a running top-k merge across key blocks so the full
N x N distance matrix is never materialized.  Exact (recall 1.0) by
construction; a Pallas-fused variant lives in ``cna_tpu.ops.knn_pallas``.

Matches the scanpy convention of including each point as its own first
neighbor (distance 0), which downstream fuzzy-connectivity code expects.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "key_block", "n", "method"))
def _knn_query_block(q, x, sq_norms, k, key_block, n, method="exact"):
    """Top-k nearest rows of x (first ``n`` rows are real, rest padding)
    for each row of q, merging over key blocks.

    ``method='exact'`` merges with full ``lax.top_k``;
    ``method='approx'`` reduces each key block with
    ``jax.lax.approx_max_k`` — XLA's TPU PartialReduce op, the
    peak-FLOPs approach of the TPU-KNN paper (PAPERS.md: "TPU-KNN: K
    Nearest Neighbor Search at Peak FLOP/s") — at 0.99 per-block recall.

    Returns (neg_sq_dists (Q, k) descending, indices (Q, k)).
    """
    nq = q.shape[0]
    q_norms = jnp.sum(q * q, axis=1, keepdims=True)  # (Q, 1)
    nblocks = x.shape[0] // key_block

    def body(carry, b):
        best_d, best_i = carry
        start = b * key_block
        xb = jax.lax.dynamic_slice_in_dim(x, start, key_block, axis=0)
        nb = jax.lax.dynamic_slice_in_dim(sq_norms, start, key_block, axis=0)
        cross = q @ xb.T  # (Q, key_block) — MXU
        d2 = q_norms + nb[None, :] - 2.0 * cross
        idx = (start + jnp.arange(key_block)).astype(jnp.int32)
        # mask out-of-range padding rows
        valid = idx < n
        negd = jnp.where(valid[None, :], -d2, -jnp.inf)
        if method == "approx":
            blk_d, blk_pos = jax.lax.approx_max_k(negd, k, recall_target=0.99)
            blk_i = idx[blk_pos]
        else:
            blk_d, blk_i = negd, jnp.broadcast_to(idx[None, :], (nq, key_block))
        cat_d = jnp.concatenate([best_d, blk_d], axis=1)
        cat_i = jnp.concatenate([best_i, blk_i], axis=1)
        top_d, top_pos = jax.lax.top_k(cat_d, k)
        top_i = jnp.take_along_axis(cat_i, top_pos, axis=1)
        return (top_d, top_i), None

    init = (
        jnp.full((nq, k), -jnp.inf, dtype=q.dtype),
        jnp.zeros((nq, k), dtype=jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(body, init, jnp.arange(nblocks))
    return best_d, best_i.astype(jnp.int32)


_AUTO_EXACT_MAX_N = 20_000
_AUTO_IVF_MIN_N = 262_144


def resolve_method(n, method):
    """Resolve 'auto' to a concrete kNN method for ``n`` points (see
    ``knn_search``); explicit methods pass through unchanged."""
    if method != "auto":
        return method
    if n <= _AUTO_EXACT_MAX_N:
        return "exact"
    if n > _AUTO_IVF_MIN_N:
        return "ivf"
    if jax.devices()[0].platform == "tpu":
        return "pallas"
    return "approx"


def knn_search(points, k, query_block=4096, key_block=8192, method="auto"):
    """kNN of ``points`` against themselves.

    Returns (indices (N, k) int32, distances (N, k) float) with neighbors
    sorted by increasing distance; each point is its own first neighbor.

    ``method``:
      * ``'exact'`` — full ``lax.top_k`` merge per key block; recall 1.0
        but the TPU top-k over (query_block, key_block)-wide slabs is the
        dominant cost at scale.
      * ``'pallas'`` — the fused Pallas kernel in
        ``cna_tpu.ops.knn_pallas``: recall 1.0 with the distance tile and
        running top-k kept in VMEM (faster than ``'approx'`` at 100k
        cells on v5e). TPU only.
      * ``'approx'`` — ``jax.lax.approx_max_k`` (the TPU PartialReduce op
        of the TPU-KNN paper) reduces each key block to k candidates at
        >= ~0.99 per-block recall before the exact merge — the role
        pynndescent's approximate search plays upstream of the reference
        (scanpy's default kNN is itself approximate).
      * ``'ivf'`` — on-device IVF-flat index (``cna_tpu.pp.ivf``):
        sub-quadratic, the only tractable single-chip option at 1M+
        cells; recall ~0.97 on manifold-structured embeddings.
      * ``'auto'`` (default) — exact up to atlas scale (XLA to 20k, the
        Pallas kernel beyond on TPU), IVF past ~260k points where the
        O(N^2) exact search stops being worth it; approx on non-TPU
        backends between 20k and 260k.
    """
    x = jnp.asarray(points)
    n = x.shape[0]
    method = resolve_method(n, method)
    if method == "pallas":
        from ..ops.knn_pallas import knn_pallas

        # Mosaic kernels only lower on TPU; elsewhere run the (slow)
        # Pallas interpreter so explicit method='pallas' stays correct
        interpret = jax.devices()[0].platform != "tpu"
        neg_d, indices = knn_pallas(points, k, interpret=interpret)
        dists = jnp.sqrt(jnp.maximum(-neg_d, 0.0))
        return np.asarray(indices), np.asarray(dists)
    if method == "ivf":
        from .ivf import ivf_knn

        return ivf_knn(np.asarray(points), k)
    # pad key axis so dynamic slices stay in bounds
    nkb = -(-n // key_block)
    pad = nkb * key_block - n
    x_padded = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    sq_norms = jnp.sum(x_padded * x_padded, axis=1)

    all_d, all_i = [], []
    for start in range(0, n, query_block):
        q = x[start : start + query_block]
        negd, idx = _knn_query_block(q, x_padded, sq_norms, k, key_block, n,
                                     method=method)
        all_d.append(negd)
        all_i.append(idx)
    neg_d = jnp.concatenate(all_d, axis=0)
    indices = jnp.concatenate(all_i, axis=0)
    # numerical floor: exact self-distance can come out as tiny negative
    dists = jnp.sqrt(jnp.maximum(-neg_d, 0.0))
    return np.asarray(indices), np.asarray(dists)
