"""Unit tests for the two-level fine-block IVF (pp.ivf_fine /
ops.ivf_pallas) — the r4 search engine.  The Pallas kernel runs in
interpreter mode here; the real-TPU twin of the kernel check lives in
scripts/tpu_smoke.py (artifact TPU_SMOKE.json)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cna_tpu.ops.ivf_pallas import score_blocks_pallas
from cna_tpu.pp.ivf_fine import (_bucket16, _rank_blocks_centroid,
                                 build_fine_index, ivf_knn_fine)


def test_score_blocks_kernel_matches_numpy():
    """Exact top-k within the probed set, compact-coordinate ids,
    count masking — against a direct numpy computation."""
    rng = np.random.RandomState(0)
    g, d_pad, f_pad, k = 128, 128, 32, 8
    x4 = rng.randn(f_pad, g, d_pad).astype(np.float32)
    counts = rng.randint(40, g + 1, f_pad).astype(np.int32)
    counts[-4:] = 0  # dummy tail blocks
    # zero the dead rows so the reference can't accidentally match them
    for b in range(f_pad):
        x4[b, counts[b]:] = 0.0
    csum = (np.cumsum(counts) - counts).astype(np.int32)
    sel = np.asarray([0, 3, 7, 11], np.int32)
    probes = np.stack([rng.permutation(f_pad)[:16] for _ in sel]).astype(
        np.int32)
    negd, idx = score_blocks_pallas(
        jnp.asarray(x4), jnp.asarray(sel), jnp.asarray(probes),
        jnp.asarray(counts), jnp.asarray(csum), k, q_blocks=1,
        interpret=True)
    negd, idx = np.asarray(negd), np.asarray(idx)
    for si, s in enumerate(sel):
        cand, ids = [], []
        for b in probes[si]:
            cand.append(x4[b][: counts[b]])
            ids.append(csum[b] + np.arange(counts[b]))
        cand = np.concatenate(cand)
        ids = np.concatenate(ids)
        q = x4[s]
        d2 = ((q[:, None, :] - cand[None, :, :]) ** 2).sum(-1)
        order = np.argsort(d2, axis=1)[:, :k]
        for r in range(counts[s]):  # live query rows only
            got = set(idx[si, r])
            ref = set(ids[order[r]])
            assert len(got & ref) >= k - 1, (si, r)  # ties may swap tail
        np.testing.assert_allclose(
            np.sort(-negd[si, : counts[s]], axis=1),
            np.sort(d2[: counts[s]], axis=1)[:, :k], rtol=1e-3,
            atol=1e-3)


def test_rank_table_own_block_first():
    rng = np.random.RandomState(1)
    cents = jnp.asarray(rng.randn(64, 16).astype(np.float32))
    table = np.asarray(_rank_blocks_centroid(cents, 16))
    assert (table[:, 0] == np.arange(64)).all()  # self distance 0
    # each row's list is distinct blocks
    assert all(len(set(row)) == len(row) for row in table)


def test_fpad_bucket_stable_across_seeds():
    """Compiled shapes must not churn with the k-means seed / tiny size
    changes (each fresh shape is a 20-60 s tunnel compile)."""
    rng = np.random.RandomState(2)
    x = rng.randn(30_000, 12).astype(np.float32)
    f_pads = set()
    for seed in (0, 1, 2):
        idx = build_fine_index(jnp.asarray(x), 30_000, 12, seed=seed)
        f_pads.add(idx.f_pad)
    assert len(f_pads) == 1, f_pads
    assert _bucket16(1000) == _bucket16(1023)


def test_compact_coordinates_roundtrip():
    """order/layout_rows bookkeeping: every compact row maps to a unique
    layout row inside its block's live range, and order is a permutation."""
    rng = np.random.RandomState(3)
    n = 10_000
    x = rng.randn(n, 8).astype(np.float32)
    idx = build_fine_index(jnp.asarray(x), n, 8, seed=0)
    assert sorted(idx.order) == list(range(n))
    blk = idx.layout_rows // idx.g
    within = idx.layout_rows % idx.g
    assert (within < idx.blk_counts[blk]).all()
    assert len(np.unique(idx.layout_rows)) == n
    # compact index == position: csum[blk] + within is the identity
    np.testing.assert_array_equal(
        np.asarray(idx.blk_csum_dev)[blk] + within, np.arange(n))


def test_uns_recall_provenance():
    """pp.neighbors on the IVF path must record the measured operating
    point (u, coverage, held-out recall, pilot curve)."""
    from cna_tpu import pp
    from cna_tpu.data import synthetic_dataset

    d, _ = synthetic_dataset(n_samples=20, cells_per_sample=600,
                             n_genes=20, seed=5)
    pp.pca(d, n_comps=10)
    pp.neighbors(d, n_neighbors=10, method="ivf")
    info = d.uns["neighbors"]["ivf"]
    assert info["u"] >= 16
    assert 0 < info["coverage"] <= 1.5
    assert info["verify_recall"] == -1 or info["verify_recall"] > 0.5
