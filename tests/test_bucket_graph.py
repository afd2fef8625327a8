"""Tests for the degree-bucketed ELL format (cna_tpu.graph.buckets)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import cna_tpu
from cna_tpu.graph.buckets import (degree_ordering, from_scipy_buckets,
                                   plan_buckets)
from cna_tpu.graph.reorder import permute_graph
from cna_tpu.ops import spmm


def _skewed_graph(n=1500, seed=0):
    """Random sparse graph with a hub tail, like a UMAP union graph."""
    a = sp.random(n, n, density=0.006, random_state=seed, format="csr")
    hubs = sp.random(n, n, density=0.15, random_state=seed + 1,
                     format="csr")[:12]
    a = sp.vstack([hubs, a[12:]]).tocsr()
    return ((a + a.T) / 2).tocsr()


def test_plan_buckets_covers_and_orders():
    degs = [1, 1, 2, 9, 9, 9, 17, 400]
    plan = plan_buckets(degs, max_buckets=4, per_bucket_cost=0)
    # covers every row exactly once, in order
    assert plan[0][0] == 0 and plan[-1][1] == len(degs)
    for (s0, e0, w0), (s1, e1, w1) in zip(plan, plan[1:]):
        assert e0 == s1 and w1 > w0
    # every row fits its bucket width
    for s0, e0, w in plan:
        assert max(degs[s0:e0]) <= w
    # hub row isolated when splits are free
    assert plan[-1] == (7, 8, 400)


def test_plan_buckets_per_bucket_cost_merges():
    degs = [8] * 1000 + [16]
    assert len(plan_buckets(degs, per_bucket_cost=10**6)) == 1
    assert len(plan_buckets(degs, per_bucket_cost=0)) == 2


def test_bucket_spmm_matches_scipy():
    a = _skewed_graph()
    n = a.shape[0]
    rng = np.random.default_rng(3)
    x = rng.standard_normal((n, 11))
    ordering = degree_ordering(a)
    g = from_scipy_buckets(permute_graph(a, ordering))
    assert g.n_rows == n and g.padded_area() >= a.nnz
    got = np.asarray(spmm.bucket_spmm(g, jnp.asarray(x[ordering.perm])))
    np.testing.assert_allclose(got[ordering.inv], a @ x,
                               rtol=1e-10, atol=1e-12)


def test_from_scipy_buckets_rejects_unsorted():
    a = _skewed_graph(seed=7)
    with pytest.raises(ValueError, match="ascending-degree"):
        from_scipy_buckets(a)


def test_bucketed_fetches_below_plain_ell():
    """On a degree-skewed graph the bucketed plan must beat plain ELL."""
    from cna_tpu.graph.ell import from_scipy

    a = _skewed_graph(seed=5)
    ordering = degree_ordering(a)
    g = from_scipy_buckets(permute_graph(a, ordering))
    ell = from_scipy(a)
    plain = ell.indices.shape[0] * ell.indices.shape[1] + ell.n_overflow
    assert g.padded_area() < plain


def test_nam_bucketed_format_matches_ell(demo):
    """The NAM must be invariant to the device graph format."""
    d, _ = demo
    nam_ell, keep_ell = cna_tpu.tl.nam(d, "id")

    cna_tpu.tl.set_graph_format(d, "bucketed")
    try:
        nam_b, keep_b = cna_tpu.tl.nam(d, "id")
    finally:
        cna_tpu.tl.set_graph_format(d, "ell")

    assert np.array_equal(keep_ell, keep_b)
    np.testing.assert_allclose(nam_ell.values, nam_b.values,
                               rtol=1e-9, atol=1e-12)


def test_association_bucketed_matches_ell(demo):
    d, samplem = demo
    y = samplem["case"].astype(float)
    null_y = np.random.default_rng(11).permuted(
        np.tile(y.to_numpy(), (40, 1)).T, axis=0)
    res_ell = cna_tpu.tl.association(d, y, "id", null_y=null_y, Nnull=40,
                                     return_full=True)
    cna_tpu.tl.set_graph_format(d, "bucketed")
    try:
        res_b = cna_tpu.tl.association(d, y, "id", null_y=null_y, Nnull=40,
                                       return_full=True)
    finally:
        cna_tpu.tl.set_graph_format(d, "ell")
    assert res_ell.p == res_b.p
    np.testing.assert_allclose(res_ell.ncorrs, res_b.ncorrs,
                               rtol=1e-8, atol=1e-10)
