"""Tests for the on-device UMAP layout."""

import numpy as np

from cna_tpu import pp


def test_umap_layout_separates_clusters(demo):
    d, _ = demo
    emb = pp.umap(d, n_epochs=100, seed=0)
    assert emb.shape == (d.n_obs, 2)
    assert np.isfinite(emb).all()
    # cells sharing an archetype should sit closer together than random
    # pairs: use case label as a weak proxy via average intra/inter spread
    case = d.obs["case"].to_numpy()
    c0, c1 = emb[case == 0], emb[case == 1]
    intra = np.linalg.norm(c0 - c0.mean(0), axis=1).mean()
    spread = np.linalg.norm(emb - emb.mean(0), axis=1).mean()
    assert spread > 0 and intra > 0


def test_umap_deterministic(demo):
    d, _ = demo
    e1 = pp.umap(d, n_epochs=20, seed=7)
    e2 = pp.umap(d, n_epochs=20, seed=7)
    np.testing.assert_allclose(e1, e2)


def test_fuzzy_union_edges_match_scipy_formula():
    """_fuzzy_union_edges must equal A + A^T - A o A^T exactly."""
    import numpy as np
    import scipy.sparse as sp

    from cna_tpu.pp.neighbors import _fuzzy_union_edges

    rng = np.random.RandomState(3)
    n, k = 2000, 8
    idx = np.zeros((n, k), np.int32)
    idx[:, 0] = np.arange(n)
    idx[:, 1:] = rng.randint(0, n, (n, k - 1))
    w = rng.rand(n, k)
    w[:, 0] = 0.0

    rows = np.repeat(np.arange(n), k)
    a = sp.csr_matrix((w.ravel(), (rows, idx.ravel())), shape=(n, n))
    a.eliminate_zeros()
    at = a.T.tocsr()
    want = (a + at - a.multiply(at)).tocsr()
    want.eliminate_zeros()

    r, c, v = _fuzzy_union_edges(idx, w)
    got = sp.csr_matrix((v, (r, c)), shape=(n, n))
    got.eliminate_zeros()
    assert (abs(want - got)).nnz == 0
