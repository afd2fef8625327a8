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


def test_spectral_init_matches_eigsh():
    """LOBPCG spectral init reproduces ARPACK's smallest non-trivial
    eigenvectors of the normalized Laplacian (up to sign)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    from cna_tpu.pp.umap import spectral_init

    # ring-of-clusters graph with a clean spectral structure
    rng = np.random.RandomState(0)
    n = 1500
    pts = np.concatenate([
        rng.randn(n // 3, 5) + 6 * np.eye(5)[i][None, :] for i in range(3)])
    from cna_tpu.pp.knn import knn_search
    from cna_tpu.pp.neighbors import fuzzy_connectivities

    idx, dists = knn_search(pts, 10)
    conn = fuzzy_connectivities(idx, dists)

    emb, mode = spectral_init(conn, n_components=2, seed=0)
    assert mode == "spectral"

    deg = np.asarray(conn.sum(axis=1)).ravel()
    deg[deg == 0] = 1
    dis = sp.diags(1.0 / np.sqrt(deg))
    lap = (sp.identity(conn.shape[0]) - dis @ conn @ dis).tocsr()
    vals, _ = spl.eigsh(lap, k=3, sigma=0.0, which="LM")
    ref_vals = np.sort(vals)[1:3]

    # the returned directions are converged eigenvectors: tiny residual
    # and Rayleigh quotients matching ARPACK's eigenvalues.  (The
    # eigenvectors themselves are only defined up to rotation when the
    # cluster structure makes the low eigenvalues nearly degenerate, so
    # compare the invariants, not the vectors.)
    v = emb.astype(np.float64)
    v /= np.linalg.norm(v, axis=0, keepdims=True)
    rq = np.einsum("ij,ij->j", v, lap @ v)
    resid = np.linalg.norm(lap @ v - v * rq[None, :], axis=0)
    assert np.all(resid < 1e-2), resid
    assert np.all(rq < ref_vals[-1] + 1e-3), (rq, ref_vals)


def test_umap_records_spectral_init(demo):
    d, _ = demo
    pp.umap(d, n_epochs=10, seed=1)
    assert d.uns["umap"]["init"] == "spectral"
