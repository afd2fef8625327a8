"""Sparse expression matrices must flow through the whole pipeline
without ever being densified (VERDICT r2 item 4: real atlases ship CSR
X; a 1M x 20k dense X would be ~80 GB)."""

import numpy as np
import pandas as pd
import scipy.sparse as sp

import cna_tpu
from cna_tpu import pp
from cna_tpu.data import CellData, synthetic_dataset


def _sparsify(d, threshold=0.6):
    """Zero out sub-threshold entries and convert X to CSR (keeps the
    archetype structure: the large entries carry the signal)."""
    x = np.asarray(d.X).copy()
    x[np.abs(x) < threshold] = 0.0
    d.X = sp.csr_matrix(x)
    return d


def test_celldata_accepts_sparse_x():
    x = sp.random(30, 10, density=0.3, format="csr", random_state=0)
    d = CellData(X=x)
    assert sp.issparse(d.X)
    sub = d[np.arange(10)]
    assert sp.issparse(sub.X) and sub.X.shape == (10, 10)


def test_h5ad_roundtrip_keeps_x_sparse(tmp_path):
    x = sp.random(40, 12, density=0.25, format="csr", random_state=1)
    d = CellData(X=x, obs=pd.DataFrame(index=[f"c{i}" for i in range(40)]))
    path = tmp_path / "sparse.h5ad"
    d.write(path)
    back = cna_tpu.read_h5ad(path)
    assert sp.issparse(back.X)
    np.testing.assert_allclose(back.X.toarray(), x.toarray())


def test_sparse_pca_matches_dense():
    rng = np.random.RandomState(0)
    x = rng.randn(500, 30)
    x[np.abs(x) < 0.8] = 0.0
    d_dense = CellData(X=x.copy())
    d_sparse = CellData(X=sp.csr_matrix(x))
    pp.pca(d_dense, n_comps=10)
    pp.pca(d_sparse, n_comps=10)
    # eigh sign ambiguity: compare column-wise up to sign
    a, b = d_dense.obsm["X_pca"], d_sparse.obsm["X_pca"]
    sign = np.sign((a * b).sum(axis=0))
    np.testing.assert_allclose(a, b * sign[None, :], rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(d_dense.uns["pca"]["variance"]),
        np.asarray(d_sparse.uns["pca"]["variance"]), rtol=1e-8)


def test_sparse_pca_chunking_matches_single_chunk():
    rng = np.random.RandomState(1)
    x = sp.random(300, 20, density=0.4, format="csr", random_state=1)
    from cna_tpu.pp.pca import _pca_sparse

    s1, e1, c1, t1 = _pca_sparse(x, 5, chunk_rows=64)
    s2, e2, c2, t2 = _pca_sparse(x, 5, chunk_rows=1000)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(e1, e2, rtol=1e-9)


def test_sparse_pca_refuses_wide_x():
    import pytest

    x = sp.random(50, 5000, density=0.01, format="csr", random_state=2)
    d = CellData(X=x)
    with pytest.raises(ValueError, match="select_hvg"):
        pp.pca(d, n_comps=10)


def test_select_hvg_picks_variable_genes():
    rng = np.random.RandomState(3)
    n, g = 400, 60
    x = rng.poisson(1.0, size=(n, g)).astype(float)
    # genes 0..9 get a strong bimodal signal (high dispersion)
    x[: n // 2, :10] += rng.poisson(8.0, size=(n // 2, 10))
    d = CellData(X=sp.csr_matrix(x))
    keep = pp.select_hvg(d, n_top=15)
    assert keep.sum() == 15
    assert keep[:10].all()  # the planted genes must all be selected
    assert sp.issparse(d.X) and d.X.shape == (n, 15)
    assert len(d.var) == 15


def test_sparse_end_to_end_association():
    """sparse X -> select_hvg -> pca -> neighbors -> association, with X
    sparse throughout; the pipeline must agree with the dense run on the
    same (post-HVG) matrix."""
    d, samplem = synthetic_dataset(n_samples=20, cells_per_sample=60,
                                   n_genes=40, seed=5, dtype=np.float64)
    d = _sparsify(d)
    assert sp.issparse(d.X)
    pp.select_hvg(d, n_top=30)
    assert sp.issparse(d.X)
    pp.pca(d, n_comps=10)
    pp.neighbors(d, n_neighbors=10)
    y = samplem["case"].astype(float)
    null_y = np.random.RandomState(7).randn(20, 40)
    p_sparse = cna_tpu.tl.association(d, y, "id", Nnull=40, null_y=null_y)
    assert sp.issparse(d.X)  # never densified

    d2 = CellData(X=np.asarray(d.X.toarray()), obs=d.obs.copy(),
                  var=d.var.copy(), samplem=samplem, sid_name="id")
    pp.pca(d2, n_comps=10)
    pp.neighbors(d2, n_neighbors=10)
    p_dense = cna_tpu.tl.association(d2, y, "id", Nnull=40, null_y=null_y)
    assert p_sparse == p_dense
