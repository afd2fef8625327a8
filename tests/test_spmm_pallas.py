"""Banded Pallas SpMM vs the ELL gather path (interpreter mode on CPU)."""

import numpy as np
import pytest
import scipy.sparse as sp

from cna_tpu.graph.ell import from_scipy
from cna_tpu.ops.spmm import graph_spmm
from cna_tpu.ops.spmm_pallas import (banded_from_ell, banded_spmm,
                                     diffusion_step_banded,
                                     _banded_spmm_xla)


def _banded_random_graph(n, k, band, seed=0, long_range_frac=0.05):
    """Symmetric weighted graph with mostly-local neighbors."""
    rng = np.random.RandomState(seed)
    rows, cols = [], []
    for i in range(n):
        local = i + rng.randint(-band, band + 1, size=k)
        far = rng.randint(0, n, size=max(1, int(k * long_range_frac)))
        nbrs = np.unique(np.clip(np.concatenate([local, far]), 0, n - 1))
        nbrs = nbrs[nbrs != i]
        rows.extend([i] * len(nbrs))
        cols.extend(nbrs)
    w = rng.rand(len(rows)) * 0.9 + 0.1
    a = sp.csr_matrix((w, (rows, cols)), shape=(n, n))
    a = a + a.T  # symmetric
    return a.tocsr()


@pytest.mark.parametrize("n,s", [(600, 12), (1024, 40)])
def test_banded_matches_gather_spmm(n, s):
    a = _banded_random_graph(n, k=8, band=60)
    ell = from_scipy(a)
    banded = banded_from_ell(ell, row_tile=128, window=128)
    assert banded.band_fraction() > 0.8

    rng = np.random.RandomState(1)
    x = rng.rand(n, s).astype(ell.dtype)

    y_ell = np.asarray(graph_spmm(ell, x))
    y_banded = np.asarray(banded_spmm(banded, x, interpret=True))
    np.testing.assert_allclose(y_banded, y_ell, rtol=2e-5, atol=1e-5)

    # independent XLA twin of the kernel semantics (+ spill/COO tails)
    import jax.numpy as jnp
    s_pad = ((s + 127) // 128) * 128
    x_pad = jnp.zeros((banded.lidx.shape[0], s_pad), x.dtype)
    x_pad = x_pad.at[:n, :s].set(x)
    y_xla = np.asarray(_banded_spmm_xla(
        banded.lidx, banded.weights, banded.slab_starts, x_pad,
        banded.row_tile, banded.slab_rows))[:n, :s]
    from cna_tpu.ops.spmm import coo_spmm_add, ell_spmm
    if banded.spill_indices.shape[1]:
        y_xla = y_xla + np.asarray(ell_spmm(
            banded.spill_indices, banded.spill_weights, jnp.asarray(x)))
    y_xla = np.asarray(coo_spmm_add(
        jnp.asarray(y_xla), banded.overflow_rows, banded.overflow_cols,
        banded.overflow_weights, jnp.asarray(x)))
    np.testing.assert_allclose(y_xla, y_ell, rtol=2e-5, atol=1e-5)


def test_banded_diffusion_step_matches_reference_formula():
    n, s = 512, 10
    a = _banded_random_graph(n, k=6, band=40, seed=3)
    ell = from_scipy(a)
    banded = banded_from_ell(ell, row_tile=128, window=64)

    rng = np.random.RandomState(2)
    x = rng.rand(n, s).astype(ell.dtype)
    colsums = np.asarray(banded.colsums(1.0))

    got = np.asarray(diffusion_step_banded(
        x, banded, colsums, 1.0, interpret=True))
    t = x / colsums[:, None]
    want = a @ t + t
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_fully_out_of_band_edges_spill_to_coo():
    n = 300
    rng = np.random.RandomState(4)
    # purely random graph: nothing is in a +-16 band
    rows = np.repeat(np.arange(n), 4)
    cols = rng.randint(0, n, 4 * n)
    keep = rows != cols
    a = sp.csr_matrix((rng.rand(keep.sum()), (rows[keep], cols[keep])),
                      shape=(n, n))
    a = (a + a.T).tocsr()
    ell = from_scipy(a)
    banded = banded_from_ell(ell, row_tile=64, window=16)
    x = rng.rand(n, 8).astype(ell.dtype)
    y_ell = np.asarray(graph_spmm(ell, x))
    y_banded = np.asarray(banded_spmm(banded, x, interpret=True))
    np.testing.assert_allclose(y_banded, y_ell, rtol=2e-5, atol=1e-5)


def test_banded_format_nam_matches_ell():
    """tl.nam with set_graph_format('banded') == the default ELL path."""
    import pandas as pd

    import cna_tpu
    from cna_tpu import pp

    rng = np.random.RandomState(5)
    n_samples, cells_per = 12, 120
    t = rng.rand(n_samples * cells_per, 2) * 3
    proj = rng.randn(2, 12)
    X = np.sin(t @ proj) + 0.05 * rng.randn(n_samples * cells_per, 12)
    obs = pd.DataFrame(
        {"sid": np.repeat([f"s{i}" for i in range(n_samples)], cells_per)},
        index=[f"c{i}" for i in range(len(X))])
    d = cna_tpu.CellData(X=X.astype(np.float64), obs=obs)
    pp.pca(d, n_comps=8)
    pp.neighbors(d, n_neighbors=8)

    nam_ell, keep_ell = cna_tpu.tl.nam(d, "sid", nsteps=3)
    cna_tpu.tl.set_graph_format(d, "banded")
    nam_banded, keep_banded = cna_tpu.tl.nam(d, "sid", nsteps=3)
    cna_tpu.tl.set_graph_format(d, "ell")

    assert (keep_ell == keep_banded).all()
    np.testing.assert_allclose(nam_banded.to_numpy(), nam_ell.to_numpy(),
                               rtol=1e-8, atol=1e-10)
