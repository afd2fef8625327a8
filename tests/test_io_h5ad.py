"""Round-trip tests for the h5ad reader/writer."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from cna_tpu import CellData, pp
from cna_tpu.data.io_h5ad import read_h5ad, write_h5ad


def test_h5ad_roundtrip(tmp_path, demo):
    d, _ = demo
    path = tmp_path / "demo.h5ad"
    write_h5ad(d, path)
    d2 = read_h5ad(path)

    assert d2.n_obs == d.n_obs and d2.n_vars == d.n_vars
    np.testing.assert_allclose(d2.X, d.X)
    assert list(d2.obs.columns) == list(d.obs.columns)
    assert list(d2.obs.index) == list(d.obs.index)
    np.testing.assert_array_equal(d2.obs["id"].to_numpy(), d.obs["id"].to_numpy())
    np.testing.assert_allclose(d2.obsm["X_pca"], d.obsm["X_pca"])
    a, b = d.obsp["connectivities"], d2.obsp["connectivities"]
    assert (abs(a - b)).max() == 0
    assert d2.uns["neighbors"]["params"]["n_neighbors"] == 15


def test_h5ad_categorical_and_bool(tmp_path):
    obs = pd.DataFrame({
        "grp": pd.Categorical(["a", "b", "a", "c"]),
        "flag": [True, False, True, True],
        "val": [1.5, 2.5, 3.5, 4.5],
    }, index=[f"c{i}" for i in range(4)])
    d = CellData(X=np.eye(4, 3), obs=obs)
    path = tmp_path / "cat.h5ad"
    write_h5ad(d, path)
    d2 = read_h5ad(path)
    np.testing.assert_array_equal(np.asarray(d2.obs["grp"]), ["a", "b", "a", "c"])
    np.testing.assert_array_equal(d2.obs["flag"].to_numpy(), obs["flag"].to_numpy())
    np.testing.assert_allclose(d2.obs["val"].to_numpy(), obs["val"].to_numpy())


def test_h5ad_association_on_loaded(tmp_path, demo):
    """The pipeline consumes a freshly loaded file (graph import path)."""
    import cna_tpu

    d, samplem = demo
    path = tmp_path / "demo2.h5ad"
    write_h5ad(d, path)
    d2 = read_h5ad(path)
    y = samplem["case"].astype(float)
    p = cna_tpu.tl.association(d2, y, "id", Nnull=100, seed=0)
    assert 0 < p <= 1
