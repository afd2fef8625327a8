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
