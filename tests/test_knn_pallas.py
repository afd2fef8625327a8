"""Pallas exact-kNN kernel vs brute force (interpreter mode on CPU)."""

import numpy as np
import pytest

from cna_tpu.ops.knn_pallas import knn_pallas


def _brute(x, k):
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    order = np.argsort(d2, axis=1)[:, :k]
    return order, np.take_along_axis(d2, order, axis=1)


@pytest.mark.parametrize("n,d,k", [(700, 20, 10), (300, 7, 5), (1025, 40, 16)])
def test_knn_pallas_exact_recall(n, d, k):
    rng = np.random.RandomState(0)
    x = rng.randn(n, d).astype(np.float32)
    negd, idx = knn_pallas(x, k, q_tile=128, block=256, interpret=True)
    negd, idx = np.asarray(negd), np.asarray(idx)
    ref_idx, ref_d = _brute(x, k)

    # self is its own nearest neighbor
    assert (idx[:, 0] == np.arange(n)).all()
    # neighbor distances agree (ties may permute equal-distance ids)
    assert np.allclose(-negd, ref_d, atol=1e-3)
    # full recall
    recall = np.mean([len(set(idx[i]) & set(ref_idx[i])) / k
                      for i in range(n)])
    assert recall == 1.0
    # sorted ascending by distance
    assert (np.diff(negd, axis=1) <= 1e-6).all()


def test_knn_pallas_matches_xla_exact_path():
    from cna_tpu.pp.knn import knn_search

    rng = np.random.RandomState(1)
    x = rng.randn(500, 10).astype(np.float32)
    xi, xd = knn_search(x, 8, method="exact")
    negd, pi = knn_pallas(x, 8, q_tile=128, block=256, interpret=True)
    pd_ = np.sqrt(np.maximum(-np.asarray(negd), 0))
    # atol covers |x|^2+|q|^2-2qx cancellation noise at the self distance
    assert np.allclose(np.sort(xd, axis=1), np.sort(pd_, axis=1), atol=5e-3)
    recall = np.mean([len(set(np.asarray(pi)[i]) & set(xi[i])) / 8
                      for i in range(500)])
    assert recall == 1.0
