"""IVF kNN index: recall against exact search on manifold data (CPU)."""

import numpy as np

from cna_tpu.pp.ivf import ivf_knn
from cna_tpu.pp.knn import knn_search


def _manifold_points(n, d_latent=2, d=20, seed=0):
    rng = np.random.RandomState(seed)
    t = rng.rand(n, d_latent) * 4
    proj = rng.randn(d_latent, d)
    return (np.sin(t @ proj) + 0.05 * rng.randn(n, d)).astype(np.float32)


def test_ivf_recall_manifold():
    n, k = 12_000, 10
    x = _manifold_points(n)
    idx, dist = ivf_knn(x, k, seed=0)
    ei, _ = knn_search(x, k, method="exact")
    recall = np.mean([len(set(idx[i]) & set(ei[i])) / k
                      for i in range(0, n, 11)])
    assert recall > 0.93
    # contract: self first at distance 0, distances ascending
    assert (idx[:, 0] == np.arange(n)).all()
    assert (dist[:, 0] == 0).all()
    assert (np.diff(dist, axis=1) >= -1e-5).all()


def test_ivf_handles_unbalanced_clusters():
    # one dense blob + a sparse tail: clusters span multiple slots
    rng = np.random.RandomState(1)
    x = np.concatenate([
        rng.randn(5000, 8) * 0.1,             # dense blob
        rng.randn(600, 8) * 3.0 + 5.0,        # diffuse far group
    ]).astype(np.float32)
    # probe everything: recall must be ~perfect regardless of balance —
    # this is the correctness check that clusters spanning multiple
    # slots are fully covered (a dense isotropic blob has no exploitable
    # structure, so PARTIAL probing legitimately tracks probe mass)
    idx, dist = ivf_knn(x, 8, n_clusters=16, nprobe=16, seed=0)
    assert idx.shape == (5600, 8)
    ei, _ = knn_search(x, 8, method="exact")
    recall = np.mean([len(set(idx[i]) & set(ei[i])) / 8
                      for i in range(0, 5600, 13)])
    assert recall > 0.99
