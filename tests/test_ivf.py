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


def test_ivf_recall_escalation():
    """Starting from a hopeless probe count, the measured-recall loop
    must escalate until the returned neighbors actually meet the floor."""
    n, k = 12_000, 10
    x = _manifold_points(n, seed=3)
    idx, _ = ivf_knn(x, k, u0=1, min_recall=0.95, seed=0)
    ei, _ = knn_search(x, k, method="exact")
    recall = np.mean([len(set(idx[i]) & set(ei[i])) / k
                      for i in range(0, n, 11)])
    # the floor is enforced on a 512-query sample; full-population recall
    # tracks it closely
    assert recall > 0.92, recall


def test_ivf_association_fidelity(capsys):
    """VERDICT r1 item 6: an IVF-built graph must reproduce the numbers
    atlas users care about — global p and per-cell ncorrs — against the
    exact graph, at a scale where IVF is a real approximation."""
    import pandas as pd

    import cna_tpu
    from cna_tpu import pp
    from cna_tpu.data import synthetic_dataset

    d_ex, samplem = synthetic_dataset(
        n_samples=40, cells_per_sample=500, n_genes=30, seed=7)
    d_iv, _ = synthetic_dataset(
        n_samples=40, cells_per_sample=500, n_genes=30, seed=7)
    y = samplem["case"].astype(float)

    pp.pca(d_ex, n_comps=20)
    pp.neighbors(d_ex, n_neighbors=15, method="exact")
    pp.pca(d_iv, n_comps=20)
    pp.neighbors(d_iv, n_neighbors=15, method="ivf")

    res_ex = cna_tpu.tl.association(
        d_ex, y, "id", Nnull=500, seed=0, return_full=True)
    res_iv = cna_tpu.tl.association(
        d_iv, y, "id", Nnull=500, seed=0, return_full=True)

    # global decision is rank-stable: same side of 0.05, p within noise
    assert (res_ex.p < 0.05) == (res_iv.p < 0.05), (res_ex.p, res_iv.p)
    assert abs(res_ex.p - res_iv.p) < 0.02 + 0.5 * max(res_ex.p, res_iv.p)
    # per-cell neighborhood coefficients nearly identical
    r = np.corrcoef(np.asarray(res_ex.ncorrs), np.asarray(res_iv.ncorrs))[0, 1]
    assert r > 0.99, r


def test_ivf_pilot_calibration(capsys):
    """With many slots, the probe count is calibrated on a slot-subsample
    pilot (one full search) instead of repeated full-search doublings;
    the result must still meet the recall floor starting from a hopeless
    probe count."""
    n, k = 20_000, 10
    x = _manifold_points(n, seed=5)
    idx, _ = ivf_knn(x, k, n_clusters=256, u0=1, min_recall=0.9,
                     seed=0)
    err = capsys.readouterr().err
    assert "pp.ivf pilot" in err, err  # the pilot actually engaged
    ei, _ = knn_search(x, k, method="exact")
    recall = np.mean([len(set(idx[i]) & set(ei[i])) / k
                      for i in range(0, n, 17)])
    assert recall > 0.87, recall


def test_ivf_handles_unbalanced_clusters():
    # one dense blob + a sparse tail: clusters span multiple slots
    rng = np.random.RandomState(1)
    x = np.concatenate([
        rng.randn(5000, 8) * 0.1,             # dense blob
        rng.randn(600, 8) * 3.0 + 5.0,        # diffuse far group
    ]).astype(np.float32)
    # probe everything: recall must be ~perfect regardless of balance —
    # this is the correctness check that clusters spanning multiple
    # blocks are fully covered (a dense isotropic blob has no exploitable
    # structure, so PARTIAL probing legitimately tracks probe mass)
    idx, dist = ivf_knn(x, 8, n_clusters=16, u0=10**5, min_recall=None,
                        seed=0)
    assert idx.shape == (5600, 8)
    ei, _ = knn_search(x, 8, method="exact")
    recall = np.mean([len(set(idx[i]) & set(ei[i])) / 8
                      for i in range(0, 5600, 13)])
    assert recall > 0.99


def test_ivf_pallas_path_interpret():
    """The TPU scoring kernel (ops.ivf_pallas) run through the Pallas
    interpreter must produce a high-recall index and honor the
    knn_search contract, matching the XLA scorer's behavior."""
    from cna_tpu.pp.ivf import ivf_knn, measured_recall

    rng = np.random.RandomState(3)
    centers = rng.randn(16, 8) * 6
    x = np.concatenate([c + rng.randn(150, 8) for c in centers]).astype(
        np.float32)
    n = len(x)
    idx, dists = ivf_knn(x, 10, seed=0, pallas_interpret=True, g=64,
                         n_clusters=32, min_recall=0.9)
    rec = measured_recall(x, idx, 10, seed=5)
    assert rec > 0.9, rec
    assert (idx[:, 0] == np.arange(n)).all()
    assert np.all(np.diff(dists[:, 1:], axis=1) >= -1e-4)
