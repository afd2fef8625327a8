"""Device-resident symmetric graph (graph.device): parity + lazy faces.

The round-4 atlas path hands ``tl.association`` a device EllGraph built
entirely on device (``pp.neighbors`` IVF branch); these tests pin its
exact agreement with the host fuzzy-union CSR (the round-3 reference
path, itself goldened against scipy semantics) and the scipy-API
compatibility of the lazy obsp faces.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import scipy.sparse as sp

from cna_tpu.graph.device import DeviceConnectivities, build_sym_ell
from cna_tpu.graph.reorder import Reordering
from cna_tpu.pp.knn import knn_search
from cna_tpu.pp.neighbors import (fuzzy_connectivities, fuzzy_union_device,
                                  membership_strengths, smooth_knn_dist)


def _hubby_points(n=2400, seed=0):
    """A dense core inside a diffuse cloud: guarantees asymmetric kNN
    (mirror edges) and hub rows (COO spill)."""
    rng = np.random.RandomState(seed)
    return np.concatenate([
        rng.randn(n - n // 6, 10), rng.randn(n // 6, 10) * 0.05
    ]).astype(np.float32)


def _device_graph(x, k=15):
    idx, dists = knn_search(x, k, method="exact")
    idx_dev = jnp.asarray(idx)
    d_dev = jnp.asarray(dists.astype(np.float32))
    rho, sigma = smooth_knn_dist(d_dev, jnp.log2(jnp.asarray(float(k))))
    w = membership_strengths(d_dev, rho, sigma, idx_dev)
    w_sym, code = fuzzy_union_device(idx_dev, w)
    ell = build_sym_ell(idx_dev, w_sym, code)
    n = len(x)
    perm = np.arange(n)
    return idx, dists, ell, DeviceConnectivities(
        ell, Reordering(perm=perm, inv=perm.copy()), n)


def test_sym_ell_matches_host_csr():
    x = _hubby_points()
    idx, dists, ell, conn = _device_graph(x)
    ref = fuzzy_connectivities(idx, dists)
    got = conn.tocsr()
    assert got.shape == ref.shape
    assert got.nnz == ref.nnz
    assert abs(got - ref).max() == 0.0  # identical f32 edge values
    assert abs(got - got.T).nnz == 0   # float-exact symmetric
    # colsums agree with the materialized matrix (f32 accumulation)
    ref_cs = np.asarray(ref.sum(axis=0)).ravel()
    np.testing.assert_allclose(np.asarray(ell.colsums_raw), ref_cs,
                               rtol=1e-5, atol=1e-5)
    # the dense core must actually exercise the mirror/overflow machinery
    assert ell.max_degree > idx.shape[1]


def test_sorted_ext_graph_parity_and_diffusion():
    """The in-degree-bucketed mirror representation (SortedExtGraph,
    forced via ell_max_kx=0) must materialize the identical CSR and
    diffuse identically to the plain symmetric ELL."""
    import jax.numpy as jnp

    from cna_tpu.graph.device import SortedExtGraph
    from cna_tpu.ops import spmm

    x = _hubby_points(2400, seed=7)
    n, k = len(x), 12
    idx, dists = knn_search(x, k, method="exact")
    idx_dev = jnp.asarray(idx)
    d_dev = jnp.asarray(dists.astype(np.float32))
    rho, sigma = smooth_knn_dist(d_dev, jnp.log2(jnp.asarray(float(k))))
    w = membership_strengths(d_dev, rho, sigma, idx_dev)
    w_sym, code = fuzzy_union_device(idx_dev, w)
    g_ell = build_sym_ell(idx_dev, w_sym, code)
    g_srt = build_sym_ell(idx_dev, w_sym, code, ell_max_kx=0)
    assert isinstance(g_srt, SortedExtGraph), type(g_srt)
    assert len(g_srt.ext_indices) >= 2  # bucketing actually engaged

    perm = np.arange(n)
    ref = DeviceConnectivities(
        g_ell, Reordering(perm=perm, inv=perm.copy()), n).tocsr()
    got = DeviceConnectivities(
        g_srt, Reordering(perm=perm, inv=perm.copy()), n).tocsr()
    assert abs(got - ref).max() < 1e-7
    np.testing.assert_allclose(np.asarray(g_srt.colsums_raw),
                               np.asarray(g_ell.colsums_raw), rtol=1e-5,
                               atol=1e-6)

    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((n, 5)), dtype=g_ell.dtype)
    y_ell = np.asarray(spmm.diffusion_step(s, g_ell,
                                           g_ell.colsums(1.0), 1.0))
    y_srt = np.asarray(spmm.diffusion_step(s, g_srt,
                                           g_srt.colsums(1.0), 1.0))
    np.testing.assert_allclose(y_srt, y_ell, rtol=1e-5, atol=1e-6)


def test_device_graph_permuted_coordinates():
    """With a nontrivial cell ordering the materialized CSR must land in
    ORIGINAL coordinates (perm[compact] = original)."""
    x = _hubby_points(1200, seed=3)
    n, k = len(x), 10
    rng = np.random.RandomState(1)
    perm = rng.permutation(n).astype(np.int32)  # compact -> original
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n, dtype=np.int32)
    # kNN computed in COMPACT coordinates (rows permuted)
    xc = x[perm]
    idx_c, dists_c = knn_search(xc, k, method="exact")
    idx_dev = jnp.asarray(idx_c)
    d_dev = jnp.asarray(dists_c.astype(np.float32))
    rho, sigma = smooth_knn_dist(d_dev, jnp.log2(jnp.asarray(float(k))))
    w = membership_strengths(d_dev, rho, sigma, idx_dev)
    w_sym, code = fuzzy_union_device(idx_dev, w)
    ell = build_sym_ell(idx_dev, w_sym, code)
    conn = DeviceConnectivities(ell, Reordering(perm=perm, inv=inv), n)
    # reference: same pipeline in original coordinates
    idx_o, dists_o = knn_search(x, k, method="exact")
    ref = fuzzy_connectivities(idx_o, dists_o)
    got = conn.tocsr()
    assert abs(got - ref).max() < 1e-6


def test_lazy_faces_scipy_compat():
    x = _hubby_points(1200, seed=2)
    idx, dists, ell, conn = _device_graph(x, k=10)
    # scipy-style attribute/method access delegates to the CSR
    assert conn.shape == (1200, 1200)
    assert conn.nnz > 0
    row = conn[5]
    assert sp.issparse(row)
    # scipy FUNCTIONS type-check their input, so they get the real CSR
    assert sp.triu(conn.tocsr(), k=1).nnz * 2 == conn.nnz  # sym, no diag


def test_checkpoint_fingerprint_device_graph():
    """NAM savepoint fingerprinting must work without materializing the
    device graph, and distinguish different graphs."""
    from cna_tpu.utils.checkpoint import _graph_fingerprint

    x = _hubby_points(1200, seed=4)
    _, _, _, conn_a = _device_graph(x, k=10)
    _, _, _, conn_b = _device_graph(x[::-1].copy(), k=10)
    codes = np.arange(1200, dtype=np.int32) % 7
    fa = _graph_fingerprint(conn_a, codes, None, 1)
    fa2 = _graph_fingerprint(conn_a, codes, None, 1)
    fb = _graph_fingerprint(conn_b, codes, None, 1)
    assert fa == fa2
    assert fa != fb
    assert conn_a._csr is None  # no materialization happened


def test_diffuse_stepwise_device_graph():
    """Public diffusion primitive must honor the device graph's cell
    ordering: each yielded step is in the caller's cell order."""
    import pandas as pd

    import cna_tpu
    from cna_tpu.data import CellData

    x = _hubby_points(1200, seed=5)
    n = len(x)
    obs = pd.DataFrame(index=[f"c{i}" for i in range(n)])
    d = CellData(X=x, obs=obs)

    idx, dists, ell, conn = _device_graph(x, k=10)
    rng = np.random.RandomState(0)
    perm = rng.permutation(n).astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n, dtype=np.int32)
    # rebuild the same graph in a shuffled compact order
    xc = x[perm]
    idx_c, dists_c = knn_search(xc, 10, method="exact")
    idx_dev = jnp.asarray(idx_c)
    d_dev = jnp.asarray(dists_c.astype(np.float32))
    rho, sigma = smooth_knn_dist(d_dev, jnp.log2(jnp.asarray(10.0)))
    w = membership_strengths(d_dev, rho, sigma, idx_dev)
    w_sym, code = fuzzy_union_device(idx_dev, w)
    ell_c = build_sym_ell(idx_dev, w_sym, code)
    d.obsp["connectivities"] = DeviceConnectivities(
        ell_c, Reordering(perm=perm, inv=inv), n)

    d_ref = CellData(X=x, obs=obs.copy())
    d_ref.obsp["connectivities"] = conn.tocsr()

    s0 = rng.rand(n, 3)
    steps = [np.asarray(s) for s in
             cna_tpu.tl.diffuse_stepwise(d, s0, maxnsteps=3)]
    steps_ref = [np.asarray(s) for s in
                 cna_tpu.tl.diffuse_stepwise(d_ref, s0, maxnsteps=3)]
    for a, b in zip(steps, steps_ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)


def test_degraded_recall_association_fidelity():
    """VERDICT r3 item 7: a deliberately LOW-recall graph (~0.75-0.85)
    must still produce association outputs close to the exact graph —
    the guard that the pipeline's min_recall=0.9 default sits on a
    plateau, not a cliff."""
    import pandas as pd

    import cna_tpu
    from cna_tpu import pp
    from cna_tpu.data import synthetic_dataset
    from cna_tpu.pp.ivf import ivf_knn, measured_recall

    d_ex, samplem = synthetic_dataset(
        n_samples=40, cells_per_sample=300, n_genes=30, seed=11)
    d_dg, _ = synthetic_dataset(
        n_samples=40, cells_per_sample=300, n_genes=30, seed=11)
    y = samplem["case"].astype(float)

    pp.pca(d_ex, n_comps=20)
    pp.neighbors(d_ex, n_neighbors=15, method="exact")

    pp.pca(d_dg, n_comps=20)
    rep = d_dg.obsm["X_pca"]
    idx, dists = ivf_knn(np.asarray(rep, np.float32), 15, u0=1, g=64,
                         min_recall=None, seed=0)
    rec = measured_recall(np.asarray(rep, np.float32), idx, 15, seed=3)
    assert rec < 0.92, f"degradation did not engage (recall {rec})"
    conn = fuzzy_connectivities(idx, dists)
    d_dg.obsp["connectivities"] = conn
    d_dg.obsp["distances"] = conn  # placeholder, unused

    res_ex = cna_tpu.tl.association(d_ex, y, "id", Nnull=500, seed=0,
                                    return_full=True)
    res_dg = cna_tpu.tl.association(d_dg, y, "id", Nnull=500, seed=0,
                                    return_full=True)
    assert (res_ex.p < 0.05) == (res_dg.p < 0.05)
    r = np.corrcoef(np.asarray(res_ex.ncorrs),
                    np.asarray(res_dg.ncorrs))[0, 1]
    assert r > 0.97, (r, rec)


def test_atlas_scale_recall_fidelity_100k():
    """VERDICT r4 item 2 (open since r2): at a scale where IVF recall
    genuinely degrades (100k cells), a capped-probe-budget graph with
    recall ~0.85-0.9 must still reproduce the association outputs of a
    near-exact graph — the evidence that sub-quadratic kNN can replace
    the reference's exact scanpy graph at atlas scale without moving
    the science.  (The 12k test above exercises the mechanism; this one
    exercises the operating regime.)"""
    import cna_tpu
    from cna_tpu import pp
    from cna_tpu.data import synthetic_dataset
    from cna_tpu.pp.ivf import ivf_knn, measured_recall

    n_samples, cells_per = 50, 2000  # 100k cells
    d_ex, samplem = synthetic_dataset(
        n_samples=n_samples, cells_per_sample=cells_per, n_genes=30,
        seed=13, structure="manifold")
    d_dg, _ = synthetic_dataset(
        n_samples=n_samples, cells_per_sample=cells_per, n_genes=30,
        seed=13, structure="manifold")
    y = samplem["case"].astype(float)

    # near-exact side: approx_max_k blocked search (recall >= ~0.99 —
    # the role scanpy's own approximate kNN plays for the reference)
    pp.pca(d_ex, n_comps=20)
    pp.neighbors(d_ex, n_neighbors=15, method="approx")

    # degraded side: capped probe budget, no escalation
    pp.pca(d_dg, n_comps=20)
    rep = np.asarray(d_dg.obsm["X_pca"], np.float32)
    idx, dists = ivf_knn(rep, 15, u0=1, g=64, min_recall=None, seed=0)
    rec = measured_recall(rep, idx, 15, seed=3, exact=False)
    assert rec < 0.93, f"degradation did not engage (recall {rec})"
    assert rec > 0.7, f"graph too degraded to be a fair probe ({rec})"
    conn = fuzzy_connectivities(idx, dists)
    d_dg.obsp["connectivities"] = conn
    d_dg.obsp["distances"] = conn  # placeholder, unused

    res_ex = cna_tpu.tl.association(d_ex, y, "id", Nnull=200, seed=0,
                                    return_full=True)
    res_dg = cna_tpu.tl.association(d_dg, y, "id", Nnull=200, seed=0,
                                    return_full=True)
    # global decision is rank-stable and per-cell coefficients track
    assert (res_ex.p < 0.05) == (res_dg.p < 0.05), (res_ex.p, res_dg.p)
    r = np.corrcoef(np.asarray(res_ex.ncorrs),
                    np.asarray(res_dg.ncorrs))[0, 1]
    assert r > 0.97, (r, rec)
