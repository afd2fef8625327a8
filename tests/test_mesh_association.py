"""End-to-end association on a virtual device mesh must match single-device."""

import jax
import numpy as np

import cna_tpu
from cna_tpu.parallel import make_mesh


def test_association_on_mesh_matches(demo):
    d, samplem = demo
    y = samplem["case"].astype(float)
    null_y = np.random.RandomState(9).randn(50, 64)

    res_single = cna_tpu.tl.association(d, y, "id", Nnull=64, null_y=null_y,
                                        return_full=True)
    assert d.uns["_cna_tpu_diffusion_path"] == "local"
    mesh = make_mesh(jax.devices()[:8], perms=2)
    res_mesh = cna_tpu.tl.association(d, y, "id", Nnull=64, null_y=null_y,
                                      mesh=mesh, return_full=True)
    # the production mesh path is the explicit halo exchange, not the
    # GSPMD all-gather fallback
    assert d.uns["_cna_tpu_diffusion_path"] == "halo"

    assert res_single.p == res_mesh.p
    assert res_single.k == res_mesh.k
    np.testing.assert_allclose(res_single.ncorrs, res_mesh.ncorrs,
                               rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(res_single.fdrs.fdr.values,
                               res_mesh.fdrs.fdr.values,
                               rtol=1e-8, atol=1e-11)


def test_nam_on_mesh_matches(demo):
    d, samplem = demo
    nam_single, keep_s = cna_tpu.tl._nam.nam_arrays(d, "id")
    mesh = make_mesh(jax.devices()[:4], perms=1)
    nam_mesh, keep_m = cna_tpu.tl._nam.nam_arrays(d, "id", mesh=mesh)
    assert d.uns["_cna_tpu_diffusion_path"] == "halo"
    assert np.array_equal(keep_s, keep_m)
    np.testing.assert_allclose(np.asarray(nam_single.nam),
                               np.asarray(nam_mesh.nam),
                               rtol=1e-10, atol=1e-13)


def test_mesh_gspmd_fallback_on_explicit_format(demo):
    """A user-pinned non-ELL graph format has no halo plan; the mesh path
    must fall back to the GSPMD row-sharded diffusion and still match."""
    d, samplem = demo
    nam_single, _ = cna_tpu.tl._nam.nam_arrays(d, "id")
    cna_tpu.tl.set_graph_format(d, "bucketed")
    try:
        mesh = make_mesh(jax.devices()[:4], perms=1)
        nam_mesh, _ = cna_tpu.tl._nam.nam_arrays(d, "id", mesh=mesh)
        assert d.uns["_cna_tpu_diffusion_path"] == "gspmd"
        np.testing.assert_allclose(np.asarray(nam_single.nam),
                                   np.asarray(nam_mesh.nam),
                                   rtol=1e-10, atol=1e-13)
    finally:
        d.uns.pop("_cna_tpu_graph_format", None)


def test_mesh_fused_fdr_matches_dense(demo, monkeypatch):
    """The fused FDR histogram composed with the mesh (shard_map + psum)
    must reproduce the dense single-device FDR curve exactly."""
    from cna_tpu.tools import _association as assoc_mod

    d, samplem = demo
    y = samplem["case"].astype(float)
    null_y = np.random.RandomState(11).randn(50, 64)

    res_dense = cna_tpu.tl.association(d, y, "id", Nnull=64, null_y=null_y,
                                       return_full=True)
    monkeypatch.setattr(assoc_mod, "_FUSED_FDR_MIN_ELEMENTS", 0)
    mesh = make_mesh(jax.devices()[:8], perms=2)
    res_fused = cna_tpu.tl.association(d, y, "id", Nnull=64, null_y=null_y,
                                       mesh=mesh, return_full=True)
    assert res_dense.p == res_fused.p
    np.testing.assert_allclose(res_dense.fdrs.fdr.values,
                               res_fused.fdrs.fdr.values,
                               rtol=1e-12, atol=0)
    np.testing.assert_array_equal(res_dense.fdrs.num_detected.values,
                                  res_fused.fdrs.num_detected.values)


def test_halo_plan_ghost_fraction(demo):
    from cna_tpu.tools._nam import get_halo_plan

    plan, ordering = get_halo_plan(demo[0], 4)
    assert ordering is not None  # locality ordering was applied
    frac = plan.ghost_fraction()
    assert 0 < frac  # some cross-shard edges exist
    # an all-gather would be (D-1) = 3x the cell count; input-order
    # blocks measured 2.92 on this data — the cluster ordering must do
    # materially better even on archetype (expander-ish) data
    assert frac < 2.0


def test_halo_plan_ghosts_small_on_manifold():
    """On manifold-structured data (the realistic atlas case) the
    locality-ordered plan must keep the exchange to boundary rows: ghost
    fraction well under 1 at 8 shards, where an all-gather would be 7."""
    from cna_tpu.tools._nam import get_halo_plan
    from cna_tpu.data import synthetic_dataset
    from cna_tpu import pp

    d, _ = synthetic_dataset(n_samples=50, cells_per_sample=400,
                             n_genes=40, seed=0, structure="manifold")
    pp.pca(d, n_comps=20)
    pp.neighbors(d, n_neighbors=15)
    plan, ordering = get_halo_plan(d, 8)
    assert ordering is not None
    frac = plan.ghost_fraction()
    assert 0 < frac < 0.5, frac
    stats = plan.exchange_stats(s_cols=50)
    assert stats["padded_bytes"] < stats["allgather_bytes"] / 4


def test_halo_plan_hub_split():
    """Hub rows must land in a small wide degree bucket, not widen the
    whole shard's ELL to the max degree."""
    import scipy.sparse as sp

    from cna_tpu.parallel.halo import build_halo_plan_csr
    from cna_tpu.ops import spmm
    from cna_tpu.graph.ell import from_scipy
    from cna_tpu.parallel import halo, mesh as meshlib

    rng = np.random.RandomState(0)
    n = 192
    a = sp.random(n, n, density=0.04, random_state=1, format="csr")
    a = (a + a.T).tocsr()
    # one mega-hub row/col
    hub = sp.csr_matrix(
        (np.full(n, 0.5), (np.zeros(n, int), np.arange(n))), shape=(n, n))
    a = (a + hub + hub.T).tocsr()

    plan = build_halo_plan_csr(a, 4)
    widths = [i.shape[2] for i in plan.bucket_indices]
    assert len(widths) >= 2          # degree bucketing engaged
    assert min(widths) < n // 4      # the bulk bucket stayed narrow
    assert max(widths) >= n // 2     # the hub rows got a wide bucket
    # padded gather area ~ nnz, far under rows x max-degree
    assert plan.padded_area() < plan.shard_rows * 4 * max(widths)

    g = from_scipy(a, width_percentile=100.0)
    s = rng.standard_normal((n, 5))
    expected = np.asarray(spmm.diffusion_step(
        jax.numpy.asarray(s), g, g.colsums(1.0), 1.0))
    mesh = meshlib.make_mesh(jax.devices()[:4], perms=1)
    n_pad = plan.n_shards * plan.shard_rows
    s_pad = jax.numpy.asarray(np.pad(s, ((0, n_pad - n), (0, 0))))
    got = np.asarray(halo.halo_diffusion_step(s_pad, plan, mesh, 1.0))[:n]
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)


def test_sharded_knn_matches_exact():
    import numpy as np

    from cna_tpu.parallel import mesh as meshlib
    from cna_tpu.parallel.sharded import sharded_knn
    from cna_tpu.pp.knn import knn_search

    rng = np.random.RandomState(0)
    x = rng.randn(1000, 12).astype(np.float32)
    mesh = meshlib.make_mesh(cells=4, perms=2)
    si, sd = sharded_knn(x, 8, mesh, key_block=256)
    ei, ed = knn_search(x, 8, method="exact")
    assert (si[:, 0] == np.arange(1000)).all()
    np.testing.assert_allclose(np.sort(sd, axis=1), np.sort(ed, axis=1),
                               atol=5e-3)
    recall = np.mean([len(set(si[i]) & set(ei[i])) / 8 for i in range(1000)])
    assert recall == 1.0


def test_assert_agreement_single_process():
    import numpy as np

    from cna_tpu.parallel import launch

    launch.assert_agreement(np.arange(10.0), "arange")  # no-op pass


def test_assert_agreement_detects_divergence():
    import numpy as np
    import pytest

    from cna_tpu.parallel import launch

    rows = np.stack([launch._digest(np.arange(10.0)),
                     launch._digest(np.arange(10.0) + 1e-3)])
    with pytest.raises(RuntimeError, match="process 1"):
        launch._check_digest_rows(rows, "nam_checksum", atol=0.0)
    # f32 reduction-order noise admitted via atol
    launch._check_digest_rows(rows, "nam_checksum", atol=1.0)
