"""Coverage of remaining API surface: option flags, utilities, plotting,
checkpointing, profiling."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

import cna_tpu
from cna_tpu.utils import checkpoint, profiling


def test_association_local_test_false(demo):
    d, samplem = demo
    y = samplem["case"].astype(float)
    res = cna_tpu.tl.association(d, y, "id", Nnull=50, seed=0,
                                 local_test=False, return_full=True,
                                 key_added="nolocal")
    assert res.fdrs is None and res.fdr_5p_t is None
    assert "nolocal" in d.obs and "nolocal_fdr" not in d.obs


def test_association_force_permute_all(demo):
    d, samplem = demo
    y = samplem["case"].astype(float)
    p = cna_tpu.tl.association(d, y, "id", Nnull=50, seed=0,
                               batches=samplem["batch"],
                               force_permute_all=True)
    assert 0 < p <= 1


def test_obs_to_sample(demo):
    d, samplem = demo
    agg = cna_tpu.ut.obs_to_sample(d, ["case", "male"], "id")
    assert list(agg.index) == list(d.obs["id"].unique())
    np.testing.assert_allclose(agg["case"].to_numpy(),
                               samplem["case"].to_numpy())
    one = cna_tpu.ut.obs_to_sample(d, "case", "id")
    assert list(one.columns) == ["case"]


def test_plotting_smoke(demo):
    d, samplem = demo
    y = samplem["case"].astype(float)
    cna_tpu.tl.association(d, y, "id", Nnull=50, seed=1, key_added="pltkey")
    d.obsm["X_umap"] = d.obsm["X_pca"][:, :2]
    fig, axes = plt.subplots(1, 2)
    ax = cna_tpu.pl.umap_ncorr(d, fdr_thresh=0.5, key="pltkey", ax=axes[0])
    assert ax is axes[0]
    d.obs["stratum"] = pd.Categorical(
        np.where(d.obs["case"] == 1, "case", "ctrl"))
    cna_tpu.pl.violinplot(d, "stratum", key="pltkey", ax=axes[1])
    plt.close(fig)


def test_nam_savepoint_roundtrip(tmp_path, demo):
    d, _ = demo
    nam_df, keep = cna_tpu.tl.nam(d, "id")
    fp = checkpoint.nam_fingerprint(d, "id")
    path = tmp_path / "nam.npz"
    checkpoint.save_nam(path, nam_df, fp, nsteps=4)

    loaded = checkpoint.load_nam(path, fp)
    assert loaded is not None
    nam2, _, nsteps = loaded
    np.testing.assert_allclose(nam2.to_numpy(), nam_df.to_numpy())
    assert list(nam2.index) == list(nam_df.index)
    assert nsteps == 4

    # fingerprint mismatch -> miss
    assert checkpoint.load_nam(path, "deadbeef") is None
    # changing an input changes the fingerprint
    fp2 = checkpoint.nam_fingerprint(d, "id", nsteps=3)
    assert fp2 != fp


def test_association_savepoint_end_to_end(tmp_path, demo):
    d, samplem = demo
    y = samplem["case"].astype(float)
    null_y = np.random.RandomState(5).randn(50, 40)
    path = str(tmp_path / "nam_sp.npz")
    p1 = cna_tpu.tl.association(d, y, "id", Nnull=40, null_y=null_y,
                                nam_savepoint=path)
    p2 = cna_tpu.tl.association(d, y, "id", Nnull=40, null_y=null_y,
                                nam_savepoint=path)
    assert p1 == p2


def test_phase_profiler_collects():
    prof = profiling.PhaseProfiler(enabled=True)
    with prof.phase("stage_a", cells=1000):
        _ = sum(range(1000))
    with prof.phase("stage_b"):
        pass
    assert len(prof.phases) == 2
    assert prof.phases[0]["cells_per_s"] > 0
    lines = []
    prof.report(out=lines.append)
    assert any("stage_a" in l for l in lines)


def test_progress_records_lines(demo):
    d, _ = demo
    from cna_tpu.tools._out import select_output

    out = select_output(False)
    out("hello", 42)
    assert out.lines == ["hello 42"]


def test_diffuse_stepwise_dataframe_labels(demo):
    d, _ = demo
    s = pd.DataFrame(np.random.RandomState(0).rand(d.n_obs, 2),
                     index=d.obs.index, columns=["a", "b"])
    step = next(iter(cna_tpu.tl.diffuse_stepwise(d, s, maxnsteps=1)))
    assert isinstance(step, pd.DataFrame)
    assert list(step.columns) == ["a", "b"]
    assert step.index.equals(d.obs.index)


def test_celldata_subset(demo):
    d, _ = demo
    mask = d.obs["case"].to_numpy() == 1
    sub = d[mask]
    assert sub.n_obs == mask.sum()
    assert sub.X.shape[0] == mask.sum()
    assert sub.obsp["connectivities"].shape == (mask.sum(), mask.sum())
    assert "_cna_tpu_ell_graph" not in "".join(sub.uns.keys())
