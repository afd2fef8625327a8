"""Golden-agreement tests: NAM pipeline vs the pinned reference.

Every test runs the actual reference implementation (via tests.ref_harness)
and cna_tpu on identical inputs — same synthetic dataset, same
connectivity graph — and asserts float64-level agreement.
"""

import numpy as np
import pandas as pd
import pytest

import cna_tpu

from .ref_harness import load_reference, ref_data_from


@pytest.fixture(scope="module")
def ref(demo):
    cna_ref = load_reference()
    return cna_ref, ref_data_from(demo[0])


def test_nam_matches_reference(demo, ref):
    d, _ = demo
    cna_ref, rd = ref

    nam_ref, keep_ref = cna_ref.tl.nam(rd, "id")
    nam_tpu, keep_tpu = cna_tpu.tl.nam(d, "id")

    assert np.array_equal(np.asarray(keep_ref), np.asarray(keep_tpu))
    assert nam_ref.shape == nam_tpu.shape
    assert list(nam_ref.index) == list(nam_tpu.index)
    np.testing.assert_allclose(
        nam_ref.values.astype(float), nam_tpu.values, rtol=1e-12, atol=1e-14)


def test_nam_fixed_nsteps_matches(demo, ref):
    d, _ = demo
    cna_ref, rd = ref
    nam_ref, _ = cna_ref.tl.nam(rd, "id", nsteps=2)
    nam_tpu, _ = cna_tpu.tl.nam(d, "id", nsteps=2)
    np.testing.assert_allclose(
        nam_ref.values.astype(float), nam_tpu.values, rtol=1e-12, atol=1e-14)


def test_diffuse_matches_reference(demo, ref):
    d, _ = demo
    cna_ref, rd = ref
    rng = np.random.default_rng(7)
    s = pd.DataFrame(rng.standard_normal((d.n_obs, 3)), index=d.obs.index)
    out_ref = cna_ref.tl.diffuse(rd, s, nsteps=3)
    out_tpu = cna_tpu.tl.diffuse(d, s, nsteps=3)
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_tpu), rtol=1e-12, atol=1e-14)


def test_diffuse_stepwise_yields_per_step(demo):
    d, _ = demo
    rng = np.random.default_rng(3)
    s = rng.standard_normal((d.n_obs, 2))
    steps = list(cna_tpu.tl.diffuse_stepwise(d, s, maxnsteps=3))
    assert len(steps) == 3
    assert all(np.asarray(x).shape == s.shape for x in steps)


def test_svd_nam_matches_reference(demo, ref):
    d, _ = demo
    cna_ref, rd = ref
    nam_ref, _ = cna_ref.tl.nam(rd, "id")
    u_ref, sv_ref, v_ref = cna_ref.tl.svd_nam(nam_ref.astype(float))
    u_tpu, sv_tpu, v_tpu = cna_tpu.tl.svd_nam(nam_ref.astype(float))
    np.testing.assert_allclose(sv_ref.values, sv_tpu.values, rtol=1e-8, atol=1e-8)
    # eigenvector signs are arbitrary: compare U U^T projections
    np.testing.assert_allclose(
        u_ref.values @ u_ref.values.T, u_tpu.values @ u_tpu.values.T,
        rtol=1e-7, atol=1e-8)
    # column-wise sign-aligned comparison of loadings; the final PC spans
    # the centering null space (eigenvalue ~0) where both implementations
    # produce numerical noise, so compare the first S-1 PCs
    s = u_ref.shape[1] - 1
    signs = np.sign(np.sum(u_ref.values * u_tpu.values, axis=0))
    np.testing.assert_allclose(u_ref.values[:, :s] * signs[:s],
                               u_tpu.values[:, :s], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(v_ref.values[:, :s] * signs[:s],
                               v_tpu.values[:, :s], rtol=1e-5, atol=1e-6)


def test_batch_kurtosis_matches(demo, ref):
    d, samplem = demo
    cna_ref, rd = ref
    nam_ref, _ = cna_ref.tl.nam(rd, "id")
    batches = samplem["batch"]
    k_ref = cna_ref.tl._nam._batch_kurtosis(nam_ref.astype(float), batches)
    k_tpu = cna_tpu.tl._nam._batch_kurtosis(nam_ref.astype(float), batches)
    np.testing.assert_allclose(np.asarray(k_ref), np.asarray(k_tpu),
                               rtol=1e-10, atol=1e-12)


def test_resid_nam_matches_reference(demo, ref):
    """Residualization with covariates + batches (the ridge-sweep path)."""
    d, samplem = demo
    cna_ref, rd = ref

    nam_ref, _ = cna_ref.tl.nam(rd, "id", batches=samplem["batch"])
    nam_f = nam_ref.astype(float)
    covs = samplem[["male"]].astype(float)
    batches = samplem["batch"]

    res_ref = cna_ref.tl._nam._resid_nam(nam_f, covs, batches)
    res_tpu = cna_tpu.tl._nam._resid_nam(nam_f, covs, batches)

    assert res_ref.r == res_tpu.r
    np.testing.assert_allclose(np.asarray(res_ref.M), res_tpu.M.values,
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(res_ref.namresid.values, res_tpu.namresid.values,
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(res_ref.namresid_svs.values,
                               res_tpu.namresid_svs.values,
                               rtol=1e-7, atol=1e-8)
