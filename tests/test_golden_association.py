"""Golden-agreement tests: full association pipeline vs the reference.

The permutation null cannot share numpy's global-seed stream with JAX, so
these tests generate the null matrix ONCE with the reference's own
permutation kernels and feed the identical matrix to both implementations
(cna_tpu's ``null_y`` escape hatch) — making every downstream number
(global p, null min-p distribution, FDR curve, obs write-back) directly
comparable.  A separate test checks the JAX-native permutation path
distributionally.
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


def _make_null(cna_ref, y, batches, nnull, seed, donorids=None):
    """Generate the permutation null with the reference kernels.

    y must be a numpy array: standardization uses numpy ddof=0 exactly as
    the reference's ``_association`` does (``_association.py:22``).
    """
    y = np.asarray(y, dtype=float)
    ystd = (y - y.mean()) / y.std()
    np.random.seed(seed)
    if donorids is not None:
        return cna_ref.tl._stats.grouplevel_permutation(donorids, ystd, nnull)
    return cna_ref.tl._stats.conditional_permutation(batches, ystd, nnull)


def _run_both(demo_pair, cna_ref, rd, covs=None, batches=None, donorids=None,
              nnull=200, seed=11, **kw):
    d, samplem = demo_pair
    y = samplem["case"].astype(float)

    # run reference with its own seeded permutations
    res_ref = cna_ref.tl.association(
        rd, y, "id", covs=covs, batches=batches, donorids=donorids,
        Nnull=nnull, seed=seed, return_full=True, **kw)

    # regenerate the exact same null matrix the reference used internally
    filt = (np.ones(len(y), dtype=bool) if covs is None
            else ~(y.isna() | covs.isna().any(axis=1)).to_numpy())
    b_eff = (np.ones(int(filt.sum())) if batches is None
             else batches[filt].values)
    null_y = _make_null(
        cna_ref, y[filt].values,
        b_eff if donorids is None else None,
        nnull, seed,
        donorids[filt].values if donorids is not None else None)

    res_tpu = cna_tpu.tl.association(
        d, y, "id", covs=covs, batches=batches, donorids=donorids,
        Nnull=nnull, null_y=np.asarray(null_y), return_full=True, **kw)
    return res_ref, res_tpu


def _assert_agreement(res_ref, res_tpu):
    assert res_ref.k == res_tpu.k
    assert res_ref.p == pytest.approx(res_tpu.p, abs=0)  # exact rank match
    np.testing.assert_allclose(np.sort(res_ref.nullminps),
                               np.sort(res_tpu.nullminps),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res_ref.ncorrs),
                               np.asarray(res_tpu.ncorrs),
                               rtol=1e-5, atol=1e-7)
    # the arange-based threshold grid's length is fp-boundary sensitive
    # (maxcorr differs between implementations in the last ulp), so compare
    # the overlapping prefix and allow at most one extra boundary element
    n_ref, n_tpu = len(res_ref.fdrs), len(res_tpu.fdrs)
    assert abs(n_ref - n_tpu) <= 1
    m = min(n_ref, n_tpu)
    np.testing.assert_allclose(res_ref.fdrs.fdr.values[:m],
                               res_tpu.fdrs.fdr.values[:m],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(res_ref.fdrs.threshold.values[:m],
                               res_tpu.fdrs.threshold.values[:m],
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(res_ref.fdrs.num_detected.values[:m],
                                  res_tpu.fdrs.num_detected.values[:m])
    assert (res_ref.fdr_5p_t is None) == (res_tpu.fdr_5p_t is None)
    if res_ref.fdr_5p_t is not None:
        assert res_ref.fdr_5p_t == pytest.approx(res_tpu.fdr_5p_t, rel=1e-9)
    np.testing.assert_allclose(res_ref.r2, res_tpu.r2, rtol=1e-8)


def test_association_plain(demo, ref):
    cna_ref, rd = ref
    res_ref, res_tpu = _run_both(demo, cna_ref, rd)
    _assert_agreement(res_ref, res_tpu)


def test_association_with_covs_and_batches(demo, ref):
    """The demo notebook's flagship config: sex covariate + batch correction."""
    d, samplem = demo
    cna_ref, rd = ref
    res_ref, res_tpu = _run_both(
        demo, cna_ref, rd,
        covs=samplem[["male"]].astype(float),
        batches=samplem["batch"])
    _assert_agreement(res_ref, res_tpu)


def test_association_with_donorids(demo, ref):
    d, samplem = demo
    cna_ref, rd = ref
    donorids = pd.Series(samplem.index.to_numpy() // 2, index=samplem.index)
    # donor-level permutation requires y constant within donor: use a
    # donor-level phenotype
    y_donor = pd.Series(
        (samplem.index.to_numpy() // 2) % 2, index=samplem.index).astype(float)
    res_ref = cna_ref.tl.association(rd, y_donor, "id", donorids=donorids,
                                     Nnull=100, seed=5, return_full=True)
    null_y = _make_null(cna_ref, y_donor.values, None, 100, 5,
                        donorids=donorids.values)
    res_tpu = cna_tpu.tl.association(d, y_donor, "id", donorids=donorids,
                                     Nnull=100, null_y=np.asarray(null_y),
                                     return_full=True)
    _assert_agreement(res_ref, res_tpu)


def test_obs_writeback_matches(demo, ref):
    d, samplem = demo
    cna_ref, rd = ref
    res_ref, res_tpu = _run_both(demo, cna_ref, rd, key_added="coef")
    np.testing.assert_allclose(
        rd.obs["coef"].values, d.obs["coef"].values,
        rtol=1e-7, atol=1e-10, equal_nan=True)
    np.testing.assert_allclose(
        rd.obs["coef_fdr"].values, d.obs["coef_fdr"].values,
        rtol=1e-6, atol=1e-9, equal_nan=True)


def test_jax_native_permutations_distributional(demo, ref):
    """The JAX permutation engine must draw nulls from the same
    distribution as the reference's numpy engine.  The global p on the
    demo data sits at the permutation floor (useless for comparison), so
    compare the *null min-p samples themselves*: a two-sample KS test
    between the reference's nullminps and ours, plus matching null-r2
    moments.  Both pipelines share golden-equal U/svs/M, so any
    distributional difference isolates the permutation stream."""
    import scipy.stats as st

    d, samplem = demo
    cna_ref, rd = ref
    y = samplem["case"].astype(float)
    res_ref = cna_ref.tl.association(rd, y, "id", Nnull=500, seed=3,
                                     return_full=True)
    res_tpu = cna_tpu.tl.association(d, y, "id", Nnull=500, seed=3,
                                     return_full=True)
    ks = st.ks_2samp(np.asarray(res_ref.nullminps),
                     np.asarray(res_tpu.nullminps))
    assert ks.pvalue > 1e-3, (ks.statistic, ks.pvalue)
    # second channel: the null r2 distribution's first two moments
    assert abs(res_ref.nullr2_mean - res_tpu.nullr2_mean) < \
        6 * res_ref.nullr2_std / np.sqrt(500)
    assert 0.7 < res_ref.nullr2_std / res_tpu.nullr2_std < 1.4
    # and the headline decision agrees
    se = np.sqrt(max(res_ref.p, res_tpu.p) / 500) + 1 / 500
    assert abs(res_ref.p - res_tpu.p) <= 5 * se


def test_association_low_sample_size_gate(demo, ref):
    d, samplem = demo
    y = samplem["case"].astype(float).iloc[:5]
    sub = d[np.isin(d.obs["id"].to_numpy(), y.index.to_numpy())]
    # re-build graph on the subset
    cna_tpu.pp.neighbors(sub)
    with pytest.raises(ValueError):
        cna_tpu.tl.association(sub, y, "id")


def test_association_input_types(demo):
    d, samplem = demo
    with pytest.raises(TypeError):
        cna_tpu.tl.association(d, samplem["case"].values, "id")
    with pytest.raises(TypeError):
        cna_tpu.tl.association(d, samplem["case"].astype(float), "id",
                               covs=samplem["male"])  # Series, not DataFrame
    with pytest.raises(ValueError):
        cna_tpu.tl.association(
            d, samplem["case"].astype(float), "id",
            batches=samplem["batch"],
            donorids=pd.Series(samplem.index, index=samplem.index))
