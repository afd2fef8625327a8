"""Golden tests for the reference-compatible ``cna_tpu.tl._stats`` module.

Each helper is checked against the actual reference ``cna.tools._stats``
(run in-process via ref_harness) on identical inputs.  The permutation
generators are checked for distributional/structural properties (the
reference's numpy global-seed stream is not bit-replicable in JAX).
"""

import numpy as np
import pytest

from cna_tpu.tools import _stats as tstats

from .ref_harness import load_reference


@pytest.fixture(scope="module")
def ref_stats():
    return load_reference().tools._stats


def test_tail_counts_golden(ref_stats, rng):
    z = rng.normal(size=40)
    znull = rng.normal(size=(40, 7))
    ours = np.asarray(tstats.tail_counts(z, znull))
    theirs = ref_stats.tail_counts(z, znull)
    np.testing.assert_array_equal(ours, theirs)


def test_empirical_fdrs_golden(ref_stats, rng):
    z = rng.normal(size=60) * 2
    znull = rng.normal(size=(60, 9))
    thresholds = np.linspace(0.1, 2.5, 25)
    ours = np.asarray(tstats.empirical_fdrs(z, znull, thresholds))
    theirs = ref_stats.empirical_fdrs(z, znull, thresholds)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_empirical_fwers_golden(ref_stats, rng):
    z = rng.normal(size=30)
    n_max_z2 = rng.chisquare(df=1, size=50) * 4
    ours = np.asarray(tstats.empirical_fwers(z, n_max_z2))
    theirs = ref_stats.empirical_fwers(z, n_max_z2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_minfwer_loo_golden(ref_stats, rng):
    n_max_z2 = rng.chisquare(df=1, size=37)
    ours = np.asarray(tstats.minfwer_loo(n_max_z2))
    theirs = ref_stats.minfwer_loo(n_max_z2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_numtests_golden(ref_stats, rng):
    n_max_z2 = rng.chisquare(df=1, size=64) * 9
    ours = float(tstats.numtests(n_max_z2))
    theirs = float(ref_stats.numtests(n_max_z2))
    np.testing.assert_allclose(ours, theirs, rtol=1e-10)


def test_numtests_loo_golden(ref_stats, rng):
    n_max_z2 = rng.chisquare(df=1, size=24) * 9
    ours = np.asarray(tstats.numtests_loo(n_max_z2))
    theirs = ref_stats.numtests_loo(n_max_z2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10)


def test_conditional_permutation_reference_signature():
    """Reference call shape: (B, Y, num) with numpy global-seed control."""
    b = np.repeat(np.arange(4), 10)
    y = np.arange(40.0)
    np.random.seed(0)
    p1 = np.asarray(tstats.conditional_permutation(b, y, 5))
    np.random.seed(0)
    p2 = np.asarray(tstats.conditional_permutation(b, y, 5))
    np.testing.assert_array_equal(p1, p2)  # np.random.seed reproducibility
    assert p1.shape == (40, 5)
    # within-batch multiset preserved per permutation column
    for col in range(5):
        for batch in range(4):
            rows = b == batch
            np.testing.assert_array_equal(np.sort(p1[rows, col]),
                                          np.sort(y[rows]))


def test_grouplevel_permutation_reference_signature():
    g = np.repeat(np.arange(6), 3)
    y = np.repeat(np.arange(6.0) * 2, 3)
    out = np.asarray(tstats.grouplevel_permutation(g, y, 4))
    assert out.shape == (18, 4)
    for col in range(4):
        # constant within group, multiset of group values preserved
        mat = out[:, col].reshape(6, 3)
        assert (mat == mat[:, :1]).all()
        np.testing.assert_array_equal(np.sort(mat[:, 0]),
                                      np.arange(6.0) * 2)
    with pytest.raises(ValueError):
        tstats.grouplevel_permutation(g, np.arange(18.0), 2)


def test_empirical_fdrs_nonuniform_thresholds_golden(ref_stats, rng):
    """Non-arithmetic threshold grids take the general (per-column) path;
    it must agree with the reference at float64 precision too."""
    z = rng.normal(size=60) * 2
    znull = rng.normal(size=(60, 9))
    thresholds = np.sort(rng.uniform(0.05, 2.5, 25))
    ours = np.asarray(tstats.empirical_fdrs(z, znull, thresholds))
    assert ours.dtype == np.float64
    theirs = ref_stats.empirical_fdrs(z, znull, thresholds)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)
