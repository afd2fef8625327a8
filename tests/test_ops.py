"""Unit/property tests for the compute kernels in cna_tpu.ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.stats as st

from cna_tpu.graph.ell import from_scipy
from cna_tpu.ops import fdr, ftest, linalg, moments, permutations, spmm


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


# ----------------------------------------------------------------- moments

def test_kurtosis_matches_scipy(rng):
    x = rng.standard_normal((50, 200)) ** 3
    np.testing.assert_allclose(
        np.asarray(moments.kurtosis(jnp.asarray(x), axis=1)),
        st.kurtosis(x, axis=1), rtol=1e-10)


def test_colstd_ddof(rng):
    x = rng.standard_normal((30, 7))
    np.testing.assert_allclose(
        np.asarray(moments.colstd(jnp.asarray(x), ddof=0)), x.std(axis=0),
        rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(moments.colstd(jnp.asarray(x), ddof=1)),
        x.std(axis=0, ddof=1), rtol=1e-12)


def test_grouped_mean(rng):
    x = rng.standard_normal((12, 5))
    g = np.array([0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2])
    got = np.asarray(moments.grouped_mean(jnp.asarray(x), jnp.asarray(g), 3))
    for b in range(3):
        np.testing.assert_allclose(got[b], x[g == b].mean(axis=0), rtol=1e-12)


# -------------------------------------------------------------------- spmm

def test_ell_spmm_matches_scipy(rng):
    n, s = 500, 7
    a = sp.random(n, n, density=0.02, random_state=1, format="csr")
    g = from_scipy(a)
    x = rng.standard_normal((n, s))
    got = np.asarray(spmm.graph_spmm(g, jnp.asarray(x)))
    np.testing.assert_allclose(got, a @ x, rtol=1e-10, atol=1e-12)


def test_ell_spmm_blocked_equals_full(rng):
    n, s = 300, 5
    a = sp.random(n, n, density=0.05, random_state=2, format="csr")
    g = from_scipy(a)
    x = jnp.asarray(rng.standard_normal((n, s)))
    full = np.asarray(spmm.graph_spmm(g, x))
    blocked = np.asarray(spmm.graph_spmm(g, x, block_rows=64))
    np.testing.assert_allclose(full, blocked, rtol=1e-12)


def test_ell_overflow_path(rng):
    """A graph with one hub row exercises the COO overflow."""
    n = 200
    a = sp.random(n, n, density=0.03, random_state=3, format="lil")
    a[0, :] = rng.random(n)  # hub row, degree n
    a = a.tocsr()
    g = from_scipy(a)
    assert g.n_overflow > 0
    x = rng.standard_normal((n, 4))
    np.testing.assert_allclose(
        np.asarray(spmm.graph_spmm(g, jnp.asarray(x))), a @ x,
        rtol=1e-10, atol=1e-12)


def test_diffusion_step_matches_reference_formula(rng):
    n, s, w = 150, 3, 2.0
    a = sp.random(n, n, density=0.05, random_state=4, format="csr")
    a = a + a.T  # symmetric
    g = from_scipy(a)
    x = rng.standard_normal((n, s))
    colsums = np.asarray(a.sum(axis=0)).ravel() + w
    expected = a @ (x / colsums[:, None]) + w * x / colsums[:, None]
    got = np.asarray(spmm.diffusion_step(
        jnp.asarray(x), g, jnp.asarray(colsums), w))
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)


# ------------------------------------------------------------------ linalg

def test_gram_svd_reconstruction(rng):
    x = rng.standard_normal((20, 100))
    nam_std, u, svs, v = linalg.standardize_and_gram_svd(jnp.asarray(x))
    # U diag(sqrt(svs)) V' reconstructs the standardized matrix
    rec = np.asarray(u) @ np.diag(np.sqrt(np.asarray(svs))) @ np.asarray(v).T
    np.testing.assert_allclose(rec, np.asarray(nam_std), rtol=1e-6, atol=1e-8)
    # U orthonormal
    np.testing.assert_allclose(np.asarray(u).T @ np.asarray(u), np.eye(20),
                               atol=1e-10)


def test_residual_projector_idempotent(rng):
    n, r = 25, 3
    c = jnp.asarray(rng.standard_normal((n, r)))
    m = np.asarray(linalg.residual_projector(c))
    np.testing.assert_allclose(m @ m, m, atol=1e-10)  # projector
    np.testing.assert_allclose(m @ np.asarray(c), 0, atol=1e-10)  # annihilates C


def test_residual_projector_ridge_shrinks_less(rng):
    n, r = 30, 4
    c = jnp.asarray(rng.standard_normal((n, r)))
    m0 = np.asarray(linalg.residual_projector(c, ridge=0.0, n_batch_cols=2))
    m_big = np.asarray(linalg.residual_projector(c, ridge=1e6, n_batch_cols=2))
    x = rng.standard_normal(n)
    # huge ridge ~ no projection on the batch columns
    assert np.linalg.norm(m_big @ x) >= np.linalg.norm(m0 @ x) - 1e-9


# ------------------------------------------------------------------- ftest

def test_f_sf_matches_scipy():
    fvals = np.array([0.1, 1.0, 2.5, 10.0, 100.0])
    for d1 in [1, 3, 10]:
        for d2 in [5, 40]:
            np.testing.assert_allclose(
                np.asarray(ftest.f_sf(jnp.asarray(fvals), float(d1), float(d2))),
                st.f.sf(fvals, d1, d2), rtol=1e-9, atol=1e-12)
    assert np.isnan(float(ftest.f_sf(1.0, 1.0, -3.0)))
    assert float(ftest.f_sf(-1.0, 2.0, 10.0)) == 1.0


def test_minp_stats_batch_matches_naive(rng):
    n, npcs, m, r = 40, 20, 8, 2
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    u = q[:, :npcs]
    mm = np.eye(n) - np.outer(np.ones(n), np.ones(n)) / n
    y = rng.standard_normal((n, m))
    ks = np.array([2, 4, 6])

    k_sel, p_sel, r2_sel = ftest.minp_stats_batch(
        jnp.asarray(u), jnp.asarray(mm), jnp.asarray(y), jnp.asarray(ks), r)

    for j in range(m):
        z = mm @ y[:, j]
        z = z / z.std()
        ps, r2s = [], []
        for k in ks:
            xpc = u[:, :k]
            beta = xpc.T @ z
            zhat = xpc @ beta
            ssefull = (zhat - z) @ (zhat - z)
            ssered = z @ z
            delta = ssered - ssefull
            f = (delta / k) / (ssefull / n)
            ps.append(st.f.sf(f, k, n - (1 + r + k)))
            r2s.append(1 - ssefull / ssered)
        best = int(np.nanargmin(ps))
        assert int(k_sel[j]) == ks[best]
        np.testing.assert_allclose(float(p_sel[j]), ps[best], rtol=1e-8)
        np.testing.assert_allclose(float(r2_sel[j]), r2s[best], rtol=1e-8)


# ------------------------------------------------------------ permutations

def test_conditional_permutation_preserves_batches():
    key = jax.random.key(0)
    batches = np.array([0, 0, 0, 1, 1, 1, 1, 2, 2])
    y = np.arange(9.0)
    out = np.asarray(permutations.conditional_permutation(key, batches, y, 200))
    assert out.shape == (9, 200)
    for b in np.unique(batches):
        mask = batches == b
        # within each batch, every column is a permutation of that batch's values
        expected = np.sort(y[mask])
        for j in range(0, 200, 50):
            np.testing.assert_array_equal(np.sort(out[mask, j]), expected)
    # columns differ (it actually permutes)
    assert (out[:, 0] != out[:, 1]).any()


def test_conditional_permutation_is_uniform():
    """Each position should receive each value ~uniformly within batch."""
    key = jax.random.key(1)
    batches = np.zeros(4)
    y = np.arange(4.0)
    out = np.asarray(permutations.conditional_permutation(key, batches, y, 4000))
    counts = np.stack([(out == v).mean(axis=1) for v in y])
    np.testing.assert_allclose(counts, 0.25, atol=0.03)


def test_grouplevel_permutation_constant_within_group():
    key = jax.random.key(2)
    groups = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    y = np.array([5.0, 5.0, 1.0, 1.0, 3.0, 3.0, 7.0, 7.0])
    out = np.asarray(permutations.grouplevel_permutation(key, groups, y, 100))
    for g in np.unique(groups):
        mask = groups == g
        assert (out[mask] == out[mask][0]).all()
    for j in range(100):
        np.testing.assert_array_equal(np.sort(np.unique(out[:, j])),
                                      [1.0, 3.0, 5.0, 7.0])
    with pytest.raises(ValueError):
        permutations.grouplevel_permutation(
            key, groups, np.arange(8.0), 10)


# --------------------------------------------------------------------- fdr

def test_tail_counts_matches_reference_semantics(rng):
    """Cross-check against a direct O(n^2) implementation of the
    reference's histogram trick."""
    z = rng.standard_normal(50)
    znull = rng.standard_normal((50, 7))
    got = np.asarray(fdr.tail_counts(jnp.asarray(z), jnp.asarray(znull)))
    z2 = z ** 2
    bins = z2 - 1e-8 - 1e-5 * z2
    expected = np.array([
        [(znull[:, j] ** 2 >= b).sum() for b in bins] for j in range(7)])
    np.testing.assert_array_equal(got, expected)


def test_empirical_fdrs_simple():
    z = jnp.asarray(np.array([3.0, 0.1, 0.2]))
    znull = jnp.asarray(np.array([[0.1, 0.2], [0.15, 0.1], [0.05, 0.3]]))
    thresholds = jnp.asarray(np.array([0.5, 1.0]))
    out = np.asarray(fdr.empirical_fdrs(z, znull, thresholds))
    # only the observed 3.0 passes 0.5/1.0; no nulls pass -> FDR 0
    np.testing.assert_allclose(out, [0.0, 0.0])


def test_null_coef_tail_counts_matches_materialized():
    """Fused matmul+histogram == tails of the materialized coefficients."""
    import jax.numpy as jnp

    from cna_tpu.ops import fdr as fdr_ops

    rng = np.random.RandomState(7)
    s, c, m = 12, 3000, 40
    namresid = jnp.asarray(rng.randn(s, c))
    ycond = jnp.asarray(rng.randn(s, m))
    nullncorrs = np.abs(np.asarray(namresid).T @ np.asarray(ycond)) / s
    maxcorr = nullncorrs.max() * 0.8
    th = np.arange(maxcorr / 4, maxcorr, maxcorr / 50)
    t0, dt = float(th[0]), float(th[1] - th[0])

    tails = np.asarray(fdr_ops.null_coef_tail_counts(
        namresid, ycond, s, t0, dt, len(th), block=1024))
    want = np.asarray(fdr_ops._tail_hist_uniform(
        jnp.asarray(nullncorrs), t0, dt, len(th), 1e-8, 1e-5))
    assert (tails == want).all()
