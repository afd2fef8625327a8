"""Empirical FDR / FWER kernels over permutation nulls, as pure XLA.

Replaces reference ``_stats.py:34-105``.  The reference's ``tail_counts``
builds, for each null instantiation, a histogram whose bin edges are the
(tolerance-shifted) sorted squared observed statistics, then reverse-
cumsums it into tail counts.  That is equivalent to, for each threshold t,
counting statistics with ``x^2 >= t^2*(1 - rtol) - atol`` — which we
compute directly with a searchsorted/bincount scheme that vectorizes over
null columns (O(C * Nnull * log T) instead of Python-looped histograms).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _adjusted_edges(thresholds, atol, rtol):
    t2 = thresholds * thresholds
    return t2 - atol - rtol * t2


def tail_counts(z, znull, atol=1e-8, rtol=1e-5):
    """Count, per null column, the null stats >= each |z| threshold.

    Matches reference ``tail_counts`` (``_stats.py:34-62``): thresholds are
    the entries of ``z`` (order preserved in the output), comparisons use
    squared magnitudes with a small tolerance slack.

    Args:
      z: (T,) statistics whose magnitudes act as thresholds.
      znull: (C,) or (C, m) null statistics.

    Returns int array (m, T): tail counts per null instantiation.
    """
    z = jnp.asarray(z)
    znull = jnp.asarray(znull)
    if znull.ndim == 1:
        znull = znull[:, None]
    z2 = z * z
    order = jnp.argsort(z2)
    inv = jnp.argsort(order)
    edges = _adjusted_edges(z[order], atol, rtol)  # ascending
    t = edges.shape[0]

    def per_column(col):
        pos = jnp.searchsorted(edges, col * col, side="right")  # in [0, T]
        counts = jnp.bincount(pos, length=t + 1)
        # tails_i = #{x : pos_x >= i+1} = reversed cumulative sum beyond i
        tails = jnp.cumsum(counts[::-1])[::-1][1:]
        return tails

    tails_sorted = jax.vmap(per_column, in_axes=1)(znull)  # (m, T)
    return tails_sorted[:, inv]


def empirical_fdrs(z, znull, thresholds, atol=1e-8, rtol=1e-5):
    """FDR curve over magnitude thresholds from permutation nulls.

    Reference ``empirical_fdrs`` (``_stats.py:64-83``): for each threshold,
    FDP per null = (#null stats past threshold) / (#observed stats past
    threshold); FDR = mean FDP over nulls.

    Args:
      z: (C,) observed statistics (e.g. neighborhood coefficients).
      znull: (C, m) null statistics.
      thresholds: (T,) increasing magnitude thresholds.

    Returns (T,) FDR values.
    """
    tails = tail_counts(thresholds, znull, atol=atol, rtol=rtol)  # (m, T)
    ranks = tail_counts(thresholds, z, atol=atol, rtol=rtol)  # (1, T)
    fdp = tails / ranks
    return fdp.mean(axis=0)


def empirical_fwers(z, n_max_z2, atol=1e-8, rtol=1e-5):
    """Permutation FWER for each entry of ``z``.

    Reference ``_stats.py:85-88``: ``n_max_z2`` holds the max squared null
    statistic per null instantiation.
    """
    tc = tail_counts(z, jnp.sqrt(jnp.asarray(n_max_z2)), atol=atol, rtol=rtol)[0]
    return (tc + 1) / (len(n_max_z2) + 1)


def minfwer_loo(n_max_z2):
    """Leave-one-out minimal attainable FWER (reference ``_stats.py:90-92``)."""
    n_max_z2 = jnp.asarray(n_max_z2)
    tc = (n_max_z2[None, :] >= n_max_z2[:, None]).sum(axis=1)
    return (tc + 1) / len(n_max_z2)


def numtests(n_max_z2):
    """Effective-number-of-tests estimator (reference ``_stats.py:94-99``)."""
    from jax.scipy.stats import chi2

    n_max_z2 = jnp.asarray(n_max_z2)
    j, k = 0, 10
    maxs = jnp.sort(n_max_z2)[::-1]
    fwers = (jnp.arange(j, k) + 1) / (len(maxs) + 1)
    ps = chi2.sf(maxs[j:k], 1)
    return 1.0 / (ps.dot(fwers) / fwers.dot(fwers))


def numtests_loo(n_max_z2):
    """Leave-one-out effective-number-of-tests (reference ``_stats.py:101-105``)."""
    n_max_z2 = jnp.asarray(n_max_z2)
    n = len(n_max_z2)
    idx = jnp.arange(n)

    def one(i):
        mask = idx != i
        # fixed-size: drop element i by rolling it to the end and slicing
        rolled = jnp.where(mask, n_max_z2, jnp.inf)
        vals = jnp.sort(rolled)[: n - 1]
        return numtests(vals)

    return jax.vmap(one)(idx)
