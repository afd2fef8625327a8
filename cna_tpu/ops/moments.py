"""Moment statistics (kurtosis, standardization, correlation) as pure XLA.

These replace the scipy/pandas statistic calls the reference makes on host
numpy arrays:

* Fisher kurtosis with biased moments (``scipy.stats.kurtosis`` defaults),
  used by the diffusion stopping rule (reference ``_nam.py:59``) and the
  batch-QC / ridge-sweep checks (``_nam.py:80-82,150``).
* Column standardization with explicit ``ddof`` — the reference mixes
  pandas (ddof=1, e.g. ``_nam.py:104,126,159``) and numpy (ddof=0, e.g.
  ``_association.py:22,52,97``) conventions, so every call site here
  states its ddof explicitly.
* Squared column correlation R², the step-to-step diffusion diagnostic
  (``_nam.py:47-49``).

All functions are jit-compatible and shape-polymorphic over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def kurtosis(x, axis=0):
    """Fisher (excess) kurtosis with biased moment estimators.

    Matches ``scipy.stats.kurtosis(x, axis=axis)`` defaults
    (fisher=True, bias=True): ``m4 / m2**2 - 3`` with population moments.
    Zero-variance slices yield NaN (0/0), as scipy's default propagates.
    """
    m = jnp.mean(x, axis=axis, keepdims=True)
    d = x - m
    m2 = jnp.mean(d * d, axis=axis)
    m4 = jnp.mean((d * d) * (d * d), axis=axis)
    return m4 / (m2 * m2) - 3.0


def colstd(x, ddof=0, axis=0):
    """Standard deviation along ``axis`` with explicit ddof.

    ddof=0 reproduces ``np.std``; ddof=1 reproduces ``pandas.std``.
    """
    n = x.shape[axis]
    m = jnp.mean(x, axis=axis, keepdims=True)
    ss = jnp.sum((x - m) ** 2, axis=axis)
    return jnp.sqrt(ss / (n - ddof))


def standardize(x, ddof=0, axis=0):
    """(x - mean) / std along ``axis``."""
    m = jnp.mean(x, axis=axis, keepdims=True)
    s = colstd(x, ddof=ddof, axis=axis)
    return (x - m) / jnp.expand_dims(s, axis)


def scale_by_std(x, ddof=0, axis=0):
    """x / std(x) along ``axis`` WITHOUT centering.

    This is what ``zcond / zcond.std()`` does in the reference
    (``_association.py:52,71,97``): the std is computed about the mean but
    the vector itself is not recentered.
    """
    s = colstd(x, ddof=ddof, axis=axis)
    return x / jnp.expand_dims(s, axis)


def column_r2(a, b, ddof=1):
    """Squared Pearson correlation of matching columns of ``a`` and ``b``.

    Mirrors the diffusion diagnostic ``R(A, B)**2`` at reference
    ``_nam.py:47-49``: a mean-normalized cross moment divided by ddof=1
    (pandas) stds — an idiosyncratic mix replicated here for parity.
    Constant columns give NaN.
    """
    am = a - a.mean(axis=0)
    bm = b - b.mean(axis=0)
    cov = (am * bm).mean(axis=0)
    r = cov / colstd(a, ddof=ddof) / colstd(b, ddof=ddof)
    return r * r


def column_r2_counted(a, b, n_true, ddof=1):
    """``column_r2`` for arrays whose rows beyond ``n_true`` are zero padding.

    Computes the same statistic from raw sums with divisor ``n_true`` —
    padding rows contribute nothing to any sum, so the result matches
    ``column_r2(a[:n_true], b[:n_true])`` without materializing the slice.
    """
    n = n_true
    sa, sb = a.sum(axis=0), b.sum(axis=0)
    saa, sbb = (a * a).sum(axis=0), (b * b).sum(axis=0)
    sab = (a * b).sum(axis=0)
    ma, mb = sa / n, sb / n
    cov = sab / n - ma * mb
    var_a = (saa - n * ma * ma) / (n - ddof)
    var_b = (sbb - n * mb * mb) / (n - ddof)
    # zero-variance columns (e.g. the all-zero "previous state" on the
    # first diffusion step) would yield 0/0 = NaN, as the reference's R()
    # does; emit +inf instead so compiled programs stay NaN-free under
    # jax_debug_nans (real R^2 <= 1, so the sentinel is unambiguous —
    # the diagnostics printer renders it back as nan for UX parity).
    # The zero test is RELATIVE to each column's magnitude: catastrophic
    # cancellation in ``saa - n*ma*ma`` can leave a genuinely varying
    # column with a tiny negative variance, which must not trip the
    # sentinel (one +inf wipes the whole step's r2p20 diagnostic).
    eps = 16 * jnp.finfo(a.dtype).eps
    safe = ((var_a > eps * jnp.abs(saa / n))
            & (var_b > eps * jnp.abs(sbb / n)))
    denom = var_a * var_b
    r2 = (cov * cov) / jnp.where(safe, denom, 1.0)
    return jnp.where(safe, r2, jnp.inf)


def grouped_mean(x, group_ids, num_groups):
    """Mean of rows of ``x`` within each group.

    ``group_ids``: int array (n,) with values in [0, num_groups).
    Returns (num_groups, x.shape[1]).  Used for per-batch neighborhood
    abundance means (reference ``_batch_kurtosis``, ``_nam.py:80-82``).
    """
    onehot = jnp.asarray(
        group_ids[:, None] == jnp.arange(num_groups)[None, :], dtype=x.dtype
    )
    counts = onehot.sum(axis=0)
    sums = onehot.T @ x
    return sums / counts[:, None]


def batch_kurtosis(nam, batch_ids, num_batches):
    """Pearson kurtosis (Fisher + 3) across per-batch mean abundances.

    Reference ``_batch_kurtosis`` (``_nam.py:78-82``): for each NAM column
    (neighborhood), take the mean abundance within each batch, then the
    kurtosis of those ``num_batches`` values, plus 3 (Pearson convention).
    """
    means = grouped_mean(nam, batch_ids, num_batches)
    return kurtosis(means, axis=0) + 3.0
