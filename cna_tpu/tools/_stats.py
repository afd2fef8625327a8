"""Reference-compatible statistics namespace (``cna.tl._stats`` parity).

The reference keeps its permutation and FDR/FWER kernels in
``src/cna/tools/_stats.py`` (lines 4-105); downstream code sometimes
reaches them directly via attribute access (``import cna;
cna.tl._stats.tail_counts(...)``) or ``from cna.tools import _stats``.
This module provides the same names with the same call signatures,
implemented on the framework's XLA kernels (``ops.permutations``,
``ops.fdr``).

Signature notes:

* ``conditional_permutation(B, Y, num)`` / ``grouplevel_permutation(G, Y,
  num)`` — the reference draws from numpy's *global* seed
  (``_stats.py:12,31``).  JAX's counter-based PRNG cannot replicate that
  stream bit-for-bit; these wrappers derive a JAX key from the numpy
  global stream, so ``np.random.seed(...)`` still makes runs
  reproducible, and the permutation *distribution* is identical.  Pass
  ``key=`` explicitly for pure-functional determinism.
* ``grouplevel_permutation`` raises on a phenotype that is not constant
  within donor groups; the reference prints and returns ``None``
  (``_stats.py:28-30``) — raising is the strictly safer behavior.
* The tail-count / FDR / FWER helpers are exact re-exports; they return
  device arrays (``np.asarray(...)`` converts, and every numpy ufunc
  accepts them directly).
"""

from __future__ import annotations

import jax
import numpy as np

from ..ops.fdr import (empirical_fdrs, empirical_fwers, minfwer_loo,
                       numtests, numtests_loo, tail_counts)
from ..ops import permutations as _perms

__all__ = [
    "conditional_permutation",
    "grouplevel_permutation",
    "tail_counts",
    "empirical_fdrs",
    "empirical_fwers",
    "minfwer_loo",
    "numtests",
    "numtests_loo",
]


def _default_key():
    """A JAX PRNG key drawn from numpy's global stream, so
    ``np.random.seed`` governs reproducibility exactly as it does for the
    reference's ``np.random.randn`` draws."""
    return jax.random.key(np.random.randint(0, 2**31 - 1))


def conditional_permutation(B, Y, num, key=None):
    """Permute ``Y`` within each batch of ``B``, ``num`` times.

    Reference ``conditional_permutation`` (``_stats.py:4-18``): returns an
    (len(Y), num) array whose columns are independent within-batch
    permutations of ``Y``.
    """
    if key is None:
        key = _default_key()
    return _perms.conditional_permutation(key, np.asarray(B),
                                          np.asarray(Y, dtype=float), num)


def grouplevel_permutation(G, Y, num, key=None):
    """Permute donor-level values of ``Y`` and broadcast back to samples.

    Reference ``grouplevel_permutation`` (``_stats.py:20-32``); requires
    ``Y`` constant within each group of ``G`` (raises otherwise).
    """
    if key is None:
        key = _default_key()
    return _perms.grouplevel_permutation(key, np.asarray(G),
                                         np.asarray(Y, dtype=float), num)
