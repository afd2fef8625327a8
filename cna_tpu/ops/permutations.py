"""Permutation-null generation for the association test.

Replaces reference ``_stats.py:4-32``:

* ``conditional_permutation`` — permute the phenotype independently within
  each batch, ``num`` times.  The reference does ``argsort(randn)`` per
  batch block on host; here all batches and all permutations are one XLA
  program: a lexicographic (batch, random-key) sort yields a uniform
  within-batch permutation per null column, scattered back to the
  original batch layout.
* ``grouplevel_permutation`` — permute donor-level phenotype values and
  broadcast back to samples (reference validates the phenotype is constant
  within donor).

Exact bit-replication of numpy's global-seed stream is impossible (and
meaningless) under JAX's counter-based PRNG; agreement with the reference
is distributional, and the association layer accepts precomputed null
matrices (``null_y``) for exact regression tests against the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _encode_groups(values):
    """Host-side: map group labels to [0, G) ids in np.unique (sorted) order."""
    values = np.asarray(values)
    uniq, ids = np.unique(values, return_inverse=True)
    return uniq, ids.astype(np.int32)


@partial(jax.jit, static_argnames=("num",))
def _conditional_permutation_dev(key, batch_ids, pos_by_batch, y, num):
    """One-program within-batch permutation.

    For each null column: lexicographically sort (batch_id, uniform key)
    carrying the row index along — the carried indices are grouped by
    batch with a uniform random within-batch order.  Writing ``y`` at
    those indices into the batch-grouped positions reproduces the
    reference's scatter (``_stats.py:8-18``) semantics.
    """
    n = y.shape[0]
    r = jax.random.uniform(key, (n, num))
    batch_b = jnp.broadcast_to(batch_ids[:, None], (n, num))
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, num))
    _, _, perm = jax.lax.sort((batch_b, r, iota), dimension=0, num_keys=2)
    permuted_y = y[perm]  # (n, num) — batch-grouped rows, shuffled within
    out = jnp.zeros((n, num), dtype=y.dtype)
    return out.at[pos_by_batch].set(permuted_y)


def conditional_permutation(key, batches, y, num):
    """Permute ``y`` within batches, ``num`` times.

    Args:
      key: jax PRNG key.
      batches: host array-like (n,) of batch labels.
      y: (n,) phenotype (device or host).
      num: number of permutations.

    Returns (n, num) array whose columns are within-batch permutations of y.
    """
    y = jnp.asarray(y)
    _, ids = _encode_groups(batches)
    # positions sorted stably by batch (the reference's concatenated
    # np.where layout) — host-computable, no RNG involved
    pos_by_batch = np.argsort(ids, kind="stable").astype(np.int32)
    return _conditional_permutation_dev(
        key, jnp.asarray(ids), jnp.asarray(pos_by_batch), y, num)


def grouplevel_permutation(key, groups, y, num):
    """Permute donor-level values of ``y`` and broadcast to samples.

    Requires ``y`` constant within each group (reference ``_stats.py:28-30``
    prints an error and returns None; we raise, which is strictly safer).
    """
    y = jnp.asarray(y)
    y_host = np.asarray(y)
    uniq, ids = _encode_groups(groups)
    ng = len(uniq)
    first = np.full(ng, -1, dtype=np.int64)
    for i in range(len(ids) - 1, -1, -1):
        first[ids[i]] = i
    yg = y_host[first]
    if np.any(yg[ids] != y_host):
        raise ValueError(
            "phenotype must be constant within each donor group for "
            "donor-level permutation"
        )
    return _grouplevel_permutation_dev(key, jnp.asarray(yg),
                                       jnp.asarray(ids), num)


@partial(jax.jit, static_argnames=("num",))
def _grouplevel_permutation_dev(key, yg, ids, num):
    ng = yg.shape[0]
    r = jax.random.uniform(key, (ng, num))
    order = jnp.argsort(r, axis=0)
    yg_perm = yg[order]  # (ng, num)
    return yg_perm[ids]  # (n, num)
