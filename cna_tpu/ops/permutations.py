"""Permutation-null generation for the association test.

Replaces reference ``_stats.py:4-32``:

* ``conditional_permutation`` — permute the phenotype independently within
  each batch, ``num`` times (the reference does ``argsort(randn)`` per
  batch block; here each batch block gets a vmapped ``argsort`` of uniform
  keys, which induces the same uniform distribution over within-batch
  permutations).
* ``grouplevel_permutation`` — permute donor-level phenotype values and
  broadcast back to samples (reference validates the phenotype is constant
  within donor).

Exact bit-replication of numpy's global-seed stream is impossible (and
meaningless) under JAX's counter-based PRNG; agreement with the reference
is distributional, and the association layer accepts precomputed null
matrices (``null_y``) for exact regression tests against the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _encode_groups(values):
    """Host-side: map group labels to [0, G) ids in np.unique (sorted) order."""
    values = np.asarray(values)
    uniq, ids = np.unique(values, return_inverse=True)
    return uniq, ids.astype(np.int32)


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
    n = y.shape[0]
    _, ids = _encode_groups(batches)
    out = jnp.zeros((n, num), dtype=y.dtype)
    nb = int(ids.max()) + 1 if n else 0
    keys = jax.random.split(key, nb)
    for b in range(nb):
        idx = np.nonzero(ids == b)[0]
        r = jax.random.uniform(keys[b], (len(idx), num))
        order = jnp.argsort(r, axis=0)  # (len(idx), num) random perms
        permuted = y[idx][order]  # (len(idx), num)
        out = out.at[idx].set(permuted)
    return out


def grouplevel_permutation(key, groups, y, num):
    """Permute donor-level values of ``y`` and broadcast to samples.

    Requires ``y`` constant within each group (reference ``_stats.py:28-30``
    prints an error and returns None; we raise, which is strictly safer).
    """
    y = jnp.asarray(y)
    y_host = np.asarray(y)
    uniq, ids = _encode_groups(groups)
    ng = len(uniq)
    # first occurrence of each group, in sorted-unique order
    first = np.zeros(ng, dtype=np.int64)
    seen = np.full(ng, False)
    for i, g in enumerate(ids):
        if not seen[g]:
            first[g] = i
            seen[g] = True
    yg = y_host[first]
    if np.any(yg[ids] != y_host):
        raise ValueError(
            "phenotype must be constant within each donor group for "
            "donor-level permutation"
        )
    r = jax.random.uniform(key, (ng, num))
    order = jnp.argsort(r, axis=0)  # (ng, num)
    yg_perm = jnp.asarray(yg)[order]  # (ng, num)
    return yg_perm[ids]  # (n, num)
