"""PCA on device.

The reference delegates PCA to scanpy upstream of the library boundary
(demo.ipynb cell 29 runs ``sc.pp.neighbors`` on a PCA representation).
Here PCA is in-framework: centered (not scaled) principal components via
an eigendecomposition of the gene-gene covariance — the Gram trick on the
small axis, since n_genes << n_cells in the target workloads.  All the
FLOPs (X^T X and the projection) are MXU matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _pca_core(x):
    xc = x - x.mean(axis=0, keepdims=True)
    cov = (xc.T @ xc) / (x.shape[0] - 1)
    evals, evecs = jnp.linalg.eigh(cov)
    evals = evals[::-1]
    evecs = evecs[:, ::-1]
    # total variance = trace of the covariance (for variance_ratio) —
    # computed here so the caller never re-uploads X for diagnostics
    return xc @ evecs, evals, evecs, jnp.trace(cov)


def pca_array(x, n_comps=50):
    """Return (scores (N, n_comps), explained variance, components)."""
    x = jnp.asarray(x)
    n_comps = min(n_comps, x.shape[1], x.shape[0])
    scores, evals, evecs, _ = _pca_core(x)
    return scores[:, :n_comps], evals[:n_comps], evecs[:, :n_comps]


def pca(data, n_comps=50, key_added="X_pca"):
    """Compute PCA of ``data.X`` into ``data.obsm[key_added]``.

    Returns the scores array.  Variance diagnostics are recorded in
    ``data.uns['pca']``.
    """
    if data.X is None:
        raise ValueError("data.X is required for PCA")
    x = jnp.asarray(data.X)
    n_comps = min(n_comps, x.shape[1], x.shape[0])
    scores_d, evals_d, evecs_d, tvar_d = _pca_core(x)
    # one batched device->host fetch for everything
    scores, variance, components, total_var = jax.device_get(
        (scores_d[:, :n_comps], evals_d[:n_comps], evecs_d[:, :n_comps],
         tvar_d))
    data.obsm[key_added] = scores
    data.uns["pca"] = {
        "variance": variance,
        "variance_ratio": variance / float(total_var),
        "components": components,
    }
    return data.obsm[key_added]
