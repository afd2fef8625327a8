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
    return xc @ evecs, evals, evecs


def pca_array(x, n_comps=50):
    """Return (scores (N, n_comps), explained variance, components)."""
    x = jnp.asarray(x)
    n_comps = min(n_comps, x.shape[1], x.shape[0])
    scores, evals, evecs = _pca_core(x)
    return scores[:, :n_comps], evals[:n_comps], evecs[:, :n_comps]


def pca(data, n_comps=50, key_added="X_pca"):
    """Compute PCA of ``data.X`` into ``data.obsm[key_added]``.

    Returns the scores array.  Variance diagnostics are recorded in
    ``data.uns['pca']``.
    """
    if data.X is None:
        raise ValueError("data.X is required for PCA")
    scores, variance, components = pca_array(data.X, n_comps=n_comps)
    data.obsm[key_added] = np.asarray(scores)
    total_var = float(np.asarray(jnp.asarray(data.X).var(axis=0, ddof=1).sum()))
    data.uns["pca"] = {
        "variance": np.asarray(variance),
        "variance_ratio": np.asarray(variance) / total_var,
        "components": np.asarray(components),
    }
    return data.obsm[key_added]
