"""Highly-variable-gene selection (the scanpy recipe upstream of PCA).

The reference assumes preprocessing happened in scanpy before its
library boundary (reference demo.ipynb cell 29 runs on an already
PCA-reduced graph).  Real atlases enter as sparse cells x 20k-gene count
matrices; the standard pipeline (``sc.pp.highly_variable_genes``,
Seurat-dispersion flavor) reduces to ~2k informative genes before PCA.
This port makes that step in-framework so a sparse h5ad can run
``select_hvg -> pca -> neighbors -> association`` end to end without
materializing a dense X.

Single streaming pass over row chunks: per-gene mean and variance, then
dispersion = var/mean normalized within mean-quantile bins (z-score), top
``n_top`` genes kept.
"""

from __future__ import annotations

import numpy as np


def _gene_moments(x, chunk_rows=262_144):
    """Per-gene (mean, var) of a sparse or dense matrix, streaming."""
    import scipy.sparse as sp

    n, g = x.shape
    s = np.zeros(g)
    ss = np.zeros(g)
    for lo in range(0, n, chunk_rows):
        blk = x[lo : lo + chunk_rows]
        if sp.issparse(blk):
            s += np.asarray(blk.sum(axis=0)).ravel()
            ss += np.asarray(blk.multiply(blk).sum(axis=0)).ravel()
        else:
            blk = np.asarray(blk)
            s += blk.sum(axis=0)
            ss += (blk * blk).sum(axis=0)
    mean = s / n
    var = (ss - n * mean * mean) / max(n - 1, 1)
    return mean, np.maximum(var, 0.0)


def select_hvg(data, n_top=2000, n_bins=20, subset=True,
               key_added="highly_variable"):
    """Flag (and by default subset to) the ``n_top`` most variable genes.

    Seurat-flavor dispersion: ``disp = var / mean`` per gene, z-scored
    within ``n_bins`` mean-quantile bins (so lowly- and highly-expressed
    genes compete only with their peers); the top ``n_top`` by normalized
    dispersion are kept.  Writes a boolean ``var[key_added]`` column;
    with ``subset=True`` also slices ``X``/``var`` down to the kept
    genes (sparse X stays sparse).

    Returns the boolean keep mask over the ORIGINAL gene axis.
    """
    import scipy.sparse as sp

    if data.X is None:
        raise ValueError("data.X is required for HVG selection")
    n, g = data.X.shape
    n_top = min(n_top, g)
    mean, var = _gene_moments(data.X)

    with np.errstate(divide="ignore", invalid="ignore"):
        disp = np.where(mean > 0, var / np.maximum(mean, 1e-12), 0.0)

    # mean-quantile bins; z-score dispersion within each bin.  The bin
    # count adapts down so each bin keeps >= ~25 genes — z-scores within
    # tiny bins are noise (n_bins=20 is calibrated for ~20k-gene panels)
    n_bins = int(np.clip(g // 25, 1, n_bins))
    order = np.argsort(mean, kind="stable")
    ranks = np.empty(g, dtype=np.int64)
    ranks[order] = np.arange(g)
    bins = np.minimum((ranks * n_bins) // g, n_bins - 1)
    norm_disp = np.zeros(g)
    for b in range(n_bins):
        sel = bins == b
        if not sel.any():
            continue
        d = disp[sel]
        sd = d.std()
        norm_disp[sel] = (d - d.mean()) / (sd if sd > 0 else 1.0)

    keep = np.zeros(g, dtype=bool)
    keep[np.argsort(norm_disp, kind="stable")[::-1][:n_top]] = True

    data.var[key_added] = keep
    if subset:
        x = data.X
        data.X = (x[:, keep].tocsr() if sp.issparse(x)
                  else np.ascontiguousarray(np.asarray(x)[:, keep]))
        data.var = data.var.loc[keep].copy()
    return keep
