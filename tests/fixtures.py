"""Synthetic multi-sample single-cell fixtures.

Delegates data generation to ``cna_tpu.data.synthetic_dataset`` (the
reference's demo/makedata.ipynb recipe, cells 2-5) and builds the
cell-cell graph with cna_tpu.pp — the same graph is fed to both the
reference implementation and cna_tpu in golden tests so their outputs are
directly comparable.  (The committed demo h5ad is absent from the
reference mount, and scanpy is unavailable here.)
"""

from __future__ import annotations

from cna_tpu import pp
from cna_tpu.data import synthetic_dataset


def make_demo_dataset(n_samples=50, n_genes=50, cells_per_sample=200,
                      noise=1.0, n_batches=5, seed=0, build_graph=True,
                      n_neighbors=15):
    """Generate the demo-scale synthetic dataset.

    Returns (CellData, samplem DataFrame indexed by sample id with columns
    case/male/batch).
    """
    import numpy as np

    d, samplem = synthetic_dataset(
        n_samples=n_samples, cells_per_sample=cells_per_sample,
        n_genes=n_genes, noise=noise, n_batches=n_batches, seed=seed,
        dtype=np.float64)
    if build_graph:
        pp.pca(d, n_comps=min(50, n_genes))
        pp.neighbors(d, n_neighbors=n_neighbors)
    return d, samplem
