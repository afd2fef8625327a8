"""Synthetic multi-sample single-cell fixtures.

``make_demo_dataset`` follows the generative recipe of the reference's
``demo/makedata.ipynb`` (cells 2-5): N samples x C cells x G genes, three
expression archetypes mixed by case/male covariates, Gaussian noise, five
batches tiled over samples.  The committed demo h5ad is absent from the
reference mount, so the fixture is regenerated deterministically; the
cell-cell graph comes from cna_tpu.pp (scanpy is not available here), and
the same graph is fed to both the reference implementation and cna_tpu in
golden tests so their outputs are directly comparable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cna_tpu import CellData, pp


def _mixture_weights(props, c):
    """Per-sample cell-population one-hot (the reference's getW)."""
    cell_ids = np.concatenate(
        [np.full(int(p * c), i) for i, p in enumerate(props)]
    )
    cell_ids = np.concatenate(
        [cell_ids, np.full(c - len(cell_ids), len(props))]
    )
    w = np.zeros((c, len(props) + 1))
    w[np.arange(c), cell_ids] = 1
    return w


def make_demo_dataset(n_samples=50, n_genes=50, cells_per_sample=200,
                      noise=1.0, n_batches=5, seed=0, build_graph=True,
                      n_neighbors=15):
    """Generate the demo-scale synthetic dataset.

    Returns (CellData, samplem DataFrame indexed by sample id with columns
    case/male/batch).
    """
    rng = np.random.RandomState(seed)

    covs = pd.DataFrame(index=pd.Series(np.arange(n_samples), name="id"))
    covs["case"] = [0] * (n_samples // 2) + [1] * (n_samples - n_samples // 2)
    q = n_samples // 4
    covs["male"] = ([0] * q + [1] * q + [0] * q + [1] * (n_samples - 3 * q))
    covs["baseline"] = 1

    h = np.zeros((3, n_genes))
    h[0, : n_genes // 2] = 1
    h[1, n_genes // 2 :] = 1
    h[2, : n_genes // 2] = 1
    h[2, : n_genes // 4] = 2

    props = np.array([
        [0.2, -0.2],   # case
        [-0.2, 0.0],   # male
        [0.5, 0.5],    # baseline
    ])

    ws = [
        _mixture_weights(row[["case", "male", "baseline"]].to_numpy() @ props,
                         cells_per_sample)
        for _, row in covs.iterrows()
    ]
    x = np.concatenate(
        [w @ h + noise * rng.randn(cells_per_sample, n_genes) for w in ws]
    )

    obs = pd.DataFrame(
        {"id": np.repeat(covs.index.to_numpy(), cells_per_sample)},
        index=pd.Index([f"cell_{i}" for i in range(len(x))], name="cell"),
    )
    var = pd.DataFrame(
        index=pd.Index([f"gene_{i}" for i in range(n_genes)], name="gene"))

    samplem = covs.drop(columns=["baseline"]).copy()
    samplem["batch"] = np.tile(range(n_batches), n_samples // n_batches)

    # cell-level copies of sample metadata (as demo's anndata flattening)
    obs = obs.join(samplem, on="id")

    d = CellData(X=x, obs=obs, var=var)
    if build_graph:
        pp.pca(d, n_comps=min(50, n_genes))
        pp.neighbors(d, n_neighbors=n_neighbors)
    return d, samplem
