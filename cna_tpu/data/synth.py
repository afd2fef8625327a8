"""Scalable synthetic multi-sample single-cell data generator.

Generalizes the reference's demo fixture recipe (demo/makedata.ipynb
cells 2-5): samples carry case/male covariates; cells mix three
expression archetypes with covariate-driven proportions plus Gaussian
noise; batches tile over samples.  Used by the benchmark configs
(BASELINE.json 1-5: demo-scale through 1M-cell atlas-scale) and tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .celldata import CellData


def _mixture_weights(props, c):
    cell_ids = np.concatenate(
        [np.full(max(int(p * c), 0), i) for i, p in enumerate(props)])
    cell_ids = np.concatenate(
        [cell_ids[:c], np.full(max(c - len(cell_ids), 0), len(props))])
    w = np.zeros((c, len(props) + 1))
    w[np.arange(c), cell_ids] = 1
    return w


def synthetic_dataset(n_samples=50, cells_per_sample=200, n_genes=50,
                      noise=1.0, n_batches=5, seed=0, dtype=np.float32):
    """Generate (CellData, sample-metadata DataFrame with case/male/batch).

    Deterministic in ``seed``.  No graph is built — callers run
    ``cna_tpu.pp.pca`` + ``cna_tpu.pp.neighbors`` (or import one).
    ``dtype=np.float64`` keeps the downstream graph weights in f64 for
    bit-close golden comparisons; f32 is the throughput default.
    """
    rng = np.random.RandomState(seed)

    covs = pd.DataFrame(index=pd.Series(np.arange(n_samples), name="id"))
    covs["case"] = (np.arange(n_samples) >= n_samples // 2).astype(int)
    q = n_samples // 4
    covs["male"] = np.concatenate([
        np.zeros(q), np.ones(q), np.zeros(q), np.ones(n_samples - 3 * q)
    ]).astype(int)
    covs["baseline"] = 1

    h = np.zeros((3, n_genes))
    h[0, : n_genes // 2] = 1
    h[1, n_genes // 2 :] = 1
    h[2, : n_genes // 2] = 1
    h[2, : n_genes // 4] = 2

    props = np.array([
        [0.2, -0.2],
        [-0.2, 0.0],
        [0.5, 0.5],
    ])

    blocks = []
    for _, row in covs.iterrows():
        w = _mixture_weights(
            row[["case", "male", "baseline"]].to_numpy() @ props,
            cells_per_sample)
        blocks.append(
            (w @ h + noise * rng.randn(cells_per_sample, n_genes))
            .astype(dtype))
    x = np.concatenate(blocks)

    obs = pd.DataFrame(
        {"id": np.repeat(covs.index.to_numpy(), cells_per_sample)},
        index=pd.Index([f"cell_{i}" for i in range(len(x))], name="cell"))
    var = pd.DataFrame(
        index=pd.Index([f"gene_{i}" for i in range(n_genes)], name="gene"))

    samplem = covs.drop(columns=["baseline"]).copy()
    samplem["batch"] = np.tile(
        np.arange(n_batches), -(-n_samples // n_batches))[:n_samples]
    obs = obs.join(samplem, on="id")

    d = CellData(X=x, obs=obs, var=var, samplem=samplem, sid_name="id")
    return d, samplem
