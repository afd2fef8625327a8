"""Measure (8,128)-tile gather dedup potential of the diffusion SpMM.

For each aligned block of 8 rows, count unique neighbor tiles
(col // 8) vs. the 8*K tile fetches the row-gather path performs.
"""
import os
import time

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from cna_tpu import pp
from cna_tpu.data import synthetic_dataset
from cna_tpu.graph.blocks import cluster_ordering
from cna_tpu.graph.ell import _pack_ell_host
from cna_tpu.graph.reorder import permute_graph

N_CELLS = int(os.environ.get("N_CELLS", 50000))
n_samples = 50
d, samplem = synthetic_dataset(
    n_samples=n_samples, cells_per_sample=N_CELLS // n_samples,
    n_genes=50, seed=0)
t0 = time.time()
pp.pca(d, n_comps=20)
pp.neighbors(d, n_neighbors=15)
print(f"graph built in {time.time()-t0:.1f}s")

a = d.obsp["connectivities"].tocsr()


def dedup_stats(a, label):
    parts = _pack_ell_host(a)
    idx = parts["indices"]  # (N, K) with padding -> row 0, weight 0
    w = parts["weights"]
    n, k = idx.shape
    nb = n // 8 * 8
    idx = idx[:nb].reshape(-1, 8, k)
    valid = w[:nb].reshape(-1, 8, k) != 0
    tiles = idx // 8
    uniq = np.empty(tiles.shape[0], dtype=np.int32)
    for i in range(tiles.shape[0]):
        uniq[i] = len(np.unique(tiles[i][valid[i]]))
    fetches_row = valid.sum(axis=(1, 2))  # actual nonpadding fetches
    print(f"{label}: K={k} mean_valid/block={fetches_row.mean():.0f} "
          f"uniq_tiles mean={uniq.mean():.1f} p50={np.percentile(uniq,50):.0f} "
          f"p99={np.percentile(uniq,99):.0f} max={uniq.max()} "
          f"traffic_ratio={uniq.mean()/ (8*k):.3f} "
          f"(vs padded row-gather), {uniq.mean()/fetches_row.mean():.3f} vs valid")


dedup_stats(a, "natural order")
t0 = time.time()
ordering = cluster_ordering(np.asarray(d.obsm["X_pca"]), block_size=8)
print(f"kd ordering in {time.time()-t0:.1f}s")
a2 = permute_graph(a, ordering)
dedup_stats(a2, "kd order   ")
