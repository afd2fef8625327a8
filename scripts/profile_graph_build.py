"""Phase-level profile of graph construction on the real TPU.

Times every stage of pp.pca + pp.neighbors at CNA_BENCH_CELLS cells so we
know where the wall-clock goes (VERDICT round-1 item 4: 121 s at 100k).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

t_import0 = time.time()
import numpy as np


def stamp(label, t0):
    print(f"[{time.time() - t_start:8.1f}s] {label}: {time.time() - t0:.2f}s",
          flush=True)
    return time.time()


t_start = time.time()

cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(cache_dir, exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cna_tpu import config as cna_config

cna_config.warmup_transfers_async()

from cna_tpu.data import synthetic_dataset
from cna_tpu import pp
from cna_tpu.pp.knn import knn_search
from cna_tpu.pp.neighbors import fuzzy_connectivities, _fuzzy_union_edges, smooth_knn_dist, membership_strengths
import jax.numpy as jnp
import scipy.sparse as sp

n_cells = int(os.environ.get("CNA_BENCH_CELLS", 100_000))
n_samples = 50

t0 = time.time()
d, samplem = synthetic_dataset(
    n_samples=n_samples, cells_per_sample=n_cells // n_samples, n_genes=50,
    seed=0)
t0 = stamp("synthetic_dataset", t0)

pp.pca(d, n_comps=20)
t0 = stamp("pca", t0)

rep = np.asarray(d.obsm["X_pca"])

# -- kNN breakdown --
indices, dists = knn_search(rep, 15)
t0 = stamp("knn_search cold (incl compile + d2h)", t0)
indices, dists = knn_search(rep, 15)
t0 = stamp("knn_search warm", t0)

# -- fuzzy connectivities breakdown --
dd = jnp.asarray(dists)
rho, sigma = smooth_knn_dist(dd, jnp.log2(jnp.asarray(15.0)))
w = membership_strengths(dd, rho, sigma)
w.block_until_ready()
t0 = stamp("smooth_knn+strengths cold", t0)
w_host = np.asarray(w)
t0 = stamp("w d2h", t0)
rows, cols, vals = _fuzzy_union_edges(np.asarray(indices), w_host)
t0 = stamp("fuzzy union host", t0)
conn = sp.csr_matrix((vals, (rows, cols)), shape=(n_cells, n_cells))
conn.eliminate_zeros()
t0 = stamp("csr build", t0)

# distances matrix (in neighbors())
rows2 = np.repeat(np.arange(n_cells), 14)
dist_mat = sp.csr_matrix(
    (dists[:, 1:].ravel(), (rows2, indices[:, 1:].ravel())),
    shape=(n_cells, n_cells))
t0 = stamp("distances csr", t0)

# -- downstream graph pack (not in bench graph_s but on the assoc path) --
d.obsp["connectivities"] = conn
from cna_tpu.tools._nam import get_device_graph

graph, ordering = get_device_graph(d)
jax.block_until_ready(graph.indices)
t0 = stamp("device graph pack (bucketed)", t0)

print(f"TOTAL {time.time() - t_start:.1f}s", flush=True)
