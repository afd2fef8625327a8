"""Build the synthetic-manifold graph ONCE (on the default backend —
the TPU when available) and cache it as an npz for the CPU-mesh halo
studies (scripts/halo_scaling.py reads it via CNA_GRAPH_CACHE).

    CNA_BENCH_CELLS=1000000 CNA_GRAPH_CACHE=.cache_graph_1m.npz \
        timeout 1200 python scripts/build_graph_cache.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from cna_tpu import config, pp
from cna_tpu.data import synthetic_dataset

N_CELLS = int(os.environ.get("CNA_BENCH_CELLS", 1_000_000))
N_SAMPLES = int(os.environ.get("CNA_BENCH_SAMPLES", 200))
cache = os.environ.get("CNA_GRAPH_CACHE")
assert cache, "set CNA_GRAPH_CACHE"

config.enable_compilation_cache(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
config.warmup_transfers_async()

t0 = time.time()
d, _ = synthetic_dataset(
    n_samples=N_SAMPLES, cells_per_sample=N_CELLS // N_SAMPLES,
    n_genes=50, seed=0, structure="manifold")
pp.pca(d, n_comps=20)
conn = pp.neighbors(d, n_neighbors=15)
print(f"graph built: {time.time() - t0:.1f}s", flush=True)

t0 = time.time()
if hasattr(conn, "tocsr"):
    conn = conn.tocsr()
x_pca = np.asarray(d.obsm["X_pca"])
print(f"materialized to host: {time.time() - t0:.1f}s nnz={conn.nnz}",
      flush=True)
np.savez(cache, data=conn.data.astype(np.float32), indices=conn.indices,
         indptr=conn.indptr, shape=np.asarray(conn.shape), x_pca=x_pca)
print(f"wrote {cache}", flush=True)
