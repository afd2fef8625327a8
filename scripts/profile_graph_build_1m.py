"""Fine-grained 1M-cell graph-build profile on the real TPU.

Where do the ~144 s of warm graph build (BENCH_NORTHSTAR_r02) go?
Runs pp.pca + pp.neighbors twice (cold, then warm) with the phase
profiler enabled so the IVF-internal phases (kmeans, pilot rounds,
exact-truth sample, search, recall check) and the host fuzzy-union
report individually.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(cache_dir, exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cna_tpu import config as cna_config

cna_config.warmup_transfers_async()

import numpy as np

from cna_tpu import pp
from cna_tpu.data import synthetic_dataset
from cna_tpu.utils import profiling

n_cells = int(os.environ.get("CNA_BENCH_CELLS", 1_000_000))
n_samples = int(os.environ.get("CNA_BENCH_SAMPLES", 200))

t0 = time.time()
d, samplem = synthetic_dataset(
    n_samples=n_samples, cells_per_sample=n_cells // n_samples, n_genes=50,
    seed=0)
print(f"synthetic_dataset: {time.time() - t0:.1f}s", flush=True)

for run in ("cold", "warm"):
    if run == "warm":
        d, samplem = synthetic_dataset(
            n_samples=n_samples, cells_per_sample=n_cells // n_samples,
            n_genes=50, seed=1)
    prof = profiling.enable_profiling()
    t0 = time.time()
    try:
        pp.pca(d, n_comps=20)
        t1 = time.time()
        conn = pp.neighbors(d, n_neighbors=15)
        if hasattr(conn, "ell"):
            # force real completion of the async device graph build
            # (axon block_until_ready does not block; CLAUDE.md)
            import jax.numpy as jnp

            float(jnp.sum(conn.ell.colsums_raw))
        t2 = time.time()
        print(f"[{run}] pca {t1 - t0:.1f}s neighbors {t2 - t1:.1f}s "
              f"total {t2 - t0:.1f}s", flush=True)
    except Exception as e:  # report the phases that DID complete
        print(f"[{run}] CRASHED after {time.time() - t0:.1f}s: {e!r}",
              flush=True)
        prof.report(out=lambda *a: print(" ", *a, flush=True))
        raise
    prof.report(out=lambda *a: print(" ", *a, flush=True))
