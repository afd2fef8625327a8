"""Benchmark driver: end-to-end CNA association on TPU vs the reference.

Emits ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Workload (BASELINE.json config-3 scale, sized to stay CPU-baselineable):
a synthetic multi-sample dataset, kNN graph built on device, then the
full association pipeline (NAM diffusion + residualization + 1000-
permutation global test + local FDR test).  ``value`` is cna_tpu's warm
end-to-end association wall-clock; ``vs_baseline`` is the speedup over
the pinned reference implementation (scipy/numpy, float64) running the
identical association on the identical graph on this host's CPU.

Scale knobs via env: CNA_BENCH_CELLS (total cells, default 100000),
CNA_BENCH_NNULL (default 1000).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _setup_cache():
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # overlap the tunnel's one-time first-d2h setup (~70s) with data prep
    from cna_tpu import config as cna_config

    cna_config.warmup_transfers_async()


def _build_workload(n_cells, n_samples, nnull):
    import numpy as np

    from cna_tpu import pp
    from cna_tpu.data import synthetic_dataset

    cells_per = n_cells // n_samples
    d, samplem = synthetic_dataset(
        n_samples=n_samples, cells_per_sample=cells_per, n_genes=50, seed=0)
    t0 = time.time()
    pp.pca(d, n_comps=20)
    pp.neighbors(d, n_neighbors=15)
    graph_s = time.time() - t0
    y = samplem["case"].astype(float)
    return d, samplem, y, graph_s


def _run_cna_tpu(d, y, nnull, seed=0):
    import cna_tpu

    t0 = time.time()
    p = cna_tpu.tl.association(d, y, "id", Nnull=nnull, seed=seed)
    return time.time() - t0, p


def _run_reference(d, y, nnull, seed=0):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from ref_harness import load_reference, ref_data_from

    cna_ref = load_reference()
    rd = ref_data_from(d, sid_cols=("id",))
    t0 = time.time()
    p = cna_ref.tl.association(rd, y, "id", Nnull=nnull, seed=seed)
    return time.time() - t0, p


def main():
    n_cells = int(os.environ.get("CNA_BENCH_CELLS", 100_000))
    nnull = int(os.environ.get("CNA_BENCH_NNULL", 1000))
    n_samples = 50

    _setup_cache()
    import warnings

    warnings.filterwarnings("ignore")

    d, samplem, y, graph_s = _build_workload(n_cells, n_samples, nnull)
    print(f"# graph build ({n_cells} cells): {graph_s:.1f}s", file=sys.stderr)

    # cold run (compilation) + warm run (steady state)
    cold_s, p_cold = _run_cna_tpu(d, y, nnull, seed=0)
    from cna_tpu.utils import profiling

    prof = profiling.enable_profiling()
    warm_s, p_warm = _run_cna_tpu(d, y, nnull, seed=1)
    print(f"# cna_tpu assoc: cold {cold_s:.1f}s warm {warm_s:.1f}s "
          f"(p={p_warm:.4g})", file=sys.stderr)
    prof.report(out=lambda *a: print("#", *a, file=sys.stderr))

    ref_s, p_ref = _run_reference(d, y, nnull, seed=0)
    print(f"# reference assoc (CPU f64): {ref_s:.1f}s (p={p_ref:.4g})",
          file=sys.stderr)

    print(json.dumps({
        "metric": f"association_e2e_{n_cells // 1000}k_cells_{nnull}perm",
        "value": round(warm_s, 3),
        "unit": "s",
        "vs_baseline": round(ref_s / warm_s, 3),
    }))


if __name__ == "__main__":
    main()
