"""Real-TPU probe of the two-level fine-block IVF (pp.ivf_fine).

Mirrors the bench graph-build workload: synthetic archetype dataset ->
PCA scores -> fine IVF search, reporting per-phase wall clock and the
held-out measured recall.  Run under ``timeout`` (CLAUDE.md: never let a
TPU probe hang the claim).

Usage: python scripts/probe_fine_tpu.py [n_cells] [k]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cna_tpu import config as cna_config
    from cna_tpu import pp
    from cna_tpu.data import synthetic_dataset
    from cna_tpu.utils import profiling

    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    cna_config.warmup_transfers_async()

    print(f"# backend: {jax.devices()[0].platform}", file=sys.stderr)
    d, _ = synthetic_dataset(n_samples=50, cells_per_sample=n // 50,
                             n_genes=50, seed=0)
    prof = profiling.enable_profiling()
    t0 = time.time()
    pp.pca(d, n_comps=20)
    rep = d.obsm["X_pca"]
    t_pca = time.time() - t0
    print(f"# pca: {t_pca:.2f}s", file=sys.stderr)

    from cna_tpu.pp.ivf_fine import ivf_knn_fine

    for rep_i in range(2):
        t0 = time.time()
        res = ivf_knn_fine(np.asarray(rep, np.float32), k, seed=rep_i)
        # force the real sync: pull a scalar reduction (axon
        # block_until_ready lies; CLAUDE.md)
        _ = float(jnp.sum(res.dists[:, 1]))
        dt = time.time() - t0
        print(f"# run {rep_i} ({'cold' if rep_i == 0 else 'warm'}): "
              f"{dt:.2f}s  u={res.u}  verify-recall={res.recall:.4f}",
              file=sys.stderr)
    prof.report(out=lambda *a: print("#", *a, file=sys.stderr))


if __name__ == "__main__":
    main()
