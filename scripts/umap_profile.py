"""pp.umap cost at scale (VERDICT r3 item 9).

Builds the graph at CNA_UMAP_CELLS (default 500k) on the session
backend, runs a measured slice of UMAP epochs (the epoch loop is
macro-batched into several-second dispatches — a single all-epochs
dispatch was a tunnel-killer), and writes UMAP_PROFILE.json with the
measured per-epoch cost and the projected full-run wall clock.

    timeout 1800 python scripts/umap_profile.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from cna_tpu import config as cna_config

    cna_config.warmup_transfers_async()

    from cna_tpu import pp
    from cna_tpu.data import synthetic_dataset

    n = int(os.environ.get("CNA_UMAP_CELLS", 500_000))
    probe_epochs = int(os.environ.get("CNA_UMAP_EPOCHS", 12))
    d, _ = synthetic_dataset(n_samples=50, cells_per_sample=n // 50,
                             n_genes=50, seed=0)
    t0 = time.time()
    pp.pca(d, n_comps=20)
    pp.neighbors(d, n_neighbors=15)
    t_graph = time.time() - t0

    # cold (compile) pass, then the measured pass
    t0 = time.time()
    pp.umap(d, n_epochs=probe_epochs, seed=0)
    t_cold = time.time() - t0
    t0 = time.time()
    pp.umap(d, n_epochs=probe_epochs, seed=1)
    t_warm = time.time() - t0

    default_epochs = 200 if n > 10_000 else 500
    per_epoch = t_warm / probe_epochs
    out = {
        "cells": n,
        "platform": jax.devices()[0].platform,
        "graph_build_s": round(t_graph, 1),
        "probe_epochs": probe_epochs,
        "probe_cold_s": round(t_cold, 1),
        "probe_warm_s": round(t_warm, 1),
        "per_epoch_s": round(per_epoch, 3),
        "projected_default_run_s": round(per_epoch * default_epochs, 1),
        "default_epochs": default_epochs,
        "init": d.uns["umap"]["init"],
        "note": ("Epoch loop is macro-batched into ~2e8-element "
                 "dispatches; per-epoch cost is dominated by the "
                 "(E, 2)-into-(N, 2) scatter-adds of the SGD updates."),
    }
    path = os.path.join(os.path.dirname(__file__), "..",
                        "UMAP_PROFILE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
