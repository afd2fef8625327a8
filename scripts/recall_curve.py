"""Recall-vs-search-time curve for the fine-block IVF at atlas scale
(VERDICT r4 item 2: the operating point must be a CHOSEN spot on a
measured tradeoff, not where the first guess landed).

Builds the index once at CNA_CELLS (default 1M, manifold synthetic),
measures exact-kNN truth on a held-out sample once, then runs the FULL
search at a grid of fixed probe counts around the production operating
point, timing each warm search and measuring its sample recall.

Writes RECALL_CURVE_<n>k.json; the north-star bench embeds it.

    timeout 3600 python scripts/recall_curve.py
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

    import jax.numpy as jnp
    import numpy as np

    from cna_tpu.data import synthetic_dataset
    from cna_tpu.pp.ivf import _recall_against, exact_knn_sample
    from cna_tpu.pp.ivf_fine import _bucket16, ivf_knn_fine

    n = int(os.environ.get("CNA_CELLS", 1_000_000))
    k = int(os.environ.get("CNA_K", 15))
    # DEFAULT archetype structure — the north-star bench workload
    # (manifold data saturates recall ~1.0 at every probe count and
    # shows no tradeoff)
    d, _ = synthetic_dataset(n_samples=200, cells_per_sample=n // 200,
                             n_genes=50, seed=0)
    from cna_tpu import pp

    from cna_tpu.pp.pca import device_rep

    t0 = time.time()
    pp.pca(d, n_comps=20)
    rep = jnp.asarray(device_rep(d, d.obsm["X_pca"]), dtype=jnp.float32)
    print(f"# pca: {time.time() - t0:.1f}s", flush=True)

    # truth sample, measured once (shared across every probe count)
    rng = np.random.RandomState(7)
    q_ix = rng.choice(n, 512, replace=False)
    t0 = time.time()
    truth = exact_knn_sample(rep, q_ix, k, exact=False)
    print(f"# exact truth sample: {time.time() - t0:.1f}s", flush=True)

    # one calibrated run first: its chosen u anchors the grid (and its
    # pilot/verify behavior is exactly the production path)
    t0 = time.time()
    res = ivf_knn_fine(rep, k, seed=0, min_recall=0.9)
    t_prod = time.time() - t0
    u_star = res.u
    print(f"# production search: u={u_star} recall={res.recall:.3f} "
          f"({t_prod:.1f}s incl pilot+verify)", flush=True)

    grid = sorted({_bucket16(max(16, int(u_star * f)))
                   for f in (0.5, 0.75, 1.0, 1.5, 2.0)})

    # index build cost alone, measured once (every per-u run below
    # rebuilds identically; total_s - build_s ~ scoring cost).  The
    # final float() forces real device completion (axon sync gotcha).
    from cna_tpu.pp.ivf_fine import build_fine_index

    t0 = time.time()
    idx_b = build_fine_index(rep, n, rep.shape[1], seed=0)
    float(jnp.sum(idx_b.cents))
    build_s = time.time() - t0

    points = []
    for u in grid:
        t0 = time.time()
        r = ivf_knn_fine(rep, k, seed=0, min_recall=None, u0=u)
        # sample rows only cross the tunnel (d2h ~8 MB/s)
        inv = np.empty(n, dtype=np.int64)
        inv[r.order] = np.arange(n)
        got = np.asarray(r.indices[jnp.asarray(inv[q_ix])])
        dt = time.time() - t0
        rec = _recall_against(r.order[got], truth, k)
        pt = {"u": int(u), "coverage": round(u * r.index.g / n, 4),
              "total_s": round(dt, 2), "recall": round(rec, 4)}
        points.append(pt)
        print(f"# {pt}", flush=True)

    out = {
        "cells": n, "k": k,
        "production": {"u": int(u_star),
                       "verify_recall": round(res.recall, 4),
                       "search_s_incl_pilot": round(t_prod, 1),
                       "pilot_curve": [list(map(float, h))
                                       for h in res.history]},
        "curve": points,
        "index_build_s": round(build_s, 2),
        "note": ("Full warm searches at fixed probe counts; total_s "
                 "includes the per-call index rebuild (index_build_s, "
                 "identical across points). Recall "
                 "on one shared 512-query exact-truth sample. The "
                 "production pilot picks u to hit min_recall=0.9; the "
                 "curve shows the recall-vs-time tradeoff around that "
                 "operating point."),
    }
    path = os.path.join(os.path.dirname(__file__), "..",
                        f"RECALL_CURVE_{n // 1000}k.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
