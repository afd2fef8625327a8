"""pp.umap cost at scale (VERDICT r3 item 9; r4 item 3).

Builds the graph at CNA_UMAP_CELLS (default 500k) on the session
backend, then times each layout stage SEPARATELY (the r4 artifact
folded spectral init into the "per-epoch" number):

* spectral init (host LOBPCG) once;
* the SGD epoch loop warm, isolated, sync'd by pulling a scalar of the
  positions (axon ``block_until_ready`` does not block — CLAUDE.md);
* the sequential host baseline: a -O3 C++ transliteration of
  umap-learn's ``optimize_layout_euclidean`` inner loop (umap-learn /
  numba are not installable in this zero-egress image), single thread,
  on the identical edge set.

Writes UMAP_PROFILE.json (or UMAP_PROFILE_<n>k.json off-default).

    timeout 1800 python scripts/umap_profile.py
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _host_baseline(heads, tails, eps_edge, pos0, epochs):
    """Compile (once) and run the C++ sequential baseline."""
    import numpy as np

    src = os.path.join(os.path.dirname(__file__), "umap_host_baseline.cpp")
    exe = os.path.join(os.path.dirname(__file__), ".umap_host_baseline")
    if (not os.path.exists(exe)
            or os.path.getmtime(exe) < os.path.getmtime(src)):
        subprocess.run(["g++", "-O3", "-march=native", "-o", exe, src],
                       check=True)
    binf = "/tmp/umap_edges.bin"
    n = pos0.shape[0]
    with open(binf, "wb") as f:
        np.asarray([len(heads)], np.int32).tofile(f)
        np.asarray(heads, np.int32).tofile(f)
        np.asarray(tails, np.int32).tofile(f)
        np.asarray(eps_edge, np.float32).tofile(f)
        np.asarray(pos0, np.float32).reshape(-1).tofile(f)
    out = subprocess.run([exe, binf, str(n), str(epochs)],
                         capture_output=True, text=True, check=True)
    os.unlink(binf)
    return json.loads(out.stdout)


def main():
    import jax

    if os.environ.get("CNA_UMAP_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from cna_tpu import config as cna_config

    cna_config.warmup_transfers_async()

    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp

    from cna_tpu import pp
    from cna_tpu.data import synthetic_dataset
    from cna_tpu.pp.umap import (_fit_ab, _optimize_layout,
                                 _period_structure, spectral_init)

    n = int(os.environ.get("CNA_UMAP_CELLS", 500_000))
    probe_epochs = int(os.environ.get("CNA_UMAP_EPOCHS", 12))
    host_epochs = int(os.environ.get("CNA_UMAP_HOST_EPOCHS", 3))
    d, _ = synthetic_dataset(n_samples=50, cells_per_sample=n // 50,
                             n_genes=50, seed=0,
                             structure="manifold")
    t0 = time.time()
    pp.pca(d, n_comps=20)
    pp.neighbors(d, n_neighbors=15)
    t_graph = time.time() - t0

    # --- edge prep (same path as pp.umap) ---
    t0 = time.time()
    conn = d.obsp["connectivities"]
    if not sp.issparse(conn):
        conn = conn.tocsr()
    coo = sp.coo_matrix(sp.triu(conn, k=1) + sp.triu(conn.T, k=1))
    coo.sum_duplicates()
    w = coo.data.astype(np.float32)
    n_epochs_default = 500 if n <= 10_000 else 200
    w = np.where(w < w.max() / float(n_epochs_default), 0.0, w)
    keep = w > 0
    heads = coo.row[keep].astype(np.int32)
    tails = coo.col[keep].astype(np.int32)
    eps_edge = w.max() / w[keep]
    t_edges = time.time() - t0

    if os.environ.get("CNA_UMAP_SKIP_SPECTRAL"):
        # at 1M the host LOBPCG runs tens of minutes on this 2-core
        # host; the auto path uses PCA init there anyway
        pos0, init_mode, t_init = None, "skipped", -1.0
    else:
        t0 = time.time()
        pos0, init_mode = spectral_init(conn, n_components=2, seed=0)
        t_init = time.time() - t0
    # the pp.umap auto rule uses PCA init above 200k cells (spectral's
    # host LOBPCG measured 250 s at 500k on this 2-core host)
    t0 = time.time()
    emb = np.asarray(d.obsm["X_pca"])[:, :2]
    emb = emb - emb.mean(axis=0, keepdims=True)
    pos_pca = (emb * (10.0 / max(np.abs(emb).max(), 1e-12))).astype(
        np.float32)
    t_init_pca = time.time() - t0
    auto_init_s = t_init_pca if n > 200_000 else t_init
    if pos0 is None:
        pos0 = pos_pca
    a, b = _fit_ab()

    def run_epochs(epochs, seed):
        pos = _optimize_layout(
            jnp.asarray(pos0), jnp.asarray(heads), jnp.asarray(tails),
            jnp.asarray(eps_edge), jax.random.key(seed), a, b,
            n_epochs=epochs)
        return float(jnp.sum(pos))  # real sync through the tunnel

    t0 = time.time()
    run_epochs(probe_epochs, 0)
    t_cold = time.time() - t0
    t0 = time.time()
    run_epochs(probe_epochs, 1)
    t_warm = time.time() - t0
    # two-point decomposition: each _optimize_layout call pays a fixed
    # cost (host period-structure build + group-array h2d) plus a
    # per-epoch rate; probing one epoch count conflates them
    t0 = time.time()
    run_epochs(4 * probe_epochs, 2)
    t_warm4 = time.time() - t0
    per_epoch = (t_warm4 - t_warm) / (3 * probe_epochs)
    fixed_s = max(t_warm - probe_epochs * per_epoch, 0.0)

    host = _host_baseline(heads, tails, eps_edge, pos0, host_epochs)

    out = {
        "cells": n,
        "edges": int(len(heads)),
        "platform": jax.devices()[0].platform,
        "graph_build_s": round(t_graph, 1),
        "edge_prep_s": round(t_edges, 2),
        "spectral_init_s": round(t_init, 2),
        "probe_epochs": probe_epochs,
        "probe_cold_s": round(t_cold, 1),
        "probe_warm_s": round(t_warm, 1),
        "probe_warm_4x_s": round(t_warm4, 1),
        "per_epoch_s": round(per_epoch, 4),
        "layout_fixed_s": round(fixed_s, 2),
        "pca_init_s": round(t_init_pca, 2),
        "projected_default_run_s": round(
            per_epoch * n_epochs_default + fixed_s + auto_init_s
            + t_edges, 1),
        "default_epochs": n_epochs_default,
        "init": init_mode,
        "auto_init": "pca" if n > 200_000 else "spectral",
        "period_groups": [
            [g["period"], int(len(g["heads"]))]
            for g in _period_structure(heads, tails, eps_edge, n)],
        "host_baseline": {
            "impl": "sequential C++ -O3 transliteration of umap-learn's "
                    "optimize_layout_euclidean (umap-learn/numba not "
                    "installable here), 1 thread, same edges",
            "epochs": host["epochs"],
            "per_epoch_s": host["per_epoch_s"],
            "projected_default_run_s": round(
                host["per_epoch_s"] * n_epochs_default, 1),
        },
        "per_epoch_speedup_vs_host": round(
            host["per_epoch_s"] / per_epoch, 1),
        "note": (
            "Period-bucketed due-edge SGD: pow2-quantized visit periods under lax.cond, scatter-free [h||t||h] segment accumulation (cumsum + boundary diff + dense add), R-row-window negative table, dynamic segment bounds (one compiled program). per_epoch_s is the incremental rate from a two-point (12/48-epoch) fit; layout_fixed_s is the per-call structure-build + h2d cost. The r4 all-edges scatter-add design ran 3.08 s/epoch at 500k."), r5; the r4 design's three "
                 "(E,2) scatter-adds dominated at 3.1 s/epoch/500k."),
    }
    suffix = "" if n == 500_000 else f"_{n // 1000}k"
    path = os.path.join(os.path.dirname(__file__), "..",
                        f"UMAP_PROFILE{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
