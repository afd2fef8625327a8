"""Halo-exchange weak-scaling evidence (SURVEY §6: efficiency at 1 chip /
1 host / >=2 hosts; this rig has one chip, so the interconnect story is
reported as measured per-step BYTES and FLOPs as a function of shard
count, on the 100k-cell manifold synthetic).

For each shard count D: build the graph-partitioned halo plan, record
ghost fraction, true/padded exchange bytes per diffusion step vs the
GSPMD all-gather alternative, plan construction wall-clock, and the
per-shard SpMM FLOPs.  Writes HALO_SCALING.json.

Run on the CPU backend (plan construction is host+device-light):
    python scripts/halo_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
import jax.numpy as jnp

# default: CPU backend (plan construction is host+device-light).  At 1M
# cells the graph build itself needs the TPU — set CNA_HALO_PLATFORM=
# default to use the session's real backend, and CNA_GRAPH_CACHE=x.npz
# to build the graph once and reuse it across invocations.
if os.environ.get("CNA_HALO_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import scipy.sparse as sp

from cna_tpu import config, pp
from cna_tpu.data import synthetic_dataset
from cna_tpu.graph.partition import (embedding_clusters, partition_clusters,
                                     partition_ordering)
from cna_tpu.graph.reorder import permute_graph_unsorted
from cna_tpu.parallel import mesh as meshlib
from cna_tpu.parallel.halo import build_halo_plan_csr, halo_diffusion_step

# persistent compilation cache: the first partition otherwise absorbs a
# multi-ten-second k-means compile (the r4 artifact's 46 s D=2 outlier)
config.enable_compilation_cache(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

N_CELLS = int(os.environ.get("CNA_BENCH_CELLS", 100_000))
N_SAMPLES = int(os.environ.get("CNA_BENCH_SAMPLES", 200))
S_COLS = N_SAMPLES  # diffusion state width = samples
ITEM = 4  # f32

t0 = time.time()
cache = os.environ.get("CNA_GRAPH_CACHE")
if cache and os.path.exists(cache):
    z = np.load(cache)
    conn = sp.csr_matrix(
        (z["data"], z["indices"], z["indptr"]), shape=tuple(z["shape"]))
    x_pca = z["x_pca"]
    print(f"graph loaded from {cache}: {time.time() - t0:.1f}s "
          f"nnz={conn.nnz}", flush=True)
else:
    d, _ = synthetic_dataset(
        n_samples=N_SAMPLES, cells_per_sample=N_CELLS // N_SAMPLES,
        n_genes=50, seed=0, structure="manifold")
    pp.pca(d, n_comps=20)
    pp.neighbors(d, n_neighbors=15)
    conn = d.obsp["connectivities"].tocsr()
    x_pca = d.obsm["X_pca"]
    if cache:
        np.savez(cache, data=conn.data.astype(np.float32),
                 indices=conn.indices, indptr=conn.indptr,
                 shape=np.asarray(conn.shape), x_pca=x_pca)
    print(f"graph built: {time.time() - t0:.1f}s nnz={conn.nnz}", flush=True)

n_dev = len(jax.devices())
# steady-state methodology: a tiny throwaway plan build first absorbs
# one-time costs (lazy imports, allocator/page-fault warmup, first-call
# jit of the asarray paths) that otherwise land entirely on the first
# shard count measured — the r4/r5 artifacts showed D=2-only outliers
# (46 s partition r4; 8.5 s plan build r5) that were ordering, not D=2
_warm = sp.random(4096, 4096, density=0.002, random_state=0,
                  format="csr")
_warm = (_warm + _warm.T).tocsr()
build_halo_plan_csr(_warm, 2)
rows = []
# the k-means clustering is shard-count-independent: fit once, reuse
# across every D (partition_ordering's assembly half is seconds)
t1 = time.time()
cid = embedding_clusters(x_pca, partition_clusters(conn.shape[0], 32))
t_cluster = time.time() - t1
print(f"clustering: {t_cluster:.1f}s", flush=True)
for n_shards in (2, 4, 8, 16, 32):
    t1 = time.time()
    ordering = partition_ordering(conn, x_pca, n_shards, cid=cid)
    t_order = time.time() - t1
    t1 = time.time()
    plan = build_halo_plan_csr(permute_graph_unsorted(conn, ordering),
                               n_shards)
    t_plan = time.time() - t1
    stats = plan.exchange_stats(S_COLS, ITEM)
    # per-shard SpMM work per step: padded bucket area x state width
    flops_per_shard = 2 * plan.padded_area() * S_COLS
    row = {
        "n_shards": n_shards,
        "ghost_fraction": round(stats["ghost_fraction"], 4),
        "ghost_bytes_per_step": stats["ghost_bytes"],
        "padded_bytes_per_step": stats["padded_bytes"],
        "allgather_bytes_per_step": stats["allgather_bytes"],
        "padded_vs_ghost": round(
            stats["padded_bytes"] / max(stats["ghost_bytes"], 1), 3),
        "bytes_vs_allgather": round(
            stats["padded_bytes"] / stats["allgather_bytes"], 4),
        "exchange_rounds": stats["rounds"],
        "flops_per_shard_per_step": flops_per_shard,
        "partition_s": round(t_order, 2),
        "plan_build_s": round(t_plan, 2),
        "local_padded_area": plan.padded_area(),
    }
    if n_shards <= n_dev:
        # MEASURED per-step wall clock on the virtual device mesh (not a
        # byte model): VERDICT r3 asked for run evidence, not estimates
        mesh = meshlib.make_mesh(jax.devices()[:n_shards], perms=1)
        n_pad = plan.n_shards * plan.shard_rows
        rng = np.random.default_rng(0)
        s = jnp.asarray(rng.standard_normal((n_pad, S_COLS)),
                        dtype=jnp.float32)
        cur = halo_diffusion_step(s, plan, mesh, 1.0)
        cur.block_until_ready()  # compile
        t1 = time.time()
        reps = 3
        for _ in range(reps):
            cur = halo_diffusion_step(cur, plan, mesh, 1.0)
        cur.block_until_ready()
        row["measured_step_s"] = round((time.time() - t1) / reps, 4)
    rows.append(row)
    print(row, flush=True)

out = {
    "workload": {
        "cells": N_CELLS, "samples": N_SAMPLES, "n_neighbors": 15,
        "structure": "manifold", "state_cols": S_COLS, "itemsize": ITEM,
    },
    "note": (
        "Per-diffusion-step interconnect bytes of the graph-partitioned "
        "halo plan vs the dense GSPMD all-gather, plus plan-build cost "
        "and per-shard SpMM FLOPs, as a function of shard count. "
        "Weak-scaling reading: all-gather bytes are ~(D-1)/D * N * S * 4 "
        "regardless of partition quality; the halo's bytes track the "
        "measured ghost fraction instead."),
    "scaling": rows,
    "clustering_s": round(t_cluster, 2),
}
suffix = "" if N_CELLS == 100_000 else f"_{N_CELLS // 1000}k"
path = os.path.join(os.path.dirname(__file__), "..",
                    f"HALO_SCALING{suffix}.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {os.path.abspath(path)}")
