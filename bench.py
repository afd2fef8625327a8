"""Benchmark driver: end-to-end CNA association on TPU vs the reference.

Emits ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extras": {...}}

Workload: a synthetic multi-sample dataset, kNN graph built on device,
then the full association pipeline (NAM diffusion + residualization +
permutation global test + local FDR test).  ``value`` is cna_tpu's warm
end-to-end association wall-clock; ``vs_baseline`` is the speedup over
the pinned reference implementation (scipy/numpy, float64) running the
identical association on the identical graph on this host's CPU —
median of ``CNA_BENCH_REF_REPS`` runs (host CPU timings here vary
run-to-run; see CLAUDE.md).

Also reported (extras + stderr): cold/warm graph-build wall-clock (the
cold number absorbs the tunnel's one-time first-transfer setup and the
per-program compiles; the warm number is the steady-state cost of
building a graph for a new dataset in an existing process) and
per-phase device timings.

Scale knobs via env:
  CNA_BENCH_CELLS  total cells                      (default 100000)
  CNA_BENCH_NNULL  permutations                     (default 1000)
  CNA_BENCH_REF_REPS reference timing repetitions   (default 3)
  CNA_BENCH_REF_CELLS reference run size            (default = CELLS)
    When the reference would be intractable at CELLS (e.g. the 1M-cell
    north-star config), set a smaller REF_CELLS; the reference is then
    measured at TWO sizes (REF_CELLS and REF_CELLS/2) and extrapolated
    with the fitted affine model t(n) = a + b*n.  The intercept a
    captures the cells-INDEPENDENT work (the reference's global
    permutation F-test loop scales with samples only, reference
    _association.py:84) and is NOT scaled up; only the measured
    per-cell slope b is.  Extras record both measured points and the
    fitted (a, b) so the extrapolation is auditable.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time


def _setup_cache():
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # overlap the tunnel's one-time first-d2h setup (~60-200s) with data
    # prep and the CPU reference runs
    from cna_tpu import config as cna_config

    cna_config.warmup_transfers_async()


def _make_data(n_cells, n_samples, seed=0):
    from cna_tpu.data import synthetic_dataset

    return synthetic_dataset(
        n_samples=n_samples, cells_per_sample=n_cells // n_samples,
        n_genes=50, seed=seed)


class _CompileCounter(logging.Handler):
    """Counts XLA compile events (jax_log_compiles messages) so the
    bench can tell 'warm' numbers polluted by recompiles from real
    steady-state cost (VERDICT r4: the committed artifact could not
    attribute a 3x warm-graph swing)."""

    def __init__(self):
        super().__init__()
        self.count = 0

    def emit(self, record):
        if "Compiling" in record.getMessage():
            self.count += 1

    def __enter__(self):
        import jax

        self._prev = jax.config.jax_log_compiles
        jax.config.update("jax_log_compiles", True)
        logging.getLogger("jax").addHandler(self)
        return self

    def __exit__(self, *exc):
        import jax

        logging.getLogger("jax").removeHandler(self)
        jax.config.update("jax_log_compiles", self._prev)


def _build_graph(d, phases_out=None):
    from cna_tpu import pp
    from cna_tpu.utils import profiling

    prof = profiling.enable_profiling() if phases_out is not None else None
    t0 = time.time()
    pp.pca(d, n_comps=20)
    conn = pp.neighbors(d, n_neighbors=15)
    if hasattr(conn, "ell"):
        # force real completion of the async device graph build — the
        # lazy obsp faces would otherwise defer work into association's
        # timing (and axon block_until_ready does not block; CLAUDE.md)
        import jax.numpy as jnp

        float(jnp.sum(conn.ell.colsums_raw))
    dt = time.time() - t0
    if phases_out is not None:
        for p in prof.phases:
            phases_out[p["phase"]] = round(
                phases_out.get(p["phase"], 0.0) + p["seconds"], 3)
        profiling._GLOBAL = profiling.PhaseProfiler(enabled=False)
    return dt


def _run_cna_tpu(d, y, nnull, seed=0):
    import cna_tpu

    t0 = time.time()
    p = cna_tpu.tl.association(d, y, "id", Nnull=nnull, seed=seed)
    return time.time() - t0, p


def _run_reference(d, y, nnull, reps, seed=0):
    """Median-of-``reps`` reference association wall-clock on this CPU."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    import statistics

    from ref_harness import load_reference, ref_data_from

    cna_ref = load_reference()
    rd = ref_data_from(d, sid_cols=("id",))
    times, p = [], None
    for rep in range(reps):
        t0 = time.time()
        p = cna_ref.tl.association(rd, y, "id", Nnull=nnull, seed=seed)
        times.append(time.time() - t0)
        print(f"#   reference rep {rep + 1}/{reps}: {times[-1]:.1f}s",
              file=sys.stderr)
    return statistics.median(times), times, p


def main():
    n_cells = int(os.environ.get("CNA_BENCH_CELLS", 100_000))
    nnull = int(os.environ.get("CNA_BENCH_NNULL", 1000))
    ref_reps = int(os.environ.get("CNA_BENCH_REF_REPS", 3))
    ref_cells = int(os.environ.get("CNA_BENCH_REF_CELLS", n_cells))
    # BASELINE config 5 (1M-cell atlas) specifies 200 samples
    n_samples = int(os.environ.get("CNA_BENCH_SAMPLES", 50))

    _setup_cache()
    import warnings

    warnings.filterwarnings("ignore")

    err = lambda *a: print(*a, file=sys.stderr, flush=True)

    # ---- reference first: its CPU-bound runs overlap the tunnel's
    # one-time first-transfer setup that the TPU cold numbers absorb ----
    d_ref, samplem_ref = _make_data(ref_cells, n_samples)
    graph_ref_s = _build_graph(d_ref)
    y_ref = samplem_ref["case"].astype(float)
    ref_nnull = min(nnull, 10_000)
    ref_s, ref_times, p_ref = _run_reference(d_ref, y_ref, ref_nnull,
                                             ref_reps)
    err(f"# reference assoc (CPU f64, {ref_cells} cells, {ref_nnull} perms): "
        f"median {ref_s:.1f}s of {['%.1f' % t for t in ref_times]} "
        f"(p={p_ref:.4g})")
    ref_fit = None
    if ref_cells != n_cells:
        # THREE measured sizes -> least-squares affine fit t(n) = a+b*n,
        # so the cells-independent permutation loop (intercept) is NOT
        # scaled and one noisy median cannot swing the slope (VERDICT r3
        # flagged the 2-point fit as fragile on this 5-30x-variance host)
        sizes = [ref_cells, ref_cells // 2, ref_cells // 4]
        medians = [ref_s]
        times_all = [ref_times]
        for i, rc in enumerate(sizes[1:], start=2):
            d_ref_i, samplem_ref_i = _make_data(rc, n_samples, seed=i)
            _build_graph(d_ref_i)
            y_ref_i = samplem_ref_i["case"].astype(float)
            ref_s_i, ref_times_i, _ = _run_reference(
                d_ref_i, y_ref_i, ref_nnull, ref_reps)
            err(f"# reference assoc (CPU f64, {rc} cells): median "
                f"{ref_s_i:.1f}s of {['%.1f' % t for t in ref_times_i]}")
            medians.append(ref_s_i)
            times_all.append(ref_times_i)
        import numpy as np

        A = np.stack([np.ones(len(sizes)), np.asarray(sizes, float)], 1)
        (a, b), *_ = np.linalg.lstsq(A, np.asarray(medians), rcond=None)
        if b <= 0 or a < 0:
            # host-timing noise broke the fit; fall back to the bound
            # that cannot overstate the reference: pure linear scaling
            # of the smallest per-cell rate
            b = min(m / rc for m, rc in zip(medians, sizes))
            a = 0.0
            err("# reference scaling fit degenerate (noisy host); using "
                "min per-cell rate, intercept 0 (understates reference)")
        ref_extrap_s = a + b * n_cells
        ref_fit = {"intercept_s": round(float(a), 3),
                   "slope_s_per_cell": float(b),
                   "ref_sizes": sizes,
                   "ref_medians_s": [round(m, 3) for m in medians],
                   "ref_times_s_per_size": [
                       [round(t, 3) for t in ts] for ts in times_all]}
        err(f"# reference extrapolation: t(n) = {a:.1f}s + {b * 1e6:.2f}s/M "
            f"* n -> {ref_extrap_s:.1f}s at {n_cells} cells")
    else:
        ref_extrap_s = ref_s

    # ---- cna_tpu ----
    if ref_cells == n_cells:
        d, samplem = d_ref, samplem_ref
        graph_cold_s = graph_ref_s
    else:
        d, samplem = _make_data(n_cells, n_samples)
        graph_cold_s = _build_graph(d)
    y = samplem["case"].astype(float)
    err(f"# graph build ({n_cells} cells): cold {graph_cold_s:.1f}s "
        "(incl compile + one-time tunnel setup)")

    # warm graph build: new dataset, same process (compiles cached);
    # per-phase breakdown + compile count make the number attributable
    # (a recompile-polluted "warm" run shows up as compiles > 0 and a
    # phase that dwarfs its steady-state cost).  Two warm builds: the
    # first can still populate a few quantized-shape variants (graph
    # bucket geometry shifts across datasets); the second is the
    # steady state a user building graphs repeatedly actually sees.
    d2, _ = _make_data(n_cells, n_samples, seed=1)
    graph_warm_first_s = _build_graph(d2)
    d2, _ = _make_data(n_cells, n_samples, seed=2)
    graph_phases = {}
    with _CompileCounter() as cc:
        graph_warm_s = _build_graph(d2, phases_out=graph_phases)
    knn_params = d2.uns.get("neighbors", {}).get("params", {})
    err(f"# graph build ({n_cells} cells): warm {graph_warm_first_s:.1f}s "
        f"then {graph_warm_s:.1f}s "
        f"method={knn_params.get('knn_method_resolved')} "
        f"compiles={cc.count} phases={graph_phases}")

    cold_s, p_cold = _run_cna_tpu(d, y, nnull, seed=0)
    from cna_tpu.utils import profiling

    prof = profiling.enable_profiling()
    warm_s, p_warm = _run_cna_tpu(d, y, nnull, seed=1)
    err(f"# cna_tpu assoc: cold {cold_s:.1f}s warm {warm_s:.1f}s "
        f"(p={p_warm:.4g})")
    prof.report(out=lambda *a: print("#", *a, file=sys.stderr))

    extras = {
        "graph_build_cold_s": round(graph_cold_s, 3),
        "graph_build_warm_s": round(graph_warm_s, 3),
        "graph_build_warm_first_s": round(graph_warm_first_s, 3),
        "graph_warm_phases_s": graph_phases,
        "graph_warm_compiles": cc.count,
        "knn_method_resolved": knn_params.get("knn_method_resolved"),
        # IVF recall provenance (atlas-scale graphs): chosen point on
        # the measured recall-vs-probes curve, absent for exact kNN
        **({"ivf": d2.uns["neighbors"]["ivf"]}
           if "ivf" in d2.uns.get("neighbors", {}) else {}),
        "assoc_cold_s": round(cold_s, 3),
        "ref_median_s": round(ref_s, 3),
        "ref_times_s": [round(t, 3) for t in ref_times],
        "ref_cells": ref_cells,
        "ref_nnull": ref_nnull,
        "ref_extrapolated_s": round(ref_extrap_s, 3),
        "e2e_warm_s": round(graph_warm_s + warm_s, 3),
    }
    if ref_fit is not None:
        extras["ref_fit"] = ref_fit
    print(json.dumps({
        "metric": f"association_e2e_{n_cells // 1000}k_cells_{nnull}perm",
        "value": round(warm_s, 3),
        "unit": "s",
        "vs_baseline": round(ref_extrap_s / warm_s, 3),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
