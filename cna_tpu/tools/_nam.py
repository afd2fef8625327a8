"""Neighborhood Abundance Matrix (NAM) pipeline, TPU-native.

Reimplements the reference's L2/L3 layers (``_nam.py``) on JAX:

* graph-diffusion of the cells-by-samples one-hot matrix (the hot SpMM,
  reference ``_nam.py:21-41``) with the adaptive kurtosis stopping rule
  (``_nam.py:56-71``),
* batch-kurtosis QC of neighborhoods (``_nam.py:78-99``),
* Gram-trick SVD of the standardized NAM (``_nam.py:102-115``),
* covariate/batch residualization with the cumulative ridge sweep
  (``_nam.py:118-177``).

Host/device split, tuned for dispatch latency (the TPU may sit behind a
network tunnel where every host sync costs a round trip): the
data-dependent diffusion stop and the ridge-sweep early exit run as
on-device ``lax.while_loop``s — ONE dispatch each — that also record the
per-step diagnostic trail (kurtosis, R²) into fixed-size buffers, which
are printed afterwards.  Only shape-changing decisions (QC column drops,
zero-variance drops) sync a small mask to host.  Sample-axis linear
algebra (S x S) runs on device via ``ops.linalg``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..core.results import Result
from ..graph.ell import EllGraph, from_scipy
from ..ops import linalg, moments, spmm
from ..parallel.dist import fetch
from ._out import select_output

_ELL_CACHE_KEY = "_cna_tpu_ell_graph"


def get_connectivity(data):
    """Fetch the cell-cell connectivity graph from an AnnData-like object.

    Accepts ``data.obsp['connectivities']`` (modern layout) or
    ``data.uns['neighbors']['connectivities']`` (pre-0.7.2 anndata layout),
    mirroring reference ``get_connectivity`` (``_nam.py:12-19``) without
    the package-version sniff: both locations are simply probed.
    """
    obsp = getattr(data, "obsp", None)
    if obsp is not None and "connectivities" in obsp:
        return obsp["connectivities"]
    uns = getattr(data, "uns", None)
    if uns is not None and "neighbors" in uns and "connectivities" in uns["neighbors"]:
        return uns["neighbors"]["connectivities"]
    raise KeyError(
        "no cell-cell graph found: expected data.obsp['connectivities'] "
        "(or data.uns['neighbors']['connectivities']); run a neighbors/"
        "graph-construction step first (e.g. cna_tpu.pp.neighbors)"
    )


_FORMAT_KEY = "_cna_tpu_graph_format"


def set_graph_format(data, fmt: str) -> None:
    """Choose the device SpMM format for ``data``:

    * 'bucketed' (pipeline default on a single device) — degree-sorted
      per-width ELL buckets (``cna_tpu.graph.buckets``): exact gather
      SpMM with traffic ~nnz tiles instead of N*K_p98; wins whenever
      the degree distribution is skewed (UMAP-union graphs: measured
      ~60% of the plain-ELL fetches are padding → 2.7x/step).
    * 'ell' (default under a mesh) — single-width row-gather SpMM; the
      robust choice on any graph structure, rows shard evenly.
    * 'block' / 'hybrid' — cluster-reordered dense tiles (MXU).
    * 'banded' — the Pallas slab-DMA kernel (``cna_tpu.ops.spmm_pallas``)
      on a locality ordering.  Measured 6-25x faster per diffusion step
      when the ordered graph is actually banded (quasi-1D trajectory
      manifolds: band fraction ~1); a wash on higher-dimensional
      manifolds (band fraction ~0.5-0.7, where the spill gather
      dominates).  Check ``BandedGraph.band_fraction()`` before
      committing a long run to it.
    """
    if fmt not in ("ell", "bucketed", "block", "hybrid", "banded"):
        raise ValueError(
            f"unknown graph format {fmt!r}; use 'ell', 'bucketed', "
            "'block', 'hybrid' or 'banded'")
    data.uns[_FORMAT_KEY] = fmt
    data.uns.pop(_ELL_CACHE_KEY, None)


def get_ell_graph(data) -> EllGraph:
    """Device ELL graph for ``data``, cached in ``data.uns`` when possible."""
    graph, _ = get_device_graph(data, fmt="ell")
    return graph


def get_device_graph(data, fmt=None):
    """Device graph for ``data`` in the configured format.

    Returns (graph, reordering): for the 'ell' format the reordering is
    None; for 'block' it is the cluster ``Reordering`` whose permuted
    axes the BlockGraph is built on (callers permute the diffusion state
    in and out once per pipeline).
    """
    from ..graph.device import DeviceConnectivities

    conn = get_connectivity(data)
    if isinstance(conn, EllGraph):
        return conn, None
    uns = getattr(data, "uns", None)
    if fmt is None:
        fmt = uns.get(_FORMAT_KEY, "ell") if uns is not None else "ell"
    if isinstance(conn, DeviceConnectivities):
        if fmt in ("ell", "bucketed"):
            # already packed on device (compact order); 'bucketed' — the
            # single-device default — is satisfied by the device ELL
            # (mirror columns are width-fitted, no repack needed)
            return conn.ell, conn.ordering
        conn = conn.tocsr()  # explicit block/banded request: materialize
    cache_key = f"{_ELL_CACHE_KEY}:{fmt}"
    if uns is not None:
        cached = uns.get(cache_key)
        if cached is not None and cached[0] is conn:
            return cached[1], cached[2]

    if fmt in ("block", "hybrid", "banded"):
        from ..graph.blocks import (cluster_ordering, from_scipy_blocks,
                                    from_scipy_hybrid)
        from ..graph.reorder import permute_graph

        obsm = getattr(data, "obsm", {})
        if "X_pca" in obsm:
            ordering = cluster_ordering(obsm["X_pca"])
        else:
            from ..graph.reorder import rcm_ordering

            ordering = rcm_ordering(conn)
        permuted = permute_graph(conn, ordering)
        if fmt == "banded":
            from ..ops.spmm_pallas import banded_from_scipy

            graph = banded_from_scipy(permuted)
        else:
            graph = (from_scipy_hybrid(permuted) if fmt == "hybrid"
                     else from_scipy_blocks(permuted))
    elif fmt == "bucketed":
        from ..graph.buckets import degree_ordering, from_scipy_buckets
        from ..graph.reorder import permute_graph

        ordering = degree_ordering(conn)
        graph = from_scipy_buckets(permute_graph(conn, ordering))
    else:
        ordering = None
        graph = from_scipy(conn)
    if uns is not None:
        uns[cache_key] = (conn, graph, ordering)
    return graph, ordering


_HALO_PLAN_KEY = "_cna_tpu_halo_plan"
_DIFFUSION_PATH_KEY = "_cna_tpu_diffusion_path"


def get_halo_plan(data, n_shards):
    """Halo-exchange plan over ``n_shards`` cell shards, cached in uns.

    The cell axis is **locality-ordered first** (kd-order bisection of the
    PCA embedding, RCM on the graph as fallback) so each shard owns a
    graph-clustered block — input-order blocks on a kNN graph ship
    near-all-gather ghost volumes (measured 2.92 of a max 3.0 at 4
    shards on the demo data), while the clustered blocks keep only true
    boundary rows in the exchange (SURVEY §5.7).

    Returns ``(plan, ordering)``; ``ordering`` is the applied
    ``Reordering`` (``None`` for a pre-packed device graph, which the
    caller must use as-is).  ``(None, None)`` when a plan cannot
    represent the graph (an imported ``EllGraph`` carrying COO overflow
    edges) — callers fall back to the GSPMD path.
    """
    from ..graph.device import DeviceConnectivities
    from ..parallel.halo import build_halo_plan, build_halo_plan_csr

    conn = get_connectivity(data)
    if isinstance(conn, DeviceConnectivities):
        # halo planning is host-side graph partitioning; materialize the
        # CSR once (cached on the object) and plan from it
        conn = conn.tocsr()
    uns = getattr(data, "uns", None)
    key = f"{_HALO_PLAN_KEY}:{n_shards}"
    if uns is not None:
        cached = uns.get(key)
        if cached is not None and cached[0] is conn:
            return cached[1], cached[2]

    ordering = None
    if isinstance(conn, EllGraph):
        if conn.n_overflow:
            return None, None
        plan = build_halo_plan(
            np.asarray(conn.indices), np.asarray(conn.weights),
            np.asarray(conn.colsums_raw), n_shards)
    else:
        from ..graph.reorder import permute_graph_unsorted

        obsm = getattr(data, "obsm", None) or {}
        if "X_pca" in obsm:
            from ..graph.partition import partition_ordering

            ordering = partition_ordering(conn, obsm["X_pca"], n_shards)
        else:
            from ..graph.reorder import rcm_ordering

            ordering = rcm_ordering(conn)
        # unsorted permute: the plan builder walks edges in storage
        # order, so the scipy column re-sort (~10 s at 1M) is skipped
        plan = build_halo_plan_csr(permute_graph_unsorted(conn, ordering),
                                   n_shards)
    if uns is not None:
        uns[key] = (conn, plan, ordering)
    return plan, ordering


def _auto_block_rows(n, k, s):
    """Row-block size bounding the gather buffer to ~256M elements."""
    budget = 1 << 28
    per_row = max(k * s, 1)
    if n * per_row <= budget:
        return None
    return max(1024, budget // per_row)


@partial(jax.jit, static_argnames=("block_rows",))
def _diffusion_step(s, graph, colsums, self_weight, block_rows=None):
    return spmm.diffusion_step(s, graph, colsums, self_weight,
                               block_rows=block_rows)


def _adaptive_loop(s0, c_counts, step, maxnsteps, nsteps, n_cells):
    """The fused adaptive-diffusion while_loop, generic over the step.

    Replicates reference ``_nam``'s stepping (``_nam.py:56-71``): after
    each step compute the median (across cells) excess kurtosis of the
    count-normalized state over samples, and the 20th-percentile
    step-to-step R²; stop when the kurtosis drop is < 3 after >= 3 steps
    (or after exactly ``nsteps``), capped at ``maxnsteps``.

    ``step``: callable s -> s' (one diffusion update; the single-device
    format-dispatched SpMM or the halo-exchange sharded step).
    ``n_cells``: number of real cells when ``s0`` carries zero padding
    rows; statistics exclude the padding so the stopping rule is
    invariant to the storage/shard layout.

    Returns (s_final, steps_taken, medkurt trail, R² trail) — the trails
    are (maxnsteps,) buffers for post-hoc diagnostics printing; entries
    past ``steps_taken`` hold an inf sentinel (inf, not NaN, so CI runs
    under ``jax_debug_nans`` stay clean).
    """
    dtype = s0.dtype
    nan = jnp.asarray(jnp.inf, dtype)

    def step_stats(s, old_s):
        s_new = step(s)
        snormed = s_new / c_counts[None, :]
        kurt = moments.kurtosis(snormed, axis=1)[:n_cells]
        medkurt = jnp.median(kurt)
        r2 = moments.column_r2_counted(s_new, old_s, n_cells)
        # the kernel returns +inf for zero-variance columns (NaN-free
        # under jax_debug_nans); numpy's percentile would be NaN if any
        # column were NaN, so propagate the sentinel the same way
        bad = jnp.any(jnp.isinf(r2))
        r2p20 = jnp.where(
            bad, jnp.inf,
            jnp.percentile(jnp.where(jnp.isinf(r2), 2.0, r2), 20))
        return s_new, medkurt, r2p20

    def cond(carry):
        _, _, _, i, done, _, _ = carry
        return (~done) & (i < maxnsteps)

    def body(carry):
        s, old_s, prevmedkurt, i, done, mk_buf, r2_buf = carry
        s_new, medkurt, r2p20 = step_stats(s, old_s)
        mk_buf = mk_buf.at[i].set(medkurt)
        r2_buf = r2_buf.at[i].set(r2p20)
        if nsteps is None:
            done = (prevmedkurt - medkurt < 3) & (i + 1 >= 3)
        else:
            done = i + 1 >= nsteps
        return (s_new, s_new, medkurt, i + 1, done, mk_buf, r2_buf)

    init = (
        s0, jnp.zeros_like(s0), jnp.asarray(jnp.inf, dtype),
        jnp.asarray(0, jnp.int32), jnp.asarray(False),
        jnp.full((maxnsteps,), nan), jnp.full((maxnsteps,), nan),
    )
    s, _, _, i, _, mk_buf, r2_buf = jax.lax.while_loop(cond, body, init)
    return s, i, mk_buf, r2_buf


@partial(jax.jit, static_argnames=("maxnsteps", "nsteps", "block_rows",
                                   "n_true"))
def _diffuse_adaptive(s0, graph, colsums, c_counts, self_weight,
                      maxnsteps=15, nsteps=None, block_rows=None,
                      n_true=None):
    """Adaptive diffusion with the format-dispatched single-program SpMM."""
    n_cells = s0.shape[0] if n_true is None else n_true

    def step(s):
        return spmm.diffusion_step(s, graph, colsums, self_weight,
                                   block_rows=block_rows)

    return _adaptive_loop(s0, c_counts, step, maxnsteps, nsteps, n_cells)


@partial(jax.jit, static_argnames=("mesh", "self_weight", "maxnsteps",
                                   "nsteps", "n_true"))
def _diffuse_adaptive_halo(s0, plan, c_counts, mesh, self_weight,
                           maxnsteps=15, nsteps=None, n_true=None):
    """Adaptive diffusion through the explicit halo-exchange sharded SpMM.

    The production multi-chip path (SURVEY §5.7): per step each cell
    shard exchanges only the ghost rows its neighbors reference (one
    ``all_to_all`` inside ``shard_map``), instead of the GSPMD
    all-gather of the full (N, S) state.  Stopping statistics exclude
    the shard-padding rows (``n_true``).
    """
    from ..parallel.halo import halo_diffusion_step

    n_cells = s0.shape[0] if n_true is None else n_true

    def step(s):
        return halo_diffusion_step(s, plan, mesh, self_weight)

    return _adaptive_loop(s0, c_counts, step, maxnsteps, nsteps, n_cells)


def diffuse_stepwise(data, s, maxnsteps=15, show_progress=False, self_weight=1):
    """Generator over lazy-random-walk diffusion steps of ``s``.

    Public low-level primitive (reference ``_nam.py:21-34``).  ``s`` may be
    a pandas DataFrame (cells x anything) or an array; each yielded step
    matches the input's type, with DataFrame labels preserved.
    """
    out = select_output(show_progress)
    graph, ordering = get_device_graph(data, fmt="ell")
    labels = None
    if isinstance(s, pd.DataFrame):
        labels = (s.index, s.columns)
        s = s.to_numpy()
    s = jnp.asarray(s, dtype=graph.dtype)
    # a device graph may live in a permuted (compact) cell order: step in
    # that order, yield every step in the caller's order
    perm = inv = None
    if ordering is not None:
        perm = jnp.asarray(ordering.perm)
        inv = jnp.asarray(ordering.inv)
        s = jnp.take(s, perm, axis=0)
    colsums = graph.colsums(self_weight)
    block_rows = _auto_block_rows(graph.n_cells, graph.max_degree, s.shape[1])
    for i in range(maxnsteps):
        out("\ttaking step", i + 1)
        s = _diffusion_step(
            s, graph, colsums,
            jnp.asarray(self_weight, dtype=s.dtype), block_rows=block_rows,
        )
        s_out = s if inv is None else jnp.take(s, inv, axis=0)
        if labels is not None:
            yield pd.DataFrame(np.asarray(s_out), index=labels[0],
                               columns=labels[1])
        else:
            yield s_out


def diffuse(data, s, nsteps, show_progress=False, self_weight=1):
    """Run exactly ``nsteps`` diffusion steps (reference ``_nam.py:36-41``)."""
    for s in diffuse_stepwise(
        data, s, maxnsteps=nsteps, show_progress=show_progress,
        self_weight=self_weight,
    ):
        pass
    return s


@dataclasses.dataclass
class NamArrays:
    """Device-resident NAM with its labels.

    ``nam``: (n_samples, n_cells) — sample s's relative abundance in each
    cell's diffused neighborhood (the transpose at reference ``_nam.py:73``).
    """

    nam: jnp.ndarray
    samples: pd.Index
    cells: pd.Index
    nsteps: int = 0

    def to_df(self) -> pd.DataFrame:
        return pd.DataFrame(fetch(self.nam), index=self.samples,
                            columns=self.cells)


@partial(jax.jit, static_argnames=("n_samples", "dtype"))
def _onehot_device(codes, n_samples, dtype):
    """(N,) int32 sample codes -> (N, n_samples) one-hot on device.

    Code -1 (filtered/padding cell) produces an all-zero row.
    """
    return (codes[:, None]
            == jnp.arange(n_samples, dtype=jnp.int32)[None, :]).astype(dtype)


def _nam(data, sid_name, sids=None, nsteps=None, maxnsteps=15, self_weight=1,
         show_progress=False, mesh=None) -> NamArrays:
    """Build the NAM via diffusion with the adaptive kurtosis stop.

    Mirrors reference ``_nam`` (``_nam.py:44-76``): one-hot cells->samples,
    diffuse until the median per-cell excess kurtosis (across samples, on
    count-normalized state) drops by <3 between steps (minimum 3 steps),
    or exactly ``nsteps`` if given; normalize by per-sample cell counts and
    transpose.  The whole loop is one device dispatch; the per-step
    kurtosis/R² trail is printed afterwards when ``show_progress``.
    """
    out = select_output(show_progress)

    # cells->samples one-hot (reference ``_nam.py:51`` pd.get_dummies):
    # column order is sorted uniques, or the category order (including
    # unused categories) for categorical dtype.  Only the int32 code
    # vector crosses to the device; the (N, S) one-hot is built there —
    # at atlas scale the dense one-hot is tens of MB of h2d otherwise.
    obs_sids = data.obs[sid_name]
    if isinstance(obs_sids.dtype, pd.CategoricalDtype):
        codes = obs_sids.cat.codes.to_numpy().astype(np.int32)
        samples = pd.Index(obs_sids.cat.categories)
    else:
        codes64, cats = pd.factorize(obs_sids, sort=True)
        codes = codes64.astype(np.int32)
        samples = pd.Index(cats)
    if sids is not None:
        sids = pd.Index(sids)
        col_pos = samples.get_indexer(sids)
        if (col_pos < 0).any():
            raise KeyError(list(sids[col_pos < 0][:5]))
        code_map = np.full(len(samples) + 1, -1, dtype=np.int32)
        code_map[col_pos] = np.arange(len(sids), dtype=np.int32)
        codes = code_map[codes]  # codes==-1 (NaN sid) stays -1 via [-1]
        samples = sids
    n_samples = len(samples)
    cells = data.obs.index
    n_cells = len(cells)
    c_counts_host = np.bincount(codes[codes >= 0], minlength=n_samples)

    uns = getattr(data, "uns", None)
    user_fmt = uns.get(_FORMAT_KEY) if uns is not None else None

    # ---- production sharded path: explicit halo exchange ----
    # When the mesh splits the cell axis, diffusion runs through the
    # shard_map halo-exchange SpMM (SURVEY §5.7) — per step each shard
    # sends only the ghost rows its neighbors reference, instead of the
    # GSPMD all-gather of the full (N, S) scaled state.  An explicit
    # non-ELL graph-format request falls back to the GSPMD row-sharded
    # path (formats like 'banded'/'block' have no halo plan).
    if mesh is not None:
        from ..parallel import mesh as meshlib

        cell_shards = dict(
            zip(mesh.axis_names, mesh.devices.shape)).get(meshlib.CELLS, 1)
        if cell_shards > 1 and user_fmt in (None, "ell"):
            plan, halo_order = get_halo_plan(data, cell_shards)
            if plan is not None:
                from ..parallel.halo import place_plan

                dtype = plan.dtype
                n_pad = plan.n_shards * plan.shard_rows
                codes_h = (codes[halo_order.perm] if halo_order is not None
                           else codes)
                codes_p = np.pad(codes_h, (0, n_pad - codes_h.shape[0]),
                                 constant_values=-1)
                s0 = _onehot_device(jnp.asarray(codes_p), n_samples, dtype)
                s0 = jax.device_put(s0, meshlib.cell_rows(mesh))
                plan_d = place_plan(plan, mesh)
                c_counts = jax.device_put(
                    jnp.asarray(c_counts_host, dtype=dtype),
                    meshlib.replicated(mesh))
                s, steps_dev, mk_buf, r2_buf = _diffuse_adaptive_halo(
                    s0, plan_d, c_counts, mesh, float(self_weight),
                    maxnsteps=maxnsteps, nsteps=nsteps, n_true=n_cells)
                if uns is not None:
                    uns[_DIFFUSION_PATH_KEY] = "halo"
                steps_taken = int(steps_dev)
                if out.enabled:
                    out(f"\thalo diffusion over {cell_shards} cell shards: "
                        f"ghost fraction {plan.ghost_fraction():.3f}")
                    _print_diffusion_trail(out, mk_buf, r2_buf, steps_taken,
                                           nsteps, maxnsteps)
                # back to the caller's cell order (drops padding rows too)
                if halo_order is not None:
                    s = jnp.take(s, jnp.asarray(halo_order.inv), axis=0)
                else:
                    s = s[:n_cells]
                nam = (s / c_counts[None, :]).T  # (samples, cells)
                return NamArrays(nam=nam, samples=samples, cells=cells,
                                 nsteps=steps_taken)

    # default format: degree-bucketed ELL (exact, ~nnz gather traffic;
    # measured 2.7x/step over plain ELL on skewed UMAP-union graphs).
    # The GSPMD mesh fallback shards plain ELL rows evenly, so it keeps
    # 'ell' unless the user set a format explicitly.
    fmt = None
    if user_fmt is None:
        fmt = "ell" if mesh is not None else "bucketed"
    graph, ordering = get_device_graph(data, fmt=fmt)
    is_block = ordering is not None or not isinstance(graph, EllGraph)
    dtype = graph.dtype
    if is_block:
        if ordering is not None:
            codes = codes[ordering.perm]
        n_pad = graph.n_rows
        if n_pad > codes.shape[0]:
            # padding rows get code -1: an all-zero one-hot row
            codes = np.pad(codes, (0, n_pad - codes.shape[0]),
                           constant_values=-1)
        block_rows = None
        n_true = n_cells
    else:
        block_rows = _auto_block_rows(graph.n_cells, graph.max_degree,
                                      n_samples)
        n_true = None
    s0 = _onehot_device(jnp.asarray(codes), n_samples, dtype)
    c_counts = jnp.asarray(c_counts_host, dtype=dtype)
    colsums = graph.colsums(self_weight)
    sw = jnp.asarray(self_weight, dtype=dtype)
    if mesh is not None:
        from ..parallel import mesh as meshlib

        rows = meshlib.cell_rows(mesh)
        repl = meshlib.replicated(mesh)
        s0 = jax.device_put(s0, rows)
        colsums = jax.device_put(colsums, rows)
        c_counts = jax.device_put(c_counts, repl)
        if isinstance(graph, EllGraph):
            graph = EllGraph(
                indices=jax.device_put(graph.indices, rows),
                weights=jax.device_put(graph.weights, rows),
                overflow_rows=jax.device_put(graph.overflow_rows, repl),
                overflow_cols=jax.device_put(graph.overflow_cols, repl),
                overflow_weights=jax.device_put(graph.overflow_weights, repl),
                colsums_raw=jax.device_put(graph.colsums_raw, rows),
            )

    s, steps_dev, mk_buf, r2_buf = _diffuse_adaptive(
        s0, graph, colsums, c_counts, sw,
        maxnsteps=maxnsteps, nsteps=nsteps, block_rows=block_rows,
        n_true=n_true)

    if uns is not None:
        uns[_DIFFUSION_PATH_KEY] = "gspmd" if mesh is not None else "local"
    steps_taken = int(steps_dev)
    if out.enabled:
        _print_diffusion_trail(out, mk_buf, r2_buf, steps_taken, nsteps,
                               maxnsteps)

    if is_block:
        # back to the caller's cell order (and drop padding rows)
        if ordering is not None:
            s = jnp.take(s, jnp.asarray(ordering.inv), axis=0)
        else:
            s = s[:n_cells]
    nam = (s / c_counts[None, :]).T  # (samples, cells)
    return NamArrays(nam=nam, samples=samples, cells=cells, nsteps=steps_taken)


def _print_diffusion_trail(out, mk_buf, r2_buf, steps_taken, nsteps,
                           maxnsteps):
    """Print the per-step kurtosis/R² diagnostic trail (the reference's
    documented UX — its demo tells users to read this, ``_nam.py:62-66``)."""
    mk = np.asarray(mk_buf)
    # render the in-kernel zero-variance sentinel (+inf) as the nan the
    # reference prints for the same situation (R() against the all-zero
    # initial state on step 1, reference ``_nam.py:56-61``)
    r2 = np.asarray(r2_buf).copy()
    r2[np.isinf(r2)] = np.nan
    for i in range(steps_taken):
        out("\ttaking step", i + 1)
        out("\tmedian kurtosis:", mk[i] + 3)
        out("\t20th percentile R2(t,t-1):", r2[i])
    if nsteps is None and steps_taken < maxnsteps:
        out("stopping after", steps_taken, "steps")


def _encode_batches(batches: pd.Series, samples: pd.Index):
    """Align sample-level batch labels to ``samples`` and encode as int ids
    in sorted-unique order (matching ``np.unique`` iteration at reference
    ``_nam.py:81``)."""
    aligned = batches.reindex(samples)
    uniq, ids = np.unique(aligned.to_numpy(), return_inverse=True)
    return uniq, jnp.asarray(ids.astype(np.int32)), len(uniq)


@partial(jax.jit, static_argnames=("num_batches",))
def _batch_kurtosis_dev(nam, batch_ids, num_batches):
    return moments.batch_kurtosis(nam, batch_ids, num_batches)


def _batch_kurtosis(NAM, batches):
    """Per-neighborhood Pearson kurtosis across per-batch mean abundances
    (reference ``_nam.py:78-82``).  ``NAM``: DataFrame samples x cells."""
    uniq, ids, nb = _encode_batches(batches, NAM.index)
    arr = jnp.asarray(NAM.to_numpy())
    return fetch(_batch_kurtosis_dev(arr, ids, nb))


def _qc_nam_arrays(nam_arrays: NamArrays, batches: pd.Series, show_progress=False):
    """Drop batchy neighborhoods (reference ``_qc_nam``, ``_nam.py:85-99``).

    Returns (filtered NamArrays, keep bool array over cells).
    """
    out = select_output(show_progress)
    uniq, ids, nb = _encode_batches(batches, nam_arrays.samples)
    if nb == 1:
        keep = np.repeat(True, nam_arrays.nam.shape[1])
        return nam_arrays, keep

    kurt = fetch(_batch_kurtosis_dev(nam_arrays.nam, ids, nb))
    threshold = max(6, 2 * np.median(kurt))
    out("throwing out neighborhoods with batch kurtosis >=", threshold)
    keep = kurt < threshold
    out("keeping", keep.sum(), "neighborhoods")

    keep_idx = jnp.asarray(np.nonzero(keep)[0])
    filtered = NamArrays(
        nam=jnp.take(nam_arrays.nam, keep_idx, axis=1),
        samples=nam_arrays.samples,
        cells=nam_arrays.cells[keep],
        nsteps=nam_arrays.nsteps,
    )
    return filtered, keep


def svd_nam(NAM):
    """SVD of a (samples x neighborhoods) NAM via the S x S Gram matrix.

    Mirrors reference ``svd_nam`` (``_nam.py:102-115``): center and
    standardize columns (pandas ddof=1), then eigen-decompose the Gram.
    Returns labeled (U DataFrame, squared-singular-value Series, V
    DataFrame) with PC1.. columns.
    """
    if isinstance(NAM, pd.DataFrame):
        index, columns = NAM.index, NAM.columns
        arr = jnp.asarray(NAM.to_numpy())
    else:
        arr = jnp.asarray(NAM)
        index = pd.RangeIndex(arr.shape[0])
        columns = pd.RangeIndex(arr.shape[1])
    _, u, svs, v = linalg.standardize_and_gram_svd(arr)
    pcs = ["PC" + str(i) for i in range(1, u.shape[1] + 1)]
    return (
        pd.DataFrame(np.asarray(u), index=index, columns=pcs),
        pd.Series(np.asarray(svs), index=pcs),
        pd.DataFrame(np.asarray(v), index=columns, columns=pcs),
    )


_DEFAULT_RIDGES = (1e5, 1e4, 1e3, 1e2, 1e1, 1e0, 1e-1, 1e-2, 1e-3, 1e-4, 0)


@partial(jax.jit, static_argnames=("n_batch_cols", "num_batches"))
def _ridge_sweep(nam_c, c, ridges, batch_ids, n_batch_cols, num_batches):
    """The cumulative ridge residualization sweep, fused on device.

    Replicates reference ``_nam.py:141-156`` exactly, including the
    compounding ``NAM_ = M @ NAM_`` across iterations and last-M-wins:
    for each ridge in the schedule build
    ``M = I - C (C'C + ridge*n*L)^-1 C'``, apply it cumulatively, and
    stop once the median batch kurtosis of the running NAM is <= 6.

    Returns (nam_resid, M_last, n_ridges_used, median-kurtosis trail) —
    trail entries past the exit hold an inf sentinel (debug_nans-clean).
    """
    nridges = ridges.shape[0]
    nan = jnp.asarray(jnp.inf, nam_c.dtype)

    def cond(carry):
        _, _, i, done, _ = carry
        return (~done) & (i < nridges)

    def body(carry):
        nam_r, _, i, done, medk_buf = carry
        m_proj = linalg.residual_projector(c, ridge=ridges[i],
                                           n_batch_cols=n_batch_cols)
        nam_r = m_proj @ nam_r
        kurt = moments.batch_kurtosis(nam_r, batch_ids, num_batches)
        medk = jnp.median(kurt)
        medk_buf = medk_buf.at[i].set(medk)
        return (nam_r, m_proj, i + 1, medk <= 6, medk_buf)

    eye = jnp.eye(nam_c.shape[0], dtype=nam_c.dtype)
    init = (nam_c, eye, jnp.asarray(0, jnp.int32), jnp.asarray(False),
            jnp.full((nridges,), nan))
    nam_r, m_proj, i, _, medk_buf = jax.lax.while_loop(cond, body, init)
    return nam_r, m_proj, i, medk_buf


def _resid_nam_core(arr, covs_arr, batches, samples, ridges=None,
                    show_progress=False):
    """Device core of the residualization: returns a dict of device arrays.

    ``arr``: (n, cells) NAM rows aligned to ``samples``.
    """
    out = select_output(show_progress)
    n = arr.shape[0]
    dtype = arr.dtype

    nam_c = arr - arr.mean(axis=0)
    if covs_arr is None:
        covs_arr = jnp.zeros((n, 0), dtype=dtype)
    else:
        covs_arr = moments.standardize(jnp.asarray(covs_arr, dtype=dtype),
                                       ddof=1, axis=0)

    single_batch = batches is None or len(np.unique(batches)) == 1
    if single_batch:
        c = covs_arr
        m_proj = linalg.residual_projector(c)
        nam_r = m_proj @ nam_c
    else:
        b_dummies = pd.get_dummies(batches)
        b_arr = moments.standardize(
            jnp.asarray(b_dummies.to_numpy(dtype=float), dtype=dtype),
            ddof=1, axis=0)
        c = jnp.concatenate([b_arr, covs_arr], axis=1)
        nbcols = b_arr.shape[1]
        _, ids, nb = _encode_batches(batches, samples)

        ridge_schedule = jnp.asarray(
            ridges if ridges is not None else _DEFAULT_RIDGES, dtype=dtype)
        nam_r, m_proj, nridges, medk_buf = _ridge_sweep(
            nam_c, c, ridge_schedule, ids, nbcols, nb)
        if out.enabled:
            medk = np.asarray(medk_buf)
            sched = np.asarray(ridge_schedule)
            for i in range(int(nridges)):
                out("\twith ridge", sched[i], "median batch kurtosis = ",
                    medk[i])

    # standardize (pandas ddof=1, no recentering — reference ``_nam.py:159``;
    # the exposed namresid is THIS matrix, while svd_nam additionally
    # centers+standardizes its own local copy, reference ``:103-104,163``)
    nam_r = nam_r / moments.colstd(nam_r, ddof=1, axis=0)[None, :]
    _, u, svs, v = linalg.standardize_and_gram_svd(nam_r)
    return dict(m=m_proj, r=int(c.shape[1]), namresid=nam_r, u=u, svs=svs,
                v=v)


def _resid_nam(NAM, covs, batches, ridges=None, npcs=None, show_progress=False):
    """Residualize covariates/batches out of the NAM, standardize, SVD.

    Mirrors reference ``_resid_nam`` (``_nam.py:118-177``), including the
    cumulative ``NAM_ = M @ NAM_`` compounding across the ridge sweep and
    the last-M-wins coupling into the association test.

    ``NAM`` may be a DataFrame (samples x cells) or a ``NamArrays``.
    Returns a ``Result`` with the reference's fields (large DataFrames
    materialized lazily from device arrays) plus device-resident ``_dev``
    arrays used by the association core.
    """
    if isinstance(NAM, NamArrays):
        samples, cells = NAM.samples, NAM.cells
        arr = NAM.nam
    else:
        samples, cells = NAM.index, NAM.columns
        arr = jnp.asarray(NAM.to_numpy(dtype=float))

    covs_arr = None if covs is None else covs.to_numpy(dtype=float)
    dev = _resid_nam_core(arr, covs_arr, batches, samples, ridges=ridges,
                          show_progress=show_progress)
    n = arr.shape[0]
    if npcs is None:
        npcs = int(dev["v"].shape[1])

    pcs = ["PC" + str(i) for i in range(1, dev["u"].shape[1] + 1)]
    res = Result()
    res._dev = Result(samples=samples, cells=cells, **dev)
    res.r = dev["r"]
    res.set_lazy("M", lambda: pd.DataFrame(
        fetch(dev["m"]), index=samples, columns=samples))
    res.set_lazy("namresid", lambda: pd.DataFrame(
        fetch(dev["namresid"]), index=samples, columns=cells))
    res.set_lazy("namresid_sampleXpc", lambda: pd.DataFrame(
        fetch(dev["u"]), index=samples, columns=pcs))
    res.set_lazy("namresid_nbhdXpc", lambda: pd.DataFrame(
        fetch(dev["v"]), index=cells, columns=pcs))
    res.set_lazy("namresid_svs", lambda: pd.Series(
        np.asarray(dev["svs"]), index=pcs)[:npcs])
    res.set_lazy("namresid_varexp", lambda: pd.Series(
        np.asarray(dev["svs"]), index=pcs) / n / len(cells))
    return res


def nam(data, sid_name, batches=None, nsteps=None, self_weight=1,
        max_frac_pcs=0.15, suffix="", ks=None, show_progress=False, **kwargs):
    """Compute and QC the NAM (public wrapper, reference ``_nam.py:179-193``).

    ``max_frac_pcs``/``ks``/``**kwargs`` are accepted and ignored so that
    ``association`` can forward one kwargs bag to both pipeline stages,
    exactly as the reference does.

    Returns (NAM DataFrame [samples x kept-cells] as float, keep bool array).
    """
    nam_qc, keep = nam_arrays(data, sid_name, batches=batches, nsteps=nsteps,
                              self_weight=self_weight,
                              show_progress=show_progress)
    return nam_qc.to_df().astype(float), keep


def nam_arrays(data, sid_name, batches=None, nsteps=None, self_weight=1,
               show_progress=False, mesh=None, nam_savepoint=None, **kwargs):
    """Device-resident variant of ``nam``: returns (NamArrays, keep).

    ``nam_savepoint``: optional path to a fingerprint-keyed diffusion
    savepoint (see ``utils.checkpoint``).  The reference deliberately
    never caches the NAM (its README.md:22, v0.2.0), so this is opt-in;
    a changed graph/sample-assignment/step-count misses rather than
    serving a stale matrix.
    """
    out = select_output(show_progress)

    if batches is None:
        sids = data.obs[sid_name].unique()
        batches = pd.Series(np.ones(len(sids)), index=sids)

    arrays = None
    fingerprint = None
    if nam_savepoint is not None:
        from ..utils import checkpoint as ckpt

        fingerprint = ckpt.nam_fingerprint(data, sid_name, nsteps=nsteps,
                                           self_weight=self_weight)
        hit = ckpt.load_nam(nam_savepoint, fingerprint)
        if hit is not None:
            out("loading NAM from savepoint")
            nam_df, _, saved_nsteps = hit
            arrays = NamArrays(nam=jnp.asarray(nam_df.to_numpy()),
                               samples=pd.Index(nam_df.index),
                               cells=pd.Index(nam_df.columns),
                               nsteps=saved_nsteps)

    if arrays is None:
        out("computing NAM")
        arrays = _nam(data, sid_name, nsteps=nsteps, self_weight=self_weight,
                      show_progress=show_progress, mesh=mesh)
        if nam_savepoint is not None:
            from ..utils import checkpoint as ckpt

            ckpt.save_nam(nam_savepoint, arrays.to_df(), fingerprint,
                          nsteps=arrays.nsteps)
    return _qc_nam_arrays(arrays, batches, show_progress=show_progress)
