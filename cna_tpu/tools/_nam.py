"""Neighborhood Abundance Matrix (NAM) pipeline, TPU-native.

Reimplements the reference's L2/L3 layers (``_nam.py``) on JAX:

* graph-diffusion of the cells-by-samples one-hot matrix (the hot SpMM,
  reference ``_nam.py:21-41``) with the adaptive kurtosis stopping rule
  (``_nam.py:56-71``),
* batch-kurtosis QC of neighborhoods (``_nam.py:78-99``),
* Gram-trick SVD of the standardized NAM (``_nam.py:102-115``),
* covariate/batch residualization with the cumulative ridge sweep
  (``_nam.py:118-177``).

Host/device split: the per-step diffusion + stopping statistics run as a
single jitted XLA program per step; the data-dependent stop, diagnostic
prints, and QC column drop happen on host between steps (matching the
reference's observable behavior, and keeping shapes static inside jit).
Sample-axis linear algebra (S x S) runs on device via ``ops.linalg``.
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


def get_ell_graph(data) -> EllGraph:
    """Device ELL graph for ``data``, cached in ``data.uns`` when possible."""
    conn = get_connectivity(data)
    if isinstance(conn, EllGraph):
        return conn
    uns = getattr(data, "uns", None)
    if uns is not None:
        cached = uns.get(_ELL_CACHE_KEY)
        if cached is not None and cached[0] is conn:
            return cached[1]
    ell = from_scipy(conn)
    if uns is not None:
        uns[_ELL_CACHE_KEY] = (conn, ell)
    return ell


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


@partial(jax.jit, static_argnames=("block_rows",))
def _diffusion_step_stats(s, old_s, graph, colsums, c_counts, self_weight,
                          block_rows=None):
    """One diffusion step fused with the stopping-rule statistics.

    Returns (s_new, median excess kurtosis over cells, 20th-pct step R²)
    — the quantities the reference computes per step at ``_nam.py:59-63``.
    """
    s_new = spmm.diffusion_step(s, graph, colsums, self_weight,
                                block_rows=block_rows)
    snormed = s_new / c_counts[None, :]
    medkurt = jnp.median(moments.kurtosis(snormed, axis=1))
    r2 = moments.column_r2(s_new, old_s)
    r2p20 = jnp.percentile(r2, 20)
    return s_new, medkurt, r2p20


def diffuse_stepwise(data, s, maxnsteps=15, show_progress=False, self_weight=1):
    """Generator over lazy-random-walk diffusion steps of ``s``.

    Public low-level primitive (reference ``_nam.py:21-34``).  ``s`` may be
    a pandas DataFrame (cells x anything) or an array; each yielded step
    matches the input's type, with DataFrame labels preserved.
    """
    out = select_output(show_progress)
    graph = get_ell_graph(data)
    labels = None
    if isinstance(s, pd.DataFrame):
        labels = (s.index, s.columns)
        s = s.to_numpy()
    s = jnp.asarray(s, dtype=graph.weights.dtype)
    colsums = graph.colsums(self_weight)
    block_rows = _auto_block_rows(graph.n_cells, graph.max_degree, s.shape[1])
    for i in range(maxnsteps):
        out("\ttaking step", i + 1)
        s = _diffusion_step(
            s, graph, colsums,
            jnp.asarray(self_weight, dtype=s.dtype), block_rows=block_rows,
        )
        if labels is not None:
            yield pd.DataFrame(np.asarray(s), index=labels[0], columns=labels[1])
        else:
            yield s


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
        df = pd.DataFrame(np.asarray(self.nam), index=self.samples,
                          columns=self.cells)
        return df


def _nam(data, sid_name, sids=None, nsteps=None, maxnsteps=15, self_weight=1,
         show_progress=False) -> NamArrays:
    """Build the NAM via diffusion with the adaptive kurtosis stop.

    Mirrors reference ``_nam`` (``_nam.py:44-76``): one-hot cells->samples,
    diffuse until the median per-cell excess kurtosis (across samples, on
    count-normalized state) drops by <3 between steps (minimum 3 steps),
    or exactly ``nsteps`` if given; normalize by per-sample cell counts and
    transpose.
    """
    out = select_output(show_progress)

    onehot = pd.get_dummies(data.obs[sid_name])
    if sids is not None:
        onehot = onehot[sids]
    samples = onehot.columns
    cells = data.obs.index
    c_counts_host = onehot.sum(axis=0).to_numpy()

    graph = get_ell_graph(data)
    dtype = graph.weights.dtype
    s = jnp.asarray(onehot.to_numpy(), dtype=dtype)
    c_counts = jnp.asarray(c_counts_host, dtype=dtype)
    colsums = graph.colsums(self_weight)
    sw = jnp.asarray(self_weight, dtype=dtype)
    block_rows = _auto_block_rows(graph.n_cells, graph.max_degree, s.shape[1])

    prevmedkurt = np.inf
    old_s = jnp.zeros_like(s)
    steps_taken = 0
    for i in range(maxnsteps):
        out("\ttaking step", i + 1)
        s, medkurt, r2p20 = _diffusion_step_stats(
            s, old_s, graph, colsums, c_counts, sw, block_rows=block_rows,
        )
        old_s = s
        medkurt = float(medkurt)
        steps_taken = i + 1
        out("\tmedian kurtosis:", medkurt + 3)
        out("\t20th percentile R2(t,t-1):", float(r2p20))
        if nsteps is None:
            if prevmedkurt - medkurt < 3 and i + 1 >= 3:
                out("stopping after", i + 1, "steps")
                break
            prevmedkurt = medkurt
        elif i + 1 == nsteps:
            break

    nam = (s / c_counts[None, :]).T  # (samples, cells)
    return NamArrays(nam=nam, samples=samples, cells=cells, nsteps=steps_taken)


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
    return np.asarray(_batch_kurtosis_dev(arr, ids, nb))


def _qc_nam_arrays(nam_arrays: NamArrays, batches: pd.Series, show_progress=False):
    """Drop batchy neighborhoods (reference ``_qc_nam``, ``_nam.py:85-99``).

    Returns (filtered NamArrays, keep bool array over cells).
    """
    out = select_output(show_progress)
    uniq, ids, nb = _encode_batches(batches, nam_arrays.samples)
    if nb == 1:
        keep = np.repeat(True, nam_arrays.nam.shape[1])
        return nam_arrays, keep

    kurt = np.asarray(_batch_kurtosis_dev(nam_arrays.nam, ids, nb))
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


_DEFAULT_RIDGES = [1e5, 1e4, 1e3, 1e2, 1e1, 1e0, 1e-1, 1e-2, 1e-3, 1e-4, 0]


def _resid_nam(NAM, covs, batches, ridges=None, npcs=None, show_progress=False):
    """Residualize covariates/batches out of the NAM, standardize, SVD.

    Mirrors reference ``_resid_nam`` (``_nam.py:118-177``), including the
    cumulative ``NAM_ = M @ NAM_`` compounding across the ridge sweep and
    the last-M-wins coupling into the association test.

    ``NAM`` may be a DataFrame (samples x cells) or a ``NamArrays``.
    Returns a ``Result`` with the reference's fields plus device-resident
    ``_dev`` arrays used by the association core.
    """
    out = select_output(show_progress)

    if isinstance(NAM, NamArrays):
        samples, cells = NAM.samples, NAM.cells
        arr = NAM.nam
    else:
        samples, cells = NAM.index, NAM.columns
        arr = jnp.asarray(NAM.to_numpy(dtype=float))
    n = arr.shape[0]
    dtype = arr.dtype

    nam_c = arr - arr.mean(axis=0)

    if covs is None:
        covs_arr = jnp.zeros((n, 0), dtype=dtype)
    else:
        covs_arr = jnp.asarray(covs.to_numpy(dtype=float), dtype=dtype)
        covs_arr = moments.standardize(covs_arr, ddof=1, axis=0)

    single_batch = batches is None or len(np.unique(batches)) == 1
    if single_batch:
        c = covs_arr
        m_proj = linalg.residual_projector(c)
        nam_r = m_proj @ nam_c
    else:
        b_dummies = pd.get_dummies(batches)
        b_arr = jnp.asarray(b_dummies.to_numpy(dtype=float), dtype=dtype)
        b_arr = moments.standardize(b_arr, ddof=1, axis=0)
        c = jnp.concatenate([b_arr, covs_arr], axis=1)
        nbcols = b_arr.shape[1]
        _, ids, nb = _encode_batches(batches, samples)

        if ridges is None:
            ridges = _DEFAULT_RIDGES
        nam_r = nam_c
        for ridge in ridges:
            m_proj = linalg.residual_projector(c, ridge=ridge, n_batch_cols=nbcols)
            nam_r = m_proj @ nam_r
            kurt = np.asarray(_batch_kurtosis_dev(nam_r, ids, nb))
            medk = np.median(kurt)
            out("\twith ridge", ridge, "median batch kurtosis = ", medk)
            if medk <= 6:
                break

    # standardize (pandas ddof=1, no recentering — reference ``_nam.py:159``;
    # the exposed namresid is THIS matrix, while svd_nam additionally
    # centers+standardizes its own local copy, reference ``:103-104,163``)
    nam_r = nam_r / moments.colstd(nam_r, ddof=1, axis=0)[None, :]
    _, u, svs, v = linalg.standardize_and_gram_svd(nam_r)
    if npcs is None:
        npcs = v.shape[1]

    pcs = ["PC" + str(i) for i in range(1, u.shape[1] + 1)]
    res = Result()
    res._dev = Result(
        m=m_proj, r=int(c.shape[1]), namresid=nam_r, u=u, svs=svs, v=v,
        samples=samples, cells=cells,
    )
    res.M = pd.DataFrame(np.asarray(m_proj), index=samples, columns=samples)
    res.r = int(c.shape[1])
    res.namresid = pd.DataFrame(np.asarray(nam_r), index=samples, columns=cells)
    res.namresid_sampleXpc = pd.DataFrame(np.asarray(u), index=samples, columns=pcs)
    res.namresid_nbhdXpc = pd.DataFrame(np.asarray(v), index=cells, columns=pcs)
    res.namresid_svs = pd.Series(np.asarray(svs), index=pcs)[:npcs]
    res.namresid_varexp = pd.Series(np.asarray(svs), index=pcs) / n / len(cells)
    return res


def nam(data, sid_name, batches=None, nsteps=None, self_weight=1,
        max_frac_pcs=0.15, suffix="", ks=None, show_progress=False, **kwargs):
    """Compute and QC the NAM (public wrapper, reference ``_nam.py:179-193``).

    ``max_frac_pcs``/``ks``/``**kwargs`` are accepted and ignored so that
    ``association`` can forward one kwargs bag to both pipeline stages,
    exactly as the reference does.

    Returns (NAM DataFrame [samples x kept-cells] as float, keep bool array).
    """
    out = select_output(show_progress)

    if batches is None:
        sids = data.obs[sid_name].unique()
        batches = pd.Series(np.ones(len(sids)), index=sids)

    out("computing NAM")
    nam_arrays = _nam(data, sid_name, nsteps=nsteps, self_weight=self_weight,
                      show_progress=show_progress)
    nam_qc, keep = _qc_nam_arrays(nam_arrays, batches, show_progress=show_progress)
    return nam_qc.to_df().astype(float), keep
