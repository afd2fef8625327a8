"""PCA on device.

The reference delegates PCA to scanpy upstream of the library boundary
(demo.ipynb cell 29 runs ``sc.pp.neighbors`` on a PCA representation).
Here PCA is in-framework: centered (not scaled) principal components via
an eigendecomposition of the gene-gene covariance — the Gram trick on the
small axis, since n_genes << n_cells in the target workloads.

Device/host split, tuned for TPU: the two FLOP-heavy stages (the
``X^T X`` covariance and the score projection) are MXU matmuls on
device; the eigendecomposition itself runs on HOST numpy.  The
covariance is (G, G) with G <= a few hundred — microseconds of LAPACK —
while ``jnp.linalg.eigh`` lowers to a large QR-iteration loop program
whose one-time compile dwarfs the whole graph-build phase (measured:
the eigh-on-device variant dominated the 100k-cell graph build; the
host-eigh pipeline compiles in ~1 s).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_PCA_DEV_KEY = "_cna_tpu_pca_dev"


@jax.jit
def _cov_core(x):
    xc = x - x.mean(axis=0, keepdims=True)
    cov = (xc.T @ xc) / (x.shape[0] - 1)
    return cov


@jax.jit
def _project(x, evecs):
    xc = x - x.mean(axis=0, keepdims=True)
    return xc @ evecs


def _pca_device(x, n_comps):
    """Covariance on device, eigh on host, projection on device.

    Returns (scores_dev (N, n_comps), evals (n_comps,) np, evecs
    (G, n_comps) np, total_var float).
    """
    cov = np.asarray(jax.device_get(_cov_core(x)))  # (G, G): tiny pull
    evals, evecs = np.linalg.eigh(cov)
    evals = evals[::-1]
    evecs = evecs[:, ::-1]
    scores_dev = _project(x, jnp.asarray(evecs[:, :n_comps], dtype=x.dtype))
    return scores_dev, evals[:n_comps], evecs[:, :n_comps], float(cov.trace())


@jax.jit
def _gram_chunk(blk):
    """(B, G) chunk -> (uncentered gram (G, G), column sums (G,))."""
    return blk.T @ blk, blk.sum(axis=0)


@jax.jit
def _project_chunk(blk, comps, shift):
    return blk @ comps - shift[None, :]


_SPARSE_PCA_MAX_GENES = 4096


def _pca_sparse(x, n_comps, chunk_rows=65_536):
    """PCA of a scipy sparse X without ever materializing it densely.

    Streams densified row chunks (B x G, B*G bounded) through the same
    two MXU stages as the dense path: accumulate the uncentered gram
    ``X^T X`` and column sums on device, center on host
    (``cov = (X'X - n mu mu')/(n-1)``), eigh the (G, G) covariance on
    host, then project chunks.  Exact — matches the dense path to
    rounding.  Guarded at ``G <= _SPARSE_PCA_MAX_GENES``: above that the
    (G, G) covariance stops being small; select genes first
    (``pp.select_hvg``, the standard scanpy recipe upstream of PCA).

    Returns (scores_dev (N, n_comps), evals, evecs, total_var).
    """
    import scipy.sparse as sp

    n, g = x.shape
    if g > _SPARSE_PCA_MAX_GENES:
        raise ValueError(
            f"sparse PCA with {g} genes needs a (G, G) covariance that is "
            "no longer small; run cna_tpu.pp.select_hvg(data) first to "
            f"reduce to <= {_SPARSE_PCA_MAX_GENES} informative genes "
            "(the standard recipe upstream of PCA)")
    x = sp.csr_matrix(x)
    from ..config import default_float

    dtype = default_float()
    gram = jnp.zeros((g, g), dtype=dtype)
    colsum = jnp.zeros((g,), dtype=dtype)
    for lo in range(0, n, chunk_rows):
        blk = jnp.asarray(
            x[lo : lo + chunk_rows].toarray().astype(dtype))
        gg, cs = _gram_chunk(blk)
        gram = gram + gg
        colsum = colsum + cs
    gram = np.asarray(jax.device_get(gram))
    mean = np.asarray(jax.device_get(colsum)) / n
    cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    evals = evals[::-1]
    evecs = evecs[:, ::-1]
    comps = np.ascontiguousarray(evecs[:, :n_comps])
    comps_dev = jnp.asarray(comps.astype(dtype))
    shift = jnp.asarray((mean @ comps).astype(dtype))
    parts = [
        _project_chunk(
            jnp.asarray(x[lo : lo + chunk_rows].toarray().astype(dtype)),
            comps_dev, shift)
        for lo in range(0, n, chunk_rows)
    ]
    scores_dev = jnp.concatenate(parts, axis=0)
    return scores_dev, evals[:n_comps], comps, float(cov.trace())


def _pca_dense_streamed(x_host, n_comps, chunk_rows=131_072):
    """Dense PCA with CHUNKED async host->device ingest.

    One monolithic ``jnp.asarray(X)`` serializes a 200 MB f32 transfer
    (~3-4 s through the tunnel at 1M x 50) before any FLOP runs.  Here
    chunks ship via ``jax.device_put`` (async) and the gram/projection
    matmuls of chunk i overlap the transfer of chunk i+1.  Exact — same
    two-stage centered-gram math as ``_pca_sparse``.
    """
    from ..config import default_float

    dtype = default_float()
    n, g = x_host.shape
    np_dtype = np.dtype(str(jnp.zeros((), dtype).dtype))
    chunks = [
        jax.device_put(np.ascontiguousarray(
            x_host[lo:lo + chunk_rows]).astype(np_dtype, copy=False))
        for lo in range(0, n, chunk_rows)
    ]
    gram = jnp.zeros((g, g), dtype=dtype)
    colsum = jnp.zeros((g,), dtype=dtype)
    for blk in chunks:
        gg, cs = _gram_chunk(blk)
        gram = gram + gg
        colsum = colsum + cs
    gram = np.asarray(jax.device_get(gram))
    mean = np.asarray(jax.device_get(colsum)) / n
    cov = (gram - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    evals = evals[::-1]
    evecs = evecs[:, ::-1]
    comps = np.ascontiguousarray(evecs[:, :n_comps])
    comps_dev = jnp.asarray(comps.astype(np_dtype))
    shift = jnp.asarray((mean @ comps).astype(np_dtype))
    scores_dev = jnp.concatenate(
        [_project_chunk(blk, comps_dev, shift) for blk in chunks], axis=0)
    return scores_dev, evals[:n_comps], comps, float(cov.trace())


_STREAM_MIN_ELEMS = 16_000_000


class LazyScores:
    """Host face of the device-resident PCA scores.

    ``obsm['X_pca']`` consumers that actually need host values
    (``np.asarray``, slicing, plotting) pull once on first touch; the
    graph-build path reads the device twin through ``device_rep`` and
    never pays the d2h (~10 s for 80 MB at 1M cells through the
    tunnel — round 3 paid it unconditionally inside ``pp.pca``).
    """

    def __init__(self, dev):
        self._dev = dev
        self._host = None
        self._fp0 = None

    def _mat(self):
        if self._host is None:
            self._host = np.asarray(jax.device_get(self._dev))
            # fingerprint at materialization: in-place mutation of the
            # host copy afterwards must invalidate the device twin
            self._fp0 = _rep_fingerprint(self._host)
        return self._host

    @property
    def materialized(self):
        return self._host is not None

    @property
    def shape(self):
        return tuple(self._dev.shape)

    @property
    def ndim(self):
        return 2

    @property
    def dtype(self):
        return np.dtype(str(self._dev.dtype))

    def __len__(self):
        return self.shape[0]

    def __array__(self, dtype=None, copy=None):
        m = self._mat()
        return m.astype(dtype) if dtype is not None else m

    def __getitem__(self, key):
        return self._mat()[key]

    def __iter__(self):
        return iter(self._mat())


def _delegate_op(name):
    def op(self, *args):
        args = tuple(np.asarray(a) if isinstance(a, LazyScores) else a
                     for a in args)
        return getattr(self._mat(), name)(*args)

    op.__name__ = name
    return op


for _nm in ("__mul__", "__rmul__", "__add__", "__radd__", "__sub__",
            "__rsub__", "__truediv__", "__rtruediv__", "__matmul__",
            "__rmatmul__", "__neg__", "__pow__", "__eq__", "__ne__",
            "__lt__", "__le__", "__gt__", "__ge__"):
    setattr(LazyScores, _nm, _delegate_op(_nm))


def pca_array(x, n_comps=50):
    """Return (scores (N, n_comps), explained variance, components)."""
    x = jnp.asarray(x)
    n_comps = min(n_comps, x.shape[1], x.shape[0])
    scores_dev, evals, evecs, _ = _pca_device(x, n_comps)
    return scores_dev, jnp.asarray(evals), jnp.asarray(evecs)


def pca(data, n_comps=50, key_added="X_pca"):
    """Compute PCA of ``data.X`` into ``data.obsm[key_added]``.

    Returns the scores array.  Variance diagnostics are recorded in
    ``data.uns['pca']``.  The device-resident scores are cached in
    ``data.uns`` so the downstream kNN (``pp.neighbors``) skips the
    device->host->device round-trip of the embedding (through a tunneled
    TPU the d2h path alone is ~8 MB/s).
    """
    if data.X is None:
        raise ValueError("data.X is required for PCA")
    import scipy.sparse as sp

    from ..utils.profiling import global_profiler

    _prof = global_profiler()
    n_comps = min(n_comps, data.X.shape[1], data.X.shape[0])
    n, g = data.X.shape
    with _prof.phase("pca_compute", cells=int(n)):
        if sp.issparse(data.X):
            scores_dev, variance, components, total_var = _pca_sparse(
                data.X, n_comps)
        elif n * g >= _STREAM_MIN_ELEMS:
            scores_dev, variance, components, total_var = \
                _pca_dense_streamed(np.asarray(data.X), n_comps)
        else:
            x = jnp.asarray(data.X)
            scores_dev, variance, components, total_var = _pca_device(
                x, n_comps)
        scores_dev.block_until_ready()
    # the host copy is LAZY: the downstream graph build reads the device
    # twin via device_rep, so the (N, n_comps) d2h (~10 s at 1M through
    # the tunnel) only happens if something actually touches the host
    # values (np.asarray / slicing / plotting)
    scores = LazyScores(scores_dev)
    data.obsm[key_added] = scores
    data.uns[_PCA_DEV_KEY] = (scores, scores_dev, None)
    data.uns["pca"] = {
        "variance": variance,
        "variance_ratio": variance / total_var,
        "components": components,
    }
    return data.obsm[key_added]


def _rep_fingerprint(arr):
    """Cheap content fingerprint of a host score array: shape, dtype, and
    a strided element sample.  Guards the device-twin cache against
    in-place mutation of ``obsm['X_pca']`` (object identity alone would
    serve a stale device copy)."""
    arr = np.asarray(arr)
    flat = arr.ravel()
    sample = flat[:: max(flat.size // 64, 1)][:64]
    return (arr.shape, str(arr.dtype), sample.tobytes())


def device_rep(data, rep):
    """The device-array twin of ``rep`` if it is this ``pca``'s output
    (same object AND unchanged content), else ``rep`` itself."""
    cached = data.uns.get(_PCA_DEV_KEY)
    if cached is None or cached[0] is not rep:
        return rep
    if isinstance(rep, LazyScores):
        if not rep.materialized:
            # nothing could have mutated host values that never existed
            return cached[1]
        if _rep_fingerprint(np.asarray(rep)) == rep._fp0:
            return cached[1]
        return np.asarray(rep)
    if cached[2] == _rep_fingerprint(rep):
        return cached[1]
    return rep
