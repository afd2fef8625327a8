"""Quick CPU correctness + traffic check of the bucketed format."""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import scipy.sparse as sp
from cna_tpu.graph.buckets import degree_ordering, from_scipy_buckets, plan_buckets
from cna_tpu.graph.ell import from_scipy
from cna_tpu.graph.reorder import permute_graph
from cna_tpu.ops.spmm import bucket_spmm, graph_spmm, diffusion_step

rng = np.random.default_rng(0)
n, s_dim = 3000, 17
# skewed degrees: kNN-union-like
a = sp.random(n, n, density=0.004, random_state=1, format="csr")
a = a + a.T
# add some hub rows
hubs = sp.random(n, n, density=0.2, random_state=2, format="csr")[:20]
a = sp.vstack([hubs, a[20:]]).tocsr()
a = (a + a.T) / 2

x = rng.standard_normal((n, s_dim))
want = a @ x

ordering = degree_ordering(a)
ap = permute_graph(a, ordering)
g = from_scipy_buckets(ap)
got_p = np.asarray(bucket_spmm(g, x[ordering.perm]))
got = got_p[ordering.inv]
print("bucket max err:", np.abs(got - want).max())
assert np.allclose(got, want, atol=1e-9)

ell = from_scipy(a)
area_ell = ell.indices.shape[0] * ell.indices.shape[1] + ell.n_overflow
print(f"plain ELL fetches: {area_ell}  bucketed: {g.padded_area()}  "
      f"nnz: {a.nnz}  buckets: {[i.shape for i in g.indices]}")

# diffusion step parity (the actual hot path), identical normalization
cs = g.colsums(1.0)
y1 = np.asarray(diffusion_step(np.asarray(x[ordering.perm]), g, np.asarray(cs), 1.0))
cs0 = ell.colsums(1.0)
y0 = np.asarray(diffusion_step(x, ell, np.asarray(cs0), 1.0))
print("diffusion parity:", np.abs(y1[ordering.inv] - y0).max())
assert np.allclose(y1[ordering.inv], y0, atol=1e-9)

# plan sanity on a tiny case
print(plan_buckets([1, 1, 2, 9, 9, 60], max_buckets=3))
print("OK")
