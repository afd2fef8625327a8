"""Worker: halo diffusion on a D-virtual-device CPU mesh (D = argv[1]).

Runs OUTSIDE the pytest process because the virtual device count is
fixed at jax import (conftest pins 8); D=16/32 are exactly the shard
counts where the bucketed-pair ppermute rounds and ring ordering take
code paths no 8-device test reaches (VERDICT r4 item 5).

Builds a hub-skewed symmetric graph, runs 3 halo diffusion steps over
the full mesh, and asserts equality with the single-device SpMM at
1e-10.  Prints ``HALO_MANY_OK D rounds=R split=S`` on success.
"""

import os
import sys

n_dev = int(sys.argv[1])
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={n_dev}")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import scipy.sparse as sp  # noqa: E402

from cna_tpu.graph.ell import from_scipy  # noqa: E402
from cna_tpu.ops import spmm  # noqa: E402
from cna_tpu.parallel import halo, mesh as meshlib  # noqa: E402

rng = np.random.RandomState(0)
n = 1600
a = sp.random(n, n, density=0.01, random_state=1, format="csr")
# hub rows: UMAP-union-like degree skew so the light/heavy pair buckets
# and the degree-bucketed local pack both engage
hub_rows = np.repeat([3, 701, 1203], 300)
hub_cols = rng.randint(0, n, hub_rows.size)
hubs = sp.csr_matrix((np.full(hub_rows.size, 0.3), (hub_rows, hub_cols)),
                     shape=(n, n))
a = (a + a.T + hubs + hubs.T).tocsr()

g = from_scipy(a, width_percentile=100.0)
s = rng.standard_normal((n, 5))
ref = jnp.asarray(s)
for _ in range(3):
    ref = spmm.diffusion_step(ref, g, g.colsums(1.5), 1.5)

assert len(jax.devices()) == n_dev
mesh = meshlib.make_mesh(jax.devices()[:n_dev], perms=1)
plan = halo.build_halo_plan_csr(a, n_dev)
n_pad = plan.n_shards * plan.shard_rows
cur = jnp.asarray(np.pad(s, ((0, n_pad - n), (0, 0))))
for _ in range(3):
    cur = halo.halo_diffusion_step(cur, plan, mesh, 1.5)

np.testing.assert_allclose(np.asarray(cur)[:n], np.asarray(ref),
                           rtol=1e-10, atol=1e-12)
# the per-offset size-bucket split must actually engage at these shard
# counts (more rounds than ring offsets)
n_offsets = len({r for r, _ in plan.rounds})
split = len(plan.rounds) - n_offsets
print(f"HALO_MANY_OK {n_dev} rounds={len(plan.rounds)} split={split}",
      flush=True)
