"""TPU timing: diffusion step, plain ELL vs degree-bucketed ELL."""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cna_tpu import pp
from cna_tpu.data import synthetic_dataset
from cna_tpu.tools import _nam as nam_mod
from cna_tpu.ops import spmm

N = int(os.environ.get("N_CELLS", 100000))
S = 50
d, samplem = synthetic_dataset(n_samples=S, cells_per_sample=N // S,
                               n_genes=50, seed=0)
t0 = time.time()
pp.pca(d, n_comps=20)
pp.neighbors(d, n_neighbors=15)
print(f"graph: {time.time()-t0:.1f}s")

x = jnp.asarray(np.random.default_rng(0).standard_normal((N, S)),
                dtype=jnp.float32)


def time_fmt(fmt):
    graph, ordering = nam_mod.get_device_graph(d, fmt=fmt)
    if fmt == "ell":
        br = nam_mod._auto_block_rows(graph.n_cells, graph.max_degree, S)
        print(f"  ell K={graph.max_degree} overflow={graph.n_overflow} "
              f"fetches={graph.indices.shape[0]*graph.indices.shape[1]}")
    else:
        br = None
        print(f"  buckets={[i.shape for i in graph.indices]} "
              f"fetches={graph.padded_area()}")
    cs = graph.colsums(1.0)
    xin = x if ordering is None else jnp.take(
        x, jnp.asarray(ordering.perm), axis=0)
    xin = jax.block_until_ready(xin)

    @jax.jit
    def five_steps(s):
        for _ in range(5):
            s = spmm.diffusion_step(s, graph, cs, 1.0, block_rows=br)
        return s

    y = jax.block_until_ready(five_steps(xin))  # compile+warm
    t0 = time.time()
    y = jax.block_until_ready(five_steps(xin))
    dt = (time.time() - t0) / 5
    print(f"{fmt}: {dt*1e3:.1f} ms/step")
    return y if ordering is None else jnp.take(
        y, jnp.asarray(ordering.inv), axis=0)


y_ell = time_fmt("ell")
y_b = time_fmt("bucketed")
print("parity:", float(jnp.abs(y_ell - y_b).max()))
