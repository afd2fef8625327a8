import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
t_start = time.time()
def stamp(label, t0):
    print(f"[{time.time()-t_start:7.1f}s] {label}: {time.time()-t0:.2f}s", flush=True)
    return time.time()

cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from cna_tpu import config as cna_config
t0 = time.time()
cna_config.warmup_transfers_async()
t0 = stamp("warmup kickoff", t0)

import jax.numpy as jnp
import importlib
pcamod = importlib.import_module("cna_tpu.pp.pca")

X = np.random.RandomState(0).randn(100_000, 50).astype(np.float32)
t0 = stamp("make X", t0)
x = jnp.asarray(X); x.block_until_ready()
t0 = stamp("h2d X", t0)
cov_dev = pcamod._cov_core(x); cov_dev.block_until_ready()
t0 = stamp("cov compute (incl compile)", t0)
cov = np.asarray(jax.device_get(cov_dev))
t0 = stamp("cov d2h (50x50)", t0)
evals, evecs = np.linalg.eigh(cov)
t0 = stamp("host eigh", t0)
s = pcamod._project(x, jnp.asarray(evecs[:, :20].astype(np.float32))); s.block_until_ready()
t0 = stamp("project (incl compile)", t0)
sh = np.asarray(jax.device_get(s))
t0 = stamp("scores d2h (100k x 20 f32 = 8MB)", t0)
# steady state second round
t0 = time.time()
cov_dev = pcamod._cov_core(x); cov = np.asarray(jax.device_get(cov_dev))
evals, evecs = np.linalg.eigh(cov)
s = pcamod._project(x, jnp.asarray(evecs[:, :20].astype(np.float32)))
sh = np.asarray(jax.device_get(s))
t0 = stamp("WARM full pca equivalent", t0)
print("TOTAL", time.time()-t_start, flush=True)
