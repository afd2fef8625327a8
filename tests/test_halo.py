"""Halo-exchange diffusion must match the single-device SpMM exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from cna_tpu.graph.ell import from_scipy
from cna_tpu.ops import spmm
from cna_tpu.parallel import halo, mesh as meshlib


def _random_symmetric_graph(n, density, seed):
    a = sp.random(n, n, density=density, random_state=seed, format="csr")
    a = a + a.T
    return a.tocsr()


def test_halo_plan_remap_consistency():
    a = _random_symmetric_graph(96, 0.05, 0)
    g = from_scipy(a)
    plan = halo.build_halo_plan(
        np.asarray(g.indices), np.asarray(g.weights),
        np.asarray(g.colsums_raw), n_shards=4)
    d, nd = plan.colsums.shape
    # every remapped index must be resolvable within the extended layout
    # [own rows | one segment per exchanged ring offset]
    ext_rows = nd + sum(int(s.shape[1]) for s in plan.send_rounds)
    assert max(int(i.max()) for i in plan.bucket_indices) < ext_rows
    assert all(1 <= r < d and len(js) for r, js in plan.rounds)


def test_halo_diffusion_matches_single_device():
    n, s_dim = 200, 7
    a = _random_symmetric_graph(n, 0.04, 1)
    g = from_scipy(a)
    rng = np.random.default_rng(2)
    s = rng.standard_normal((n, s_dim))

    expected = np.asarray(spmm.diffusion_step(
        jnp.asarray(s), g, g.colsums(1.0), 1.0))

    mesh = meshlib.make_mesh(jax.devices()[:8], perms=1)
    plan = halo.build_halo_plan(
        np.asarray(g.indices), np.asarray(g.weights),
        np.asarray(g.colsums_raw), n_shards=8)
    n_pad = plan.n_shards * plan.shard_rows
    s_pad = jnp.asarray(np.pad(s, ((0, n_pad - n), (0, 0))))
    got = np.asarray(halo.halo_diffusion_step(s_pad, plan, mesh, 1.0))[:n]

    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)


def test_halo_multi_step_matches():
    n, s_dim = 160, 3
    a = _random_symmetric_graph(n, 0.06, 3)
    g = from_scipy(a)
    rng = np.random.default_rng(4)
    s = rng.standard_normal((n, s_dim))

    ref = jnp.asarray(s)
    for _ in range(4):
        ref = spmm.diffusion_step(ref, g, g.colsums(2.0), 2.0)

    mesh = meshlib.make_mesh(jax.devices()[:4], perms=1)
    plan = halo.build_halo_plan(
        np.asarray(g.indices), np.asarray(g.weights),
        np.asarray(g.colsums_raw), n_shards=4)
    n_pad = plan.n_shards * plan.shard_rows
    cur = jnp.asarray(np.pad(s, ((0, n_pad - n), (0, 0))))
    for _ in range(4):
        cur = halo.halo_diffusion_step(cur, plan, mesh, 2.0)

    np.testing.assert_allclose(np.asarray(cur)[:n], np.asarray(ref),
                               rtol=1e-9, atol=1e-11)


import subprocess
import sys
from pathlib import Path

import pytest


@pytest.mark.parametrize("n_dev", [16, 32])
def test_halo_many_shards_subprocess(n_dev):
    """VERDICT r4 item 5: the bucketed-pair rounds and ring ordering at
    D=16/32 — shard counts beyond this process's 8 virtual devices —
    must produce diffusion identical to single-device (run in a worker
    process with its own device count)."""
    worker = Path(__file__).parent / "halo_many_worker.py"
    out = subprocess.run([sys.executable, str(worker), str(n_dev)],
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"HALO_MANY_OK {n_dev}" in out.stdout, out.stdout
