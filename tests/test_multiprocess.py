"""True multi-process distributed test (VERDICT r1 item 2; SURVEY §4).

Spawns two ``jax.distributed``-initialized CPU processes (4 virtual
devices each) that run the full sharded ``association(mesh=)`` pipeline —
halo-exchange diffusion, perm-sharded null scoring, cross-process
``assert_agreement`` digests — on a dataset built once by this driver,
and checks that both processes produce the identical result, which also
matches a single-process run of the same data and seed in this process.
"""

import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = Path(__file__).parent / "mp_worker.py"


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def mp_dataset(tmp_path_factory):
    """Demo dataset + graph, built once and written to disk so every
    process (and this one) consumes bit-identical inputs."""
    from cna_tpu.data import write_h5ad

    from .fixtures import make_demo_dataset

    d, samplem = make_demo_dataset(
        n_samples=50, cells_per_sample=60, n_genes=50, seed=0,
        n_neighbors=10)
    y = samplem["case"].astype(float)
    tmp = tmp_path_factory.mktemp("mp")
    data_path = tmp / "demo.h5ad"
    y_path = tmp / "y.npz"
    write_h5ad(d, data_path)
    np.savez(y_path, y=y.to_numpy(), index=np.asarray(y.index))
    return data_path, y_path, y


@pytest.fixture(scope="module")
def mp_results(mp_dataset):
    data_path, y_path, _ = mp_dataset
    port = _free_port()
    nproc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(i), str(nproc), str(port),
             str(data_path), str(y_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=str(_WORKER.parent.parent))
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    results = []
    for out in outs:
        m = re.search(
            r"RESULT pid=(\d+) p=([\d.e+-]+) k=(\d+) ncorr_sum=([\d.e+-]+) "
            r"fdr_min=([\d.]+)", out)
        assert m, f"no RESULT line in worker output:\n{out}"
        results.append(dict(pid=int(m.group(1)), p=float(m.group(2)),
                            k=int(m.group(3)), ncorr_sum=float(m.group(4)),
                            fdr_min=float(m.group(5))))
    return results


def test_processes_agree(mp_results):
    a, b = mp_results
    assert a["p"] == b["p"]
    assert a["k"] == b["k"]
    assert a["ncorr_sum"] == b["ncorr_sum"]
    assert a["fdr_min"] == b["fdr_min"]


def test_matches_single_process(mp_results, mp_dataset):
    """The 2-process sharded run reproduces the single-process result on
    the identical serialized dataset."""
    data_path, _, y = mp_dataset

    import cna_tpu
    from cna_tpu.data import read_h5ad

    d = read_h5ad(data_path)
    res = cna_tpu.tl.association(d, y, "id", seed=0, Nnull=200,
                                 return_full=True)
    mp = mp_results[0]
    assert mp["p"] == res.p
    assert mp["k"] == res.k
    assert mp["ncorr_sum"] == pytest.approx(
        float(np.abs(res.ncorrs).sum()), rel=1e-9)
    assert mp["fdr_min"] == pytest.approx(float(res.fdrs.fdr.min()), abs=1e-6)
