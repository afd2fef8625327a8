"""Worker process for the multi-process distributed test.

Launched by ``test_multiprocess.py`` N times with a shared coordinator
port and a pre-built dataset (h5ad + phenotype npz).  Each process owns
4 virtual CPU devices; together they form the global (cells x perms)
mesh.  Runs the FULL sharded association pipeline (halo-exchange
diffusion included) and verifies cross-process agreement through
``assert_agreement`` — which exercises the
``multihost_utils.process_allgather`` digest branch that single-process
tests cannot reach (SURVEY §4 multi-process simulation).

The dataset is built once by the driver rather than per-worker: graph
construction involves LAPACK/XLA reductions whose floating-point results
legitimately vary with backend thread/device configuration, and this
test isolates the *sharded pipeline* on identical inputs.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    data_path = sys.argv[4]
    y_path = sys.argv[5]
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, repo)

    from cna_tpu.parallel import launch

    launch.initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc,
        process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    import numpy as np
    import pandas as pd

    import cna_tpu
    from cna_tpu.data import read_h5ad
    from cna_tpu.parallel.launch import assert_agreement

    d = read_h5ad(data_path)
    with np.load(y_path, allow_pickle=True) as z:
        y = pd.Series(z["y"], index=pd.Index(z["index"]))

    mesh = launch.global_mesh(perms=2)
    res = cna_tpu.tl.association(d, y, "id", mesh=mesh, seed=0, Nnull=200,
                                 return_full=True)

    # the production sharded path must be the halo exchange, not GSPMD
    path = d.uns.get("_cna_tpu_diffusion_path")
    assert path == "halo", f"diffusion path {path!r}, expected 'halo'"

    # cross-process determinism digests: the global p, the per-cell
    # coefficients, and the null min-p vector (sharded over the perms
    # axis, so its digest genuinely crosses processes)
    assert_agreement(res.p, "global_p")
    assert_agreement(np.asarray(res.ncorrs), "ncorrs")
    assert_agreement(np.asarray(res.nullminps), "nullminps")

    fdr_min = float(res.fdrs.fdr.min())
    print(f"RESULT pid={pid} p={res.p:.17g} k={res.k} "
          f"ncorr_sum={np.abs(res.ncorrs).sum():.17e} fdr_min={fdr_min:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
