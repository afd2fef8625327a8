"""Subprocess worker for the restart/resume test (SURVEY §5.3).

Phases:
  crash  — build the dataset, compute the NAM with a savepoint, then
           die hard (os._exit) BEFORE the association statistics run:
           the savepoint on disk is all that survives.
  resume — run the full association with the same savepoint; prints the
           pipeline progress (the savepoint hit emits "loading NAM from
           savepoint") and writes results to the output json.
  clean  — full association with NO savepoint (ground truth).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dataset():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import cna_tpu
    from cna_tpu.data import synthetic_dataset

    cna_tpu.config.enable_x64(True)
    d, samplem = synthetic_dataset(n_samples=20, cells_per_sample=60,
                                   n_genes=12, seed=13)
    from cna_tpu import pp

    pp.pca(d, n_comps=8)
    pp.neighbors(d, n_neighbors=8)
    y = samplem["case"].astype(float)
    return d, y


def main():
    phase, savepoint, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    d, y = _dataset()
    import cna_tpu

    if phase == "crash":
        from cna_tpu.tools._nam import nam_arrays

        nam_arrays(d, "id", nam_savepoint=savepoint, show_progress=True)
        assert os.path.exists(savepoint)
        sys.stdout.flush()
        os._exit(17)  # simulate an abrupt kill mid-pipeline

    kwargs = {} if phase == "clean" else {"nam_savepoint": savepoint}
    res = cna_tpu.tl.association(d, y, "id", Nnull=200, seed=0,
                                 return_full=True, show_progress=True,
                                 **kwargs)
    with open(out_path, "w") as f:
        json.dump({"p": float(res.p),
                   "ncorrs": np.asarray(res.ncorrs).tolist()}, f)


if __name__ == "__main__":
    main()
