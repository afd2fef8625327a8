"""Multi-host SPMD launch helpers (SURVEY §2.4).

The reference is single-process; here multi-host runs follow the standard
JAX single-controller-per-host model: every host runs the same program,
``initialize_distributed`` wires the process group (XLA's runtime is the
communication backend — no NCCL/MPI analog to manage), and
``global_mesh`` builds the (cells, perms) mesh over all global devices.
Collectives ride ICI within a slice and DCN across slices; the sharded
pipeline stages (``parallel.sharded``, ``parallel.halo``) are already
expressed against the mesh and need no changes multi-host.

Typical pod-slice driver::

    from cna_tpu.parallel import launch
    launch.initialize_distributed()          # env-driven on TPU pods
    mesh = launch.global_mesh(perms=2)
    p = cna_tpu.tl.association(data, y, "sample", mesh=mesh)
"""

from __future__ import annotations

import jax

from .mesh import make_mesh


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, local_device_ids=None) -> None:
    """Initialize the JAX process group.

    On TPU pods all arguments are discovered from the environment; on
    CPU/GPU test rigs pass them explicitly.  Safe to call once per
    process, before any device use.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def global_mesh(perms: int = 1):
    """(cells, perms) mesh over every device in the process group."""
    return make_mesh(jax.devices(), perms=perms)


def process_info():
    """(process_index, process_count, local_device_count, global_device_count)."""
    return (jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count())


def _digest(value):
    """Order-independent numeric digest of an array-like: (size, sum,
    |x| sum, max) — enough to catch any nondeterministic collective or
    divergent input without shipping the full array between hosts."""
    import numpy as np

    local = np.asarray(jax.device_get(value), dtype=np.float64).ravel()
    mx = float(local.max()) if local.size else 0.0
    return np.array([float(local.size), float(local.sum()),
                     float(np.abs(local).sum()), mx])


def _check_digest_rows(rows, name, atol):
    """Raise if any process's digest deviates from process 0's.

    A NaN anywhere in the digest (the value itself contained NaN, even
    identically on every process) raises a dedicated error rather than a
    misattributed "cross-process disagreement" — ``allclose`` would flag
    NaN == NaN as a mismatch otherwise.
    """
    import numpy as np

    rows = np.atleast_2d(np.asarray(rows))
    if np.isnan(rows).any():
        raise RuntimeError(
            f"digest of {name!r} contains NaN — the checked value itself "
            "has NaN entries; fix the producing computation (this is not "
            "a cross-process disagreement)"
        )
    ref = rows[0]
    for pid, row in enumerate(rows[1:], start=1):
        if not np.allclose(row, ref, atol=atol, rtol=0.0):
            raise RuntimeError(
                f"cross-process disagreement on {name!r}: process {pid} "
                f"digest {row.tolist()} != process 0 digest {ref.tolist()}"
            )


def assert_agreement(value, name="value", atol=0.0):
    """Deterministic-collective assertion (SURVEY §5.2).

    Every process computes a numeric digest of ``value`` and all-gathers
    it; a mismatch raises on every process, naming the first divergent
    one.  Use in multi-host CI to verify the sharded pipeline produced
    identical results everywhere (e.g. the global p-value, the NAM
    checksum after halo-exchange diffusion).  Single-process: a no-op
    sanity pass.  ``atol`` admits benign cross-host reduction-order
    noise in f32 runs; the default demands bit-identical digests.
    """
    digest = _digest(value)
    if jax.process_count() == 1:
        _check_digest_rows(digest[None, :], name, atol)
        return
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(digest)
    _check_digest_rows(gathered, name, atol)
