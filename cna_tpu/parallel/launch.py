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
