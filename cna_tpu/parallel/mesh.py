"""Device-mesh construction and sharding specs for the CNA pipeline.

The reference is strictly single-process (SURVEY §2.3); here scale-out is
a first-class layer.  The pipeline's two axes of scale map onto a 2-D
mesh:

* ``cells`` — the long axis (up to millions).  Diffusion state, the NAM,
  and neighborhood statistics are row-sharded over it; XLA inserts the
  gather/all-gather collectives for cross-shard graph edges.
* ``perms`` — the permutation-null axis (embarrassingly parallel).  Null
  phenotype columns, min-p batches, and FDR tail counts shard over it and
  merge with tiny collectives.

Everything over the sample axis (S x S projectors, Gram SVD) is
replicated — it is a few hundred squared at most.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

CELLS = "cells"
PERMS = "perms"


def make_mesh(devices=None, cells: int | None = None, perms: int = 1) -> Mesh:
    """Build a (cells, perms) mesh over ``devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if cells is None:
        if n % perms:
            raise ValueError(f"{n} devices not divisible by perms={perms}")
        cells = n // perms
    if cells * perms > n:
        raise ValueError(
            f"mesh {cells}x{perms} needs {cells * perms} devices, have {n}")
    dev_array = np.asarray(devices[: cells * perms]).reshape(cells, perms)
    return Mesh(dev_array, (CELLS, PERMS))


def cell_rows(mesh: Mesh) -> NamedSharding:
    """Rows sharded over the cell axis: (n_cells, ...) arrays."""
    return NamedSharding(mesh, P(CELLS))


def cell_cols(mesh: Mesh) -> NamedSharding:
    """Columns sharded over the cell axis: (S, n_cells) arrays (the NAM)."""
    return NamedSharding(mesh, P(None, CELLS))


def perm_cols(mesh: Mesh) -> NamedSharding:
    """Columns sharded over the permutation axis: (n, Nnull) null matrices."""
    return NamedSharding(mesh, P(None, PERMS))


def cell_by_perm(mesh: Mesh) -> NamedSharding:
    """(n_cells, Nnull) arrays sharded over both axes (null ncorrs)."""
    return NamedSharding(mesh, P(CELLS, PERMS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
