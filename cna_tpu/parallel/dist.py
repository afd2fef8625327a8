"""Host-side access to globally-sharded arrays (multi-process SPMD).

In a multi-process run (``jax.distributed``), an array sharded over the
``cells`` or ``perms`` mesh axis is not fully addressable from any single
process: ``np.asarray``/``jax.device_get`` raise.  Every host pull in the
pipeline goes through :func:`fetch`, which is a plain ``device_get``
single-process and an ``process_allgather`` of the global value when the
array spans processes.  The pulled quantities are all small (per-cell
scalars at most), so the gather is cheap relative to the compute it
follows.

The reference has no analog — it is single-process by construction
(SURVEY §2.3); this module is part of the multi-host communication
backend the TPU build adds (SURVEY §2.4).
"""

from __future__ import annotations

import jax
import numpy as np


def _needs_allgather(x) -> bool:
    return (isinstance(x, jax.Array)
            and jax.process_count() > 1
            and not x.is_fully_addressable)


def fetch(x) -> np.ndarray:
    """The GLOBAL value of ``x`` as a host numpy array, on every process."""
    if _needs_allgather(x):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


def fetch_many(*xs):
    """Pull several arrays; one batched device_get when all are local."""
    if any(_needs_allgather(x) for x in xs):
        return tuple(fetch(x) for x in xs)
    return tuple(np.asarray(v) for v in jax.device_get(xs))
