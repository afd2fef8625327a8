"""Runtime numeric sanitizers (SURVEY §5.2).

The reference has nothing to race and nothing to sanitize — single
thread, fail-fast ValueErrors.  The TPU build adds three layers:

1. ``assert_finite`` — always-on post-condition on the pipeline's small
   host-side outputs (global p, min-p nulls, neighborhood coefficients,
   FDR curve).  An output NaN/Inf is always a framework bug, and the
   check costs microseconds, so it is on by default
   (``cna_tpu.config.enable_runtime_checks(False)`` to opt out).
2. ``checkify_float_checks`` — wraps a jitted function with
   ``jax.experimental.checkify`` float checks (NaN/Inf produced *inside*
   kernels), for CI and debugging of new kernels.
3. ``cna_tpu.config.enable_debug_nans`` — the per-dispatch NaN tripwire;
   a CI job runs the golden pipeline under it (tests/test_sanitizers.py).
"""

from __future__ import annotations

import numpy as np

_RUNTIME_CHECKS = True


def enable_runtime_checks(enable: bool = True) -> None:
    global _RUNTIME_CHECKS
    _RUNTIME_CHECKS = bool(enable)


def runtime_checks_enabled() -> bool:
    return _RUNTIME_CHECKS


def assert_finite(**named_arrays) -> None:
    """Raise FloatingPointError naming the first non-finite output.

    No-op when runtime checks are disabled.  Accepts arrays or scalars;
    None values are skipped (optional outputs).
    """
    if not _RUNTIME_CHECKS:
        return
    for name, value in named_arrays.items():
        if value is None:
            continue
        arr = np.asarray(value)
        if arr.dtype.kind not in "fc":
            continue
        if not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"association produced {n_bad} non-finite value(s) in "
                f"{name!r} (shape {arr.shape}). This indicates a numeric "
                "bug in the pipeline or degenerate input (e.g. a constant "
                "phenotype or an empty graph); rerun with "
                "cna_tpu.config.enable_debug_nans(True) to locate the "
                "producing kernel."
            )


def checkify_float_checks(fn):
    """Wrap ``fn`` with checkify float checks: returns a callable with
    the same signature that raises on NaN/Inf created anywhere inside."""
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper
