"""Global numeric / device configuration for cna_tpu.

The reference implementation (immunogenomics/cna) computes everything in
float64 on the host CPU (numpy/pandas defaults).  On TPU, float64 is
emulated and slow; the framework therefore supports two precision modes:

* ``x64``  -- float64 end-to-end, used for bit-close agreement with the
  reference (golden tests, small data).
* ``f32``  -- float32 compute (bfloat16 matmul accumulation in the hot
  SpMM where safe), used for throughput on real TPU hardware.

Precision is controlled process-wide through ``jax.config.jax_enable_x64``
plus the helpers here, mirroring how the reference inherits numpy's dtype
defaults rather than threading dtypes through every call.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax
import jax.numpy as jnp


def enable_x64(enable: bool = True) -> None:
    """Toggle float64 compute (required for reference-exact agreement)."""
    jax.config.update("jax_enable_x64", enable)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_float():
    """The working dtype for dense statistics (NAM, projections, tests)."""
    return jnp.float64 if x64_enabled() else jnp.float32


def spmm_dtype():
    """Dtype for the diffusion SpMM hot loop.

    In f32 mode the gather/multiply-accumulate runs in float32 (bfloat16
    inputs lose too much precision over <=15 accumulating diffusion steps
    for the downstream kurtosis stopping rule to stay faithful).
    """
    return default_float()


@dataclasses.dataclass(frozen=True)
class Precision:
    """Frozen record of the precision policy in force for a pipeline run."""

    x64: bool

    @property
    def float(self):
        return jnp.float64 if self.x64 else jnp.float32


def current_precision() -> Precision:
    return Precision(x64=x64_enabled())


@contextlib.contextmanager
def precision(x64: bool):
    """Context manager for temporarily switching precision mode."""
    old = x64_enabled()
    try:
        enable_x64(x64)
        yield current_precision()
    finally:
        enable_x64(old)


def enable_debug_nans(enable: bool = True) -> None:
    """NaN tripwire for every compiled program (SURVEY §5.2: the
    JAX-native analog of a sanitizer run; use in CI / debugging, not
    production — it forces a check after each dispatch)."""
    jax.config.update("jax_debug_nans", enable)


def enable_runtime_checks(enable: bool = True) -> None:
    """Toggle the always-on finiteness post-conditions on association
    outputs (``utils.checks.assert_finite``).  Default on — the checked
    quantities are tiny host arrays, so the cost is microseconds."""
    from .utils import checks

    checks.enable_runtime_checks(enable)


def enable_compilation_cache(cache_dir: str = ".jax_cache",
                             min_compile_seconds: float = 0.5) -> None:
    """Persist compiled executables across processes.  First compiles on
    a tunneled TPU cost tens of seconds; the cache makes reruns warm."""
    import os

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_seconds)


def warmup_transfers_async() -> "object":
    """Start the device<->host transfer path warming in a daemon thread.

    Through a tunneled remote TPU the FIRST device->host transfer of a
    process pays a large one-time setup cost (~70 s measured on this
    deployment) regardless of size.  Firing a 4-byte round trip in the
    background at startup overlaps that setup with host-side data prep /
    compilation, so the first real result pull is cheap.

    Returns the started thread (join it to block until warm); no-op
    cost if the path is already warm.
    """
    import threading

    def _warm():
        try:
            import numpy as np

            np.asarray(jax.device_put(jnp.zeros((1,), jnp.float32)))
        except Exception:
            pass  # never let warmup take a process down

    t = threading.Thread(target=_warm, name="cna-transfer-warmup",
                         daemon=True)
    t.start()
    return t
