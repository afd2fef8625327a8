"""Sanitizer wiring tests (SURVEY §5.2; VERDICT r1 item 10).

Three layers: the per-dispatch ``jax_debug_nans`` tripwire runs the full
golden pipeline clean; checkify float-checks wrap the diffusion kernel;
and the always-on output finiteness post-condition trips on poisoned
values with an actionable message.
"""

import jax
import numpy as np
import pandas as pd
import pytest

import cna_tpu
from cna_tpu.utils import checks


def test_association_clean_under_debug_nans(demo):
    """The full pipeline produces no NaN in any compiled program."""
    d, samplem = demo
    y = samplem["case"].astype(float)
    cna_tpu.config.enable_debug_nans(True)
    try:
        p = cna_tpu.tl.association(d, y, "id", Nnull=100, seed=3)
    finally:
        cna_tpu.config.enable_debug_nans(False)
    assert 0 < p <= 1


def test_diffusion_step_checkified(demo):
    """checkify float-checks pass through the diffusion SpMM kernel."""
    import jax.numpy as jnp

    from cna_tpu.ops import spmm
    from cna_tpu.tools._nam import get_ell_graph

    d, _ = demo
    graph = get_ell_graph(d)
    s = jnp.ones((graph.n_cells, 4), dtype=graph.weights.dtype)
    colsums = graph.colsums(1.0)

    def step(s):
        return spmm.diffusion_step(s, graph, colsums,
                                   jnp.asarray(1.0, s.dtype))

    checked = checks.checkify_float_checks(jax.jit(step))
    out = checked(s)
    assert np.isfinite(np.asarray(out)).all()


def test_checkify_catches_injected_nan():
    """The checkify wrapper actually trips on an in-kernel NaN."""
    import jax.numpy as jnp

    def bad(x):
        return jnp.log(x - 2.0)  # log of negative -> NaN for x=1

    checked = checks.checkify_float_checks(jax.jit(bad))
    with pytest.raises(Exception, match="nan"):
        checked(jnp.asarray(1.0))


def test_assert_finite_trips_and_names_output():
    with pytest.raises(FloatingPointError, match="ncorrs"):
        checks.assert_finite(ncorrs=np.array([0.1, np.nan, 0.3]))
    # None and integer arrays are skipped
    checks.assert_finite(fdrs=None, counts=np.array([1, 2, 3]))


def test_runtime_checks_toggle():
    checks.enable_runtime_checks(False)
    try:
        checks.assert_finite(x=np.array([np.inf]))  # no raise when off
    finally:
        checks.enable_runtime_checks(True)
    with pytest.raises(FloatingPointError):
        checks.assert_finite(x=np.array([np.inf]))
