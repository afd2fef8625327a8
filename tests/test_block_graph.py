"""Tests for the block-dense graph format and its format-invariance."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import cna_tpu
from cna_tpu.graph.blocks import BlockGraph, from_scipy_blocks
from cna_tpu.ops import spmm


def test_block_spmm_matches_scipy():
    rng = np.random.default_rng(0)
    n, s = 700, 9
    a = sp.random(n, n, density=0.02, random_state=5, format="csr")
    g = from_scipy_blocks(a, block_size=64)
    x = rng.standard_normal((n, s))
    xp = np.pad(x, ((0, g.colsums_raw.shape[0] - n), (0, 0)))
    got = np.asarray(spmm.block_spmm(g, jnp.asarray(xp)))[:n]
    np.testing.assert_allclose(got, a @ x, rtol=1e-10, atol=1e-12)


def test_block_spmm_chunked_matches():
    rng = np.random.default_rng(1)
    n, s = 1024, 5
    a = sp.random(n, n, density=0.05, random_state=6, format="csr")
    g = from_scipy_blocks(a, block_size=32)
    assert g.n_pairs > 16
    x = jnp.asarray(np.pad(rng.standard_normal((n, s)),
                           ((0, g.colsums_raw.shape[0] - n), (0, 0))))
    full = np.asarray(spmm.block_spmm(g, x, pair_chunk=10**9))
    chunked = np.asarray(spmm.block_spmm(g, x, pair_chunk=16))
    np.testing.assert_allclose(full, chunked, rtol=1e-10, atol=1e-12)


def test_nam_block_format_matches_ell(demo):
    """The NAM must be invariant to the device graph format."""
    d, _ = demo
    nam_ell, keep_ell = cna_tpu.tl.nam(d, "id")

    cna_tpu.tl._nam.set_graph_format(d, "block")
    try:
        nam_blk, keep_blk = cna_tpu.tl.nam(d, "id")
    finally:
        cna_tpu.tl._nam.set_graph_format(d, "ell")

    assert np.array_equal(keep_ell, keep_blk)
    np.testing.assert_allclose(nam_ell.values, nam_blk.values,
                               rtol=1e-9, atol=1e-12)


def test_association_block_format_matches(demo):
    d, samplem = demo
    y = samplem["case"].astype(float)
    null_y = np.random.RandomState(3).randn(50, 50)
    res_ell = cna_tpu.tl.association(d, y, "id", Nnull=50, null_y=null_y,
                                     return_full=True)
    cna_tpu.tl._nam.set_graph_format(d, "block")
    try:
        res_blk = cna_tpu.tl.association(d, y, "id", Nnull=50, null_y=null_y,
                                         return_full=True)
    finally:
        cna_tpu.tl._nam.set_graph_format(d, "ell")
    assert res_ell.p == res_blk.p
    np.testing.assert_allclose(res_ell.ncorrs, res_blk.ncorrs,
                               rtol=1e-6, atol=1e-9)


def test_hybrid_spmm_matches_scipy():
    from cna_tpu.graph.blocks import from_scipy_hybrid

    rng = np.random.default_rng(7)
    n, s = 900, 6
    a = sp.random(n, n, density=0.03, random_state=8, format="csr")
    g = from_scipy_hybrid(a, block_size=32, coverage=0.6)
    assert g.block.n_pairs > 0 and g.ell.weights.shape[0] == g.n_rows
    x = rng.standard_normal((n, s))
    xp = jnp.asarray(np.pad(x, ((0, g.n_rows - n), (0, 0))))
    t = xp / g.colsums(1.0)[:, None]
    got = np.asarray(spmm.diffusion_step(xp, g, g.colsums(1.0), 1.0))[:n]
    expected = (a @ (x / np.asarray(g.colsums(1.0))[:n, None])
                + np.asarray(t)[:n])
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-11)


def test_nam_hybrid_format_matches_ell(demo):
    d, _ = demo
    nam_ell, keep_ell = cna_tpu.tl.nam(d, "id")
    cna_tpu.tl._nam.set_graph_format(d, "hybrid")
    try:
        nam_h, keep_h = cna_tpu.tl.nam(d, "id")
    finally:
        cna_tpu.tl._nam.set_graph_format(d, "ell")
    assert np.array_equal(keep_ell, keep_h)
    np.testing.assert_allclose(nam_ell.values, nam_h.values,
                               rtol=1e-9, atol=1e-12)
