"""End-to-end association on a virtual device mesh must match single-device."""

import jax
import numpy as np

import cna_tpu
from cna_tpu.parallel import make_mesh


def test_association_on_mesh_matches(demo):
    d, samplem = demo
    y = samplem["case"].astype(float)
    null_y = np.random.RandomState(9).randn(50, 64)

    res_single = cna_tpu.tl.association(d, y, "id", Nnull=64, null_y=null_y,
                                        return_full=True)
    mesh = make_mesh(jax.devices()[:8], perms=2)
    res_mesh = cna_tpu.tl.association(d, y, "id", Nnull=64, null_y=null_y,
                                      mesh=mesh, return_full=True)

    assert res_single.p == res_mesh.p
    assert res_single.k == res_mesh.k
    np.testing.assert_allclose(res_single.ncorrs, res_mesh.ncorrs,
                               rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(res_single.fdrs.fdr.values,
                               res_mesh.fdrs.fdr.values,
                               rtol=1e-8, atol=1e-11)


def test_nam_on_mesh_matches(demo):
    d, samplem = demo
    nam_single, keep_s = cna_tpu.tl._nam.nam_arrays(d, "id")
    mesh = make_mesh(jax.devices()[:4], perms=1)
    nam_mesh, keep_m = cna_tpu.tl._nam.nam_arrays(d, "id", mesh=mesh)
    assert np.array_equal(keep_s, keep_m)
    np.testing.assert_allclose(np.asarray(nam_single.nam),
                               np.asarray(nam_mesh.nam),
                               rtol=1e-10, atol=1e-13)
