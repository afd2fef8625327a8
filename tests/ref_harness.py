"""Harness for running the PINNED REFERENCE implementation in-process.

The golden-agreement tests execute the actual reference code mounted at
/root/reference (read-only) on the same inputs as cna_tpu and compare
outputs.  The reference imports anndata/scanpy, which are not installed
here; since it only uses them for (a) a version sniff around the graph
accessor and (b) plotting, lightweight module stubs plus one accessor
monkeypatch make the full pipeline runnable on a duck-typed data object.

This file contains NO reference code — it only imports and invokes it.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pandas as pd

_REF_PATH = "/root/reference/src"
_ref_module = None


class RefData:
    """Duck-typed stand-in for AnnData: .obs DataFrame + .obsp dict."""

    def __init__(self, obs: pd.DataFrame, connectivities):
        self.obs = obs.copy()
        self.obsp = {"connectivities": connectivities}
        self.uns = {}


def load_reference():
    """Import the reference cna package (cached), stubbing its externals."""
    global _ref_module
    if _ref_module is not None:
        return _ref_module

    if "scanpy" not in sys.modules:
        scanpy_stub = types.ModuleType("scanpy")
        scanpy_stub.pl = types.SimpleNamespace(umap=lambda *a, **k: None)
        sys.modules["scanpy"] = scanpy_stub
    if "anndata" not in sys.modules:
        sys.modules["anndata"] = types.ModuleType("anndata")

    # numpy 2 removed np.NaN (used by the reference's write-back path)
    if not hasattr(np, "NaN"):
        np.NaN = np.nan

    if _REF_PATH not in sys.path:
        sys.path.insert(0, _REF_PATH)
    import cna  # noqa: F401  (the reference package)

    # bypass the anndata version sniff in the graph accessor
    cna.tl._nam.get_connectivity = lambda data: data.obsp["connectivities"]
    _ref_module = cna
    return cna


def ref_data_from(data, sid_cols=("id", "case", "male", "batch")):
    """Build a RefData view of a cna_tpu CellData (same graph, same obs)."""
    cols = [c for c in sid_cols if c in data.obs.columns]
    return RefData(data.obs[cols], data.obsp["connectivities"])
