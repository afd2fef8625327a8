"""``cna_tpu.tl`` — the scanpy-idiomatic tools namespace.

Mirrors the reference's ``cna.tl`` exports (``tools/__init__.py:1-9``):
association, nam, svd_nam, diffuse, diffuse_stepwise; plus the TPU-only
graph-format selector.
"""
from ._association import association
from ._nam import (diffuse, diffuse_stepwise, nam, set_graph_format,
                   svd_nam)
from . import _stats  # reference-compatible cna.tl._stats namespace

__all__ = ["association", "nam", "svd_nam", "diffuse", "diffuse_stepwise",
           "set_graph_format"]
