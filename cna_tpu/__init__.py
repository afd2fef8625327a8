"""cna_tpu — a TPU-native Covarying Neighborhood Analysis framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
immunogenomics/cna: graph-diffusion neighborhood abundance matrices,
covariate residualization, global/local permutation association testing,
on-device kNN graph construction, and multi-host scaling over TPU meshes.

API mirrors the reference (scanpy-idiomatic):
  cna_tpu.tl.association / nam / svd_nam / diffuse / diffuse_stepwise
  cna_tpu.pl.umap_ncorr / umap_overlay / violinplot
  cna_tpu.ut.obs_to_sample
plus framework-native layers the reference outsources:
  cna_tpu.CellData, cna_tpu.read_h5ad (data model + IO)
  cna_tpu.pp (PCA / kNN / UMAP-connectivity graph construction)
  cna_tpu.parallel (mesh sharding for cells and permutations)
"""

from . import config
from . import pp
from . import parallel
from . import tools as tl
from . import plotting as pl
from . import utils as ut
from .data import CellData, read_h5ad
from .tools import association, nam, svd_nam, diffuse, diffuse_stepwise

__version__ = "0.1.0"

__all__ = [
    "association",
    "nam",
    "svd_nam",
    "diffuse",
    "diffuse_stepwise",
    "CellData",
    "read_h5ad",
    "tl",
    "pl",
    "ut",
    "config",
]
