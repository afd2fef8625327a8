"""Pure-XLA / Pallas compute kernels for the CNA pipeline."""
from . import fdr, ftest, linalg, moments, permutations, spmm

# Pallas TPU kernels (knn_pallas, spmm_pallas) are imported lazily by
# their call sites so a CPU-only install never touches Mosaic.

__all__ = ["fdr", "ftest", "linalg", "moments", "permutations", "spmm"]
