"""Pure-XLA / Pallas compute kernels for the CNA pipeline."""
from . import fdr, ftest, linalg, moments, permutations, spmm

__all__ = ["fdr", "ftest", "linalg", "moments", "permutations", "spmm"]
