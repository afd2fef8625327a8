from .ell import EllGraph, from_arrays, from_scipy

__all__ = ["EllGraph", "from_arrays", "from_scipy"]
