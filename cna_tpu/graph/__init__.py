from .buckets import BucketEllGraph, degree_ordering, from_scipy_buckets
from .ell import EllGraph, from_arrays, from_scipy

__all__ = ["EllGraph", "from_arrays", "from_scipy",
           "BucketEllGraph", "degree_ordering", "from_scipy_buckets"]
