from ._nam import nam, svd_nam, diffuse, diffuse_stepwise
from ._association import association

__all__ = ["association", "nam", "svd_nam", "diffuse", "diffuse_stepwise"]
