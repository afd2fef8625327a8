"""Multi-device / multi-host scaling: mesh construction and sharded stages."""
from . import mesh
from .mesh import make_mesh, CELLS, PERMS
from . import halo
from . import launch
from . import sharded

__all__ = ["mesh", "make_mesh", "sharded", "halo", "launch", "CELLS", "PERMS"]
