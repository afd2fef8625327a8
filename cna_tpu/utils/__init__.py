from .multisample import obs_to_sample
from . import profiling
from . import checkpoint
from . import checks

__all__ = ["obs_to_sample", "profiling", "checkpoint", "checks"]
