from .multisample import obs_to_sample
from . import profiling
from . import checkpoint

__all__ = ["obs_to_sample", "profiling", "checkpoint"]
