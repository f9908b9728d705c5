from .checkpoint import LVPPCheckpoint
from .pointeval import evaluate, interpolate_nonmatching, locate_cells
from .profiling import annotate, device_trace

__all__ = ["LVPPCheckpoint", "evaluate", "interpolate_nonmatching",
           "locate_cells", "annotate", "device_trace"]
