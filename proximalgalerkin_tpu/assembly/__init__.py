from .assemble import VolumeForm
from .geometry import cell_geometry, CellGeometry

__all__ = ["VolumeForm", "cell_geometry", "CellGeometry"]
