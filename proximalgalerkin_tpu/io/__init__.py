from .vtu import (write_vtu, read_vtu, PVDWriter, write_xdmf, read_xdmf)

__all__ = ["write_vtu", "read_vtu", "PVDWriter", "write_xdmf", "read_xdmf"]
