from .vtu import write_vtu, read_vtu, PVDWriter, write_xdmf

__all__ = ["write_vtu", "read_vtu", "PVDWriter", "write_xdmf"]
