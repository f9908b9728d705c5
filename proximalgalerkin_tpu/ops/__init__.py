from .pallas_spmv import dia_spmv_pallas

__all__ = ["dia_spmv_pallas"]
