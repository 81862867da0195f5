from .operator import CmeOperator, build_operator
from .spmv import spmv
from .expm import expm_pade

__all__ = ["CmeOperator", "build_operator", "spmv", "expm_pade"]
