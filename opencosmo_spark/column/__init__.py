from .expr import Binder, ColumnExpr, Mask, ScalarReduction, col, lit
from .stock import add_mag_cols, norm_cols, offset_3d

__all__ = [
    "Binder",
    "ColumnExpr",
    "Mask",
    "ScalarReduction",
    "col",
    "lit",
    "norm_cols",
    "offset_3d",
    "add_mag_cols",
]
