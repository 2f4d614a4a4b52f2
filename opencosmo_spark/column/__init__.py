from .expr import Binder, ColumnExpr, Mask, ScalarReduction, col, lit
from .stock import (
    add_mag_cols,
    gas_emission_measure,
    gas_mmw,
    gas_number_density,
    gas_temperature,
    h_fraction,
    norm_cols,
    offset_3d,
)

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
    "gas_mmw",
    "gas_temperature",
    "gas_number_density",
    "gas_emission_measure",
    "h_fraction",
]
