"""opencosmo_spark — a PySpark-native analytical engine with the query
and data-processing capabilities of ArgonneCPAC/OpenCosmo.

Public API mirrors the reference package surface
(/root/reference/python/opencosmo/__init__.py) re-expressed Spark-first:
``open``/``write`` over Parquet, lazy immutable ``Dataset`` over a
DataFrame, unit conventions as projection rewrites, spatial regions as
two-phase pruning predicates, linked collections as key-based joins.
"""

from __future__ import annotations

__version__ = "0.1.0"

from .column import (
    add_mag_cols,
    col,
    gas_emission_measure,
    gas_mmw,
    gas_number_density,
    gas_temperature,
    h_fraction,
    lit,
    norm_cols,
    offset_3d,
)
from .dataset import Dataset
from .header import Cosmology, OpenCosmoHeader
from .session import get_spark
from .units import Quantity, Unit, UnitConvention, parse_unit
from .collection.healpix_map import HealpixMap
from .collection.lightcone import Lightcone
from .collection.simulation import SimulationCollection
from .collection.structure import StructureCollection

__all__ = [
    "Dataset",
    "StructureCollection",
    "SimulationCollection",
    "Lightcone",
    "HealpixMap",
    "OpenCosmoHeader",
    "Cosmology",
    "get_spark",
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
    "Quantity",
    "Unit",
    "UnitConvention",
    "parse_unit",
    "open",
    "write",
    "write_parquet",
    "write_hdf5",
    "make_box",
    "make_cone",
    "make_skybox",
]


def open(*paths, **flags):  # noqa: A001 - mirrors reference oc.open
    from .io import open_files

    return open_files(*paths, **flags)


def write(path, dataset, overwrite: bool = False):
    from .io import write_dataset

    return write_dataset(path, dataset, overwrite=overwrite)


def write_parquet(path, dataset, overwrite: bool = False):
    from .io import write_dataset

    return write_dataset(path, dataset, overwrite=overwrite)


def write_hdf5(path, dataset, overwrite: bool = False, **kw):
    """Export to the reference's SPEC HDF5 layout (h5py-gated):
    Dataset -> single-dataset file, StructureCollection ->
    multi-dataset file; see io/hdf5.py::write_hdf5."""
    from .io.hdf5 import write_hdf5 as _wh

    return _wh(dataset, path, overwrite=overwrite, **kw)


def make_box(p1, p2):
    from .spatial.region import make_box as _mb

    return _mb(p1, p2)


def make_cone(center, radius):
    from .spatial.region import make_cone as _mc

    return _mc(center, radius)


def make_skybox(p1, p2):
    from .spatial.region import make_skybox as _ms

    return _ms(p1, p2)
