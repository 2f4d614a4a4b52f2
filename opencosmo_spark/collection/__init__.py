from .healpix_map import HealpixMap
from .lightcone import Lightcone
from .simulation import SimulationCollection
from .structure import LinkSpec, StructureCollection

__all__ = ["StructureCollection", "LinkSpec", "Lightcone", "HealpixMap", "SimulationCollection"]
