"""Dataset header: cosmology + simulation metadata.

Parity target: reference ``python/opencosmo/header.py:35``
(OpenCosmoHeader) and the pydantic simulation models in
``dtypes/hacc.py:28-231``. Persisted as a JSON sidecar next to the
Parquet data (the reference stores it as HDF5 attributes).
"""

from __future__ import annotations

import json
import math
from dataclasses import asdict, dataclass, field


@dataclass
class Cosmology:
    """Flat-LCDM parameters (enough for unit conversions + z<->a)."""

    H0: float = 67.66
    Om0: float = 0.3096
    Ob0: float = 0.04897
    sigma8: float = 0.8102
    ns: float = 0.9665

    @property
    def h(self) -> float:
        return self.H0 / 100.0

    def scale_factor(self, z: float) -> float:
        return 1.0 / (1.0 + z)

    def comoving_distance(self, z: float, n: int = 512) -> float:
        """Comoving distance in Mpc (flat LCDM, trapezoid integration).

        c/H0 * ∫ dz' / E(z'); good to <0.1% for test redshifts.
        """
        if z <= 0:
            return 0.0
        c_km_s = 299792.458
        om, ol = self.Om0, 1.0 - self.Om0
        total = 0.0
        prev = 1.0  # 1/E(0)
        for i in range(1, n + 1):
            zi = z * i / n
            e = math.sqrt(om * (1 + zi) ** 3 + ol)
            cur = 1.0 / e
            total += 0.5 * (prev + cur) * (z / n)
            prev = cur
        return c_km_s / self.H0 * total


@dataclass
class OpenCosmoHeader:
    """Driver-side metadata attached to every Dataset."""

    cosmology: Cosmology = field(default_factory=Cosmology)
    simulation: dict = field(default_factory=dict)
    redshift: float = 0.0
    step: int | None = None
    box_size: float | None = None  # Mpc/h comoving
    unit_convention: str = "scalefree"
    data_type: str = "snapshot"  # snapshot | lightcone | healpix_map
    extra: dict = field(default_factory=dict)

    @property
    def h(self) -> float:
        return self.cosmology.h

    @property
    def scale_factor(self) -> float:
        return 1.0 / (1.0 + self.redshift)

    def to_json(self) -> str:
        d = asdict(self)
        return json.dumps(d, indent=2, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "OpenCosmoHeader":
        d = json.loads(text)
        cosmo = Cosmology(**d.pop("cosmology", {}))
        known = {k: d[k] for k in (
            "simulation", "redshift", "step", "box_size",
            "unit_convention", "data_type", "extra",
        ) if k in d}
        return OpenCosmoHeader(cosmology=cosmo, **known)

    def with_(self, **kw) -> "OpenCosmoHeader":
        d = asdict(self)
        cosmo = d.pop("cosmology")
        d.update(kw)
        if isinstance(d.get("cosmology"), Cosmology):
            cosmo = d.pop("cosmology")
            return OpenCosmoHeader(cosmology=cosmo, **d)
        return OpenCosmoHeader(cosmology=Cosmology(**cosmo), **d)
