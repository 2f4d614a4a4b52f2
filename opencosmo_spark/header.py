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
    """Cosmology parameters covering the reference's model family
    (reference cosmology.py:62-80 dispatches FlatLambdaCDM / LambdaCDM
    / FlatwCDM / wCDM / Flatw0waCDM / w0waCDM from the same five
    numbers; we keep the parameters and the distance integral instead
    of astropy class objects).

    Defaults are flat LCDM. ``Ode0=None`` means flat (Ode0 =
    1 - Om0); set it explicitly for open/closed models.
    """

    H0: float = 67.66
    Om0: float = 0.3096
    Ob0: float = 0.04897
    sigma8: float = 0.8102
    ns: float = 0.9665
    Ode0: float | None = None
    w0: float = -1.0
    wa: float = 0.0

    @property
    def h(self) -> float:
        return self.H0 / 100.0

    @property
    def ode0(self) -> float:
        return 1.0 - self.Om0 if self.Ode0 is None else self.Ode0

    @property
    def ok0(self) -> float:
        """Curvature density (0 for flat models)."""
        return 1.0 - self.Om0 - self.ode0

    @property
    def is_flat(self) -> bool:
        return abs(self.ok0) < 1e-12

    @property
    def model_type(self) -> str:
        """Most specific model name (mirrors the reference's astropy
        class dispatch, cosmology.py:62-80)."""
        if self.wa != 0:
            return "Flatw0waCDM" if self.is_flat else "w0waCDM"
        if self.w0 != -1:
            return "FlatwCDM" if self.is_flat else "wCDM"
        return "FlatLambdaCDM" if self.is_flat else "LambdaCDM"

    def scale_factor(self, z: float) -> float:
        return 1.0 / (1.0 + z)

    def efunc(self, z: float) -> float:
        """E(z) = H(z)/H0 with curvature and CPL dark energy
        w(a) = w0 + wa(1-a)."""
        zp = 1.0 + z
        de = self.ode0
        if self.w0 != -1.0 or self.wa != 0.0:
            a = 1.0 / zp
            de = de * a ** (-3.0 * (1.0 + self.w0 + self.wa)) * math.exp(
                -3.0 * self.wa * (1.0 - a)
            )
        return math.sqrt(self.Om0 * zp**3 + self.ok0 * zp**2 + de)

    def comoving_distance(self, z: float, n: int = 512) -> float:
        """Line-of-sight comoving distance in Mpc (trapezoid
        integration of c/H0 ∫ dz'/E(z'); <0.1% for test redshifts)."""
        if z <= 0:
            return 0.0
        c_km_s = 299792.458
        total = 0.0
        prev = 1.0  # 1/E(0)
        for i in range(1, n + 1):
            zi = z * i / n
            cur = 1.0 / self.efunc(zi)
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
