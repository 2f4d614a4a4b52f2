"""Stock derived-column builders.

Parity target: reference ``python/opencosmo/column/stock.py``
(norm_cols :121-152, offset_3d :28-74, add_mag_cols :77-118). Pure
expression composition — no UDFs, fully codegen'd by Catalyst.
"""

from __future__ import annotations

from .expr import ColumnExpr, col, wrap


def norm_cols(*columns: str | ColumnExpr) -> ColumnExpr:
    """Euclidean norm of N columns: sqrt(sum(c_i^2))."""
    if not columns:
        raise ValueError("norm_cols needs at least one column")
    exprs = [col(c) if isinstance(c, str) else wrap(c) for c in columns]
    acc = exprs[0] * exprs[0]
    for e in exprs[1:]:
        acc = acc + e * e
    return acc.sqrt()


def offset_3d(
    a: tuple[str, str, str] | list[str],
    b: tuple[str, str, str] | list[str],
) -> ColumnExpr:
    """Distance between two 3-D coordinate triples: ||A - B||."""
    if len(a) != len(b):
        raise ValueError("coordinate triples must have equal length")
    diffs = [col(x) - col(y) for x, y in zip(a, b)]
    return norm_cols(*diffs)


def add_mag_cols(*mags: str | ColumnExpr) -> ColumnExpr:
    """Astronomical magnitude addition via flux space:
    -2.5*log10(sum(10^(-0.4*m_i)))."""
    if not mags:
        raise ValueError("add_mag_cols needs at least one column")
    exprs = [col(m) if isinstance(m, str) else wrap(m) for m in mags]
    flux = (exprs[0] * -0.4).exp10()
    for e in exprs[1:]:
        flux = flux + (e * -0.4).exp10()
    return flux.log10() * -2.5


# ---- derived gas thermodynamics (reference analysis/yt_utils.py
# :272-310 defines these as yt-side derived fields; here they are
# engine-side column expressions, so they filter/aggregate/push down
# like any other column instead of requiring a yt export first).
# Physics: fully-ionized ideal monatomic gas (gamma = 5/3), the
# standard X-ray cluster assumptions. All inputs CGS: density g/cm^3,
# specific internal energy cm^2/s^2, mass g. ----

PROTON_MASS_G = 1.67262192369e-24
BOLTZMANN_ERG_PER_K = 1.380649e-16
SOLAR_METALLICITY = 0.012899  # HACC's internal value (public release)


def _c(x: str | ColumnExpr) -> ColumnExpr:
    return col(x) if isinstance(x, str) else wrap(x)


def h_fraction(yhe: str | ColumnExpr = "yhe") -> ColumnExpr:
    """Hydrogen mass fraction X = 1 - Y from the helium fraction."""
    return 1.0 - _c(yhe)


def gas_mmw(
    yhe: str | ColumnExpr = "yhe", zmet: str | ColumnExpr = "zmet"
) -> ColumnExpr:
    """Mean molecular weight of fully ionized gas,
    mu = 1 / (2X + 0.75Y + Z/32), with Z = zmet * Z_sun (zmet in
    solar units). Recomputed from composition — the stored ``mu``
    field is a placeholder in the source catalogs."""
    y = _c(yhe)
    x = 1.0 - y
    z = _c(zmet) * SOLAR_METALLICITY
    return 1.0 / (x * 2.0 + y * 0.75 + z * (1.0 / 32.0))


def gas_temperature(
    uu: str | ColumnExpr = "uu",
    yhe: str | ColumnExpr = "yhe",
    zmet: str | ColumnExpr = "zmet",
    uu_to_cgs: float = 1.0,
) -> ColumnExpr:
    """Gas temperature in K: T = mu * m_p * u * (gamma - 1) / k_B
    with gamma = 5/3 and u the specific internal energy in cm^2/s^2
    (``uu_to_cgs`` rescales other conventions, e.g. 1e10 for
    (km/s)^2)."""
    u_cgs = _c(uu) * uu_to_cgs
    return (
        gas_mmw(yhe, zmet)
        * u_cgs
        * (PROTON_MASS_G * (2.0 / 3.0) / BOLTZMANN_ERG_PER_K)
    )


def gas_number_density(
    density: str | ColumnExpr = "rho",
    yhe: str | ColumnExpr = "yhe",
    zmet: str | ColumnExpr = "zmet",
) -> ColumnExpr:
    """Total particle number density n = rho / (mu * m_p) in cm^-3
    (density in g/cm^3)."""
    return _c(density) / (gas_mmw(yhe, zmet) * PROTON_MASS_G)


def gas_emission_measure(
    density: str | ColumnExpr = "rho",
    mass: str | ColumnExpr = "mass",
    yhe: str | ColumnExpr = "yhe",
) -> ColumnExpr:
    """X-ray emission measure n_e * n_H * V per particle in cm^-3:
    n_e = (1 - Y/2) rho/m_p, n_H = (1 - Y) rho/m_p (fully ionized),
    V = mass/rho — so the product simplifies to one density power:
    (1 - Y/2)(1 - Y) * rho * mass / m_p^2."""
    y = _c(yhe)
    return (
        (1.0 - y * 0.5)
        * (1.0 - y)
        * _c(density)
        * _c(mass)
        * (1.0 / (PROTON_MASS_G * PROTON_MASS_G))
    )
