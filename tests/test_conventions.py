"""Unit-convention switching tests (reference test/test_units.py
semantics, factors recomputed by hand): scalefree -> comoving divides
out littleh; -> physical additionally applies a^(length power) with
per-row scale factor where available.
"""

import numpy as np
import pytest

import opencosmo_spark as oc


@pytest.fixture(scope="module")
def halos(spark, fixtures):
    return oc.open(f"{fixtures}/halo_properties")


H = 0.6766


def test_scalefree_to_comoving(halos):
    raw = halos.get_data("numpy")
    com = halos.with_units("comoving")
    data = com.get_data("numpy")
    # Msun/h -> Msun: divide by h
    np.testing.assert_allclose(
        data["fof_halo_mass"],
        raw["fof_halo_mass"].astype(np.float64) / H,
        rtol=1e-6,
    )
    # Mpc/h -> Mpc
    np.testing.assert_allclose(
        data["fof_halo_center_x"],
        raw["fof_halo_center_x"].astype(np.float64) / H,
        rtol=1e-6,
    )
    # km/s: no h -> unchanged
    np.testing.assert_allclose(data["fof_halo_com_vx"], raw["fof_halo_com_vx"])
    assert str(com.units["fof_halo_mass"]) == "Msun"
    assert com.convention == "comoving"


def test_comoving_to_physical_per_row_a(halos):
    raw = halos.get_data("numpy")
    phys = halos.with_units("physical")
    data = phys.get_data("numpy")
    a = raw["fof_halo_center_a"].astype(np.float64)
    # positions: ×a (length power 1), after h removal
    np.testing.assert_allclose(
        data["fof_halo_center_x"],
        raw["fof_halo_center_x"].astype(np.float64) / H * a,
        rtol=1e-6,
    )
    # velocity km/s has length power 1 -> ×a
    np.testing.assert_allclose(
        data["fof_halo_com_vx"],
        raw["fof_halo_com_vx"].astype(np.float64) * a,
        rtol=1e-6,
    )
    # mass: no length dimension -> only h removal
    np.testing.assert_allclose(
        data["fof_halo_mass"],
        raw["fof_halo_mass"].astype(np.float64) / H,
        rtol=1e-6,
    )


def test_unitless(halos):
    un = halos.with_units("unitless")
    assert all(u.dimensionless_ for u in un.units.values())
    raw = halos.get_data("numpy")
    data = un.get_data("numpy")
    np.testing.assert_allclose(data["fof_halo_mass"], raw["fof_halo_mass"])


def test_per_column_conversion(halos):
    # the column is Mpc/h: converting the prefix is fine as long as the
    # littleh power is preserved (h conversion needs the cosmology and
    # must go through a convention switch)
    conv = halos.with_units(conversions={"sod_halo_radius": "kpc/h"})
    raw = halos.get_data("numpy")
    data = conv.get_data("numpy")
    np.testing.assert_allclose(
        data["sod_halo_radius"],
        raw["sod_halo_radius"].astype(np.float64) * 1000.0,
        rtol=1e-6,
    )
    assert str(conv.units["sod_halo_radius"]) == "kpc / h"

    from opencosmo_spark.units import UnitError

    with pytest.raises(UnitError):
        halos.with_units(conversions={"sod_halo_radius": "kpc"})


def test_filter_in_new_convention(halos):
    from opencosmo_spark import col

    com = halos.with_units("comoving")
    raw = halos.get_data("numpy")
    expected = np.sum(raw["fof_halo_mass"].astype(np.float64) / H > 1e13)
    assert len(com.filter(col("fof_halo_mass") > 1e13)) == expected


def test_derived_in_new_convention(halos):
    from opencosmo_spark import col

    com = halos.with_units("comoving")
    d = com.with_new_columns(mm=col("fof_halo_mass") * 2.0)
    raw = halos.get_data("numpy")
    np.testing.assert_allclose(
        d.get_data("numpy")["mm"],
        raw["fof_halo_mass"].astype(np.float64) / H * 2,
        rtol=1e-6,
    )


def test_lightcone_physical_uses_redshift(spark, fixtures):
    lc = oc.open(f"{fixtures}/lightcone")
    raw = lc.get_data("pandas")
    phys = lc.with_units("physical")
    data = phys.get_data("pandas")
    a = 1.0 / (1.0 + raw["redshift"].to_numpy())
    np.testing.assert_allclose(
        data["fof_halo_mass"],
        raw["fof_halo_mass"].to_numpy().astype(np.float64) / H,
        rtol=1e-6,
    )
    # ra/dec are angles: untouched
    np.testing.assert_allclose(data["ra"], raw["ra"])


def test_scalefree_roundtrip(halos):
    """Scalefree-base data supports the inverse switch (reference
    units/converters.py:57-90 installs add_littleh from the cosmology):
    -> comoving -> scalefree restores values AND littleh powers."""
    raw = halos.get_data("numpy")
    back = halos.with_units("comoving").with_units("scalefree")
    data = back.get_data("numpy")
    np.testing.assert_allclose(
        data["fof_halo_mass"], raw["fof_halo_mass"], rtol=1e-6
    )
    np.testing.assert_allclose(
        data["fof_halo_center_x"], raw["fof_halo_center_x"], rtol=1e-6
    )
    assert str(back.units["fof_halo_mass"]) == "Msun / h"
    assert back.convention == "scalefree"


def test_physical_roundtrip_to_scalefree(halos):
    """physical -> scalefree inverts BOTH steps (per-row scale factor
    and littleh)."""
    raw = halos.get_data("numpy")
    back = halos.with_units("physical").with_units("scalefree")
    data = back.get_data("numpy")
    np.testing.assert_allclose(
        data["fof_halo_center_x"], raw["fof_halo_center_x"], rtol=1e-6
    )
    np.testing.assert_allclose(
        data["fof_halo_com_vx"], raw["fof_halo_com_vx"], rtol=1e-6
    )


def test_lightcone_scalefree_roundtrip(spark, fixtures):
    """Regression: Lightcone._clone must propagate base_convention /
    base_units (as HealpixMap does) — a scalefree-born lightcone
    converted to comoving keeps its recorded littleh powers, so the
    switch back to scalefree stays invertible."""
    lc = oc.open(f"{fixtures}/lightcone")
    assert lc.convention == "scalefree"
    back = lc.with_units("comoving").with_units("scalefree")
    from opencosmo_spark.collection.lightcone import Lightcone

    assert isinstance(back, Lightcone)
    raw = lc.get_data("numpy")
    data = back.get_data("numpy")
    np.testing.assert_allclose(
        data["fof_halo_mass"], raw["fof_halo_mass"], rtol=1e-6
    )
    assert str(back.units["fof_halo_mass"]) == "Msun / h"
    assert back.convention == "scalefree"


def test_scalefree_unreachable_for_comoving_base(spark):
    """Data born comoving has no recorded littleh powers: the inverse
    switch must still raise (scoped error, reference parity)."""
    import pandas as pd

    from opencosmo_spark import Dataset, OpenCosmoHeader
    from opencosmo_spark.header import Cosmology
    from opencosmo_spark.units import parse_unit

    df = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0]}))
    ds = Dataset(
        df,
        header=OpenCosmoHeader(cosmology=Cosmology(H0=67.66)),
        units={"x": parse_unit("Mpc")},
        convention="comoving",
    )
    with pytest.raises(ValueError, match="not invertible"):
        ds.with_units("scalefree")


def test_roundtrip_preserves_column_conversion(halos):
    """A per-column prefix conversion done while comoving survives the
    switch back: kpc stays kpc, the h power re-attaches."""
    conv = halos.with_units("comoving").with_units(
        conversions={"sod_halo_radius": "kpc"}
    )
    back = conv.with_units("scalefree")
    raw = halos.get_data("numpy")
    data = back.get_data("numpy")
    # Mpc/h -> (x/h) Mpc -> (1000x/h) kpc -> x*1000 kpc/h
    np.testing.assert_allclose(
        data["sod_halo_radius"],
        raw["sod_halo_radius"].astype(np.float64) * 1000.0,
        rtol=1e-6,
    )
    assert str(back.units["sod_halo_radius"]) == "kpc / h"


def test_blanket_unit_conversion(halos):
    """Reference dataset.py:1055-1060: a unit-keyed `conversions` entry
    applies to EVERY column carrying that unit in the current
    convention; explicit column conversions take precedence."""
    com = halos.with_units("comoving")
    # all Mpc columns (positions + radius) -> kpc in one blanket
    out = com.with_units(conversions={"Mpc": "kpc"})
    raw = com.get_data("numpy")
    data = out.get_data("numpy")
    for c in ("fof_halo_center_x", "fof_halo_center_y", "sod_halo_radius"):
        assert str(out.units[c]) == "kpc"
        np.testing.assert_allclose(data[c], raw[c] * 1000.0, rtol=1e-6)
    # non-Mpc columns untouched
    np.testing.assert_allclose(data["fof_halo_mass"], raw["fof_halo_mass"])
    assert str(out.units["fof_halo_mass"]) == "Msun"

    # column conversion wins over the blanket for its column
    mixed = com.with_units(
        conversions={"Mpc": "kpc"}, fof_halo_center_x="m"
    )
    md = mixed.get_data("numpy")
    assert str(mixed.units["fof_halo_center_x"]) == "m"
    np.testing.assert_allclose(
        md["fof_halo_center_x"], raw["fof_halo_center_x"] * 3.0856775814913673e22,
        rtol=1e-6,
    )
    assert str(mixed.units["fof_halo_center_y"]) == "kpc"


def test_blanket_conversion_with_convention_switch(halos):
    """Blankets match the POST-convention unit (reference
    units/handler.py:93-114): Mpc matches after scalefree->comoving
    drops the littleh."""
    out = halos.with_units("comoving", conversions={"Mpc": "lyr"})
    assert str(out.units["fof_halo_center_x"]) == "lyr"
    raw = halos.get_data("numpy")
    data = out.get_data("numpy")
    np.testing.assert_allclose(
        data["fof_halo_center_x"],
        raw["fof_halo_center_x"].astype(np.float64) / H * 3.2615637771674333e6,
        rtol=1e-6,
    )
