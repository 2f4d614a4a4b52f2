"""Unit algebra + parser tests (reference test/test_units.py analog —
astropy is unavailable, so expected factors are computed by hand)."""

import pytest
from fractions import Fraction

from opencosmo_spark.units import Quantity, Unit, UnitError, parse_unit


def test_parse_basic():
    u = parse_unit("Msun/h")
    assert u.as_dict() == {"Msun": 1, "h": -1}
    assert parse_unit("km/s").as_dict() == {"km": 1, "s": -1}
    assert parse_unit("(km/s)^2").as_dict() == {"km": 2, "s": -2}
    assert parse_unit("Msun/yr").as_dict() == {"Msun": 1, "yr": -1}
    assert parse_unit("comoving Mpc/h").as_dict() == {"Mpc": 1, "h": -1}
    assert parse_unit("").dimensionless_
    assert parse_unit(None).dimensionless_


def test_parse_dex():
    u = parse_unit("dex(Msun)")
    assert u.is_dex and u.as_dict() == {"Msun": 1}


def test_algebra():
    a, b = parse_unit("Mpc"), parse_unit("Mpc")
    assert (a * b).as_dict() == {"Mpc": 2}
    assert (a / b).dimensionless_
    assert a.pow(2).sqrt() == a


def test_h_and_length_powers():
    u = parse_unit("Msun/h")
    assert u.h_power == -1
    assert u.length_power == 0
    v = parse_unit("Mpc/h")
    assert v.length_power == 1
    w = parse_unit("(km/s)^2")
    assert w.length_power == 2


def test_conversion_factor():
    assert parse_unit("Mpc").conversion_factor(parse_unit("kpc")) == pytest.approx(1000.0)
    assert parse_unit("km/s").conversion_factor(parse_unit("m/s")) == pytest.approx(1000.0)
    # same h-power on both sides converts normally
    assert parse_unit("Mpc/h").conversion_factor(parse_unit("kpc/h")) == pytest.approx(1000.0)
    # differing h-power is a convention switch, not a unit conversion —
    # it needs the cosmology (with_units), so plain unit algebra raises
    with pytest.raises(UnitError):
        parse_unit("Mpc/h").conversion_factor(parse_unit("kpc"))
    with pytest.raises(UnitError):
        parse_unit("Mpc").conversion_factor(parse_unit("Msun"))


def test_physical_to_scalefree_for_scalefree_base(spark, fixtures):
    # scalefree-BASE data supports the inverse switch (reference
    # units/converters.py:57-90); the comoving-base raise is covered in
    # test_conventions.test_scalefree_unreachable_for_comoving_base
    import opencosmo_spark as oc

    ds = oc.open(f"{fixtures}/halo_properties")
    back = ds.with_units("physical").with_units("scalefree")
    assert back.convention == "scalefree"
    assert str(back.units["fof_halo_mass"]) == "Msun / h"


def test_quantity():
    q = Quantity(1.0, "Mpc")
    assert q.to_value(parse_unit("kpc")) == pytest.approx(1000.0)


def test_without_h():
    assert parse_unit("Msun/h").without_h().as_dict() == {"Msun": 1}


def test_str_roundtrip():
    for s in ("Msun / h", "km / s", "Mpc"):
        assert str(parse_unit(s)).replace(" ", "") == s.replace(" ", "")


def test_cosmology_model_dispatch():
    """Model-type dispatch mirrors the reference's astropy class choice
    (reference cosmology.py:62-80) for all six families."""
    from opencosmo_spark import Cosmology

    assert Cosmology().model_type == "FlatLambdaCDM"
    assert Cosmology(Om0=0.3, Ode0=0.6).model_type == "LambdaCDM"
    assert Cosmology(w0=-0.9).model_type == "FlatwCDM"
    assert Cosmology(w0=-0.9, Om0=0.3, Ode0=0.6).model_type == "wCDM"
    assert Cosmology(w0=-0.9, wa=0.1).model_type == "Flatw0waCDM"
    assert (
        Cosmology(w0=-0.9, wa=0.1, Om0=0.3, Ode0=0.6).model_type == "w0waCDM"
    )


def test_cosmology_efunc_and_distance():
    from opencosmo_spark import Cosmology

    flat = Cosmology()
    assert flat.efunc(0.0) == pytest.approx(1.0)
    # LCDM E(1) = sqrt(Om*8 + Ode)
    assert flat.efunc(1.0) == pytest.approx(
        (0.3096 * 8 + (1 - 0.3096)) ** 0.5
    )
    # open model: curvature term present at z=1
    open_ = Cosmology(Om0=0.3, Ode0=0.6)
    assert open_.efunc(1.0) == pytest.approx((0.3 * 8 + 0.1 * 4 + 0.6) ** 0.5)
    # w0=-1, wa=0 reduces to LCDM exactly
    assert Cosmology(w0=-1.0).comoving_distance(0.5) == pytest.approx(
        flat.comoving_distance(0.5)
    )
    # phantom-free w>-1 shrinks distances (DE dilutes with a)
    assert Cosmology(w0=-0.8).comoving_distance(1.0) < flat.comoving_distance(
        1.0
    )
