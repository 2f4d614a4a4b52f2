"""Core Dataset verb tests — reference-style oracle/invariant checks
(test/test_dataset.py, test_filters.py, test_derive.py analogs):
every result is compared against an independent numpy recomputation.
"""

import numpy as np
import pytest

import opencosmo_spark as oc
from opencosmo_spark import col, norm_cols


@pytest.fixture(scope="module")
def halos(spark, fixtures):
    return oc.open(f"{fixtures}/halo_properties")


@pytest.fixture(scope="module")
def halos_np(halos):
    return halos.get_data("numpy")


def test_open_units(halos):
    assert str(halos.units["fof_halo_mass"]) == "Msun / h"
    assert halos.convention == "scalefree"
    assert halos.header.box_size == 64.0


def test_len_and_columns(halos):
    assert len(halos) == 2000
    assert "fof_halo_mass" in halos.columns
    assert not any(c.startswith("__") for c in halos.columns)


def test_filter_minmax(halos, halos_np):
    out = halos.filter(col("fof_halo_mass") > 1e13).get_data("numpy")
    expected = np.sum(halos_np["fof_halo_mass"] > 1e13)
    assert len(out["fof_halo_mass"]) == expected
    assert out["fof_halo_mass"].min() > 1e13


def test_filter_compound(halos, halos_np):
    m, s = halos_np["fof_halo_mass"], halos_np["sod_halo_mass"]
    expected = np.sum((m > 1e13) & (s > 0) | (m < 1e12))
    out = halos.filter(
        ((col("fof_halo_mass") > 1e13) & (col("sod_halo_mass") > 0))
        | (col("fof_halo_mass") < 1e12)
    )
    assert len(out) == expected


def test_select_wildcard(halos):
    out = halos.select("fof_halo_center_*")
    assert sorted(out.columns) == [
        "fof_halo_center_a",
        "fof_halo_center_x",
        "fof_halo_center_y",
        "fof_halo_center_z",
    ]


def test_sorted_take_equals_np_sort(halos, halos_np):
    top = (
        halos.sort_by("fof_halo_mass", invert=True)
        .take(50)
        .get_data("numpy")["fof_halo_mass"]
    )
    expected = np.sort(halos_np["fof_halo_mass"])[::-1][:50]
    np.testing.assert_allclose(np.sort(top)[::-1], expected, rtol=0)


def test_take_range(halos, halos_np):
    rng = (
        halos.sort_by("fof_halo_mass")
        .take_range(10, 40)
        .get_data("numpy")["fof_halo_mass"]
    )
    expected = np.sort(halos_np["fof_halo_mass"])[10:40]
    np.testing.assert_allclose(np.sort(rng), expected, rtol=0)


def test_take_rows(halos, halos_np):
    rows = [0, 5, 17, 100]
    out = (
        halos.sort_by("unique_tag").take_rows(rows).get_data("numpy")["unique_tag"]
    )
    expected = np.sort(halos_np["unique_tag"])[rows]
    assert sorted(out) == sorted(expected)


def test_take_random_exact_n(halos):
    out = halos.take(100, at="random", seed=11)
    assert len(out) == 100
    # sampling without replacement: tags unique
    tags = out.get_data("numpy")["fof_halo_tag"]
    assert len(np.unique(tags)) == 100


def test_derived_column_and_sort(halos, halos_np):
    ds = halos.with_new_columns(
        v2=col("fof_halo_com_vx") ** 2 + col("fof_halo_com_vy") ** 2
    )
    out = ds.sort_by("v2", invert=True).take(10).get_data("numpy")
    expected = np.sort(
        halos_np["fof_halo_com_vx"].astype(np.float64) ** 2
        + halos_np["fof_halo_com_vy"].astype(np.float64) ** 2
    )[::-1][:10]
    np.testing.assert_allclose(np.sort(out["v2"])[::-1], expected, rtol=1e-6)


def test_derived_units(halos):
    ds = halos.with_new_columns(
        xoff=norm_cols("fof_halo_com_vx", "fof_halo_com_vy", "fof_halo_com_vz")
    )
    assert str(ds.units["xoff"]) == "km / s"
    ds2 = halos.with_new_columns(
        m2=col("fof_halo_mass") * col("fof_halo_mass")
    )
    assert ds2.units["m2"].as_dict() == {"Msun": 2, "h": -2}


def test_add_requires_compatible_units(halos):
    from opencosmo_spark.units import UnitError

    with pytest.raises(UnitError):
        halos.with_new_columns(
            bad=col("fof_halo_mass") + col("fof_halo_center_x")
        ).get_data()


def test_zscore_scalar_reductions(halos, halos_np):
    ds = halos.select(
        "fof_halo_tag",
        z=(col("fof_halo_mass") - col("fof_halo_mass").mean())
        / col("fof_halo_mass").std(),
    )
    z = ds.get_data("numpy")["z"]
    assert abs(z.mean()) < 1e-9
    assert abs(z.std() - 1.0) < 1e-9


def test_scalar_in_filter(halos, halos_np):
    m = halos_np["fof_halo_mass"].astype(np.float64)
    expected = np.sum(m > m.mean())
    out = halos.filter(col("fof_halo_mass") > col("fof_halo_mass").mean())
    assert len(out) == expected


def test_quantile_reduction(halos, halos_np):
    m = halos_np["fof_halo_mass"].astype(np.float64)
    q90 = np.quantile(m, 0.9)
    scalars = halos.select(q=col("fof_halo_mass").quantile(0.9))
    assert scalars["q"] == pytest.approx(q90, rel=1e-6)


def test_scalar_only_select(halos, halos_np):
    out = halos.select(
        mean=col("fof_halo_mass").mean(), mx=col("fof_halo_mass").max()
    )
    assert out["mean"] == pytest.approx(
        halos_np["fof_halo_mass"].astype(np.float64).mean(), rel=1e-9
    )
    assert out["mx"] == pytest.approx(halos_np["fof_halo_mass"].max())


def test_unit_aware_filter_quantity(halos, halos_np):
    from opencosmo_spark import Quantity

    # radius column is Mpc/h: thresholds must carry the same h-power
    n_mpc = len(halos.filter(col("sod_halo_radius") > Quantity(1.0, "Mpc/h")))
    n_kpc = len(halos.filter(col("sod_halo_radius") > Quantity(1000.0, "kpc/h")))
    assert n_mpc == n_kpc > 0

    # a plain-Mpc threshold against an Mpc/h column is a convention
    # mix — unit algebra must refuse (needs the cosmology)
    from opencosmo_spark.units import UnitError

    with pytest.raises(UnitError):
        len(halos.filter(col("sod_halo_radius") > Quantity(1.0, "Mpc")))


def test_repr(halos):
    r = repr(halos)
    assert "OpenCosmo Dataset" in r and "First 10 rows" in r


def test_rows_iterator(halos):
    it = halos.rows()
    row = next(it)
    assert "fof_halo_mass" in row


def test_drop_inverse_of_select(halos):
    d = halos.drop("fof_halo_mass")
    assert "fof_halo_mass" not in d.columns
    assert set(d.columns) == set(halos.columns) - {"fof_halo_mass"}


def test_stock_columns_vs_numpy(halos, halos_np):
    import numpy as np

    from opencosmo_spark import add_mag_cols, col, norm_cols, offset_3d

    d = halos.select(
        "fof_halo_tag",
        speed=norm_cols("vx", "vy", "vz") if "vx" in halos.columns else norm_cols(
            "fof_halo_center_x", "fof_halo_center_y", "fof_halo_center_z"
        ),
        off=offset_3d(
            ("fof_halo_center_x", "fof_halo_center_y", "fof_halo_center_z"),
            ("sod_halo_com_x", "sod_halo_com_y", "sod_halo_com_z"),
        )
        if "sod_halo_com_x" in halos.columns
        else col("fof_halo_center_x") * 0,
    ).get_data("pandas").set_index("fof_halo_tag").sort_index()
    n = halos_np
    ref = np.sqrt(
        n["fof_halo_center_x"] ** 2
        + n["fof_halo_center_y"] ** 2
        + n["fof_halo_center_z"] ** 2
    )
    order = np.argsort(n["fof_halo_tag"])
    # fixture columns are float32; spark computes in double
    np.testing.assert_allclose(d.speed.to_numpy(), ref[order], rtol=1e-5)


def test_trig_functions_vs_numpy(halos, halos_np):
    import numpy as np

    from opencosmo_spark import col

    # build a dimensionless column in [-1, 1] for arcsin
    d = halos.select(
        "fof_halo_tag",
        s=(col("fof_halo_mass") / col("fof_halo_mass").max()).arcsin(),
    ).get_data("pandas").set_index("fof_halo_tag").sort_index()
    n = halos_np
    order = np.argsort(n["fof_halo_tag"])
    m = n["fof_halo_mass"][order]
    np.testing.assert_allclose(
        d.s.to_numpy(), np.arcsin(m.astype(np.float64) / m.max()), rtol=1e-5
    )


def test_literal_array_columns(halos):
    """numpy arrays / Quantity arrays attach as columns aligned to the
    current row order (reference test_im_col.py add_column analog),
    then compose with filter/take."""
    import numpy as np

    from opencosmo_spark import Quantity

    n = len(halos)
    arr = np.arange(n, dtype=np.int64) * 2
    q = Quantity(np.linspace(0.0, 1.0, n), "km/s")
    ds = halos.with_new_columns(idx2=arr, speed=q)
    assert str(ds.units["speed"]) == "km / s"
    pdf = ds.sort_by("fof_halo_tag").get_data("pandas")
    base = halos.sort_by("fof_halo_tag").get_data("pandas")

    # alignment: row k of the canonical (__row_id) order got arr[k]
    canon = halos.get_data("pandas")  # canonical order
    tag_to_pos = {t: i for i, t in enumerate(canon.fof_halo_tag)}
    expect = [arr[tag_to_pos[t]] for t in base.fof_halo_tag]
    assert list(pdf.idx2) == expect

    # composes with filter + take
    f = ds.filter(oc.col("idx2") < 100).get_data("pandas")
    assert (f.idx2 < 100).all() and len(f) == 50

    # wrong length raises
    with pytest.raises(ValueError):
        halos.with_new_columns(bad=np.arange(3))


def test_literal_array_compositions(halos):
    """The reference's test_im_col composition matrix: derive FROM an
    added array column, unit-aware filter on it, take after add, and
    select/drop interplay (reference test/test_im_col.py:47-120)."""
    import numpy as np

    from opencosmo_spark import Quantity

    n = len(halos)
    q = Quantity(np.linspace(1.0, 2.0, n), "Mpc")
    ds = halos.with_new_columns(dist=q)

    # derive from the added column: units propagate through arithmetic
    d2 = ds.with_new_columns(dist_kpc=oc.col("dist") * 1000.0)
    assert str(d2.units["dist_kpc"]) == "Mpc"  # scalar doesn't change unit
    pdf = d2.get_data("pandas")
    np.testing.assert_allclose(pdf.dist_kpc, pdf.dist * 1000.0)

    # unit-aware filter with a Quantity RHS on the added column
    f = ds.filter(oc.col("dist") > Quantity(1500.0, "kpc"))
    fp = f.get_data("pandas")
    assert (fp.dist > 1.5).all() and 0 < len(fp) < n

    # take after add keeps alignment (canonical __row_id order)
    canon = ds.get_data("pandas")
    t = ds.take(7, at="start").get_data("pandas")
    np.testing.assert_allclose(t.dist, canon.dist.iloc[:7])

    # select keeps the added column; drop removes it
    assert "dist" in ds.select("fof_halo_tag", "dist").columns
    assert "dist" not in ds.drop("dist").columns


def test_take_too_many_returns_all(halos):
    """Reference test_take.py::test_take_too_many / _end_too_many:
    asking for more rows than exist returns the whole dataset, not an
    error — both ends."""
    n = len(halos)
    assert len(halos.take(n + 1)) == n
    assert len(halos.take(n + 1, at="end")) == n


def test_filter_scalar_uses_current_selection(halos, halos_np):
    """Reference test_filters.py::test_filter_scalar_uses_current_selection:
    a scalar reduction chained after a filter reduces over the
    already-filtered rows, not the full dataset."""
    m = halos_np["fof_halo_mass"].astype(np.float64)
    cut = np.median(m)
    pref = halos.filter(col("fof_halo_mass") > cut)
    pref_mean = m[m > cut].mean()
    full_mean = m.mean()
    assert not np.isclose(pref_mean, full_mean)

    above = pref.filter(col("fof_halo_mass") > col("fof_halo_mass").mean())
    vals = above.get_data("numpy")["fof_halo_mass"].astype(np.float64)
    assert len(vals) == np.sum(m[m > cut] > pref_mean)
    assert np.all(vals > pref_mean)


def test_invalid_column_raises(halos):
    """Reference test_filters/test_select invalid-column tests: using a
    nonexistent column fails loudly at materialization or before."""
    import pytest as _pytest
    from pyspark.errors import AnalysisException

    with _pytest.raises((AnalysisException, KeyError, ValueError)):
        halos.filter(col("definitely_not_a_column") > 1).get_data()
    with _pytest.raises((AnalysisException, KeyError, ValueError)):
        halos.select("also_not_a_column").get_data()


def test_gas_fields_vs_numpy(spark):
    """Reference analysis/yt_utils.py:272-310 (_mmw/_temperature/
    _number_density/_emission_measure/_h_fraction as yt derived
    fields): the same fully-ionized-gas formulas as engine-side
    column expressions, checked against a verbatim numpy twin."""
    import numpy as np
    import pandas as pd

    from opencosmo_spark import (
        Dataset,
        gas_emission_measure,
        gas_mmw,
        gas_number_density,
        gas_temperature,
        h_fraction,
    )
    from opencosmo_spark.column.stock import (
        BOLTZMANN_ERG_PER_K,
        PROTON_MASS_G,
        SOLAR_METALLICITY,
    )

    rng = np.random.default_rng(7)
    n = 500
    pdf = pd.DataFrame(
        {
            "pid": np.arange(n, dtype=np.int64),
            "yhe": rng.uniform(0.22, 0.30, n),
            "zmet": rng.uniform(0.0, 2.0, n),
            # specific internal energy in (km/s)^2 (HACC convention)
            "uu": rng.uniform(1e3, 1e6, n),
            "rho": 10 ** rng.uniform(-28, -24, n),  # g/cm^3
            "mass": 10 ** rng.uniform(38, 41, n),  # g
        }
    )
    ds = Dataset(spark.createDataFrame(pdf))
    out = (
        ds.select(
            "pid",
            mu=gas_mmw("yhe", "zmet"),
            xh=h_fraction("yhe"),
            temp=gas_temperature("uu", "yhe", "zmet", uu_to_cgs=1e10),
            nd=gas_number_density("rho", "yhe", "zmet"),
            em=gas_emission_measure("rho", "mass", "yhe"),
        )
        .get_data("pandas")
        .set_index("pid")
        .sort_index()
    )

    # verbatim numpy twin of the reference formulas
    Y = pdf["yhe"].to_numpy()
    X = 1 - Y
    Z = pdf["zmet"].to_numpy() * SOLAR_METALLICITY
    mu = 1 / (2 * X + 0.75 * Y + Z / (2 * 16))
    u_cgs = pdf["uu"].to_numpy() * 1e10
    temp = mu * PROTON_MASS_G * u_cgs / BOLTZMANN_ERG_PER_K * (5 / 3 - 1)
    nd = pdf["rho"].to_numpy() / (mu * PROTON_MASS_G)
    ne = (1 - 0.5 * Y) * pdf["rho"].to_numpy() / PROTON_MASS_G
    nH = (1 - Y) * pdf["rho"].to_numpy() / PROTON_MASS_G
    em = ne * nH * (pdf["mass"].to_numpy() / pdf["rho"].to_numpy())

    np.testing.assert_allclose(out.mu.to_numpy(), mu, rtol=1e-12)
    np.testing.assert_allclose(out.xh.to_numpy(), X, rtol=1e-12)
    np.testing.assert_allclose(out.temp.to_numpy(), temp, rtol=1e-12)
    np.testing.assert_allclose(out.nd.to_numpy(), nd, rtol=1e-12)
    np.testing.assert_allclose(out.em.to_numpy(), em, rtol=1e-10)
    # physical sanity: ICM-scale temperatures land in the keV band
    assert (out.temp > 1e4).all() and (out.temp < 1e9).all()
