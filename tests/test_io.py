"""IO round-trip tests (reference test_write.py / test_parquet.py
analogs): transform -> write -> reopen -> equality, metadata survival.
"""

import numpy as np
import pandas as pd
import pytest

import opencosmo_spark as oc
from opencosmo_spark import col


@pytest.fixture(scope="module")
def halos(spark, fixtures):
    return oc.open(f"{fixtures}/halo_properties")


def test_roundtrip_preserves_data_and_metadata(halos, tmp_path):
    f = halos.filter(col("fof_halo_mass") > 1e13).with_new_columns(
        logm=col("fof_halo_mass").log10()
    )
    path = str(tmp_path / "halos_out")
    oc.write(path, f)
    re = oc.open(path)
    assert len(re) == len(f)
    assert str(re.units["fof_halo_mass"]) == "Msun / h"
    assert str(re.units["logm"]) == "dex(Msun / h)"
    assert re.header.box_size == 64.0
    a = f.get_data("pandas").sort_values("fof_halo_tag").reset_index(drop=True)
    b = re.get_data("pandas").sort_values("fof_halo_tag").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_like=True)


def test_roundtrip_preserves_convention(halos, tmp_path):
    com = halos.with_units("comoving")
    path = str(tmp_path / "halos_com")
    oc.write(path, com)
    re = oc.open(path)
    assert re.convention == "comoving"
    # clustered write reorders rows (range-partition on the spatial
    # cell); compare as keyed sets, the engine's actual contract
    a = re.sort_by("fof_halo_tag").get_data("numpy")
    b = com.sort_by("fof_halo_tag").get_data("numpy")
    np.testing.assert_array_equal(a["fof_halo_tag"], b["fof_halo_tag"])
    np.testing.assert_allclose(a["fof_halo_mass"], b["fof_halo_mass"])


def test_overwrite_flag(halos, tmp_path):
    path = str(tmp_path / "dup")
    oc.write(path, halos.take(10))
    with pytest.raises(FileExistsError):
        oc.write(path, halos.take(10))
    oc.write(path, halos.take(20), overwrite=True)
    assert len(oc.open(path)) == 20


def test_open_bare_parquet(spark):
    ds = oc.open("/root/testdata/sf0.001/nation.parquet")
    assert len(ds) == 25
    assert ds.units["n_name"].dimensionless_


def test_spatial_index_survives_roundtrip(halos, tmp_path):
    from opencosmo_spark import make_box

    path = str(tmp_path / "spatial")
    oc.write(path, halos)
    re = oc.open(path)
    region = make_box((10, 10, 10), (30, 30, 30))
    assert len(re.bound(region)) == len(halos.bound(region))


def test_formats(halos):
    ds = halos.take(5)
    pdf = ds.get_data("pandas")
    assert len(pdf) == 5
    arr = ds.get_data("numpy")
    assert isinstance(arr, dict) and len(arr["fof_halo_tag"]) == 5
    tbl = ds.get_data("arrow")
    assert tbl.num_rows == 5
    rows = ds.get_data("list")
    assert isinstance(rows[0], dict)


def test_open_csv_json_dispatch(spark, tmp_path):
    """Extension dispatch: .csv and .jsonl open as plain Datasets."""
    import json as _json

    import pandas as pd

    import opencosmo_spark as oc

    csv = tmp_path / "t.csv"
    pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]}).to_csv(csv, index=False)
    ds = oc.open(str(csv))
    assert sorted(ds.columns) == ["x", "y"] and len(ds) == 3

    jl = tmp_path / "t.jsonl"
    with open(jl, "w") as f:
        for i in range(4):
            f.write(_json.dumps({"k": i, "v": f"s{i}"}) + "\n")
    ds2 = oc.open(str(jl))
    assert sorted(ds2.columns) == ["k", "v"] and len(ds2) == 4
