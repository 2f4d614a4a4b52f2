"""Spatial tests (reference test/spatial/test_2d.py, test_3d.py
analogs): bound() results must equal the brute-force exact predicate —
the two-phase cell optimization must be semantically invisible.
"""

import numpy as np
import pytest

import opencosmo_spark as oc
from opencosmo_spark import make_box, make_cone, make_skybox


@pytest.fixture(scope="module")
def halos(spark, fixtures):
    return oc.open(f"{fixtures}/halo_properties")


@pytest.fixture(scope="module")
def lc(spark, fixtures):
    return oc.open(f"{fixtures}/lightcone")


def test_box_bound_equals_brute(halos):
    data = halos.get_data("numpy")
    region = make_box((10.0, 5.0, 20.0), (35.0, 50.0, 44.0))
    x, y, z = (
        data["fof_halo_center_x"],
        data["fof_halo_center_y"],
        data["fof_halo_center_z"],
    )
    expected = np.sum(
        (x >= 10) & (x < 35) & (y >= 5) & (y < 50) & (z >= 20) & (z < 44)
    )
    out = halos.bound(region)
    assert len(out) == expected
    assert out.region == region


def test_box_bound_small_region(halos):
    data = halos.get_data("numpy")
    region = make_box((30.0, 30.0, 30.0), (31.5, 31.5, 31.5))
    x, y, z = (
        data["fof_halo_center_x"],
        data["fof_halo_center_y"],
        data["fof_halo_center_z"],
    )
    expected = np.sum(
        (x >= 30) & (x < 31.5) & (y >= 30) & (y < 31.5) & (z >= 30) & (z < 31.5)
    )
    assert len(halos.bound(region)) == expected


def test_bound_nonoverlap(halos):
    region = make_box((100.0, 100.0, 100.0), (101.0, 101.0, 101.0))
    assert len(halos.bound(region)) == 0


def test_box_search_sugar(halos):
    a = halos.box_search((0, 0, 0), (32, 32, 32))
    b = halos.bound(make_box((0, 0, 0), (32, 32, 32)))
    assert len(a) == len(b)


def test_cone_search_equals_brute(lc):
    data = lc.get_data("pandas")
    region = make_cone((180.0, 20.0), 15.0)
    inside = np.array(
        [region.contains_point(r, d) for r, d in zip(data["ra"], data["dec"])]
    )
    out = lc.cone_search(180.0, 20.0, 15.0)
    assert len(out) == int(inside.sum())


def test_skybox_equals_brute(lc):
    data = lc.get_data("pandas")
    region = make_skybox((40.0, -10.0), (80.0, 25.0))
    inside = np.array(
        [region.contains_point(r, d) for r, d in zip(data["ra"], data["dec"])]
    )
    out = lc.bound(region)
    assert len(out) == int(inside.sum())


def test_region_algebra():
    big = make_box((0, 0, 0), (10, 10, 10))
    small = make_box((2, 2, 2), (4, 4, 4))
    assert big.contains(small) and not small.contains(big)
    assert big.intersects(small)
    apart = make_box((20, 20, 20), (30, 30, 30))
    assert not big.intersects(apart)

    c1 = make_cone((100, 0), 10)
    c2 = make_cone((105, 0), 3)
    assert c1.contains(c2)
    assert c1.intersects(make_cone((115, 0), 6))
    assert not c1.intersects(make_cone((140, 0), 5))


def test_lightcone_pixel_search(lc):
    pix = lc.get_pixels()
    sub = pix[:10]
    out = lc.pixel_search(sub)
    meta = out.get_metadata(["pixel_cell"])["pixel_cell"]
    assert set(np.unique(meta)).issubset(set(sub))
    assert len(out) > 0
