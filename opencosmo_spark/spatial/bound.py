"""Compile a Region into the two-phase Spark predicate for
``Dataset.bound``.

Parity target: reference ``python/opencosmo/dataset/dataset.py:340-431``
— (1) tree query yields fully-contained cells (rows skip the exact
geometric test) and intersecting boundary cells (rows get the exact
test); (2) final selection = interior ∪ (boundary ∧ exact).

Spark realization: the cell walk happens on the driver
(``octree.region_to_cells``); the result is ONE predicate
``cell IN interior OR (cell IN boundary AND exact(x,y,z))``. With data
z-order-clustered on the cell column, Parquet row-group min/max stats
prune interior/boundary misses — the same chunk-skip the reference gets
from its tree, with no custom execution path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .octree import region_to_cells
from .region import (
    BoxRegion,
    ConeRegion,
    FullSkyRegion,
    HealpixRegion,
    SkyboxRegion,
)

CELL_COL = "__cell_id"
PIXEL_COL = "pixel_cell"

# reference spatial/check.py:53-83 — coordinate-column discovery
COORD_CANDIDATES_3D = [
    ("x", "y", "z"),
    ("fof_halo_center_x", "fof_halo_center_y", "fof_halo_center_z"),
    ("fof_halo_com_x", "fof_halo_com_y", "fof_halo_com_z"),
    ("sod_halo_com_x", "sod_halo_com_y", "sod_halo_com_z"),
    ("gal_center_x", "gal_center_y", "gal_center_z"),
]
COORD_CANDIDATES_2D = [("ra", "dec")]


def find_coords(columns: list[str], dims: int, select_by=None):
    if select_by is not None:
        return tuple(select_by)
    cands = COORD_CANDIDATES_3D if dims == 3 else COORD_CANDIDATES_2D
    cols = set(columns)
    for cand in cands:
        if all(c in cols for c in cand):
            return cand
    raise ValueError(
        f"no {dims}-D coordinate columns found; pass select_by=(...)"
    )


def exact_predicate(region, coords):
    """The fine-phase geometric test as a Spark Column."""
    if isinstance(region, BoxRegion):
        x, y, z = (F.col(c) for c in coords)
        p = None
        for c, lo, hi in zip((x, y, z), region.p1, region.p2):
            leg = (c >= F.lit(lo)) & (c < F.lit(hi))
            p = leg if p is None else (p & leg)
        return p
    if isinstance(region, ConeRegion):
        ra, dec = (F.radians(F.col(c)) for c in coords)
        ra0, dec0 = F.radians(F.lit(region.ra)), F.radians(F.lit(region.dec))
        import math

        cosr = F.lit(math.cos(math.radians(region.radius)))
        cos_sep = (
            F.sin(dec) * F.sin(dec0)
            + F.cos(dec) * F.cos(dec0) * F.cos(ra - ra0)
        )
        return cos_sep >= cosr
    if isinstance(region, SkyboxRegion):
        ra, dec = F.pmod(F.col(coords[0]), F.lit(360.0)), F.col(coords[1])
        decp = (dec >= F.lit(region.dec_min)) & (dec <= F.lit(region.dec_max))
        if region.wraps:
            rap = (ra >= F.lit(region.ra_min)) | (ra <= F.lit(region.ra_max))
        else:
            rap = (ra >= F.lit(region.ra_min)) & (ra <= F.lit(region.ra_max))
        return decp & rap
    if isinstance(region, FullSkyRegion):
        return F.lit(True)
    raise TypeError(f"unsupported region {type(region).__name__}")


def bound_dataset(ds, region, select_by=None):
    from ..dataset import Dataset  # noqa: PLC0415

    df = ds.spark_df
    header = ds.header

    if isinstance(region, HealpixRegion):
        if PIXEL_COL not in df.columns:
            from .healpix import ang2pix_expr

            coords = find_coords(ds.columns, 2, select_by)
            pix = ang2pix_expr(region.nside, F.col(coords[0]), F.col(coords[1]))
            out = df.filter(pix.isin(list(region.pixels)))
        else:
            out = df.filter(F.col(PIXEL_COL).isin(list(region.pixels)))
        return ds._clone(out, region=region)

    dims = 3 if isinstance(region, BoxRegion) else 2
    coords = find_coords(ds.columns, dims, select_by)
    exact = exact_predicate(region, coords)

    # Two-phase pruning via the ingest-time cell column. The exact
    # predicate already implies cell ∈ interior ∪ boundary (the cell walk
    # covers the region), so the INSET's only value is Parquet row-group /
    # partition pruning — worth evaluating ONLY when the cell column is
    # materialized in storage (sidecar-opened data). For a derived cell
    # expression the INSET would inline the whole morton chain per probe
    # and cost far more than the 6-comparison exact test it implies.
    if (
        dims == 3
        and CELL_COL in df.columns
        and header.box_size
        and header.extra.get("cell_materialized")
    ):
        level = int(header.extra.get("tree_level", 4))
        interior, boundary = region_to_cells(
            region, [0.0, 0.0, 0.0], float(header.box_size), level, dims=3
        )
        if not (interior or boundary):
            return ds._clone(df.filter(F.lit(False)), region=region)
        # interior ∪ (boundary ∧ exact) ≡ (cell ∈ interior∪boundary) ∧ exact
        # for a precise exact predicate: one INSET probe instead of two,
        # same rows, same row-group pruning on the clustered cell column.
        pred = F.col(CELL_COL).isin(interior + boundary) & exact
        return ds._clone(df.filter(pred), region=region)

    # no spatial index: exact predicate only (still pushed to Parquet
    # row groups when data is clustered on the coordinate columns)
    return ds._clone(df.filter(exact), region=region)
