"""Lightcone: per-redshift-step catalogs presented as one dataset.

Parity target: reference
``python/opencosmo/collection/lightcone/lightcone.py:75``. The
reference keeps a dict of per-step Datasets and vstacks on access
(lightcone.py:401-408); here a lightcone IS one step-partitioned
DataFrame — union is free, and ``with_redshift_range`` /
``with_steps`` become partition-pruned filters (write layout
``partitionBy(step)`` turns them into directory pruning).
"""

from __future__ import annotations

from .._litarr import lit_double_array
from pyspark.sql import functions as F

from ..dataset import Dataset
from ..spatial.bound import PIXEL_COL
from ..spatial.region import ConeRegion, HealpixRegion, SkyboxRegion


class Lightcone(Dataset):
    """A Dataset with a ``step`` column and redshift semantics."""

    STEP_COL = "step"
    Z_COL = "redshift"

    @staticmethod
    def from_steps(steps: dict[int, Dataset]) -> "Lightcone":
        """Build from per-step datasets (reference open of multi-step
        files) — schema-strict union (join_type='exact')."""
        dfs = []
        first = None
        for step, ds in sorted(steps.items()):
            first = first or ds
            df = ds.spark_df
            if Lightcone.STEP_COL not in df.columns:
                df = df.withColumn(Lightcone.STEP_COL, F.lit(int(step)))
            dfs.append(df)
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return Lightcone(
            out,
            header=first._header.with_(data_type="lightcone"),
            units=first._units,
            descriptions=first._descriptions,
            convention=first._convention,
            base_convention=first._base_convention,
            base_units=first._base_units,
        )

    def _clone(self, df=None, **kw) -> "Lightcone":
        base = super()._clone(df, **kw)
        lc = Lightcone(
            base._df,
            header=base._header,
            units=base._units,
            descriptions=base._descriptions,
            sort_keys=base._sort_keys,
            region=base._region,
            convention=base._convention,
            base_convention=base._base_convention,
            base_units=base._base_units,
        )
        return lc

    @property
    def steps(self) -> list[int]:
        rows = self._df.select(self.STEP_COL).distinct().collect()
        return sorted(r[0] for r in rows)

    @property
    def z_range(self) -> tuple[float, float]:
        row = self._df.agg(
            F.min(self.Z_COL).alias("lo"), F.max(self.Z_COL).alias("hi")
        ).collect()[0]
        return (row["lo"], row["hi"])

    def with_redshift_range(self, z_low: float, z_high: float) -> "Lightcone":
        """Restrict to a redshift range (reference lightcone.py:516-548)
        — step-level partition pruning happens automatically when the
        data is written partitioned by step."""
        return self._clone(
            self._df.filter(
                (F.col(self.Z_COL) >= F.lit(z_low))
                & (F.col(self.Z_COL) < F.lit(z_high))
            )
        )

    def with_steps(self, steps: list[int]) -> "Lightcone":
        return self._clone(self._df.filter(F.col(self.STEP_COL).isin(list(steps))))

    # -- sky queries ---------------------------------------------------
    def cone_search(self, ra: float, dec: float, radius: float) -> "Lightcone":
        return self.bound(ConeRegion(float(ra), float(dec), float(radius)))

    def box_search(self, p1, p2) -> "Lightcone":
        from ..spatial.region import make_skybox

        return self.bound(make_skybox(p1, p2))

    def bound(self, region, select_by=None) -> "Lightcone":
        """Two-phase sky restrict: interior pixels skip the exact test,
        boundary pixels get it (reference dataset.py:340-431 shape)."""
        if (
            isinstance(region, (ConeRegion, SkyboxRegion))
            and PIXEL_COL in self._df.columns
        ):
            from ..spatial.bound import exact_predicate, find_coords
            from ..spatial.healpix import query_region

            nside = int(self._header.extra.get("nside", 64))
            interior, boundary = query_region(nside, region)
            coords = find_coords(self.columns, 2, select_by)
            exact = exact_predicate(region, coords)
            cell = F.col(PIXEL_COL)
            pred = None
            if interior:
                pred = cell.isin(interior)
            if boundary:
                b = cell.isin(boundary) & exact
                pred = b if pred is None else (pred | b)
            if pred is None:
                pred = F.lit(False)
            return self._clone(self._df.filter(pred), region=region)
        if isinstance(region, HealpixRegion):
            from ..spatial.bound import bound_dataset

            return bound_dataset(self, region, select_by)
        from ..spatial.bound import exact_predicate, find_coords

        coords = find_coords(self.columns, 2, select_by)
        return self._clone(
            self._df.filter(exact_predicate(region, coords)), region=region
        )

    def get_pixels(self, nside: int | None = None) -> list[int]:
        """Distinct HEALPix pixels occupied by the data
        (reference lightcone.py:317-349)."""
        base_nside = int(self._header.extra.get("nside", 64))
        nside = nside or base_nside
        col = F.col(PIXEL_COL)
        if nside != base_nside:
            if nside > base_nside:
                raise ValueError("can only degrade to coarser nside")
            ratio = (base_nside // nside) ** 2
            col = F.floor(col / F.lit(ratio)).cast("long")
        rows = self._df.select(col.alias("p")).distinct().collect()
        return sorted(r["p"] for r in rows)

    def pixel_search(self, pixels: list[int], nside: int | None = None) -> "Lightcone":
        """Restrict to a pixel list (reference lightcone.py:715-766)."""
        base_nside = int(self._header.extra.get("nside", 64))
        nside = nside or base_nside
        col = F.col(PIXEL_COL)
        if nside != base_nside:
            ratio = (base_nside // nside) ** 2
            col = F.floor(col / F.lit(ratio)).cast("long")
        return self._clone(self._df.filter(col.isin(list(pixels))))


def lightcone_to_cartesian(
    df,
    cosmology,
    ra_col: str = "ra",
    dec_col: str = "dec",
    z_col: str = "redshift",
    out_cols: tuple[str, str, str] = ("x", "y", "z"),
    dist_col: str = "comoving_distance",
    z_max: float | None = None,
    n_knots: int = 2048,
    h_units: bool = True,
):
    """Convert observed lightcone coordinates (ra, dec, redshift) to
    comoving Cartesian positions — the bridge that lets every 3-D
    statistic in the engine (pair counts, FoF, P(k), profiles) run on
    a lightcone catalog.

    The cosmology-dependent part, D_C(z) = c/H0 ∫ dz'/E(z'), is
    integrated ONCE on the driver over an ``n_knots`` uniform grid
    (the same trapezoid kernel as ``Cosmology.comoving_distance``, so
    the column agrees with the scalar API at the knots); the per-row
    lookup is piecewise-linear interpolation against the literal knot
    array — ``element_at`` + one multiply, pure JVM, scan-fused, no
    shuffle, no Python in the hot path. Interpolation error is
    O((z_max/n_knots)^2) on a smooth integrand — ~1e-7 relative at
    the defaults — far below any survey redshift precision.

    ``z_max`` bounds the grid (one max() aggregation when omitted);
    rows beyond it raise at runtime rather than extrapolating.
    ``h_units=True`` returns Mpc/h (the simulation convention, so the
    output feeds box-side statistics directly); False gives Mpc.
    """
    if n_knots < 8:
        raise ValueError("n_knots must be >= 8")
    if z_max is None:
        row = df.agg(F.max(F.col(z_col).cast("double"))).collect()[0]
        z_max = float(row[0] or 0.0)
    if z_max <= 0:
        raise ValueError(f"z_max must be positive (got {z_max})")
    z_max *= 1.0 + 1e-9  # the max row itself stays in-grid
    dz = z_max / (n_knots - 1)
    scale = cosmology.h if h_units else 1.0
    knots = [
        cosmology.comoving_distance(i * dz) * scale
        for i in range(n_knots)
    ]
    arr = lit_double_array(knots)
    zc = F.col(z_col).cast("double")
    guard = F.when(
        (zc < 0) | (zc > z_max),
        F.raise_error(
            F.concat(
                F.lit(
                    f"lightcone_to_cartesian: redshift outside "
                    f"[0, {z_max:.6g}]: "
                ),
                zc.cast("string"),
            )
        ),
    ).otherwise(zc)
    idx = F.least(
        F.floor(guard / F.lit(dz)).cast("int"), F.lit(n_knots - 2)
    )
    d0 = F.element_at(arr, idx + 1)
    d1 = F.element_at(arr, idx + 2)
    frac = guard / F.lit(dz) - idx.cast("double")
    dist = d0 + (d1 - d0) * frac
    ra_r = F.radians(F.col(ra_col).cast("double"))
    dec_r = F.radians(F.col(dec_col).cast("double"))
    out = df.withColumn(dist_col, dist)
    dc = F.col(dist_col)
    return (
        out.withColumn(out_cols[0], dc * F.cos(dec_r) * F.cos(ra_r))
        .withColumn(out_cols[1], dc * F.cos(dec_r) * F.sin(ra_r))
        .withColumn(out_cols[2], dc * F.sin(dec_r))
    )
