"""HealpixMap: one row per HEALPix pixel, value columns per row.

Parity target: reference
``python/opencosmo/collection/lightcone/healpix_map.py:93``. Degrade
(``with_resolution``, reference :426-508) is a textbook hash
aggregate: nested-scheme pixels at nside have their parent at
``pixel // 4^k`` — groupBy + avg over every value column.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..dataset import Dataset
from ..spatial.region import ConeRegion, HealpixRegion, SkyboxRegion

PIX = "pixel"


class HealpixMap(Dataset):
    def __init__(self, df, nside: int, **kw):
        super().__init__(df, **kw)
        if PIX not in df.columns:
            raise ValueError("HealpixMap requires a 'pixel' column")
        self._nside = int(nside)

    @property
    def nside(self) -> int:
        return self._nside

    @property
    def npix(self) -> int:
        return 12 * self._nside * self._nside

    def _clone(self, df=None, **kw) -> "HealpixMap":
        base = super()._clone(df, **kw)
        return HealpixMap(
            base._df,
            nside=self._nside,
            header=base._header,
            units=base._units,
            descriptions=base._descriptions,
            sort_keys=base._sort_keys,
            region=base._region,
            convention=base._convention,
        )

    def with_resolution(self, nside: int) -> "HealpixMap":
        """Degrade to a coarser nside: mean-aggregate every value
        column over ``pixel // ratio^2`` (reference :459-472)."""
        if nside > self._nside:
            raise ValueError("can only degrade to a coarser resolution")
        if nside == self._nside:
            return self
        ratio = (self._nside // nside) ** 2
        value_cols = [c for c in self.columns if c != PIX]
        parent = F.floor(F.col(PIX) / F.lit(ratio)).cast("long").alias(PIX)
        g = self._df.groupBy(parent).agg(
            *[F.avg(c).alias(c) for c in value_cols]
        )
        out = self._clone(g.select(PIX, *value_cols))
        out._nside = nside
        return out

    def bound(self, region, select_by=None) -> "HealpixMap":
        """Restrict to pixels intersecting a sky region."""
        if isinstance(region, HealpixRegion):
            pix = F.col(PIX)
            if region.nside != self._nside:
                if region.nside > self._nside:
                    raise ValueError("region nside finer than map nside")
                ratio = (self._nside // region.nside) ** 2
                pix = F.floor(pix / F.lit(ratio)).cast("long")
            return self._clone(
                self._df.filter(pix.isin(list(region.pixels))), region=region
            )
        if isinstance(region, (ConeRegion, SkyboxRegion)):
            from ..spatial.healpix import query_region

            interior, boundary = query_region(self._nside, region)
            return self._clone(
                self._df.filter(F.col(PIX).isin(interior + boundary)),
                region=region,
            )
        raise TypeError(f"unsupported region {type(region).__name__}")

    def cone_search(self, ra: float, dec: float, radius: float) -> "HealpixMap":
        return self.bound(ConeRegion(float(ra), float(dec), float(radius)))

    def to_full_sky(self, fill: float = float("nan")) -> "HealpixMap":
        """Densify to all 12*nside^2 pixels (masked partial-sky output)."""
        spark = self._df.sparkSession
        allpix = spark.range(self.npix).select(F.col("id").alias(PIX))
        out = allpix.join(self._df, PIX, "left")
        return self._clone(out)
