"""Minimal HEALPix (nested scheme) — healpy is not available in this
image, so the standard pixelization math is implemented here in
vectorized numpy from the published algorithm (Górski et al. 2005,
ApJ 622, 759; same formulas as the public healpix C/healpy sources).

Provides what the engine needs (reference parity:
``python/opencosmo/spatial/healpix.py:27-66``):
* ``ang2pix_nest`` / ``pix2ang_nest`` (vectorized numpy, driver or UDF)
* ``query_region`` — pixels intersecting/contained in a sky region
  (drives the two-phase lightcone predicate)
* ``ang2pix_expr`` — Arrow-batched pandas UDF for ingest-time pixel
  columns.
"""

from __future__ import annotations

import numpy as np

# face rows/cols for pix2ang (standard HEALPix face layout tables)
_JRLL = np.array([2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4])
_JPLL = np.array([1, 3, 5, 7, 0, 2, 4, 6, 1, 3, 5, 7])


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between bits (for Morton encoding), 32-bit in."""
    v = v.astype(np.uint64)
    v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << 2)) & np.uint64(0x3333333333333333)
    v = (v | (v << 1)) & np.uint64(0x5555555555555555)
    return v


def _compress_bits(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> 1)) & np.uint64(0x3333333333333333)
    v = (v | (v >> 2)) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> 4)) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> 8)) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> 16)) & np.uint64(0x00000000FFFFFFFF)
    return v


def _xyf2nest(nside: int, ix, iy, face) -> np.ndarray:
    return (
        face.astype(np.int64) * nside * nside
        + (_spread_bits(ix) | (_spread_bits(iy) << np.uint64(1))).astype(np.int64)
    )


def _nest2xyf(nside: int, pix: np.ndarray):
    npface = nside * nside
    face = pix // npface
    p = (pix % npface).astype(np.uint64)
    ix = _compress_bits(p).astype(np.int64)
    iy = _compress_bits(p >> np.uint64(1)).astype(np.int64)
    return ix, iy, face


def ang2pix_nest(nside: int, theta: np.ndarray, phi: np.ndarray) -> np.ndarray:
    """theta: colatitude [0, pi]; phi: longitude [0, 2pi) -> nested pix."""
    theta = np.asarray(theta, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    z = np.cos(theta)
    za = np.abs(z)
    tt = np.mod(phi, 2 * np.pi) / (0.5 * np.pi)  # in [0,4)

    ix = np.empty(theta.shape, dtype=np.int64)
    iy = np.empty(theta.shape, dtype=np.int64)
    face = np.empty(theta.shape, dtype=np.int64)

    eq = za <= 2.0 / 3.0
    # --- equatorial belt ---
    if np.any(eq):
        temp1 = nside * (0.5 + tt[eq])
        temp2 = nside * (z[eq] * 0.75)
        jp = (temp1 - temp2).astype(np.int64)  # ascending edge index
        jm = (temp1 + temp2).astype(np.int64)  # descending edge index
        ifp = jp >> int(np.log2(nside))
        ifm = jm >> int(np.log2(nside))
        f = np.where(
            ifp == ifm,
            (ifp & 3) + 4,
            np.where(ifp < ifm, ifp & 3, (ifm & 3) + 8),
        )
        face[eq] = f
        ix[eq] = jm & (nside - 1)
        iy[eq] = nside - (jp & (nside - 1)) - 1
    # --- polar caps ---
    po = ~eq
    if np.any(po):
        ntt = np.minimum(tt[po].astype(np.int64), 3)
        tp = tt[po] - ntt
        tmp = nside * np.sqrt(3.0 * (1.0 - za[po]))
        jp = (tp * tmp).astype(np.int64)
        jm = ((1.0 - tp) * tmp).astype(np.int64)
        jp = np.minimum(jp, nside - 1)
        jm = np.minimum(jm, nside - 1)
        north = z[po] >= 0
        face[po] = np.where(north, ntt, ntt + 8)
        ix[po] = np.where(north, nside - jm - 1, jp)
        iy[po] = np.where(north, nside - jp - 1, jm)
    return _xyf2nest(nside, ix, iy, face)


def pix2ang_nest(nside: int, pix: np.ndarray):
    """nested pix -> (theta, phi) of pixel centers."""
    pix = np.asarray(pix, dtype=np.int64)
    ix, iy, face = _nest2xyf(nside, pix)
    jr = _JRLL[face] * nside - ix - iy - 1

    nr = np.empty(pix.shape, dtype=np.int64)
    z = np.empty(pix.shape, dtype=np.float64)
    kshift = np.empty(pix.shape, dtype=np.int64)

    north_cap = jr < nside
    south_cap = jr > 3 * nside
    belt = ~(north_cap | south_cap)

    if np.any(north_cap):
        nr_ = jr[north_cap]
        z[north_cap] = 1.0 - (nr_ * nr_) * (1.0 / (3.0 * nside * nside))
        nr[north_cap] = nr_
        kshift[north_cap] = 0
    if np.any(south_cap):
        nr_ = 4 * nside - jr[south_cap]
        z[south_cap] = -1.0 + (nr_ * nr_) * (1.0 / (3.0 * nside * nside))
        nr[south_cap] = nr_
        kshift[south_cap] = 0
    if np.any(belt):
        nr[belt] = nside
        z[belt] = (2 * nside - jr[belt]) * (2.0 / (3.0 * nside))
        kshift[belt] = (jr[belt] - nside) & 1

    jp = (_JPLL[face] * nr + ix - iy + 1 + kshift) // 2
    jp = np.where(jp > 4 * nr, jp - 4 * nr, jp)
    jp = np.where(jp < 1, jp + 4 * nr, jp)
    phi = (jp - (kshift + 1) * 0.5) * (0.5 * np.pi / nr)
    theta = np.arccos(np.clip(z, -1.0, 1.0))
    return theta, phi


def radec2pix_nest(nside: int, ra_deg, dec_deg) -> np.ndarray:
    theta = np.radians(90.0 - np.asarray(dec_deg, dtype=np.float64))
    phi = np.radians(np.mod(np.asarray(ra_deg, dtype=np.float64), 360.0))
    return ang2pix_nest(nside, theta, phi)


def pix2radec_nest(nside: int, pix):
    theta, phi = pix2ang_nest(nside, np.asarray(pix))
    return np.degrees(phi), 90.0 - np.degrees(theta)


def pixel_sample_points(nside: int, pix: np.ndarray, refine: int = 4):
    """Sample points spanning each pixel: center + corner-ward children
    centers at nside*2^refine (approximates the pixel outline for
    containment classification)."""
    pix = np.asarray(pix, dtype=np.int64)
    f = 1 << refine
    base = pix * f * f
    k = f - 1
    # children sub-positions: 4 corners + 4 edge midpoints in (x,y)
    subs = [
        (0, 0), (k, 0), (0, k), (k, k),
        (k // 2, 0), (0, k // 2), (k, k // 2), (k // 2, k),
    ]
    pts = []
    hi_nside = nside * f
    for sx, sy in subs:
        child = base + (
            _spread_bits(np.full(pix.shape, sx, dtype=np.int64))
            | (_spread_bits(np.full(pix.shape, sy, dtype=np.int64)) << np.uint64(1))
        ).astype(np.int64)
        ra, dec = pix2radec_nest(hi_nside, child)
        pts.append((ra, dec))
    cra, cdec = pix2radec_nest(nside, pix)
    pts.append((cra, cdec))
    return pts  # list of (ra_array, dec_array)


def query_region(nside: int, region) -> tuple[list[int], list[int]]:
    """(interior_pixels, boundary_pixels) for a sky region at nside.

    Classification samples 9 points per pixel (center, corners, edge
    midpoints): all inside -> interior; any inside (or pixel holds the
    region center) -> boundary. Conservative for regions larger than
    ~half a pixel; exact row-level predicates run on boundary pixels.
    """
    npix = 12 * nside * nside
    pix = np.arange(npix, dtype=np.int64)
    pts = pixel_sample_points(nside, pix)
    inside = np.zeros((len(pts), npix), dtype=bool)
    for i, (ra, dec) in enumerate(pts):
        inside[i] = _contains_vec(region, ra, dec)
    n_in = inside.sum(axis=0)
    interior = pix[n_in == len(pts)]
    boundary = pix[(n_in > 0) & (n_in < len(pts))]
    # the pixel containing the region's center is at least boundary
    center = _region_center(region)
    if center is not None:
        cpix = int(radec2pix_nest(nside, [center[0]], [center[1]])[0])
        if cpix not in interior and cpix not in boundary:
            boundary = np.append(boundary, cpix)
    return interior.tolist(), boundary.tolist()


def _contains_vec(region, ra: np.ndarray, dec: np.ndarray) -> np.ndarray:
    from .region import ConeRegion, FullSkyRegion, SkyboxRegion

    if isinstance(region, FullSkyRegion):
        return np.ones(ra.shape, dtype=bool)
    if isinstance(region, ConeRegion):
        ra_r, dec_r = np.radians(ra), np.radians(dec)
        ra0, dec0 = np.radians(region.ra), np.radians(region.dec)
        cos_sep = np.sin(dec_r) * np.sin(dec0) + np.cos(dec_r) * np.cos(dec0) * np.cos(
            ra_r - ra0
        )
        return cos_sep >= np.cos(np.radians(region.radius))
    if isinstance(region, SkyboxRegion):
        ra_m = np.mod(ra, 360.0)
        decp = (dec >= region.dec_min) & (dec <= region.dec_max)
        if region.wraps:
            rap = (ra_m >= region.ra_min) | (ra_m <= region.ra_max)
        else:
            rap = (ra_m >= region.ra_min) & (ra_m <= region.ra_max)
        return decp & rap
    raise TypeError(f"unsupported sky region {type(region).__name__}")


def _region_center(region):
    from .region import ConeRegion, SkyboxRegion

    if isinstance(region, ConeRegion):
        return (region.ra, region.dec)
    if isinstance(region, SkyboxRegion) and not region.wraps:
        return ((region.ra_min + region.ra_max) / 2, (region.dec_min + region.dec_max) / 2)
    return None


def ang2pix_expr(nside: int, ra_col, dec_col):
    """Spark expression: nested HEALPix pixel from ra/dec degree
    columns (Arrow-batched pandas UDF over the numpy implementation)."""
    import pandas  # noqa: PLC0415 - must be importable at worker side

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    def _p(ra: pandas.Series, dec: pandas.Series) -> pandas.Series:
        return pandas.Series(radec2pix_nest(nside, ra.to_numpy(), dec.to_numpy()))

    # explicit hints via __annotations__ resolution need pandas in the
    # module globals; bind the UDF with concrete types instead
    _p.__annotations__ = {
        "ra": pandas.Series,
        "dec": pandas.Series,
        "return": pandas.Series,
    }
    return F.pandas_udf(_p, LongType())(ra_col, dec_col)
