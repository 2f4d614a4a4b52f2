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


def pixel_circumradius(nside: int, pix: np.ndarray) -> np.ndarray:
    """Per-pixel upper bound on the center-to-anywhere angular distance
    (degrees). Estimated from refined corner-child centers: the true
    corner lies inside the corner child, whose own circumradius is
    ~1/16 of the parent's (refine=4), so a 1.5x factor safely covers
    the estimate-to-true gap."""
    pts = pixel_sample_points(nside, pix)
    cra, cdec = pts[-1]
    max_sep = np.zeros(len(pix))
    for ra, dec in pts[:-1]:
        max_sep = np.maximum(max_sep, _angsep_vec(cra, cdec, ra, dec))
    return max_sep * 1.5


def _angsep_vec(ra1, dec1, ra2, dec2) -> np.ndarray:
    """Angular separation in degrees, vectorized over arrays."""
    r1, d1 = np.radians(ra1), np.radians(dec1)
    r2, d2 = np.radians(ra2), np.radians(dec2)
    cos_sep = np.sin(d1) * np.sin(d2) + np.cos(d1) * np.cos(d2) * np.cos(r1 - r2)
    return np.degrees(np.arccos(np.clip(cos_sep, -1.0, 1.0)))


def query_region(nside: int, region) -> tuple[list[int], list[int]]:
    """(interior_pixels, boundary_pixels) for a sky region at nside.

    CONSERVATIVE both ways (the healpy query_disc(inclusive=True)
    posture the reference relies on, spatial/healpix.py:27-66):

    * interior only when containment is PROVABLE — the whole pixel disk
      (center +- circumradius bound) fits inside the region, so rows in
      interior pixels may legitimately skip the exact predicate;
    * boundary is a SUPERSET of every pixel that could intersect — any
      pixel whose disk touches the region (never classified by point
      samples alone, which can all miss a corner-clipping region).

    The exact row-level predicate then decides for boundary pixels, so
    over-inclusion costs a little compute and never correctness.
    """
    from .region import ConeRegion, FullSkyRegion, SkyboxRegion

    npix = 12 * nside * nside
    pix = np.arange(npix, dtype=np.int64)
    if isinstance(region, FullSkyRegion):
        return pix.tolist(), []

    cra, cdec = pix2radec_nest(nside, pix)
    rpix = pixel_circumradius(nside, pix)

    if isinstance(region, ConeRegion):
        sep = _angsep_vec(cra, cdec, region.ra, region.dec)
        interior_m = sep <= region.radius - rpix
        boundary_m = ~interior_m & (sep <= region.radius + rpix)
    elif isinstance(region, SkyboxRegion):
        interior_m, boundary_m = _classify_skybox(region, cra, cdec, rpix)
    else:
        raise TypeError(f"unsupported sky region {type(region).__name__}")

    return pix[interior_m].tolist(), pix[boundary_m].tolist()


def _classify_skybox(region, cra, cdec, rpix):
    """Margin-based skybox classification. All pixel points lie within
    ``rpix`` of the center (a spherical cap), so dec spans
    cdec +- rpix, and the cap's RA extent is the EXACT tangent-meridian
    bound: a meridian is tangent to a cap of radius r centered at
    declination d at longitude offset asin(sin r / cos d) — every cap
    point satisfies |RA - cra| <= that offset. When sin r >= cos d the
    cap contains (or touches) a pole and spans the full RA circle ->
    demoted to boundary, where the exact predicate decides."""
    dec_lo, dec_hi = region.dec_min, region.dec_max
    r = np.radians(rpix)
    sin_r, cos_d = np.sin(r), np.cos(np.radians(cdec))
    # rpix >= 90 deg breaks the sin monotonicity the bound relies on
    near_pole = (sin_r >= cos_d) | (rpix >= 90.0)
    ratio = np.clip(np.divide(sin_r, np.maximum(cos_d, 1e-12)), 0.0, 1.0)
    dra = np.where(near_pole, 360.0, np.degrees(np.arcsin(ratio)))

    ra_len = region.ra_length
    # forward arc offset from the region's RA start to the pixel center
    off = np.mod(cra - region.ra_min, 360.0)

    dec_interior = (cdec - rpix >= dec_lo) & (cdec + rpix <= dec_hi)
    ra_interior = (off >= dra) & (off + dra <= ra_len)
    interior = dec_interior & ra_interior & ~near_pole

    dec_touch = (cdec + rpix >= dec_lo) & (cdec - rpix <= dec_hi)
    # pixel RA arc [cra-dra, cra+dra] overlaps region arc
    ra_touch = (
        (np.mod(cra - dra - region.ra_min, 360.0) <= ra_len)
        | (np.mod(region.ra_min - (cra - dra), 360.0) <= 2 * dra)
    )
    boundary = dec_touch & (ra_touch | (dra >= 360.0)) & ~interior
    return interior, boundary


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
