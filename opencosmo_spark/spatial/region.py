"""Geometric query regions with contains/intersects algebra.

Parity target: reference ``python/opencosmo/spatial/region.py``
(BoxRegion:304, ConeRegion:58, SkyboxRegion:151, HealpixRegion:216,
FullSkyRegion:284) and ``spatial/relations.py:24-271``. Pure
driver-side value objects — they compile to Spark predicates (see
``bound.py``); no data motion.

All angles in degrees (ra 0..360, dec -90..90) matching the reference's
user surface; cone radius in degrees.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


def _unit_vec(ra_deg: float, dec_deg: float) -> tuple[float, float, float]:
    ra, dec = math.radians(ra_deg), math.radians(dec_deg)
    return (
        math.cos(dec) * math.cos(ra),
        math.cos(dec) * math.sin(ra),
        math.sin(dec),
    )


def _ang_sep_deg(ra1, dec1, ra2, dec2) -> float:
    v1, v2 = _unit_vec(ra1, dec1), _unit_vec(ra2, dec2)
    dot = max(-1.0, min(1.0, sum(a * b for a, b in zip(v1, v2))))
    return math.degrees(math.acos(dot))


def _arc_len(lo: float, hi: float) -> float:
    """Forward (counterclockwise) arc length lo -> hi on the RA circle,
    in [0, 360)."""
    return (hi - lo) % 360.0


@dataclass(frozen=True)
class BoxRegion:
    """Axis-aligned 3-D box [p1, p2) in simulation coordinates."""

    p1: tuple[float, float, float]
    p2: tuple[float, float, float]

    def __post_init__(self):
        if any(a >= b for a, b in zip(self.p1, self.p2)):
            raise ValueError("box requires p1 < p2 on every axis")

    @property
    def center(self):
        return tuple((a + b) / 2 for a, b in zip(self.p1, self.p2))

    def contains_point(self, p) -> bool:
        return all(a <= x < b for a, x, b in zip(self.p1, p, self.p2))

    def contains(self, other: "BoxRegion") -> bool:
        return all(a <= oa for a, oa in zip(self.p1, other.p1)) and all(
            ob <= b for ob, b in zip(other.p2, self.p2)
        )

    def intersects(self, other: "BoxRegion") -> bool:
        return all(
            a < ob and oa < b
            for a, b, oa, ob in zip(self.p1, self.p2, other.p1, other.p2)
        )


@dataclass(frozen=True)
class ConeRegion:
    """Sky cone: center (ra, dec) + angular radius, degrees."""

    ra: float
    dec: float
    radius: float

    def __post_init__(self):
        if self.radius <= 0 or self.radius > 180:
            raise ValueError("cone radius must be in (0, 180] degrees")

    def contains_point(self, ra: float, dec: float) -> bool:
        return _ang_sep_deg(self.ra, self.dec, ra, dec) <= self.radius

    def contains(self, other) -> bool:
        """Cross-type dispatch mirrors reference
        spatial/relations.py:223-250: cone-cone is exact; cone-skybox
        tests the box's four corners (the reference's criterion)."""
        if isinstance(other, ConeRegion):
            # strict, matching reference relations.py __cone_contains_cone
            # ('>'): an identical cone does not contain itself, consistent
            # with the FullSkyRegion posture
            sep = _ang_sep_deg(self.ra, self.dec, other.ra, other.dec)
            return sep + other.radius < self.radius
        if isinstance(other, SkyboxRegion):
            corners = [
                (other.ra_min, other.dec_min),
                (other.ra_min, other.dec_max),
                (other.ra_max, other.dec_min),
                (other.ra_max, other.dec_max),
            ]
            return all(self.contains_point(r, d) for r, d in corners)
        raise ValueError(f"expected a 2D sky region, got {type(other).__name__}")

    def intersects(self, other) -> bool:
        if isinstance(other, ConeRegion):
            # strict ('<'), reference relations.py __cone_intersects_cone
            sep = _ang_sep_deg(self.ra, self.dec, other.ra, other.dec)
            return sep < self.radius + other.radius
        if isinstance(other, SkyboxRegion):
            return other.intersects(self)
        raise ValueError(f"expected a 2D sky region, got {type(other).__name__}")


@dataclass(frozen=True)
class SkyboxRegion:
    """RA/Dec rectangle, degrees; handles RA wraparound."""

    ra_min: float
    ra_max: float
    dec_min: float
    dec_max: float

    def __post_init__(self):
        if not (-90 <= self.dec_min < self.dec_max <= 90):
            raise ValueError("bad dec range")

    @property
    def wraps(self) -> bool:
        return self.ra_min > self.ra_max

    def contains_point(self, ra: float, dec: float) -> bool:
        ra = ra % 360.0
        if not (self.dec_min <= dec <= self.dec_max):
            return False
        if self.wraps:
            return ra >= self.ra_min or ra <= self.ra_max
        return self.ra_min <= ra <= self.ra_max

    @property
    def ra_length(self) -> float:
        """Forward arc length ra_min -> ra_max on the RA circle; a
        distinct-endpoint multiple of 360 (e.g. 0 -> 360) means full
        coverage, not zero."""
        d = _arc_len(self.ra_min, self.ra_max)
        if d == 0.0 and self.ra_min != self.ra_max:
            return 360.0
        return d

    def contains(self, other) -> bool:
        """RA coverage is a single circular arc whether or not it
        crosses 0 deg, so containment is pure arc algebra: other's arc
        starts inside self's and fits in the remaining length
        (reference handles wrap the same way, spatial/region.py:151-214).
        Cone containment uses the reference's flat ra/dec span test
        (relations.py __skybox_contains_cone), wrap-aware here.
        """
        if isinstance(other, ConeRegion):
            r = other.radius
            dec_ok = (
                self.dec_min <= other.dec - r and other.dec + r <= self.dec_max
            )
            return dec_ok and self._arc_contains(
                (other.ra - r) % 360.0, (other.ra + r) % 360.0
            )
        if not isinstance(other, SkyboxRegion):
            raise ValueError(
                f"expected a 2D sky region, got {type(other).__name__}"
            )
        dec_ok = (
            self.dec_min <= other.dec_min and other.dec_max <= self.dec_max
        )
        if other.ra_length >= 360.0:
            return dec_ok and self.ra_length >= 360.0
        return dec_ok and self._arc_contains(other.ra_min, other.ra_max)

    def _arc_contains(self, lo: float, hi: float) -> bool:
        """Does self's RA arc contain the forward arc lo -> hi?
        Compared via the two endpoint OFFSETS from self.ra_min —
        never by adding an offset to an arc LENGTH: offsets are
        like-computed ``(x - ra_min) % 360`` values, so a child
        sharing self's end meridian compares exactly equal, whereas
        ``offset + length`` picks up an ulp of addition error and
        flips exact containment (hypothesis-found: a=[1.025, 130.525]
        failing to contain b=[129.5, 130.525] by 3e-14 deg). The
        offset form is also what makes the algebra agree with
        pointwise ``contains_point`` at every float, not just almost
        everywhere."""
        if self.ra_length >= 360.0:
            return True
        off_lo = _arc_len(self.ra_min, lo)
        off_hi = _arc_len(self.ra_min, hi)
        return off_lo <= off_hi <= self.ra_length

    def intersects(self, other) -> bool:
        if isinstance(other, ConeRegion):
            # nearest point of the box to the cone center (reference
            # relations.py __skybox_intersects_cone, arc-aware clip)
            dec_n = min(max(other.dec, self.dec_min), self.dec_max)
            if _arc_len(self.ra_min, other.ra % 360.0) <= self.ra_length:
                ra_n = other.ra % 360.0
                return (
                    _ang_sep_deg(other.ra, other.dec, ra_n, dec_n)
                    < other.radius
                )
            return min(
                _ang_sep_deg(other.ra, other.dec, self.ra_min, dec_n),
                _ang_sep_deg(other.ra, other.dec, self.ra_max, dec_n),
            ) < other.radius
        if not isinstance(other, SkyboxRegion):
            raise ValueError(
                f"expected a 2D sky region, got {type(other).__name__}"
            )
        dec_ok = self.dec_min < other.dec_max and other.dec_min < self.dec_max
        ra_ok = (
            _arc_len(self.ra_min, other.ra_min) < self.ra_length
            or _arc_len(other.ra_min, self.ra_min) < other.ra_length
        )
        return dec_ok and ra_ok


@dataclass(frozen=True)
class HealpixRegion:
    """Explicit set of HEALPix pixels at a given nside (nested)."""

    pixels: tuple[int, ...]
    nside: int

    def combine(self, other: "HealpixRegion") -> "HealpixRegion":
        if other.nside != self.nside:
            raise ValueError("cannot combine HealpixRegions of different nside")
        return HealpixRegion(tuple(sorted(set(self.pixels) | set(other.pixels))), self.nside)

    def _cover_of(self, other) -> set[int]:
        """Pixels at self.nside that may intersect ``other`` (the
        reference's get_healpix_intersections: a conservative cover —
        interior + boundary from query_region)."""
        from .healpix import query_region

        if isinstance(other, (ConeRegion, SkyboxRegion, FullSkyRegion)):
            interior, boundary = query_region(self.nside, other)
            return set(interior) | set(boundary)
        raise ValueError(f"expected a 2D sky region, got {type(other).__name__}")

    def contains(self, other) -> bool:
        """True only when every covering pixel of ``other`` is in this
        region (reference relations.py __healpix_contains_other). The
        cover is conservative, so contains() never returns a false
        True for cone/skybox arguments."""
        if isinstance(other, HealpixRegion):
            # reference posture: pixel sets never "contain" each other
            # (test_healpix_never_contains_healpix) — a pixel set is a
            # cover, not a closed shape with an interior
            return False
        return self._cover_of(other) <= set(self.pixels)

    def intersects(self, other) -> bool:
        if isinstance(other, HealpixRegion):
            a, b = self, other
            if a.nside != b.nside:
                # align to the coarser scheme (nested parents)
                if a.nside > b.nside:
                    a, b = b, a
                ratio = (b.nside // a.nside) ** 2
                bp = {p // ratio for p in b.pixels}
                return bool(bp & set(a.pixels))
            return bool(set(a.pixels) & set(b.pixels))
        return bool(self._cover_of(other) & set(self.pixels))


@dataclass(frozen=True)
class FullSkyRegion:
    def contains_point(self, ra: float, dec: float) -> bool:
        return True

    def contains(self, other) -> bool:
        # a region does not contain itself (reference relations.py:218)
        return not isinstance(other, FullSkyRegion)

    def intersects(self, other) -> bool:
        # mirrors the reference's (FullSky, FullSky) -> False quirk
        # (test_full_sky_does_not_intersect_itself)
        return not isinstance(other, FullSkyRegion)


# -- constructors (reference spatial/builders.py:39-140) ---------------
def make_box(p1, p2) -> BoxRegion:
    return BoxRegion(tuple(float(x) for x in p1), tuple(float(x) for x in p2))


def make_cone(center, radius) -> ConeRegion:
    ra, dec = center
    return ConeRegion(float(ra), float(dec), float(radius))


def make_skybox(p1, p2) -> SkyboxRegion:
    (ra1, dec1), (ra2, dec2) = p1, p2
    return SkyboxRegion(
        float(min(ra1, ra2)), float(max(ra1, ra2)),
        float(min(dec1, dec2)), float(max(dec1, dec2)),
    )
