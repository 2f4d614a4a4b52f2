"""Property-based invariants (hypothesis) for the driver-side math the
spatial and unit subsystems depend on. Pure Python — no SparkSession —
so these run in milliseconds and explore far more geometry than the
example-based tests.

Invariants mirror what the reference guarantees structurally:
* region→cells soundness: every point of the region lands in an
  interior or boundary cell (reference octree query completeness,
  octree.py:131-177);
* interior precision: interior cells are fully inside the region (their
  rows may skip the exact test, dataset.py:399-427);
* morton encoding is injective per level;
* unit algebra is a group action with exact rational exponents.
"""

from fractions import Fraction

import pytest
from hypothesis import example, given, settings, strategies as st

from opencosmo_spark.spatial.octree import _morton_encode, region_to_cells
from opencosmo_spark.spatial.region import (
    BoxRegion,
    ConeRegion,
    make_box,
    make_cone,
    make_skybox,
)
from opencosmo_spark.units import Unit, parse_unit

LEVEL = 3  # 8^3 = 512 cells: fast yet non-trivial


def cell_of_point(p, level=LEVEL):
    """Driver-side twin of octree.morton_cell_column."""
    n = 1 << level
    coords = tuple(max(0, min(n - 1, int(x * n))) for x in p)
    return _morton_encode(coords, level)


coord = st.floats(0.0, 1.0, exclude_max=True, allow_nan=False, width=64)
boxes = st.tuples(
    st.tuples(coord, coord, coord), st.tuples(coord, coord, coord)
).map(
    lambda ps: make_box(
        tuple(min(a, b) for a, b in zip(*ps)),
        tuple(min(max(a, b) + 1e-9, 1.0) for a, b in zip(*ps)),
    )
)


@settings(max_examples=200, deadline=None)
@given(region=boxes, p=st.tuples(coord, coord, coord))
def test_region_cells_sound(region, p):
    """point ∈ region ⟹ its cell was emitted (interior or boundary)."""
    interior, boundary = region_to_cells(
        region, [0.0, 0.0, 0.0], 1.0, LEVEL, dims=3
    )
    if region.contains_point(p):
        assert cell_of_point(p) in set(interior) | set(boundary)


@settings(max_examples=100, deadline=None)
@given(region=boxes, p=st.tuples(coord, coord, coord))
def test_interior_cells_precise(region, p):
    """point in an interior cell ⟹ point ∈ region (rows in interior
    cells may legally skip the exact geometric test)."""
    interior, _ = region_to_cells(region, [0.0, 0.0, 0.0], 1.0, LEVEL, dims=3)
    if cell_of_point(p) in set(interior):
        assert region.contains_point(p)


@settings(max_examples=200, deadline=None)
@given(
    a=st.tuples(*[st.integers(0, 7)] * 3),
    b=st.tuples(*[st.integers(0, 7)] * 3),
)
def test_morton_injective(a, b):
    if a != b:
        assert _morton_encode(a, 3) != _morton_encode(b, 3)
    assert 0 <= _morton_encode(a, 3) < 512


@settings(max_examples=100, deadline=None)
@given(
    c1=st.tuples(st.floats(0, 360), st.floats(-80, 80), st.floats(0.1, 20)),
    c2=st.tuples(st.floats(0, 360), st.floats(-80, 80), st.floats(0.1, 20)),
)
def test_cone_contains_implies_intersects(c1, c2):
    a, b = make_cone(c1[:2], c1[2]), make_cone(c2[:2], c2[2])
    if a.contains(b):
        assert a.intersects(b)


@settings(max_examples=100, deadline=None)
@given(region=boxes, other=boxes)
def test_box_contains_implies_intersects(region, other):
    if region.contains(other):
        assert region.intersects(other)


units = st.dictionaries(
    st.sampled_from(["Mpc", "Msun", "km", "s", "h"]),
    st.sampled_from(
        [Fraction(n, d) for n in range(-6, 7) for d in (1, 2, 3) if n]
    ),
    max_size=3,
).map(lambda d: Unit.of(**{k: v for k, v in d.items() if v}))


@settings(max_examples=200, deadline=None)
@given(a=units, b=units)
def test_unit_group_laws(a, b):
    assert (a * b) / b == a
    assert a * Unit.dimensionless() == a
    assert (a * b).pow(2) == a.pow(2) * b.pow(2)
    assert a.pow(2).sqrt() == a


@settings(max_examples=200, deadline=None)
@given(u=units)
def test_unit_str_roundtrip(u):
    assert parse_unit(str(u)) == u


@settings(max_examples=100, deadline=None)
@given(
    p=st.integers(1, 3),
)
def test_conversion_factor_inverse(p):
    a, b = Unit.of(Mpc=p), Unit.of(km=p)
    f, g = a.conversion_factor(b), b.conversion_factor(a)
    assert abs(f * g - 1.0) < 1e-9


@settings(max_examples=100, deadline=None)
@given(
    ra=st.floats(0, 360, allow_nan=False),
    dec=st.floats(-90, 90, allow_nan=False),
)
def test_skybox_membership_consistent(ra, dec):
    sb = make_skybox((10.0, -20.0), (50.0, 20.0))
    inside = 10.0 <= ra % 360.0 <= 50.0 and -20.0 <= dec <= 20.0
    assert sb.contains_point(ra, dec) == inside


# ---------------------------------------------------------------------
# HEALPix pixelization (hand-written, healpy-free) invariants
# ---------------------------------------------------------------------
@settings(max_examples=300, deadline=None)
@given(
    ra=st.floats(0, 360, exclude_max=True, allow_nan=False),
    dec=st.floats(-89.9, 89.9, allow_nan=False),
    nside_pow=st.integers(0, 8),
)
def test_healpix_roundtrip_within_pixel(ra, dec, nside_pow):
    """ang2pix(pix2ang(ang2pix(p))) is a fixed point, pixel ids are in
    range, and the pixel center is close to the input direction (within
    ~2 pixel diagonals)."""
    import numpy as np

    from opencosmo_spark.spatial.healpix import (
        pix2radec_nest,
        radec2pix_nest,
    )

    nside = 1 << nside_pow
    pix = radec2pix_nest(nside, np.array([ra]), np.array([dec]))
    assert 0 <= pix[0] < 12 * nside * nside
    cra, cdec = pix2radec_nest(nside, pix)
    # center maps back to the same pixel (exact fixed point)
    pix2 = radec2pix_nest(nside, cra, cdec)
    assert pix2[0] == pix[0]
    # angular distance center<->input bounded by ~2x pixel scale
    from opencosmo_spark.spatial.region import _ang_sep_deg

    pixel_scale = 58.6 / nside  # sqrt(4pi/12npix) in degrees
    assert _ang_sep_deg(ra, dec, float(cra[0]), float(cdec[0])) < 2.5 * pixel_scale


@settings(max_examples=50, deadline=None)
@given(
    ra=st.floats(0, 360, exclude_max=True, allow_nan=False),
    dec=st.floats(-85, 85, allow_nan=False),
    radius=st.floats(1.0, 30.0),
)
def test_healpix_query_region_covers_center(ra, dec, radius):
    """The cone's own center pixel must be among the pixels returned by
    query_region (coverage soundness at the query's heart)."""
    import numpy as np

    from opencosmo_spark.spatial.healpix import query_region, radec2pix_nest

    nside = 32
    cone = make_cone((ra, dec), radius)
    interior, boundary = query_region(nside, cone)
    center_pix = int(radec2pix_nest(nside, np.array([ra]), np.array([dec]))[0])
    assert center_pix in set(interior) | set(boundary)


# ---------------------------------------------------------------------
# RA-wrapping skybox algebra (reference spatial/region.py:151-214)
# ---------------------------------------------------------------------
def _skybox(ra_min, ra_max, dec_min=-10.0, dec_max=10.0):
    from opencosmo_spark.spatial.region import SkyboxRegion

    return SkyboxRegion(ra_min, ra_max, dec_min, dec_max)


@settings(max_examples=200, deadline=None)
@given(
    a_start=st.floats(0, 360, exclude_max=True),
    a_len=st.floats(1.0, 180.0),
    b_start=st.floats(0, 360, exclude_max=True),
    b_len=st.floats(1.0, 180.0),
)
# regression pin: offset+length arc algebra lost exact containment to
# an ulp of addition error when b shares a's end meridian (round-9
# hypothesis find; fixed by endpoint-offset comparison)
@example(
    a_start=1.02500000000002,
    a_len=129.5,
    b_start=129.50000000000003,
    b_len=1.02500000000002,
)
def test_skybox_wrap_algebra_vs_pointwise(a_start, a_len, b_start, b_len):
    """contains/intersects must agree with dense point-wise evaluation,
    including arcs crossing RA=0."""
    import numpy as np

    a = _skybox(a_start, (a_start + a_len) % 360.0)
    b = _skybox(b_start, (b_start + b_len) % 360.0)

    # dense RA sampling of b's arc (dec band is shared)
    ts = np.linspace(0.0, b_len, 721)
    ras = (b_start + ts) % 360.0
    inside_a = np.array([a.contains_point(r, 0.0) for r in ras])

    if a.contains(b):
        assert inside_a.all()
    if inside_a.all():
        # endpoint-sampled containment implies algebraic containment up
        # to sampling resolution: check the exact claim only when the
        # arcs don't merely touch at the resolution limit
        margin = b_len / 720
        a2 = _skybox(a_start, (a_start + a_len) % 360.0)
        if a2.ra_length >= b.ra_length + 2 * margin:
            assert a.contains(b)
    if inside_a.any() and not a.intersects(b):
        # any strictly-inside sample point refutes a non-intersection
        strict = [
            r
            for r, i in zip(ras[1:-1], inside_a[1:-1])
            if i
        ]
        assert not strict


def test_skybox_wrap_examples():
    """Deterministic wrap cases: [350, 10] crosses zero."""
    wrap = _skybox(350.0, 10.0)
    assert wrap.wraps and wrap.ra_length == 20.0
    assert wrap.contains(_skybox(355.0, 5.0))
    assert wrap.contains(_skybox(350.0, 10.0))
    assert not wrap.contains(_skybox(340.0, 5.0))
    assert wrap.intersects(_skybox(5.0, 20.0))
    assert not wrap.intersects(_skybox(20.0, 340.0))
    # the complement arc wraps the other way
    comp = _skybox(10.0, 350.0)
    assert not comp.wraps
    assert comp.intersects(wrap) is False  # strict: they touch only at endpoints
    # full-RA band contains everything
    full = _skybox(0.0, 360.0)
    assert full.ra_length == 360.0
    assert full.contains(wrap) and full.intersects(wrap)


@settings(max_examples=40, deadline=None)
@given(
    ra=st.floats(0, 360, exclude_max=True, allow_nan=False),
    dec=st.floats(-85, 85, allow_nan=False),
    radius=st.floats(1.0, 30.0),
)
def test_healpix_interior_pixels_provably_inside(ra, dec, radius):
    """Every INTERIOR pixel's sampled outline must be fully inside the
    cone — interior rows skip the exact predicate, so a misclassified
    interior would admit wrong rows."""
    import numpy as np

    from opencosmo_spark.spatial.healpix import (
        pixel_sample_points,
        query_region,
    )

    nside = 16
    cone = make_cone((ra, dec), radius)
    interior, _ = query_region(nside, cone)
    if not interior:
        return
    pts = pixel_sample_points(nside, np.array(interior))
    for pra, pdec in pts:
        for r, d in zip(pra, pdec):
            assert cone.contains_point(float(r), float(d))


@settings(max_examples=40, deadline=None)
@given(
    ra_start=st.floats(0, 360, exclude_max=True, allow_nan=False),
    ra_len=st.floats(1.0, 359.0, allow_nan=False),
    dec_lo=st.floats(-89.0, 87.0, allow_nan=False),
    dec_span=st.floats(0.5, 60.0, allow_nan=False),
)
def test_healpix_skybox_interior_pixels_provably_inside(
    ra_start, ra_len, dec_lo, dec_span
):
    """Skybox twin of the cone proof, including RA wrap and near-pole
    boxes: every INTERIOR pixel's sampled outline must be fully inside
    the skybox — interior rows skip the exact predicate, so a
    misclassified interior silently admits wrong rows."""
    import numpy as np

    from opencosmo_spark.spatial.healpix import (
        pixel_sample_points,
        query_region,
    )
    from opencosmo_spark.spatial.region import SkyboxRegion

    dec_hi = min(dec_lo + dec_span, 90.0)
    box = SkyboxRegion(ra_start, (ra_start + ra_len) % 360.0, dec_lo, dec_hi)
    nside = 16
    interior, _ = query_region(nside, box)
    if not interior:
        return
    pts = pixel_sample_points(nside, np.array(interior))
    for pra, pdec in pts:
        for r, d in zip(pra, pdec):
            assert box.contains_point(float(r), float(d))


@settings(max_examples=40, deadline=None)
@given(
    ra_start=st.floats(0, 360, exclude_max=True, allow_nan=False),
    ra_len=st.floats(0.5, 359.0, allow_nan=False),
    dec_lo=st.floats(-89.9, 89.0, allow_nan=False),
    dec_span=st.floats(0.1, 30.0, allow_nan=False),
)
def test_healpix_skybox_never_drops_covered_points(
    ra_start, ra_len, dec_lo, dec_span
):
    """Points inside the skybox (corners, edge midpoints, center) must
    land in pixels that query_region returned — the false-negative
    class: a covered pixel classified neither interior nor boundary."""
    import numpy as np

    from opencosmo_spark.spatial.healpix import query_region, radec2pix_nest
    from opencosmo_spark.spatial.region import SkyboxRegion

    dec_hi = min(dec_lo + dec_span, 90.0)
    box = SkyboxRegion(ra_start, (ra_start + ra_len) % 360.0, dec_lo, dec_hi)
    nside = 16
    interior, boundary = query_region(nside, box)
    covered = set(interior) | set(boundary)
    fr = [0.0, 0.25, 0.5, 0.75, 1.0]
    for fx in fr:
        for fy in fr:
            pr = (ra_start + fx * ra_len) % 360.0
            pd = dec_lo + fy * (dec_hi - dec_lo)
            assert box.contains_point(pr, pd)
            p = int(radec2pix_nest(nside, np.array([pr]), np.array([pd]))[0])
            assert p in covered


@settings(max_examples=40, deadline=None)
@given(
    ra=st.floats(0, 360, exclude_max=True, allow_nan=False),
    dec=st.floats(-85, 85, allow_nan=False),
    radius=st.floats(0.05, 2.0),
)
def test_healpix_small_cone_never_dropped(ra, dec, radius):
    """A cone smaller than a pixel must still be covered: points ON the
    cone (center + rim samples) map to pixels that query_region
    returned (the false-negative class ADVICE flagged: all 9 samples
    outside an intersecting pixel)."""
    import numpy as np

    from opencosmo_spark.spatial.healpix import query_region, radec2pix_nest

    nside = 16
    cone = make_cone((ra, dec), radius)
    interior, boundary = query_region(nside, cone)
    covered = set(interior) | set(boundary)
    # rim points in several directions
    for ang in np.linspace(0, 2 * np.pi, 13):
        pr = ra + radius * np.cos(ang) / max(np.cos(np.radians(dec)), 1e-6)
        pd = np.clip(dec + radius * np.sin(ang), -90.0, 90.0)
        if not cone.contains_point(pr % 360.0, float(pd)):
            continue  # flat-sky approx outside the true cone: skip
        p = int(radec2pix_nest(nside, np.array([pr % 360.0]), np.array([pd]))[0])
        assert p in covered


# --------------------------------------------------------------- waterfill
# the temperature-mixing rate solver is pure driver math — explore it
# far beyond the example-based tests
group_counts = st.dictionaries(
    st.text(st.characters(codec="ascii", categories=["Ll"]), min_size=1, max_size=4),
    st.integers(1, 100_000),
    min_size=1,
    max_size=12,
)


@given(
    counts=group_counts,
    alpha=st.floats(0.0, 1.5, allow_nan=False),
    target=st.floats(0.01, 1.0, allow_nan=False, exclude_min=False),
)
@settings(max_examples=300, deadline=None)
def test_waterfill_rates_invariants(counts, alpha, target):
    from opencosmo_spark.pipeline.sample import waterfill_rates

    rates = waterfill_rates(counts, alpha, target)
    assert set(rates) == set(counts)
    # rates are valid probabilities
    for g, r in rates.items():
        assert 0.0 <= r <= 1.0 + 1e-12, (g, r)
    # expected kept mass hits the target whenever feasible (target <= 1
    # of total is always feasible since rate 1.0 keeps everything)
    total = sum(counts.values())
    kept = sum(counts[g] * rates[g] for g in counts)
    assert kept == pytest.approx(target * total, rel=1e-9, abs=1e-6)
    # alpha < 1 upweights smaller groups: rates anti-monotone in size
    if alpha < 1.0:
        by_size = sorted(counts.items(), key=lambda kv: kv[1])
        for (g1, n1), (g2, n2) in zip(by_size, by_size[1:]):
            if n1 < n2:
                assert rates[g1] >= rates[g2] - 1e-9, (g1, g2)


@given(counts=group_counts, target=st.floats(0.01, 1.0, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_waterfill_alpha_one_is_uniform_rate(counts, target):
    from opencosmo_spark.pipeline.sample import waterfill_rates

    rates = waterfill_rates(counts, 1.0, target)
    for r in rates.values():
        assert r == pytest.approx(target, rel=1e-9)


# ---------------------------------------------------------------------------
# codec robustness: the pure-python decoders gate a mapInPandas hot
# path over UNTRUSTED binary payloads — they must classify (None) or
# decode, never raise, on arbitrary bytes
# ---------------------------------------------------------------------------


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_decoders_never_raise_on_garbage(data):
    from opencosmo_spark.pipeline.multimodal import (
        _decode_bmp,
        _decode_pnm,
        _decode_wav,
    )

    for dec in (_decode_bmp, _decode_pnm, _decode_wav):
        out = dec(data)
        assert out is None or out is not None  # no exception escapes


@given(
    st.binary(max_size=200),
    st.sampled_from([b"BM", b"P5", b"P6", b"RIFF"]),
)
@settings(max_examples=300, deadline=None)
def test_decoders_never_raise_on_magic_prefixed_garbage(tail, magic):
    """Payloads that pass the magic check but carry corrupt
    headers/rasters are the adversarial case — still no exceptions,
    and any non-None image result is a well-formed (h, w, 3) uint8."""
    import numpy as np

    from opencosmo_spark.pipeline.multimodal import (
        _decode_bmp,
        _decode_pnm,
        _decode_wav,
    )

    data = magic + tail
    for dec in (_decode_bmp, _decode_pnm):
        out = dec(data)
        if out is not None:
            assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3
    w = _decode_wav(data)
    if w is not None:
        samples, rate = w
        assert rate > 0 and samples.dtype == np.float32


# --- WARC framing round-trip (pipeline/web.py) -----------------------------

_warc_payloads = st.binary(min_size=0, max_size=300)
_warc_types = st.sampled_from(["response", "request", "conversion", "metadata"])


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(_warc_types, _warc_payloads), min_size=1, max_size=8
    ),
    st.booleans(),
)
def test_warc_roundtrip_property(records, as_gzip):
    """serialize -> parse recovers every record's type and exact
    payload bytes, regardless of payload content (including payloads
    embedding record-boundary byte sequences) and gzip framing."""
    import gzip as _gzip

    from opencosmo_spark.pipeline.web import parse_warc_records

    blob = b""
    for i, (rtype, payload) in enumerate(records):
        blob += (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + rtype.encode() + b"\r\n"
            b"WARC-Record-ID: <urn:uuid:" + str(i).encode() + b">\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
            b"\r\n" + payload + b"\r\n\r\n"
        )
    data = _gzip.compress(blob) if as_gzip else blob
    got = parse_warc_records(data)
    assert [(r["warc_type"], r["payload"]) for r in got] == [
        (t, p) for t, p in records
    ]
