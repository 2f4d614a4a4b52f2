"""Neighbor pairs / 2-point correlation / FoF vs brute-force numpy."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from opencosmo_spark.spatial.pairs import (
    fof_groups,
    neighbor_pairs_3d,
    two_point_correlation,
)

BOX = 10.0


def _points_df(spark, pts):
    return spark.createDataFrame(
        [Row(id=i, x=float(p[0]), y=float(p[1]), z=float(p[2])) for i, p in enumerate(pts)]
    )


def _brute_pairs(pts, radius, periodic=True, box=BOX):
    out = {}
    n = len(pts)
    for i in range(n):
        for j in range(i + 1, n):
            d = np.abs(pts[i] - pts[j])
            if periodic:
                d = np.minimum(d, box - d)
            dist = float(np.sqrt((d**2).sum()))
            if dist <= radius:
                out[(i, j)] = dist
    return out


@pytest.mark.parametrize("periodic", [True, False])
def test_neighbor_pairs_match_bruteforce(spark, periodic):
    rng = np.random.default_rng(17)
    pts = rng.uniform(0, BOX, size=(250, 3))
    df = _points_df(spark, pts)
    rows = neighbor_pairs_3d(df, 1.3, BOX, periodic=periodic).collect()
    got = {(r["a"], r["b"]): r["dist"] for r in rows}
    assert len(rows) == len(got)  # engine must emit each pair ONCE
    want = _brute_pairs(pts, 1.3, periodic=periodic)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_neighbor_pairs_coarse_grid(spark):
    """radius > box/3: the neighbor offsets collapse mod n — pairs must
    still be exact (and unique) on a tiny grid."""
    rng = np.random.default_rng(23)
    pts = rng.uniform(0, BOX, size=(60, 3))
    df = _points_df(spark, pts)
    rows = neighbor_pairs_3d(df, 4.9, BOX).collect()
    got = {(r["a"], r["b"]): r["dist"] for r in rows}
    assert len(rows) == len(got)  # uniqueness even on the collapsed grid
    want = _brute_pairs(pts, 4.9)
    assert set(got) == set(want)


def test_two_point_correlation_uniform_is_flat(spark):
    """A uniform random box has xi(r) ~ 0 in every bin (within shot
    noise); a strongly clustered set has xi >> 0 at small r."""
    rng = np.random.default_rng(31)
    uni = rng.uniform(0, BOX, size=(2000, 3))
    bins = [0.2, 0.5, 1.0, 1.5]
    xi_u = {
        r["bin"]: r["xi"]
        for r in two_point_correlation(_points_df(spark, uni), bins, BOX).collect()
    }
    for b, v in xi_u.items():
        assert abs(v) < 0.35, (b, v)  # shot-noise band at this N

    # 50 clusters of 20 points each, sigma 0.1
    centers = rng.uniform(0, BOX, size=(50, 3))
    cl = np.vstack([c + rng.normal(0, 0.1, size=(20, 3)) for c in centers]) % BOX
    xi_c = {
        r["bin"]: r["xi"]
        for r in two_point_correlation(_points_df(spark, cl), bins, BOX).collect()
    }
    assert xi_c[0] > 20  # huge excess at r < 0.5
    assert xi_c[0] > xi_c[2]  # decreasing with scale


def test_two_point_dd_matches_bruteforce(spark):
    rng = np.random.default_rng(41)
    pts = rng.uniform(0, BOX, size=(400, 3))
    bins = [0.3, 0.8, 1.2]
    out = {r["bin"]: r for r in two_point_correlation(_points_df(spark, pts), bins, BOX).collect()}
    brute = _brute_pairs(pts, 1.2)
    for i in range(len(bins) - 1):
        dd = sum(1 for d in brute.values() if bins[i] <= d < bins[i + 1])
        assert out[i]["dd"] == dd, i
        # analytic RR sanity: shell volume fraction
        n = len(pts)
        shell = 4 / 3 * math.pi * (bins[i + 1] ** 3 - bins[i] ** 3)
        assert out[i]["rr"] == pytest.approx(n * (n - 1) / 2 * shell / BOX**3)


def _brute_fof(pts, ll, box=BOX):
    """Union-find over brute-force pairs."""
    parent = list(range(len(pts)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for (i, j) in _brute_pairs(pts, ll, box=box):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    groups = {}
    for i in range(len(pts)):
        groups.setdefault(find(i), []).append(i)
    # canonical label = min member
    return {i: min(members) for members in groups.values() for i in members}


def test_fof_groups_match_union_find(spark):
    rng = np.random.default_rng(53)
    # clumps + field particles
    centers = rng.uniform(0, BOX, size=(12, 3))
    clumps = np.vstack([c + rng.normal(0, 0.15, size=(15, 3)) for c in centers]) % BOX
    field = rng.uniform(0, BOX, size=(80, 3))
    pts = np.vstack([clumps, field])
    df = _points_df(spark, pts)
    got = {r["id"]: r["group_id"] for r in fof_groups(df, 0.5, BOX).collect()}
    want = _brute_fof(pts, 0.5)
    assert got == want
    # the clumps actually produced non-trivial groups
    sizes = {}
    for g in got.values():
        sizes[g] = sizes.get(g, 0) + 1
    assert max(sizes.values()) >= 10


def test_pair_id_col_rejects_non_unique(spark):
    """A non-unique *_tag id must never silently drive the pair
    engine: fall back to __row_id when persisted, raise otherwise."""
    import pytest as _pytest

    from opencosmo_spark.analysis import _pair_id_col

    class _DS:
        def __init__(self, df):
            self.df = df

    dup = spark.createDataFrame(
        pd.DataFrame({"fof_halo_tag": [1, 1, 2], "x": [0.0, 1.0, 2.0]})
    )
    with _pytest.raises(ValueError, match="no unique id column"):
        _pair_id_col(_DS(dup))

    with_rid = dup.withColumn("__row_id", F.monotonically_increasing_id())
    assert _pair_id_col(_DS(with_rid)) == "__row_id"

    uniq = spark.createDataFrame(
        pd.DataFrame({"fof_halo_tag": [1, 2, 3], "x": [0.0, 1.0, 2.0]})
    )
    assert _pair_id_col(_DS(uniq)) == "fof_halo_tag"

    # a LATER unique id must win over a non-unique first candidate —
    # the particle-table shape (shared halo tag first, own unique
    # particle id second); the probe covers all candidates in one job
    particle = spark.createDataFrame(
        pd.DataFrame(
            {
                "fof_halo_tag": [1, 1, 2],
                "particle_id": [10, 11, 12],
                "x": [0.0, 1.0, 2.0],
            }
        )
    )
    assert _pair_id_col(_DS(particle)) == "particle_id"


def _brute_cross(pa, pb, radius, periodic, box=BOX):
    out = {}
    for i in range(len(pa)):
        for j in range(len(pb)):
            d = np.abs(pa[i] - pb[j])
            if periodic:
                d = np.minimum(d, box - d)
            dist = float(np.sqrt((d**2).sum()))
            if dist <= radius:
                out[(i, j)] = dist
    return out


@pytest.mark.parametrize("periodic", [True, False])
def test_cross_pairs_match_bruteforce(spark, periodic):
    from opencosmo_spark.spatial.pairs import cross_pairs_3d

    rng = np.random.default_rng(31)
    pa = rng.uniform(0, BOX, size=(120, 3))
    pb = rng.uniform(0, BOX, size=(90, 3))
    got = {
        (r["a"], r["b"]): r["dist"]
        for r in cross_pairs_3d(
            _points_df(spark, pa), _points_df(spark, pb), 1.5, BOX,
            periodic=periodic,
        ).collect()
    }
    want = _brute_cross(pa, pb, 1.5, periodic)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_uniform_random_catalog_deterministic_and_uniform(spark):
    from opencosmo_spark.spatial.pairs import uniform_random_catalog

    a = uniform_random_catalog(spark, 2000, BOX, seed=3).toPandas()
    b = uniform_random_catalog(spark, 2000, BOX, seed=3).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("id").reset_index(drop=True),
        b.sort_values("id").reset_index(drop=True),
    )
    c = uniform_random_catalog(spark, 2000, BOX, seed=4).toPandas()
    assert not np.allclose(
        a.sort_values("id").x.to_numpy(), c.sort_values("id").x.to_numpy()
    )
    for col in ("x", "y", "z"):
        v = a[col].to_numpy()
        assert 0 <= v.min() and v.max() < BOX
        assert abs(v.mean() - BOX / 2) < 0.25  # ~3 sigma at n=2000


def test_landy_szalay_uniform_is_flat(spark):
    """On uniform data LS must give xi ~ 0 — the estimator's defining
    property is that geometry/edge effects cancel through the randoms
    even in a NON-periodic box."""
    from opencosmo_spark.spatial.pairs import two_point_landy_szalay

    rng = np.random.default_rng(41)
    pts = rng.uniform(0, BOX, size=(900, 3))
    out = two_point_landy_szalay(
        _points_df(spark, pts), [0.5, 1.0, 1.5, 2.0], BOX,
        n_random=2700, periodic=False,
    ).collect()
    assert [r["bin"] for r in out] == [0, 1, 2]
    for r in out:
        assert r["dd"] > 0 and r["rr"] > 0
        assert abs(r["xi"]) < 0.25, (r["bin"], r["xi"])


def test_landy_szalay_detects_clustering(spark):
    """Tight clumps must produce strongly positive xi in the
    small-separation bin, and the LS value must agree with a numpy
    recomputation from the same raw counts."""
    from opencosmo_spark.spatial.pairs import two_point_landy_szalay

    rng = np.random.default_rng(43)
    centers = rng.uniform(1, BOX - 1, size=(25, 3))
    pts = np.vstack(
        [c + rng.normal(0, 0.08, size=(20, 3)) for c in centers]
    ).clip(0, BOX - 1e-9)
    nd = len(pts)
    nr = 2 * nd
    out = two_point_landy_szalay(
        _points_df(spark, pts), [0.2, 0.6, 3.0], BOX,
        n_random=nr, periodic=False,
    ).collect()
    r0 = out[0]
    assert r0["xi"] > 5.0  # strong small-scale clustering
    ddn = r0["dd"] / (nd * (nd - 1) / 2)
    drn = r0["dr"] / (nd * nr)
    rrn = r0["rr"] / (nr * (nr - 1) / 2)
    assert r0["xi"] == pytest.approx((ddn - 2 * drn + rrn) / rrn, rel=1e-12)


def test_precompute_rr_sweep_runs_rr_join_once(spark, monkeypatch):
    """A two-call bin-edge sweep sharing a precompute_rr artifact must
    build the RR pair join exactly once (spied at the operator level),
    with estimator values identical to the self-contained path."""
    import opencosmo_spark.spatial.pairs as pairs_mod
    from opencosmo_spark.spatial.pairs import (
        precompute_rr,
        release_rr,
        two_point_landy_szalay,
    )

    rng = np.random.default_rng(47)
    pts = rng.uniform(0, BOX, size=(400, 3))
    df = _points_df(spark, pts)
    nr = 800

    calls = []
    orig = pairs_mod.neighbor_pairs_3d

    def spy(d, *a, **k):
        calls.append(1)
        return orig(d, *a, **k)

    monkeypatch.setattr(pairs_mod, "neighbor_pairs_3d", spy)

    rr = precompute_rr(spark, rmax=2.0, box_size=BOX, n_random=nr)
    assert len(calls) == 1  # the one RR join, built here

    bins_a = [0.5, 1.0, 2.0]
    bins_b = [0.25, 0.75, 1.25, 2.0]  # different edges, same artifact
    got_a = two_point_landy_szalay(df, bins_a, BOX, rr=rr).collect()
    got_b = two_point_landy_szalay(df, bins_b, BOX, rr=rr).collect()
    # 1 (precompute RR) + 2 (one DD per estimator call): the sweep
    # added NO further RR joins
    assert len(calls) == 3

    monkeypatch.setattr(pairs_mod, "neighbor_pairs_3d", orig)
    plain_a = two_point_landy_szalay(df, bins_a, BOX, n_random=nr).collect()
    assert [tuple(r) for r in got_a] == [tuple(r) for r in plain_a]
    assert all(r["rr"] > 0 for r in got_b)
    release_rr(rr)


def test_precompute_rr_mismatch_is_refused(spark):
    """An artifact silently mismatched to the call would produce a
    WRONG xi, not an error — every axis must validate up front."""
    from opencosmo_spark.spatial.pairs import (
        precompute_rr,
        release_rr,
        two_point_landy_szalay,
    )

    rng = np.random.default_rng(49)
    df = _points_df(spark, rng.uniform(0, BOX, size=(50, 3)))
    rr = precompute_rr(spark, rmax=1.0, box_size=BOX, n_random=100)
    with pytest.raises(ValueError, match="rmax"):
        two_point_landy_szalay(df, [0.5, 2.0], BOX, rr=rr)
    with pytest.raises(ValueError, match="box_size"):
        two_point_landy_szalay(df, [0.5, 1.0], BOX * 2, rr=rr)
    with pytest.raises(ValueError, match="periodic"):
        two_point_landy_szalay(df, [0.5, 1.0], BOX, periodic=True, rr=rr)
    with pytest.raises(ValueError, match="kind"):
        two_point_landy_szalay(df, [0.5, 1.0], BOX, rr={**rr, "kind": "sky"})
    release_rr(rr)


def test_stacked_radial_profile_bruteforce_and_physics(spark):
    """Profile counts equal the all-pairs python twin bin-for-bin; a
    planted overdense clump around every center shows up as a high
    inner overdensity, and the outer bins approach the box mean."""
    import numpy as np

    from opencosmo_spark.spatial.pairs import stacked_radial_profile

    rng = np.random.default_rng(13)
    box = 60.0
    centers = rng.uniform(0, box, size=(6, 3))
    # background + a clump of 40 particles within r<2 of each center
    bg = rng.uniform(0, box, size=(1500, 3))
    clumps = np.concatenate(
        [
            (c + rng.normal(0, 0.8, size=(40, 3))) % box
            for c in centers
        ]
    )
    parts = np.concatenate([bg, clumps])
    cdf = spark.createDataFrame(
        [(i, *map(float, c)) for i, c in enumerate(centers)],
        ["id", "x", "y", "z"],
    )
    pdf = spark.createDataFrame(
        [(i, *map(float, p)) for i, p in enumerate(parts)],
        ["id", "x", "y", "z"],
    )
    bins = [0.0, 2.0, 5.0, 10.0]
    prof = {
        r["bin"]: r
        for r in stacked_radial_profile(
            cdf, pdf, bins, box
        ).collect()
    }
    # brute-force twin with periodic minimum image
    def pdist(a, b):
        d = np.abs(a - b)
        d = np.minimum(d, box - d)
        return np.sqrt((d**2).sum())

    want = [0, 0, 0]
    for c in centers:
        for p in parts:
            r = pdist(c, p)
            for i in range(3):
                if bins[i] <= r < bins[i + 1]:
                    want[i] += 1
    assert [prof[i]["n_pairs"] for i in range(3)] == want
    # physics: inner bin strongly overdense, outer bin near the mean
    assert prof[0]["overdensity"] > 5.0
    assert abs(prof[2]["overdensity"]) < 1.0
    # mass-weighted with unit masses reproduces the counts
    pmdf = pdf.withColumn("m", F.lit(1.0))
    prof_m = {
        r["bin"]: r
        for r in stacked_radial_profile(
            cdf, pmdf, bins, box, mass_col="m"
        ).collect()
    }
    assert [prof_m[i]["mass"] for i in range(3)] == [float(w) for w in want]


def test_stacked_value_profile_matches_bruteforce(spark):
    """Per-bin mean/std of a particle value over stacked shells equals
    the all-pairs python twin."""
    import numpy as np

    from opencosmo_spark.spatial.pairs import stacked_value_profile

    rng = np.random.default_rng(17)
    box = 40.0
    centers = rng.uniform(0, box, size=(4, 3))
    parts = rng.uniform(0, box, size=(800, 3))
    vals = rng.normal(5.0, 2.0, size=800)
    cdf = spark.createDataFrame(
        [(i, *map(float, c)) for i, c in enumerate(centers)],
        ["id", "x", "y", "z"],
    )
    pdf = spark.createDataFrame(
        [(i, *map(float, p), float(v)) for i, (p, v) in enumerate(zip(parts, vals))],
        ["id", "x", "y", "z", "vel"],
    )
    bins = [0.0, 5.0, 10.0]
    got = {
        r["bin"]: r
        for r in stacked_value_profile(
            cdf, pdf, bins, box, value_col="vel"
        ).collect()
    }

    def pdist(a, b):
        d = np.abs(a - b)
        d = np.minimum(d, box - d)
        return np.sqrt((d**2).sum())

    buckets = {0: [], 1: []}
    for c in centers:
        for p, v in zip(parts, vals):
            r = pdist(c, p)
            for i in range(2):
                if bins[i] <= r < bins[i + 1]:
                    buckets[i].append(v)
    for i in range(2):
        want = np.array(buckets[i])
        assert got[i]["n"] == len(want)
        assert got[i]["mean"] == pytest.approx(want.mean(), abs=1e-9)
        assert got[i]["std"] == pytest.approx(want.std(), abs=1e-9)


def test_projected_correlation_bruteforce_and_poisson(spark):
    """wp(rp) DD cells match the all-pairs python twin exactly, the
    estimator formula agrees to 1e-9, and a Poisson box gives wp ~ 0
    while a z-axis filament shows strong small-rp signal."""
    import numpy as np

    from opencosmo_spark.spatial.pairs import projected_correlation

    box = 50.0
    rng = np.random.default_rng(23)
    pts = rng.uniform(0, box, size=(900, 3))
    # a line-of-sight filament: tight in (x, y), extended in z
    fil = np.column_stack(
        [
            np.full(120, 10.0) + rng.normal(0, 0.3, 120),
            np.full(120, 20.0) + rng.normal(0, 0.3, 120),
            rng.uniform(0, box, 120),
        ]
    ) % box
    allpts = np.concatenate([pts, fil])
    df = spark.createDataFrame(
        [(i, *map(float, p)) for i, p in enumerate(allpts)],
        ["id", "x", "y", "z"],
    )
    rp_bins = [0.0, 1.0, 4.0, 10.0]
    pi_max = 8.0
    n_pi = 4
    got = {
        r["bin"]: r
        for r in projected_correlation(
            df, rp_bins, pi_max, box, n_pi_bins=n_pi
        ).collect()
    }

    # twin: identical estimator over brute-force pairs
    n = len(allpts)
    d = np.abs(allpts[:, None, :] - allpts[None, :, :])
    d = np.minimum(d, box - d)
    rp = np.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2)
    pi = d[..., 2]
    iu = np.triu_indices(n, 1)
    rp, pi = rp[iu], pi[iu]
    d_pi = pi_max / n_pi
    total_pairs = n * (n - 1) / 2
    for i in range(3):
        lo, hi = rp_bins[i], rp_bins[i + 1]
        sel = (rp >= lo) & (rp < hi) & (pi < pi_max)
        assert got[i]["dd"] == int(sel.sum())
        wp = 0.0
        area = np.pi * (hi**2 - lo**2)
        for j in range(n_pi):
            dd = int(
                (sel & (np.minimum((pi / d_pi).astype(int), n_pi - 1) == j)).sum()
            )
            rr = total_pairs * area * 2 * d_pi / box**3
            wp += (dd / rr - 1.0) * 2 * d_pi
        assert got[i]["wp"] == pytest.approx(wp, abs=1e-9)
    # physics: the filament dominates the smallest rp bin
    assert got[0]["wp"] > 5 * abs(got[2]["wp"])


def test_correlation_multipoles_bruteforce_and_anisotropy(spark):
    """xi_0/xi_2(s) equal the all-pairs twin to 1e-9; an isotropic
    clustered field has xi_2 ~ 0, and squashing structures along the
    line of sight drives xi_2 negative at small s (the Kaiser-like
    signature the statistic exists to detect)."""
    import numpy as np

    from opencosmo_spark.spatial.pairs import correlation_multipoles

    box = 50.0
    rng = np.random.default_rng(29)

    def clumpy(flatten_z):
        field = rng.uniform(0, box, size=(700, 3))
        cents = rng.uniform(0, box, size=(10, 3))
        sig = np.array([1.5, 1.5, 1.5 * flatten_z])
        clumps = np.concatenate(
            [(c + rng.normal(0, 1, size=(60, 3)) * sig) % box for c in cents]
        )
        return np.concatenate([field, clumps])

    iso = clumpy(1.0)
    df = spark.createDataFrame(
        [(i, *map(float, p)) for i, p in enumerate(iso)],
        ["id", "x", "y", "z"],
    )
    s_bins = [0.5, 3.0, 8.0]
    got = {
        r["bin"]: r
        for r in correlation_multipoles(df, s_bins, box).collect()
    }

    # brute twin with the identical estimator
    n = len(iso)
    d = np.abs(iso[:, None, :] - iso[None, :, :])
    d = np.minimum(d, box - d)
    dist = np.sqrt((d**2).sum(-1))
    iu = np.triu_indices(n, 1)
    dist, dz = dist[iu], d[..., 2][iu]
    total = n * (n - 1) / 2
    for i in range(2):
        lo, hi = s_bins[i], s_bins[i + 1]
        sel = (dist >= lo) & (dist < hi)
        mu = dz[sel] / dist[sel]
        rr = total * 4 / 3 * np.pi * (hi**3 - lo**3) / box**3
        xi0 = mu.size / rr - 1.0
        xi2 = 5.0 * ((3 * mu**2 - 1) / 2).sum() / rr
        assert got[i]["dd"] == mu.size
        assert got[i]["xi_0"] == pytest.approx(xi0, abs=1e-9)
        assert got[i]["xi_2"] == pytest.approx(xi2, abs=1e-9)
    # isotropic: strong monopole, small quadrupole at small s
    assert got[0]["xi_0"] > 3.0
    assert abs(got[0]["xi_2"]) < 0.5 * got[0]["xi_0"]

    # anisotropic (z-flattened clumps): negative quadrupole
    flat = clumpy(0.25)
    df2 = spark.createDataFrame(
        [(i, *map(float, p)) for i, p in enumerate(flat)],
        ["id", "x", "y", "z"],
    )
    got2 = {
        r["bin"]: r
        for r in correlation_multipoles(df2, s_bins, box).collect()
    }
    assert got2[0]["xi_2"] < -0.5


def test_pairwise_velocity_bruteforce_and_infall(spark):
    """v12(r) bin-for-bin vs an all-pairs numpy twin (minimum image),
    plus physics: a planted radial-infall flow drives v12 negative at
    clump scales while a static field gives exactly 0."""
    from opencosmo_spark.spatial.pairs import pairwise_velocity

    rng = np.random.default_rng(23)
    n = 220
    pts = rng.uniform(0, BOX, size=(n, 3))
    vel = rng.normal(0, 50.0, size=(n, 3))
    df = spark.createDataFrame(
        [
            Row(
                id=i,
                x=float(p[0]), y=float(p[1]), z=float(p[2]),
                vx=float(v[0]), vy=float(v[1]), vz=float(v[2]),
            )
            for i, (p, v) in enumerate(zip(pts, vel))
        ]
    )
    bins = [0.0, 1.0, 2.0, 3.0]
    got = pairwise_velocity(df, bins, BOX).toPandas().set_index("bin")

    # all-pairs twin
    sums = np.zeros(3)
    sqs = np.zeros(3)
    cnt = np.zeros(3, dtype=int)
    for i in range(n):
        for j in range(i + 1, n):
            d = pts[i] - pts[j]
            d -= BOX * np.round(d / BOX)
            dist = float(np.sqrt((d**2).sum()))
            if dist <= 0 or dist >= bins[-1]:
                continue
            b = int(np.searchsorted(bins, dist, side="right")) - 1
            v12 = float(np.dot(vel[i] - vel[j], d) / dist)
            sums[b] += v12
            sqs[b] += v12 * v12
            cnt[b] += 1
    for b in range(3):
        assert got.loc[b, "n_pairs"] == cnt[b]
        if cnt[b]:
            mean = sums[b] / cnt[b]
            std = math.sqrt(max(sqs[b] / cnt[b] - mean * mean, 0.0))
            assert got.loc[b, "v12_mean"] == pytest.approx(mean, abs=1e-8)
            assert got.loc[b, "v12_std"] == pytest.approx(std, abs=1e-7)

    # physics: velocities pointing at a common center -> pure infall
    center = np.array([5.0, 5.0, 5.0])
    cpts = center + rng.normal(0, 0.8, size=(80, 3))
    cvel = (center - cpts) * 10.0  # each point falls toward the center
    cdf = spark.createDataFrame(
        [
            Row(id=i, x=float(p[0]), y=float(p[1]), z=float(p[2]),
                vx=float(v[0]), vy=float(v[1]), vz=float(v[2]))
            for i, (p, v) in enumerate(zip(cpts, cvel))
        ]
    )
    infall = (
        pairwise_velocity(cdf, [0.0, 1.0, 2.0], BOX)
        .toPandas().set_index("bin")
    )
    assert infall.loc[0, "v12_mean"] < -1.0
    assert infall.loc[1, "v12_mean"] < -1.0

    # static field: v12 identically zero
    static = (
        pairwise_velocity(
            cdf.withColumn("vx", F.lit(0.0))
            .withColumn("vy", F.lit(0.0))
            .withColumn("vz", F.lit(0.0)),
            [0.0, 1.0, 2.0], BOX,
        ).toPandas().set_index("bin")
    )
    assert (static.v12_mean == 0.0).all()
    assert (static.v12_std == 0.0).all()


def test_marked_correlation_bruteforce_and_null(spark):
    """M(r) vs an all-pairs twin; constant marks give exactly M = 1
    (the shuffled-mark null), clump-concentrated marks give M > 1 at
    clump scales; degenerate marks refuse loudly."""
    from opencosmo_spark.spatial.pairs import marked_correlation

    rng = np.random.default_rng(31)
    n = 200
    pts = rng.uniform(0, BOX, size=(n, 3))
    marks = rng.uniform(0.5, 2.0, size=n)
    df = spark.createDataFrame(
        [
            Row(id=i, x=float(p[0]), y=float(p[1]), z=float(p[2]),
                m=float(w))
            for i, (p, w) in enumerate(zip(pts, marks))
        ]
    )
    bins = [0.0, 1.0, 2.0]
    got = (
        marked_correlation(df, bins, BOX, mark_col="m")
        .toPandas().set_index("bin")
    )
    wbar = marks.mean()
    dd = np.zeros(2, dtype=int)
    ww = np.zeros(2)
    for i in range(n):
        for j in range(i + 1, n):
            d = pts[i] - pts[j]
            d -= BOX * np.round(d / BOX)
            dist = float(np.sqrt((d**2).sum()))
            if dist >= bins[-1]:
                continue
            b = int(np.searchsorted(bins, dist, side="right")) - 1
            dd[b] += 1
            ww[b] += marks[i] * marks[j]
    for b in range(2):
        assert got.loc[b, "dd"] == dd[b]
        assert got.loc[b, "ww"] == pytest.approx(ww[b], abs=1e-8)
        assert got.loc[b, "mcf"] == pytest.approx(
            ww[b] / (dd[b] * wbar * wbar), abs=1e-8
        )

    # constant marks -> M(r) == 1 exactly where pairs exist
    const = (
        marked_correlation(
            df.withColumn("m", F.lit(3.0)), bins, BOX, mark_col="m"
        ).toPandas().set_index("bin")
    )
    assert (const[const.dd > 0].mcf == 1.0).all()

    # clump members carry big marks -> small-r M(r) > 1
    clump = np.array([5.0, 5.0, 5.0]) + rng.normal(0, 0.4, size=(40, 3))
    allpts = np.vstack([pts, clump])
    allmarks = np.concatenate([marks, np.full(40, 10.0)])
    big = spark.createDataFrame(
        [
            Row(id=i, x=float(p[0]), y=float(p[1]), z=float(p[2]),
                m=float(w))
            for i, (p, w) in enumerate(zip(allpts, allmarks))
        ]
    )
    sig = (
        marked_correlation(big, [0.0, 1.0], BOX, mark_col="m")
        .toPandas().set_index("bin")
    )
    assert sig.loc[0, "mcf"] > 2.0

    with pytest.raises(ValueError, match="mean mark is 0"):
        marked_correlation(
            df.withColumn("m", F.lit(0.0)), bins, BOX, mark_col="m"
        )
    with pytest.raises(ValueError, match="empty"):
        marked_correlation(
            df.filter(F.lit(False)), bins, BOX, mark_col="m"
        )


def test_fit_nfw_recovers_planted_profile(spark):
    """fit_nfw recovers rho_s/r_s from a sampled NFW halo through the
    REAL stacked_radial_profile pipeline, and from a clean synthetic
    profile exactly; loud errors on wrong schema / too-few bins."""
    import pandas as pd

    from opencosmo_spark.analysis import fit_nfw
    from opencosmo_spark.spatial.pairs import stacked_radial_profile

    # clean synthetic profile: exact NFW evaluated at bin mids
    rho_s, r_s = 5000.0, 0.6
    edges = np.geomspace(0.05, 4.0, 16)
    mids = (edges[:-1] + edges[1:]) / 2
    dens = rho_s / ((mids / r_s) * (1 + mids / r_s) ** 2)
    prof = pd.DataFrame(
        {"r_lo": edges[:-1], "r_hi": edges[1:], "mean_density": dens}
    )
    fit = fit_nfw(prof, r_delta=2.0)
    assert fit["r_s"] == pytest.approx(r_s, rel=0.05)
    assert fit["rho_s"] == pytest.approx(rho_s, rel=0.15)
    assert fit["concentration"] == pytest.approx(2.0 / r_s, rel=0.05)
    assert fit["log_rms"] < 0.02

    # end-to-end: sample particles from an NFW cumulative-mass profile
    # around one center, run the distributed profile, fit it
    rng = np.random.default_rng(11)
    n_p = 6000
    # inverse-CDF sampling of M(<r) ∝ ln(1+x) - x/(1+x), x = r/r_s
    xs = np.geomspace(1e-3, 5.0 / 0.5, 4000)
    m = np.log1p(xs) - xs / (1 + xs)
    u = rng.uniform(0, m[-1], n_p)
    x = np.interp(u, m, xs)
    radii = x * 0.5  # planted r_s = 0.5
    dirs = rng.normal(size=(n_p, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    center = np.array([5.0, 5.0, 5.0])
    pts = center + dirs * radii[:, None]
    pts = np.mod(pts, BOX)
    centers = spark.createDataFrame([Row(id=0, x=5.0, y=5.0, z=5.0)])
    parts = spark.createDataFrame(
        [
            Row(id=i, x=float(p[0]), y=float(p[1]), z=float(p[2]))
            for i, p in enumerate(pts)
        ]
    )
    prof_df = stacked_radial_profile(
        centers, parts, list(np.geomspace(0.05, 2.5, 14)), BOX
    )
    fit2 = fit_nfw(prof_df)
    assert fit2["r_s"] == pytest.approx(0.5, rel=0.35)  # sampled, noisy
    assert fit2["log_rms"] < 0.5

    with pytest.raises(ValueError, match="needs columns"):
        fit_nfw(pd.DataFrame({"r": [1.0], "rho": [1.0]}))
    with pytest.raises(ValueError, match=">= 3 non-empty"):
        fit_nfw(
            pd.DataFrame(
                {"r_lo": [0.1, 0.2], "r_hi": [0.2, 0.3],
                 "mean_density": [1.0, 0.0]}
            )
        )


def test_two_point_jackknife_exact_twin_and_consistency(spark):
    """Jackknife xi/err vs an exact python twin (same definitions,
    brute-force pairs), point-estimate identical to
    two_point_correlation, and the planted-clustering signal exceeds
    its own jackknife error."""
    from opencosmo_spark.spatial.pairs import (
        two_point_correlation,
        two_point_jackknife,
    )

    rng = np.random.default_rng(41)
    pts = rng.uniform(0, BOX, size=(300, 3))
    df = _points_df(spark, pts)
    bins = [0.5, 1.5, 2.5]
    n_side = 2
    got = (
        two_point_jackknife(df, bins, BOX, n_side=n_side)
        .toPandas().set_index("bin")
    )

    # python twin
    blk = BOX / n_side
    bid = (
        (np.minimum(np.floor(pts[:, 0] / blk), n_side - 1) * n_side
         + np.minimum(np.floor(pts[:, 1] / blk), n_side - 1)) * n_side
        + np.minimum(np.floor(pts[:, 2] / blk), n_side - 1)
    ).astype(int)
    n = len(pts)
    k3 = n_side**3
    dd = np.zeros(2, dtype=int)
    touch = np.zeros((k3, 2), dtype=int)
    for i in range(n):
        for j in range(i + 1, n):
            d = pts[i] - pts[j]
            d -= BOX * np.round(d / BOX)
            dist = float(np.sqrt((d**2).sum()))
            if not (bins[0] <= dist < bins[-1]):
                continue
            b = 0 if dist < bins[1] else 1
            dd[b] += 1
            touch[bid[i]][b] += 1
            if bid[j] != bid[i]:
                touch[bid[j]][b] += 1
    vbox = BOX**3
    for b in range(2):
        shell = 4 / 3 * math.pi * (bins[b + 1] ** 3 - bins[b] ** 3)
        rr = n * (n - 1) / 2 * shell / vbox
        xi = dd[b] / rr - 1
        assert got.loc[b, "dd"] == dd[b]
        assert got.loc[b, "xi"] == pytest.approx(xi, abs=1e-9)
        xis = []
        for k in range(k3):
            n_k = n - int((bid == k).sum())
            rr_k = n_k * (n_k - 1) / 2 * shell / vbox
            xis.append((dd[b] - touch[k][b]) / rr_k - 1)
        mean = np.mean(xis)
        err = math.sqrt((k3 - 1) / k3 * ((np.array(xis) - mean) ** 2).sum())
        assert got.loc[b, "xi_err"] == pytest.approx(err, abs=1e-9)
        assert got.loc[b, "n_jackknife"] == k3

    # point estimate identical to the plain estimator
    plain = two_point_correlation(df, bins, BOX).toPandas().set_index("bin")
    for b in range(2):
        assert got.loc[b, "xi"] == pytest.approx(
            plain.loc[b, "xi"], abs=1e-9
        )

    # clustering detected ABOVE its own error bar: clumped catalog
    centers = rng.uniform(1, BOX - 1, size=(30, 3))
    clumped = np.vstack(
        [c + rng.normal(0, 0.3, size=(12, 3)) for c in centers]
    )
    cdf = _points_df(spark, np.mod(clumped, BOX))
    cj = (
        two_point_jackknife(cdf, [0.1, 1.0, 3.0], BOX, n_side=3)
        .toPandas().set_index("bin")
    )
    assert cj.loc[0, "xi"] > 3 * cj.loc[0, "xi_err"] > 0

    with pytest.raises(ValueError, match="n_side"):
        two_point_jackknife(df, bins, BOX, n_side=1)


def test_apply_rsd_shift_and_kaiser_sign(spark):
    """RSD mapping: exact per-row shift with periodic wrap, and the
    physics — coherent infall along the line of sight drives the
    quadrupole of the shifted field negative while the real-space
    field has xi_2 ~ 0."""
    from opencosmo_spark.spatial.pairs import (
        apply_rsd,
        correlation_multipoles,
    )

    rng = np.random.default_rng(47)
    pts = rng.uniform(0, BOX, size=(120, 3))
    vel = rng.normal(0, 30.0, size=(120, 3))
    df = spark.createDataFrame(
        [
            Row(id=i, x=float(p[0]), y=float(p[1]), z=float(p[2]),
                vx=float(v[0]), vy=float(v[1]), vz=float(v[2]))
            for i, (p, v) in enumerate(zip(pts, vel))
        ]
    )
    out = (
        apply_rsd(df, BOX, hubble=100.0)
        .toPandas().set_index("id").sort_index()
    )
    want = np.mod(pts[:, 2] + vel[:, 2] / 100.0, BOX)
    assert np.allclose(out.z.to_numpy(), want, atol=1e-12)
    # untouched axes
    assert np.allclose(out.x.to_numpy(), pts[:, 0])
    assert np.allclose(out.y.to_numpy(), pts[:, 1])

    with pytest.raises(ValueError, match="axis"):
        apply_rsd(df, BOX, 100.0, axis=3)
    with pytest.raises(ValueError, match="positive"):
        apply_rsd(df, BOX, -1.0)

    # physics: clumps whose members stream toward the clump center
    # along z only -> z-extent squashes -> negative quadrupole
    centers = rng.uniform(5, BOX - 5, size=(25, 3))
    members = np.concatenate(
        [c + rng.normal(0, 1.2, size=(16, 3)) for c in centers]
    )
    cvz = np.concatenate(
        [-(members[i * 16:(i + 1) * 16, 2] - c[2]) * 60.0
         for i, c in enumerate(centers)]
    )
    cdf = spark.createDataFrame(
        [
            Row(id=i, x=float(p[0]), y=float(p[1]), z=float(p[2]),
                vx=0.0, vy=0.0, vz=float(vz))
            for i, (p, vz) in enumerate(zip(np.mod(members, BOX), cvz))
        ]
    )
    bins = [2.0, 6.0]
    real = correlation_multipoles(cdf, bins, BOX, ells=(0, 2)).collect()[0]
    shifted = correlation_multipoles(
        apply_rsd(cdf, BOX, hubble=100.0), bins, BOX, ells=(0, 2)
    ).collect()[0]
    assert shifted["xi_2"] < real["xi_2"] - 0.1


def test_stacked_delta_sigma_bruteforce_and_physics(spark):
    """Delta-Sigma vs an exact all-pairs twin (counts, sigma, the
    cumulative mean including the core), ~0 on a uniform field, and
    positive declining excess around planted clumps."""
    from opencosmo_spark.spatial.pairs import stacked_delta_sigma

    rng = np.random.default_rng(53)
    cen = rng.uniform(0, BOX, size=(6, 3))
    parts = rng.uniform(0, BOX, size=(800, 3))
    masses = rng.uniform(0.5, 2.0, size=800)
    cdf = _points_df(spark, cen)
    pdf_rows = [
        Row(id=i, x=float(p[0]), y=float(p[1]), z=float(p[2]),
            m=float(w))
        for i, (p, w) in enumerate(zip(parts, masses))
    ]
    pdf = spark.createDataFrame(pdf_rows)
    rp_bins = [0.5, 1.5, 3.0]
    pi_max = 2.0
    got = (
        stacked_delta_sigma(
            cdf, pdf, rp_bins, BOX, pi_max, mass_col="m"
        ).toPandas().set_index("bin")
    )

    # exact twin over full edges [0, .5, 1.5, 3]
    full = [0.0] + rp_bins
    nb = len(full) - 1
    cnt = np.zeros(nb, dtype=int)
    mass = np.zeros(nb)
    for ci in range(len(cen)):
        for pi_ in range(len(parts)):
            d = cen[ci] - parts[pi_]
            d -= BOX * np.round(d / BOX)
            rp = math.hypot(d[0], d[1])
            if abs(d[2]) > pi_max or math.sqrt((d**2).sum()) > math.sqrt(
                rp_bins[-1] ** 2 + pi_max**2
            ):
                continue
            for b in range(nb):
                if full[b] <= rp < full[b + 1]:
                    cnt[b] += 1
                    mass[b] += masses[pi_]
    ncen = len(cen)
    cum_m = np.cumsum(mass)
    areas = np.array(
        [math.pi * (full[i + 1] ** 2 - full[i] ** 2) for i in range(nb)]
    )
    cum_a = np.cumsum(areas)
    for b in range(1, nb):  # output bins skip the core
        o = b - 1
        assert got.loc[o, "n_pairs"] == cnt[b]
        assert got.loc[o, "mass"] == pytest.approx(mass[b], abs=1e-8)
        sigma = mass[b] / (ncen * areas[b])
        sigma_bar = cum_m[b] / (ncen * cum_a[b])
        assert got.loc[o, "sigma"] == pytest.approx(sigma, abs=1e-8)
        assert got.loc[o, "sigma_bar"] == pytest.approx(sigma_bar, abs=1e-8)
        assert got.loc[o, "delta_sigma"] == pytest.approx(
            sigma_bar - sigma, abs=1e-8
        )

    # physics: clumps centered ON the centers -> strong positive,
    # declining Delta-Sigma
    clump = np.concatenate(
        [c + rng.normal(0, 0.3, size=(150, 3)) for c in cen]
    )
    all_parts = _points_df(spark, np.mod(np.vstack([parts, clump]), BOX))
    sig = (
        stacked_delta_sigma(
            cdf, all_parts, [0.5, 1.0, 2.0, 3.0], BOX, pi_max
        ).toPandas().set_index("bin")
    )
    assert sig.loc[0, "delta_sigma"] > 0
    assert sig.loc[0, "delta_sigma"] > sig.loc[2, "delta_sigma"]

    with pytest.raises(ValueError, match="exceeds half the box"):
        stacked_delta_sigma(cdf, pdf, [0.5, 4.9], BOX, 4.9)
    with pytest.raises(ValueError, match="pi_max"):
        stacked_delta_sigma(cdf, pdf, rp_bins, BOX, 0.0)
