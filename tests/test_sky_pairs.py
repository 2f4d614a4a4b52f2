"""sky_pairs / uniform sky randoms / w(theta) vs numpy brute force."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row

from opencosmo_spark.spatial.crossmatch import (
    sky_pairs,
    uniform_sky_catalog,
    w_theta_landy_szalay,
)


def _sky_df(spark, ra, dec):
    return spark.createDataFrame(
        [Row(id=i, ra=float(r), dec=float(d)) for i, (r, d) in enumerate(zip(ra, dec))]
    )


def _sep_deg(ra1, dec1, ra2, dec2):
    r1, d1, r2, d2 = map(np.radians, (ra1, dec1, ra2, dec2))
    a = (
        np.sin((d2 - d1) / 2) ** 2
        + np.cos(d1) * np.cos(d2) * np.sin((r2 - r1) / 2) ** 2
    )
    return np.degrees(2 * np.arcsin(np.minimum(np.sqrt(a), 1.0)))


def _uniform_sphere(rng, n):
    ra = rng.uniform(0, 360, n)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    return ra, dec


def test_sky_self_pairs_match_bruteforce(spark):
    rng = np.random.default_rng(61)
    ra, dec = _uniform_sphere(rng, 300)
    # force coverage of the polar caps and the RA wrap seam
    ra[:3], dec[:3] = [0.05, 359.95, 120.0], [89.5, 89.4, -89.3]
    rows = sky_pairs(_sky_df(spark, ra, dec), None, 8.0).collect()
    got = {(r["a"], r["b"]): r["sep_deg"] for r in rows}
    assert len(rows) == len(got)  # one row per pair, poles included
    want = {}
    for i in range(len(ra)):
        for j in range(i + 1, len(ra)):
            s = _sep_deg(ra[i], dec[i], ra[j], dec[j])
            if s <= 8.0:
                want[(i, j)] = s
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_sky_cross_pairs_match_bruteforce(spark):
    rng = np.random.default_rng(67)
    ra1, dec1 = _uniform_sphere(rng, 150)
    ra2, dec2 = _uniform_sphere(rng, 120)
    got = {
        (r["a"], r["b"]): r["sep_deg"]
        for r in sky_pairs(
            _sky_df(spark, ra1, dec1), _sky_df(spark, ra2, dec2), 6.0
        ).collect()
    }
    want = {}
    for i in range(len(ra1)):
        for j in range(len(ra2)):
            s = _sep_deg(ra1[i], dec1[i], ra2[j], dec2[j])
            if s <= 6.0:
                want[(i, j)] = s
    assert set(got) == set(want)


def test_uniform_sky_catalog_is_equal_area(spark):
    cat = uniform_sky_catalog(spark, 4000, seed=2).toPandas()
    again = uniform_sky_catalog(spark, 4000, seed=2).toPandas()
    pd.testing.assert_frame_equal(
        cat.sort_values("id").reset_index(drop=True),
        again.sort_values("id").reset_index(drop=True),
    )
    # equal-area: sin(dec) uniform in [-1, 1], so mean ~ 0 and the
    # |dec| < 30 band holds ~half the points
    s = np.sin(np.radians(cat.dec.to_numpy()))
    assert abs(s.mean()) < 0.05
    frac = (np.abs(cat.dec) < 30).mean()
    assert abs(frac - 0.5) < 0.04
    assert 0 <= cat.ra.min() and cat.ra.max() < 360


def test_w_theta_uniform_is_flat(spark):
    rng = np.random.default_rng(71)
    ra, dec = _uniform_sphere(rng, 800)
    out = w_theta_landy_szalay(
        _sky_df(spark, ra, dec), [1.0, 3.0, 6.0], n_random=2400
    ).collect()
    assert [r["bin"] for r in out] == [0, 1]
    for r in out:
        assert r["dd"] > 0 and r["rr"] > 0
        assert abs(r["w"]) < 0.25, (r["bin"], r["w"])


def test_w_theta_detects_clustering(spark):
    rng = np.random.default_rng(73)
    cra, cdec = _uniform_sphere(rng, 30)
    ra = np.concatenate([c + rng.normal(0, 0.15, 20) for c in cra]) % 360
    dec = np.concatenate(
        [c + rng.normal(0, 0.15, 20) for c in cdec]
    ).clip(-89.9, 89.9)
    nd = len(ra)
    nr = 2 * nd
    out = w_theta_landy_szalay(
        _sky_df(spark, ra, dec), [0.1, 0.5, 5.0], n_random=nr
    ).collect()
    r0 = out[0]
    assert r0["w"] > 5.0
    ddn = r0["dd"] / (nd * (nd - 1) / 2)
    drn = r0["dr"] / (nd * nr)
    rrn = r0["rr"] / (nr * (nr - 1) / 2)
    assert r0["w"] == pytest.approx((ddn - 2 * drn + rrn) / rrn, rel=1e-12)


def test_w_theta_dataset_entry(spark, fixtures):
    """Dataset-level w_theta: RA/Dec and the id column resolve from a
    lightcone dataset the way sky regions resolve them."""
    import opencosmo_spark as oc
    from opencosmo_spark.analysis import w_theta

    lc = oc.open(f"{fixtures}/lightcone")
    # the WHOLE synthetic lightcone is uniform on the sphere -> w ~ 0.
    # (A pixel-ordered take(at="start") would grab a contiguous sky
    # patch and w against full-sky randoms would be large — that is
    # the footprint caveat the estimator documents, not a bug.)
    out = w_theta(lc, [2.0, 5.0], n_random=4000).collect()
    assert [r["bin"] for r in out] == [0]
    assert out[0]["dd"] > 0 and out[0]["rr"] > 0
    assert abs(out[0]["w"]) < 0.3


def test_sky_fof_groups_match_union_find(spark):
    """Angular FoF vs union-find over brute-force sky pairs, with
    clumps planted near a pole and across the RA seam."""
    from opencosmo_spark.spatial.crossmatch import sky_fof_groups

    rng = np.random.default_rng(83)
    cra, cdec = _uniform_sphere(rng, 10)
    cra[0], cdec[0] = 359.9, 0.0      # straddles the RA seam
    cra[1], cdec[1] = 10.0, 88.5      # near-polar clump
    ra = np.concatenate([c + rng.normal(0, 0.2, 8) for c in cra]) % 360
    dec = np.concatenate(
        [c + rng.normal(0, 0.2, 8) for c in cdec]
    ).clip(-89.9, 89.9)
    field_ra, field_dec = _uniform_sphere(rng, 40)
    ra = np.concatenate([ra, field_ra])
    dec = np.concatenate([dec, field_dec])

    got = {
        r["id"]: r["group_id"]
        for r in sky_fof_groups(_sky_df(spark, ra, dec), 1.0).collect()
    }

    # union-find oracle over brute-force pairs
    parent = list(range(len(ra)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(len(ra)):
        for j in range(i + 1, len(ra)):
            if _sep_deg(ra[i], dec[i], ra[j], dec[j]) <= 1.0:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    groups = {}
    for i in range(len(ra)):
        groups.setdefault(find(i), []).append(i)
    want = {i: min(m) for m in groups.values() for i in m}
    assert got == want
    sizes = {}
    for g in got.values():
        sizes[g] = sizes.get(g, 0) + 1
    assert max(sizes.values()) >= 8  # the clumps really grouped


def test_sky_fof_dataset_entry(spark, fixtures):
    import opencosmo_spark as oc
    from opencosmo_spark.analysis import sky_fof

    lc = oc.open(f"{fixtures}/lightcone")
    labels = sky_fof(lc, 0.5)
    assert set(labels.columns) == {"fof_halo_tag", "group_id"}
    assert labels.count() == len(lc)


def test_precompute_rr_sky_sweep_runs_rr_join_once(spark, monkeypatch):
    """Angular twin of the 3-D precompute test: a two-call bin-edge
    sweep sharing a precompute_rr_sky artifact builds the RR sky-pair
    join once, with values identical to the self-contained path."""
    import opencosmo_spark.spatial.crossmatch as cm
    from opencosmo_spark.spatial.crossmatch import (
        precompute_rr_sky,
        w_theta_landy_szalay,
    )
    from opencosmo_spark.spatial.pairs import release_rr

    rng = np.random.default_rng(79)
    ra, dec = _uniform_sphere(rng, 300)
    df = _sky_df(spark, ra, dec)
    nr = 600

    calls = []
    orig = cm.sky_pairs

    def spy(left, right, *a, **k):
        # count only SELF-pair builds (right=None): DD and RR shapes
        if right is None:
            calls.append(1)
        return orig(left, right, *a, **k)

    monkeypatch.setattr(cm, "sky_pairs", spy)
    rr = precompute_rr_sky(spark, tmax_deg=6.0, n_random=nr)
    assert len(calls) == 1  # the one RR join

    got_a = w_theta_landy_szalay(df, [1.0, 3.0, 6.0], rr=rr).collect()
    got_b = w_theta_landy_szalay(df, [0.5, 2.0, 4.0, 6.0], rr=rr).collect()
    # + one DD self-join per estimator call, NO further RR joins
    assert len(calls) == 3

    monkeypatch.setattr(cm, "sky_pairs", orig)
    plain_a = w_theta_landy_szalay(df, [1.0, 3.0, 6.0], n_random=nr).collect()
    assert [tuple(r) for r in got_a] == [tuple(r) for r in plain_a]
    assert all(r["rr"] > 0 for r in got_b)
    with pytest.raises(ValueError, match="rmax"):
        w_theta_landy_szalay(df, [1.0, 10.0], rr=rr)
    with pytest.raises(ValueError, match="kind"):
        w_theta_landy_szalay(df, [1.0, 3.0], rr={**rr, "kind": "3d"})
    release_rr(rr)


def test_w_theta_jackknife_exact_twin_and_signal(spark):
    """w_theta_jackknife vs an exact python twin (brute-force DD/DR/RR
    per region, same LS + jackknife arithmetic); point estimate equals
    w_theta_landy_szalay on the same randoms; planted clustering
    exceeds its own error bar."""
    import math

    from opencosmo_spark.spatial.crossmatch import (
        w_theta_jackknife,
    )

    rng = np.random.default_rng(71)
    ra, dec = _uniform_sphere(rng, 150)
    rra, rdec = _uniform_sphere(rng, 300)
    df = _sky_df(spark, ra, dec)
    rdf = _sky_df(spark, rra, rdec)
    bins = [1.0, 4.0, 8.0]
    n_ra, n_z = 2, 2
    got = (
        w_theta_jackknife(df, bins, random_df=rdf, n_ra=n_ra, n_z=n_z)
        .toPandas().set_index("bin")
    )

    # python twin
    def region(r, d):
        ira = min(int((r % 360.0) / (360.0 / n_ra)), n_ra - 1)
        iz = min(int((math.sin(math.radians(d)) + 1) / (2.0 / n_z)), n_z - 1)
        return iz * n_ra + ira

    dreg = np.array([region(r, d) for r, d in zip(ra, dec)])
    rreg = np.array([region(r, d) for r, d in zip(rra, rdec)])
    k3 = n_ra * n_z
    nb = len(bins) - 1

    def count(ra1, dec1, reg1, ra2, dec2, reg2, self_pairs):
        tot = np.zeros(nb)
        touch = np.zeros((k3, nb))
        n1 = len(ra1)
        n2 = len(ra2)
        for i in range(n1):
            js = range(i + 1, n2) if self_pairs else range(n2)
            for j in js:
                s = round(
                    float(_sep_deg(ra1[i], dec1[i], ra2[j], dec2[j])), 8
                )
                if not (bins[0] <= s < bins[-1]):
                    continue
                b = 0 if s < bins[1] else 1
                tot[b] += 1
                touch[reg1[i]][b] += 1
                if reg2[j] != reg1[i]:
                    touch[reg2[j]][b] += 1
        return tot, touch

    dd, dd_t = count(ra, dec, dreg, ra, dec, dreg, True)
    dr, dr_t = count(ra, dec, dreg, rra, rdec, rreg, False)
    rr, rr_t = count(rra, rdec, rreg, rra, rdec, rreg, True)
    nd, nr = len(ra), len(rra)

    def ls(ddc, drc, rrc, ndp, nrp):
        if ndp < 2 or nrp < 2 or rrc <= 0:
            return None
        rrn = rrc / (nrp * (nrp - 1) / 2)
        return (
            ddc / (ndp * (ndp - 1) / 2) - 2 * drc / (ndp * nrp) + rrn
        ) / rrn

    for b in range(nb):
        assert got.loc[b, "dd"] == dd[b]
        assert got.loc[b, "dr"] == dr[b]
        assert got.loc[b, "rr"] == rr[b]
        w = ls(dd[b], dr[b], rr[b], nd, nr)
        assert got.loc[b, "w"] == pytest.approx(w, abs=1e-8)
        ws = []
        for k in range(k3):
            wk = ls(
                dd[b] - dd_t[k][b], dr[b] - dr_t[k][b],
                rr[b] - rr_t[k][b],
                nd - int((dreg == k).sum()), nr - int((rreg == k).sum()),
            )
            if wk is not None:
                ws.append(wk)
        mean = np.mean(ws)
        err = math.sqrt(
            (len(ws) - 1) / len(ws) * ((np.array(ws) - mean) ** 2).sum()
        )
        assert got.loc[b, "w_err"] == pytest.approx(err, abs=1e-8)
        assert got.loc[b, "n_jackknife"] == k3

    # point estimate agrees with the LS twin on the same randoms
    lsdf = (
        w_theta_landy_szalay(df, bins, random_df=rdf)
        .toPandas().set_index("bin")
    )
    for b in range(nb):
        assert got.loc[b, "w"] == pytest.approx(lsdf.loc[b, "w"], abs=1e-8)

    # clustered field: tight sky clumps detected above the error bar
    centers_ra, centers_dec = _uniform_sphere(rng, 25)
    cra = np.concatenate(
        [cr + rng.normal(0, 0.3, 12) for cr in centers_ra]
    )
    cdec = np.clip(
        np.concatenate([cd + rng.normal(0, 0.3, 12) for cd in centers_dec]),
        -89.9, 89.9,
    )
    cdf = _sky_df(spark, cra % 360.0, cdec)
    sig = (
        w_theta_jackknife(cdf, [0.1, 1.5, 6.0], n_random=800, n_ra=3, n_z=2)
        .toPandas().set_index("bin")
    )
    # clump-dominated resamples make the jackknife error itself large;
    # 2 sigma is the right bar for 25 clumps across 6 regions
    assert sig.loc[0, "w"] > 2 * sig.loc[0, "w_err"] > 0

    with pytest.raises(ValueError, match="sorted"):
        w_theta_jackknife(df, [3.0, 1.0])
