"""Sky cross-match: nearest-neighbor catalog matching within a radius.

The astronomy staple the reference leaves to external tools
(astropy ``match_to_catalog_sky`` is single-node): for every left
row, find the nearest right row within ``radius_deg``. Beyond-parity
operator, same family as the engine's other bin-join designs.

Scale design: a bare cross join is O(n*m). Instead both catalogs are
bucketed into square sky bins of ``bin_deg`` (>= radius, so any match
lies in the left row's bin or its 8 neighbors): the RIGHT side is
exploded to its bin + 8 wrap-aware neighbors, the join is an EQUI-join
on bin, the exact great-circle separation filters bin collisions, and
a struct-min hash aggregate keeps the nearest match per left row
(map-side partial aggregation, no per-source sort). Shuffle volume
is O(left + 9*right); each candidate pair meets in exactly one bin
(the left row's own), so no dedup is needed.

Pole handling: RA-neighbor bins stop covering true neighborhoods when
cos(dec) collapses, so rows with |dec| >= polar_cut are routed into a
single per-pole cap bin (both sides), where the exact predicate does
the work — correctness is preserved for any radius <= 90 - polar_cut;
cap-bin cost is O(cap population^2), negligible for survey-like data.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

_POLE_BIN = -1_000_000  # sentinel bin ids for the two polar caps


def _sep_deg(ra1: Column, dec1: Column, ra2: Column, dec2: Column) -> Column:
    """Great-circle separation in degrees (haversine — stable at small
    angles where the cosine formula loses precision)."""
    r1, d1 = F.radians(ra1), F.radians(dec1)
    r2, d2 = F.radians(ra2), F.radians(dec2)
    a = (
        F.pow(F.sin((d2 - d1) / 2), 2)
        + F.cos(d1) * F.cos(d2) * F.pow(F.sin((r2 - r1) / 2), 2)
    )
    return F.degrees(2 * F.asin(F.least(F.sqrt(a), F.lit(1.0))))


def _bin_of(ra: Column, dec: Column, bin_deg: float, polar_cut: float) -> Column:
    nra = int(360.0 / bin_deg) + 1
    # pmod, not %: Spark % keeps the dividend sign (Java remainder)
    ira = F.floor(F.pmod(ra, F.lit(360.0)) / F.lit(bin_deg)).cast("long")
    idec = F.floor((dec + 90.0) / F.lit(bin_deg)).cast("long")
    return (
        F.when(dec >= polar_cut, F.lit(_POLE_BIN))
        .when(dec <= -polar_cut, F.lit(_POLE_BIN - 1))
        .otherwise(idec * nra + ira)
    )


def _neighbor_bins(
    ra: Column,
    dec: Column,
    bin_deg: float,
    polar_cut: float,
    radius_deg: float,
) -> Column:
    """Bins of every left row this right row could match: dec
    neighbors +-1 (|d-dec| <= radius <= bin), and an RA span that
    WIDENS with declination. The exact bound comes from the haversine
    identity sin^2(sep/2) = sin^2(ddec/2) + cos d1 cos d2 sin^2(dRA/2):
    with both endpoints at |dec| <= D, separation <= r implies
    |dRA| <= 2*asin(min(1, sin(r/2)/cos(D))). The linear r/cos(D)
    approximation under-covers near the cap (where dRA can approach a
    half circle while the separation stays small), silently dropping
    matches; the asin form is exact, and the min(1, .) clamp degrades
    to full-circle coverage (dRA = 180) when sin(r/2) >= cos(D) — the
    -k..k sequence then wraps and array_distinct dedups it. Adjacent
    pole caps are appended when the row borders one."""
    nra = int(360.0 / bin_deg) + 1
    extreme = F.least(F.abs(dec) + F.lit(bin_deg), F.lit(polar_cut))
    ratio = F.least(
        F.sin(F.radians(F.lit(float(radius_deg)) / 2))
        / F.cos(F.radians(extreme)),
        F.lit(1.0),
    )
    dra_max = F.degrees(2 * F.asin(ratio))
    k = F.least(
        F.ceil(dra_max / F.lit(bin_deg)), F.lit(nra)
    ).cast("int")
    dras = F.sequence(-k, k)
    per_ddec = []
    for ddec in (-1, 0, 1):
        d = F.least(
            F.greatest(dec + F.lit(ddec * bin_deg), F.lit(-90.0)), F.lit(90.0)
        )
        idec = F.floor((d + 90.0) / F.lit(bin_deg)).cast("long")
        per_ddec.append(
            F.transform(
                dras,
                lambda dra: idec * nra
                + F.floor(
                    F.pmod(
                        ra + dra.cast("double") * F.lit(bin_deg),
                        F.lit(360.0),
                    )
                    / F.lit(bin_deg)
                ).cast("long"),
            )
        )
    arr = F.flatten(F.array(*per_ddec))
    arr = F.when(
        dec + F.lit(bin_deg) >= polar_cut, F.array_append(arr, F.lit(_POLE_BIN))
    ).otherwise(arr)
    arr = F.when(
        dec - F.lit(bin_deg) <= -polar_cut,
        F.array_append(arr, F.lit(_POLE_BIN - 1)),
    ).otherwise(arr)
    return F.array_distinct(arr)


def crossmatch_sky(
    left: DataFrame,
    right: DataFrame,
    radius_deg: float,
    left_id: str,
    right_id: str,
    ra_col: str = "ra",
    dec_col: str = "dec",
    bin_deg: float | None = None,
    polar_cut: float = 88.0,
    sep_decimals: int | None = None,
) -> DataFrame:
    """Nearest right-row within ``radius_deg`` for every left row.

    Returns (left_id, right_id, sep_deg) — left rows with no match
    within the radius are absent (inner semantics; left-join the
    result back for outer). Ties on separation break toward the
    smallest right id, so the match is deterministic.

    ``sep_decimals`` rounds the separation BEFORE the radius filter
    and the argmin (engine-determinism knob: trig last-ulp differences
    between engines cannot flip the selected match once both rank the
    rounded value; ties resolve by id).
    """
    if radius_deg <= 0:
        raise ValueError("radius_deg must be positive")
    if bin_deg is None:
        bin_deg = max(radius_deg, 0.25)
    if bin_deg < radius_deg:
        raise ValueError("bin_deg must be >= radius_deg (neighbor cover)")
    if radius_deg > 90.0 - polar_cut:
        # matches may span a cap boundary the bin graph can't see
        polar_cut = max(0.0, 90.0 - radius_deg - bin_deg)

    l = left.select(
        F.col(left_id).alias("__lid"),
        F.col(ra_col).alias("__lra"),
        F.col(dec_col).alias("__ldec"),
        _bin_of(F.col(ra_col), F.col(dec_col), bin_deg, polar_cut).alias("__bin"),
    )
    r = right.select(
        F.col(right_id).alias("__rid"),
        F.col(ra_col).alias("__rra"),
        F.col(dec_col).alias("__rdec"),
        F.explode(
            _neighbor_bins(
                F.col(ra_col), F.col(dec_col), bin_deg, polar_cut, radius_deg
            )
        ).alias("__bin"),
    )
    sep = _sep_deg(
        F.col("__lra"), F.col("__ldec"), F.col("__rra"), F.col("__rdec")
    )
    if sep_decimals is not None:
        sep = F.round(sep, sep_decimals)
    cand = (
        l.join(r, "__bin")
        .withColumn("__sep", sep)
        .filter(F.col("__sep") <= F.lit(float(radius_deg)))
    )
    # nearest-match argmin as a struct-min hash aggregate: min((sep,
    # rid)) is lexicographically (sep asc, rid asc) — the same
    # tie-break the former row_number window gave, but with map-side
    # partial aggregation and no per-source sort (one shuffle's worth
    # of sort work saved)
    best = cand.groupBy("__lid").agg(
        F.min(F.struct(F.col("__sep"), F.col("__rid"))).alias("__b")
    )
    return best.select(
        F.col("__lid").alias(left_id),
        F.col("__b.__rid").alias(right_id),
        F.round(F.col("__b.__sep"), 8).alias("sep_deg"),
    )


def sky_pairs(
    left: DataFrame,
    right: DataFrame | None,
    radius_deg: float,
    left_id: str = "id",
    right_id: str = "id",
    ra_col: str = "ra",
    dec_col: str = "dec",
    bin_deg: float | None = None,
    polar_cut: float = 88.0,
    carry_left: tuple[str, ...] = (),
    carry_right: tuple[str, ...] = (),
) -> DataFrame:
    """ALL pairs within ``radius_deg`` — the pair-count primitive
    behind angular correlation functions, where ``crossmatch_sky``
    keeps only the nearest. ``right=None`` gives unordered SELF pairs
    of ``left`` (a < b); otherwise every (left, right) pair appears
    once. Returns (a, b, sep_deg), plus ``{name}_a`` / ``{name}_b``
    for ``carry_left`` / ``carry_right`` payload columns threaded
    through the join (the 3-D engine's carry idiom — jackknife region
    tags, weights — without a post-join re-attach at pair volume).

    Same scale shape as the cross-match: bin equi-join, right side
    exploded to its wrap-aware 9-neighborhood. Each candidate pair
    meets in exactly one bin — the left row's own single bin, with the
    right fan-out array_distinct'ed, so this holds at the pole caps
    too — hence no dedup exists or is needed.
    """
    if radius_deg <= 0:
        raise ValueError("radius_deg must be positive")
    if bin_deg is None:
        bin_deg = max(radius_deg, 0.25)
    if bin_deg < radius_deg:
        raise ValueError("bin_deg must be >= radius_deg (neighbor cover)")
    if radius_deg > 90.0 - polar_cut:
        polar_cut = max(0.0, 90.0 - radius_deg - bin_deg)
    self_pairs = right is None
    if self_pairs:
        right = left
        right_id = left_id
        if not carry_right:
            carry_right = carry_left

    l = left.select(
        F.col(left_id).alias("a"),
        F.col(ra_col).alias("__lra"),
        F.col(dec_col).alias("__ldec"),
        _bin_of(F.col(ra_col), F.col(dec_col), bin_deg, polar_cut).alias("__bin"),
        *[F.col(c).alias(f"{c}_a") for c in carry_left],
    )
    r = right.select(
        F.col(right_id).alias("b"),
        F.col(ra_col).alias("__rra"),
        F.col(dec_col).alias("__rdec"),
        F.explode(
            _neighbor_bins(
                F.col(ra_col), F.col(dec_col), bin_deg, polar_cut, radius_deg
            )
        ).alias("__bin"),
        *[F.col(c).alias(f"{c}_b") for c in carry_right],
    )
    sep = _sep_deg(
        F.col("__lra"), F.col("__ldec"), F.col("__rra"), F.col("__rdec")
    )
    out = l.join(r, "__bin")
    if self_pairs:
        out = out.filter(F.col("a") < F.col("b"))
    # no dedup needed: the left row carries exactly ONE bin (cap OR
    # ring) and the right fan-out is array_distinct'ed (cap appends
    # happen before the distinct), so a given (a, b) pair can match
    # at most once — verified by the pole/seam brute-force
    # differentials
    return (
        out.withColumn("__sep", sep)
        .filter(F.col("__sep") <= F.lit(float(radius_deg)))
        .select(
            "a", "b", F.round(F.col("__sep"), 8).alias("sep_deg"),
            *[F.col(f"{c}_a") for c in carry_left],
            *[F.col(f"{c}_b") for c in carry_right],
        )
    )


def uniform_sky_catalog(
    spark,
    n: int,
    seed: int = 1,
    id_col: str = "id",
    ra_col: str = "ra",
    dec_col: str = "dec",
) -> DataFrame:
    """Deterministic uniform random catalog on the full sphere
    (``ra`` uniform, ``dec = asin(2u - 1)`` — equal-area), generated
    distributed from md5 hash lanes: the same (n, seed) yields the
    same catalog on any partitioning. For survey footprints pass your
    own masked randoms instead — the estimator only cancels geometry
    the randoms actually trace."""
    from ..pipeline.dedup import md5_lane

    out = spark.range(n).select(F.col("id").alias(id_col))
    u1 = md5_lane(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col), F.lit("ra"))
    ).cast("double") / F.lit(float(2**60))
    u2 = md5_lane(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col), F.lit("dec"))
    ).cast("double") / F.lit(float(2**60))
    return out.withColumn(ra_col, u1 * F.lit(360.0)).withColumn(
        dec_col, F.degrees(F.asin(u2 * 2.0 - 1.0))
    )


def precompute_rr_sky(
    spark,
    tmax_deg: float,
    n_random: int,
    seed: int = 1,
    random_df: DataFrame | None = None,
    id_col: str = "id",
    ra_col: str = "ra",
    dec_col: str = "dec",
) -> dict:
    """Angular twin of ``spatial.pairs.precompute_rr``: run the RR
    sky-pair join once, persist the randoms and the RR separations out
    to ``tmax_deg``, and return the artifact for
    ``w_theta_landy_szalay(..., rr=...)`` sweeps (any bin edges with
    ``max(edges) <= tmax_deg`` reuse it). Release with
    ``spatial.pairs.release_rr``."""
    from pyspark import StorageLevel

    if random_df is None:
        random_df = uniform_sky_catalog(spark, int(n_random), seed)
        id_col, ra_col, dec_col = "id", "ra", "dec"
    rdf = random_df.persist(StorageLevel.MEMORY_AND_DISK)
    nr = rdf.count()
    rr_pairs = (
        sky_pairs(rdf, None, float(tmax_deg), id_col, id_col, ra_col, dec_col)
        .select(F.col("sep_deg").alias("dist"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rr_pairs.count()  # the ONE RR pair-join execution
    return {
        "kind": "sky",
        "random_df": rdf,
        "rr_pairs": rr_pairs,
        "nr": int(nr),
        "rmax": float(tmax_deg),
        "id_col": id_col,
        "ra_col": ra_col,
        "dec_col": dec_col,
    }


def w_theta_landy_szalay(
    df: DataFrame,
    bins_deg: list[float],
    id_col: str = "id",
    ra_col: str = "ra",
    dec_col: str = "dec",
    random_df: DataFrame | None = None,
    n_random: int | None = None,
    seed: int = 1,
    rr: dict | None = None,
) -> DataFrame:
    """Angular two-point correlation w(theta) with the Landy-Szalay
    estimator — the lightcone-side twin of the 3-D
    ``two_point_landy_szalay``: DD/DR/RR through ``sky_pairs``'
    bin-join (never all-pairs), normalized counts, per-angular-bin
    ``(bin, t_lo, t_hi, dd, dr, rr, w)``. Default randoms are
    full-sky uniform (``2 * len(df)`` points), persisted across the
    DR and RR joins (handle on the result's ``_oc_cached``); supply
    masked ``random_df`` for survey footprints, or an
    ``rr=precompute_rr_sky(...)`` artifact to skip the RR join
    entirely across a sweep."""
    if sorted(bins_deg) != list(bins_deg) or len(bins_deg) < 2:
        raise ValueError("bins_deg must be a sorted list of >= 2 edges")
    tmax = float(bins_deg[-1])
    edges = [float(e) for e in bins_deg]
    nd = df.count()

    from .pairs import _binned_counts, _check_rr, _ls_assemble

    cached = []
    if rr is not None:
        _check_rr(rr, "sky", edges)
        random_df = rr["random_df"]
        nr = rr["nr"]
        r_id, r_ra, r_dec = rr["id_col"], rr["ra_col"], rr["dec_col"]
        rr_counts = _binned_counts(rr["rr_pairs"], edges, "rr")
    elif random_df is None:
        from pyspark import StorageLevel

        nr = int(n_random or 2 * nd)
        random_df = uniform_sky_catalog(df.sparkSession, nr, seed).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        cached.append(random_df)
        r_id, r_ra, r_dec = "id", "ra", "dec"
    else:
        nr = random_df.count()
        r_id, r_ra, r_dec = id_col, ra_col, dec_col
    if nd < 2 or nr < 2:
        raise ValueError(f"need >= 2 data and random points, got {nd}/{nr}")

    def binned(pairs, name):
        return _binned_counts(
            pairs.select(F.col("sep_deg").alias("dist")), edges, name
        )

    dd = binned(
        sky_pairs(df, None, tmax, id_col, id_col, ra_col, dec_col), "dd"
    )
    dr = binned(
        sky_pairs(
            df, random_df, tmax, id_col, r_id, ra_col, dec_col
        )
        if (ra_col, dec_col) == (r_ra, r_dec)
        else sky_pairs(
            df,
            random_df.withColumnsRenamed({r_ra: ra_col, r_dec: dec_col}),
            tmax, id_col, r_id, ra_col, dec_col,
        ),
        "dr",
    )
    if rr is None:
        rr_counts = binned(
            sky_pairs(random_df, None, tmax, r_id, r_id, r_ra, r_dec), "rr"
        )
    out = _ls_assemble(
        df.sparkSession, edges, dd, dr, rr_counts, nd, nr, "t_lo", "t_hi", "w"
    )
    if cached:
        from ..pipeline.dedup import _attach_cached

        _attach_cached(out, cached)
    return out


def sky_fof_groups(
    df: DataFrame,
    linking_deg: float,
    id_col: str = "id",
    ra_col: str = "ra",
    dec_col: str = "dec",
    max_iterations: int = 30,
) -> DataFrame:
    """Angular friends-of-friends: sources within ``linking_deg`` of
    each other chain into groups (cluster finding on the sky — the
    angular twin of ``spatial.pairs.fof_groups``). Returns
    ``(id, group_id)`` with ``group_id`` = the smallest member id.
    Percolation chains are the high-diameter connected-components
    case, so this rides the large-star/small-star algorithm like the
    3-D finder."""
    from ..pipeline.dedup import connected_components

    pairs = sky_pairs(
        df, None, linking_deg, id_col, id_col, ra_col, dec_col
    ).select("a", "b")
    labels = connected_components(
        pairs, df.select(F.col(id_col)), id_col, "a", "b",
        max_iterations=max_iterations, algorithm="star",
    )
    return labels.withColumnRenamed("cluster_id", "group_id")


def sky_jackknife_region(
    ra: Column, dec: Column, n_ra: int, n_z: int
) -> Column:
    """Equal-area sky region id for jackknife resampling: RA split
    uniformly, declination split uniformly in sin(dec) (the same
    equal-area measure ``uniform_sky_catalog`` draws from), so the
    ``n_ra * n_z`` regions have equal solid angle and comparable
    point counts for any isotropic catalog."""
    ira = F.least(
        F.floor(F.pmod(ra, F.lit(360.0)) / F.lit(360.0 / n_ra)),
        F.lit(n_ra - 1),
    ).cast("long")
    iz = F.least(
        F.floor(
            (F.sin(F.radians(dec)) + 1.0) / F.lit(2.0 / n_z)
        ),
        F.lit(n_z - 1),
    ).cast("long")
    return iz * n_ra + ira


def w_theta_jackknife(
    df: DataFrame,
    bins_deg: list[float],
    id_col: str = "id",
    ra_col: str = "ra",
    dec_col: str = "dec",
    random_df: DataFrame | None = None,
    n_random: int | None = None,
    seed: int = 1,
    n_ra: int = 4,
    n_z: int = 2,
) -> DataFrame:
    """Landy-Szalay w(theta) WITH delete-one sky-jackknife error bars
    (Norberg et al. 2009 on the sphere): equal-area regions (RA x
    sin(dec) grid), each resample leaves one region's data AND randoms
    out, per-bin error = jackknife variance over the K = n_ra * n_z
    resamples.

    Cost identity as in the 3-D twin: all K resampled DD/DR/RR counts
    come from the SAME three pair joins the plain estimator runs —
    region ids ride ``sky_pairs``' carry columns, each join aggregates
    once by (bin, region_a, region_b) into a <= n_bins * K^2 driver
    table, and every leave-one-out estimate is driver arithmetic with
    the per-resample normalizations N_dd/N_dr/N_rr recomputed from the
    retained point counts. Error bars cost zero extra shuffles.

    Returns
    ``(bin, t_lo, t_hi, dd, dr, rr, w, w_err, n_jackknife)`` with raw
    (unnormalized) full-sample counts and the full-sample LS ``w``.
    """
    if sorted(bins_deg) != list(bins_deg) or len(bins_deg) < 2:
        raise ValueError("bins_deg must be a sorted list of >= 2 edges")
    if n_ra * n_z < 2:
        raise ValueError("need >= 2 jackknife regions")
    edges = [float(e) for e in bins_deg]
    tmax = edges[-1]
    k3 = n_ra * n_z
    reg = sky_jackknife_region(F.col(ra_col), F.col(dec_col), n_ra, n_z)

    data = df.withColumn("__jk", reg)
    cached = []
    if random_df is None:
        from pyspark import StorageLevel

        nd0 = df.count()
        nr0 = int(n_random or 2 * nd0)
        random_df = uniform_sky_catalog(df.sparkSession, nr0, seed)
        rid, rra, rdec = "id", "ra", "dec"
    else:
        rid, rra, rdec = id_col, ra_col, dec_col
    rand = random_df.withColumn(
        "__jk", sky_jackknife_region(F.col(rra), F.col(rdec), n_ra, n_z)
    )
    from pyspark import StorageLevel

    rand = rand.persist(StorageLevel.MEMORY_AND_DISK)
    cached.append(rand)
    try:
        ndk = {
            int(r["__jk"]): int(r["n"])
            for r in data.groupBy("__jk").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        nrk = {
            int(r["__jk"]): int(r["n"])
            for r in rand.groupBy("__jk").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        nd, nr = sum(ndk.values()), sum(nrk.values())
        if nd < 2 or nr < 2:
            raise ValueError(f"need >= 2 data and random points, got {nd}/{nr}")

        n_bins = len(edges) - 1

        def _bin_idx():
            out = F.lit(None).cast("int")
            for i in range(n_bins, 0, -1):
                out = F.when(
                    (F.col("sep_deg") >= edges[i - 1])
                    & (F.col("sep_deg") < edges[i]),
                    F.lit(i - 1),
                ).otherwise(out)
            return out

        def tables(pairs):
            rows = (
                pairs.select(
                    _bin_idx().alias("bin"),
                    F.col("__jk_a").cast("long").alias("ra_"),
                    F.col("__jk_b").cast("long").alias("rb_"),
                )
                .filter(F.col("bin").isNotNull())
                .groupBy("bin", "ra_", "rb_")
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            )
            tot = [0] * n_bins
            touch = [[0] * n_bins for _ in range(k3)]
            for r in rows:
                b, ba, bb, c = r["bin"], int(r["ra_"]), int(r["rb_"]), int(r["c"])
                tot[b] += c
                touch[ba][b] += c
                if bb != ba:
                    touch[bb][b] += c
            return tot, touch

        dd, dd_t = tables(
            sky_pairs(
                data, None, tmax, id_col, id_col, ra_col, dec_col,
                carry_left=("__jk",),
            )
        )
        r_for_cross = (
            rand
            if (rra, rdec) == (ra_col, dec_col)
            else rand.withColumnsRenamed({rra: ra_col, rdec: dec_col})
        )
        dr, dr_t = tables(
            sky_pairs(
                data, r_for_cross, tmax, id_col, rid, ra_col, dec_col,
                carry_left=("__jk",), carry_right=("__jk",),
            )
        )
        rr, rr_t = tables(
            sky_pairs(
                rand, None, tmax, rid, rid, rra, rdec,
                carry_left=("__jk",),
            )
        )
    finally:
        for c in cached:
            c.unpersist()

    def ls(ddc, drc, rrc, ndp, nrp):
        if ndp < 2 or nrp < 2 or rrc <= 0:
            return None
        ndd = ndp * (ndp - 1) / 2.0
        ndr = float(ndp) * nrp
        nrr = nrp * (nrp - 1) / 2.0
        rrn = rrc / nrr
        return (ddc / ndd - 2.0 * drc / ndr + rrn) / rrn

    out = []
    for i in range(n_bins):
        w_full = ls(dd[i], dr[i], rr[i], nd, nr)
        ws = []
        for k in range(k3):
            wk = ls(
                dd[i] - dd_t[k][i],
                dr[i] - dr_t[k][i],
                rr[i] - rr_t[k][i],
                nd - ndk.get(k, 0),
                nr - nrk.get(k, 0),
            )
            if wk is not None:
                ws.append(wk)
        kk = len(ws)
        if kk > 1:
            mean = sum(ws) / kk
            err = math.sqrt((kk - 1) / kk * sum((x - mean) ** 2 for x in ws))
        else:
            err = float("nan")
        out.append(
            (
                i, edges[i], edges[i + 1], dd[i], dr[i], rr[i],
                round(w_full, 10) if w_full is not None else None,
                round(err, 10), kk,
            )
        )
    return df.sparkSession.createDataFrame(
        out,
        "bin int, t_lo double, t_hi double, dd long, dr long, rr long, "
        "w double, w_err double, n_jackknife int",
    )
