"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` — one entry per implemented operator from SURVEY.md §2,
each a callable (spark, sf_dir) -> DataFrame exercising the
opencosmo_spark engine (or raw DataFrame ops for generic relational
operators). ``oracle_sql()`` — the DuckDB-equivalent SQL.

Determinism policy (so Spark and DuckDB hash-match bit-for-bit):
* monetary aggregates go through exact integer arithmetic
  (``round(x*100) -> BIGINT`` cents) — double summation order differs
  between engines, integers don't;
* arbitrary doubles are rounded to 6 decimals (identical input bits +
  identical rounding -> identical outputs) BEFORE aggregation;
* transcendental outputs (log10, asin, cosine similarity) are rounded
  to 6 decimals;
* every top-k has a full tiebreak ordering;
* deterministic "random" sampling uses md5 prefixes, identical in both
  engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opencosmo_spark._litarr import values_df

SF_SMOKE = "/root/testdata/sf0.001"


def _harden(spark: SparkSession) -> None:
    """Make queries self-sufficient on ANY session (the driver's
    correctness harness passes a vanilla one). All four are
    runtime-settable SQLConfs:
    * nanosAsLong — events.parquet stores INT64 TIMESTAMP(NANOS),
      which a vanilla session rejects at read time;
    * UTC — timestamp<->string rendering must match the DuckDB oracle;
    * excludedRules — InferFiltersFromGenerate inlines array-producing
      expressions into interpreted per-row filters under explode
      (measured 40-80x on the shingle pipelines);
    * Arrow — fast toPandas for the harness's collection step.
    """
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        (
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        ),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — never let hardening kill a query
            pass


def _ts_ns(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events time axis to INT64 epoch-nanoseconds.

    The fixture has shipped ``ts`` two ways across rounds: INT64
    TIMESTAMP(NANOS) (surfaces as a raw long under ``nanosAsLong``) and
    ``timestamp[us]`` (surfaces as TIMESTAMP_NTZ, where ``nanosAsLong``
    is a no-op). Branch on the read dtype: a timestamp is relabeled to
    exact long nanos (``unix_micros`` under the UTC session TZ is an
    identity relabel, then *1000 in long arithmetic — no doubles, no
    precision loss); a long passes through untouched. Downstream query
    code can then assume long nanos unconditionally.
    """
    dt = dict(df.dtypes).get(col, "")
    if dt.startswith("timestamp"):
        return df.withColumn(
            col, F.unix_micros(F.col(col).cast("timestamp")) * F.lit(1000)
        )
    return df


# Per-session table-plan memo: spark.read.parquet re-reads footers and
# re-infers the schema on EVERY call (~0.2 s of driver+job time per
# table per query construction — bench queries construct per rep).
# The cached value is an UNRESOLVED PLAN + schema, the metastore-table
# pattern: every action still scans the parquet files, nothing
# data-sized is persisted. Keyed weakly by session so a stopped
# session's plans can never leak into a new one; _harden runs once per
# session (its four confs are idempotent).
import weakref

_T_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        per = _T_CACHE.get(spark)
    except TypeError:  # un-weakref-able session stand-in (tests/mocks)
        per = None
    if per is None:
        _harden(spark)
        per = {}
        try:
            _T_CACHE[spark] = per
        except TypeError:
            pass
    df = per.get((sf_dir, name))
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = _ts_ns(df)
        per[(sf_dir, name)] = df
    return df


def _cents(c, scale=100):
    """Exact integer money: round(x*scale) as BIGINT."""
    return F.round(c * F.lit(scale), 0).cast("long")


# =====================================================================
# flagship
# =====================================================================
def entry(spark: SparkSession) -> DataFrame:
    """TPC-H Q1-shaped pricing summary via exact integer aggregation."""
    return q15_tpch_q1(spark, SF_SMOKE)


# =====================================================================
# §2.1/2.2 scan, projection, filters, takes
# =====================================================================
def q01_scan_filter_project(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter((F.col("l_shipdate") < "1996-01-01") & (F.col("l_quantity") > 25))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


def q02_select_drop(spark, sf):
    # select (wildcard expansion) chained with drop — the two
    # projection verbs in one lineage (formerly q02 + q03)
    from opencosmo_spark import Dataset

    ds = Dataset(_t(spark, sf, "lineitem"))
    return ds.select("l_*key", "l_linenumber", "l_quantity").drop("l_quantity").df


def q04_filter_compound(spark, sf):
    # comparison + boolean combinators + isin in one mask (formerly
    # q04 + q05 — the isin verb folded into the compound predicate)
    from opencosmo_spark import Dataset, col

    ds = Dataset(_t(spark, sf, "lineitem"))
    mask = ((col("l_quantity") >= 30) & (col("l_discount") < 0.05)) | col(
        "l_returnflag"
    ).isin(["R", "A"])
    return ds.filter(mask).select("l_orderkey", "l_linenumber", "l_quantity").df


def q06_filter_scalar_mean(spark, sf):
    # "rows above the mean" — the DerivedScalarValue-in-filter pattern,
    # lowered exactly: price_cents * N > sum_cents (integer compare).
    li = _t(spark, sf, "lineitem").withColumn("__pc", _cents(F.col("l_extendedprice")))
    agg = li.agg(
        F.sum("__pc").alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    return (
        li.crossJoin(F.broadcast(agg))
        .filter(F.col("__pc") * F.col("__n") > F.col("__s"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


def q07_sample_hash(spark, sf):
    # deterministic pseudo-random sample via md5 prefix (reference
    # take(at="random") gets real rand(); this is the oracle-checkable
    # twin — see also tests for the rand() path)
    li = _t(spark, sf, "lineitem")
    key = F.md5(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    )
    return li.filter(F.substring(key, 1, 2) <= "14").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


def q08_sort_topk(spark, sf):
    # sorted take + take_range on the same sort (formerly q08 + q09):
    # top-100 UNION rows [100, 300) — together the first 300 rows, but
    # produced through BOTH verbs' plans (TakeOrderedAndProject for the
    # head, offset-window for the range).
    from opencosmo_spark import Dataset

    ds = Dataset(_t(spark, sf, "lineitem"))
    srt = ds.sort_by("l_extendedprice", "l_orderkey", "l_linenumber", invert=True)
    top = srt.take(100, at="start").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    rng = srt.take_range(100, 300).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return top.df.unionByName(rng.df)


# =====================================================================
# §2.3 derived columns and scalar functions
# =====================================================================
def q10_derived_cols(spark, sf):
    # with_new_columns arithmetic chained into math-function derivations
    # REFERENCING the derived column (formerly q10 + q11): rev is a real
    # column after with_new_columns, so the log10/sqrt/arcsin exprs
    # compose on it like any base column.
    from opencosmo_spark import Dataset, col

    ds = Dataset(_t(spark, sf, "lineitem"))
    ds = ds.with_new_columns(
        rev=col("l_extendedprice") * (1 - col("l_discount")) * (1 + col("l_tax"))
    )
    from opencosmo_spark import (
        add_mag_cols,
        gas_emission_measure,
        gas_mmw,
        gas_temperature,
        norm_cols,
    )

    # derived gas thermodynamics (reference yt_utils derived fields as
    # engine-side exprs): composition/energy/density lanes are derived
    # from lineitem numerics identically in the SQL twin; log10-rounded
    # so cross-engine double-op ulps can't flip the hash
    yhe = col("l_discount") + 0.24
    zmet = col("l_tax") * 10.0
    ds = ds.select(
        "l_orderkey",
        "l_linenumber",
        "rev",
        lg=col("rev").log10(),
        sq=col("rev").sqrt(),
        ang=(col("rev") / 1000000.0).arcsin(),
        # the stock-column helpers (formerly q12) in the same lineage
        norm=norm_cols("l_quantity", "l_discount", "l_tax"),
        mag=add_mag_cols("l_discount", "l_tax"),
        mu=gas_mmw(yhe, zmet),
        gtemp=gas_temperature(
            col("l_quantity") * 10000.0, yhe, zmet, uu_to_cgs=1e10
        ).log10(),
        gem=gas_emission_measure(
            col("l_extendedprice") * 1e-30, col("l_quantity") * 1e39, yhe
        ).log10(),
    )
    return ds.df.select(
        "l_orderkey",
        "l_linenumber",
        "rev",
        F.round("lg", 6).alias("lg"),
        F.round("sq", 6).alias("sq"),
        F.round("ang", 6).alias("ang"),
        "norm",
        F.round("mag", 6).alias("mag"),
        F.round("mu", 9).alias("mu"),
        F.round("gtemp", 6).alias("gtemp"),
        F.round("gem", 6).alias("gem"),
    )


def q13_zscore(spark, sf):
    # z-score with exact integer sums (cents): mean/std identical in
    # both engines, so the per-row doubles match bit-for-bit. Sums run
    # in decimal(38,0): sum(cents^2) overflows int64 already at sf0.1
    # (~6e19), and DuckDB's SUM(BIGINT) is exact 128-bit — decimal is
    # the Spark twin of that (and the only scale-safe choice).
    # z = (pc*n - s) / sqrt(n*ss - s^2): numerator and radicand are
    # EXACT integers (decimal algebra), so each engine performs exactly
    # ONE int->double rounding plus identical double ops — bit-equal
    # output with no tolerance games.
    li = _t(spark, sf, "lineitem").withColumn("__pc", _cents(F.col("l_extendedprice")))
    pcd = F.col("__pc").cast("decimal(19,0)")
    agg = li.agg(
        F.sum(pcd).alias("__s"),
        F.sum(pcd * pcd).alias("__ss"),
        F.count(F.lit(1)).cast("decimal(19,0)").alias("__n"),
    )
    j = li.crossJoin(F.broadcast(agg))
    num = (pcd * F.col("__n") - F.col("__s")).cast("double")
    rad = (F.col("__n") * F.col("__ss") - F.col("__s") * F.col("__s")).cast(
        "double"
    )
    z = num / F.sqrt(rad)
    return j.select(
        "l_orderkey", "l_linenumber", z.alias("z")
    )


def q14_quantile_filter(spark, sf):
    li = _t(spark, sf, "lineitem")
    agg = li.agg(F.percentile(F.col("l_extendedprice"), F.lit(0.9)).alias("__q"))
    return (
        li.crossJoin(F.broadcast(agg))
        .filter(F.col("l_extendedprice") > F.col("__q"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


# =====================================================================
# §2.5 aggregations
# =====================================================================
def q15_tpch_q1(spark, sf):
    li = _t(spark, sf, "lineitem")
    pc = _cents(F.col("l_extendedprice"))
    dc = _cents(F.col("l_discount"))
    tc = _cents(F.col("l_tax"))
    qi = F.col("l_quantity").cast("long")
    e = li.filter(F.col("l_shipdate") <= "1998-09-02").select(
        "l_returnflag",
        "l_linestatus",
        qi.alias("qi"),
        pc.alias("pc"),
        dc.alias("dc"),
        tc.alias("tc"),
    )
    # decimal sums: int64 product-sums overflow around 1e19 total cents
    # — DuckDB's SUM(BIGINT) is exact 128-bit, decimal(38,0) matches it
    pcd = F.col("pc").cast("decimal(19,0)")
    g = e.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qi").alias("sq"),
        F.sum(pcd).alias("sp"),
        F.sum(pcd * (100 - F.col("dc"))).alias("sd"),
        F.sum(pcd * (100 - F.col("dc")) * (100 + F.col("tc"))).alias("sc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    n = F.col("count_order")
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sq").cast("double").alias("sum_qty"),
        (F.col("sp").cast("double") / 100.0).alias("sum_base_price"),
        (F.col("sd").cast("double") / 10000.0).alias("sum_disc_price"),
        (F.col("sc").cast("double") / 1000000.0).alias("sum_charge"),
        (F.col("sq").cast("double") / n).alias("avg_qty"),
        (F.col("sp").cast("double") / n / 100.0).alias("avg_price"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


def q16_degrade(spark, sf):
    # HealpixMap.with_resolution analog: group key // ratio, mean-agg
    # (reference healpix_map.py:426-508) — exact via micro-units.
    ev = _t(spark, sf, "events")
    vi = F.round(F.round(F.col("value"), 6) * 1000000, 0).cast("long")
    g = (
        ev.select((F.floor(F.col("user_id") / 16)).alias("bucket"), vi.alias("vi"))
        .groupBy("bucket")
        .agg(F.sum("vi").alias("sv"), F.count(F.lit(1)).alias("n"))
    )
    return g.select(
        "bucket",
        (F.col("sv").cast("double") / F.col("n") / 1000000.0).alias("avg_value"),
        "n",
    )


def q17_histogram(spark, sf):
    # halo-mass-function analog: groupBy(bin).count()
    o = _t(spark, sf, "orders")
    return (
        o.select(F.floor(F.col("o_totalprice") / 20000).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# =====================================================================
# §2.6 joins / linking
# =====================================================================
def q19_join_1n(spark, sf):
    # halo -> particles 1:N link analog (particles.join(halos, tag))
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 200000)
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus"
    )


def q20_join_left(spark, sf):
    # 1:1 idx link with missing (-1 -> null) analog
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").filter(F.col("c_acctbal") < -900)
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "c_name"
    )


def q21_semi_cascade(spark, sf):
    # the StructureCollection filter cascade: filter source, linked
    # tables narrow via left-semi joins (reference handler.py:187-333)
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").join(
        c.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    )
    li = _t(spark, sf, "lineitem").join(
        o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )
    return li.select("l_orderkey", "l_linenumber", "l_quantity")


def q22_join_nested_agg(spark, sf):
    # nested link chain analog (halos -> galaxies -> particles):
    # lineitem -> orders -> customer -> nation, revenue per nation
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    rev = (
        _cents(F.col("l_extendedprice")).cast("decimal(19,0)")
        * (100 - _cents(F.col("l_discount")))
    ).alias("rc")
    j = (
        li.select("l_orderkey", rev)
        .join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    g = j.groupBy("n_name").agg(
        F.sum("rc").alias("src"), F.count(F.lit(1)).alias("n_items")
    )
    return g.select(
        "n_name", (F.col("src").cast("double") / 10000.0).alias("revenue"), "n_items"
    )




# =====================================================================
# §2.7 set operations
# =====================================================================
def q24_set_ops(spark, sf):
    # set-operation family in one result (formerly q24 + q25 + q18):
    # the lightcone step-vstack analog (unionByName of two event
    # slices, then agg) stacked over an INTERSECT of customer key sets
    # and a DISTINCT projection, tagged into a common (tag, val)
    # schema.
    ev = _t(spark, sf, "events")
    a = ev.filter(F.col("value") > 50)
    b = ev.filter(F.col("event_type") == "click")
    counts = (
        a.unionByName(b)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("event_type").alias("tag"), F.col("n").alias("val"))
    )
    c = _t(spark, sf, "customer")
    ia = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ib = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    inter = ia.intersect(ib).select(
        F.lit("ix_custkey").alias("tag"), F.col("c_custkey").alias("val")
    )
    dis = (
        _t(spark, sf, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .select(
            F.concat(
                F.lit("rl:"), F.col("l_returnflag"), F.col("l_linestatus")
            ).alias("tag"),
            F.lit(0).cast("long").alias("val"),
        )
    )
    # anti-join family member (formerly q23): orders with zero
    # lineitems (absent 1:N link = no child rows), in the shared
    # (tag, val) schema
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    anti = o.join(
        li.select("l_orderkey"),
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left_anti",
    ).select(
        F.lit("anti_orderkey").alias("tag"),
        F.col("o_orderkey").cast("long").alias("val"),
    )
    return counts.unionByName(inter).unionByName(dis).unionByName(anti)




def q66_pair_counts(spark, sf):
    # DRIVER-CHECKED pair-count parity: deterministic point clouds are
    # derived from doc/vec ids via the md5 lane (identically derivable
    # in SQL), the REAL cell-keyed pair engine counts DD (self pairs)
    # and DR (cross pairs) per radial bin under periodic minimum-image
    # distance, and the DuckDB oracle brute-forces the same counts.
    # The COUNTS are integer-exact; bin membership is float-derived
    # (Spark dx*dx vs DuckDB pow(x,2)), so dist is rounded to 6
    # decimals on BOTH sides before binning (the crossmatch_sky
    # sep_decimals idiom) — a pair within ulps of the 5.0/10.0 edges
    # can't bin differently across engines. This is the engine-vs-
    # brute-force differential as a driver row.
    from opencosmo_spark.pipeline.dedup import md5_lane
    from opencosmo_spark.spatial.pairs import (
        _binned_counts,
        cross_pairs_3d,
        neighbor_pairs_3d,
    )

    box, rmax = 100.0, 10.0
    edges = [0.0, 5.0, 10.0]

    def coords(df, idc, tag):
        out = df
        for ax in ("x", "y", "z"):
            lane = md5_lane(
                F.concat_ws(
                    ":", F.lit(tag), F.col(idc).cast("string"), F.lit(ax)
                )
            )
            out = out.withColumn(
                ax,
                lane.cast("double") / F.lit(float(2**60)) * F.lit(box),
            )
        return out

    P = coords(_t(spark, sf, "documents").select("doc_id"), "doc_id", "p")
    Q = coords(_t(spark, sf, "embeddings").select("vec_id"), "vec_id", "q")

    rnd = lambda pf: pf.withColumn("dist", F.round(F.col("dist"), 6))  # noqa: E731
    dd = _binned_counts(
        rnd(neighbor_pairs_3d(P, rmax, box, id_col="doc_id", periodic=True)),
        edges, "dd",
    )
    dr = _binned_counts(
        rnd(cross_pairs_3d(
            P, Q, rmax, box, id_col_a="doc_id", id_col_b="vec_id",
            periodic=True,
        )),
        edges, "dr",
    )
    # values_df: LocalTableScan, not a 32-slice PythonRDD (the old
    # 2-row createDataFrame grid spun up 32 Python workers per run
    # behind the synchronized SparkEnv lock — thread-dump-verified)
    grid = values_df(spark, [(0,), (1,)], "bin INT")
    return (
        grid.join(dd, "bin", "left")
        .join(dr, "bin", "left")
        .select(
            "bin",
            F.coalesce("dd", F.lit(0)).alias("dd"),
            F.coalesce("dr", F.lit(0)).alias("dr"),
        )
        .orderBy("bin")
    )


# =====================================================================
# windows (internal machinery for take_range; exposed as operators)
# =====================================================================
def q26_window_topk(spark, sf):
    # window top-k + the ranking/navigation family (formerly q53) over
    # ONE partition spec: row_number/rank/dense_rank/ntile/lead/lag all
    # share a single per-partition sort, then the rn <= 3 filter keeps
    # the top-k semantics
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.lead("o_orderkey", 1).over(w).alias("next_ok"),
            F.lag("o_orderkey", 1).over(w).alias("prev_ok"),
        )
        .filter(F.col("rn") <= 3)
    )


def q27_window_running(spark, sf):
    # ts is long nanos after _t's normalization; ordering is identical.
    # Merged former q52: the ROWS running total and the RANGE 1h
    # rolling count/sum (frame by event TIME, not row position) share
    # the per-user partition — one query proves both frame kinds.
    ev = _t(spark, sf, "events")
    vi = F.round(F.round(F.col("value"), 6) * 1000000, 0).cast("long")
    wrows = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    HOUR_NS = 3_600 * 1_000_000_000
    wrange = Window.partitionBy("user_id").orderBy("ts").rangeBetween(-HOUR_NS, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.sum(vi).over(wrows).alias("run_micros"),
        F.count(F.lit(1)).over(wrange).alias("n_1h"),
        F.sum(vi).over(wrange).alias("sum_vi_1h"),
    )


def q28_time_window(spark, sf):
    # _t normalizes ts to long nanos; `div` keeps ns->us in exact long
    # arithmetic (double `/` has 256ns ulp at epoch-nanos magnitude)
    ev = _t(spark, sf, "events")
    vi = F.round(F.round(F.col("value"), 6) * 1000000, 0).cast("long")
    hour = F.date_trunc(
        "hour", F.timestamp_micros(F.expr("ts div 1000"))
    ).cast("string")
    g = (
        ev.select(hour.alias("hour"), vi.alias("vi"))
        .groupBy("hour")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("vi").alias("sv"))
    )
    return g.select("hour", "n", (F.col("sv").cast("double") / 1000000.0).alias("sum_value"))


# =====================================================================
# §2.8 spatial: two-phase interior/boundary predicate
# =====================================================================
def q29_spatial_box(spark, sf):
    from opencosmo_spark import Dataset, OpenCosmoHeader, make_box
    from opencosmo_spark.spatial.octree import morton_cell_column

    li = _t(spark, sf, "lineitem")
    # synthetic 3-D coordinates in [0,1)^3 from lineitem columns
    df = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") / 51.0).alias("x"),
        (F.col("l_discount") * 9.0).alias("y"),
        (F.col("l_tax") * 11.0).alias("z"),
    )
    df = df.withColumn(
        "__cell_id",
        morton_cell_column([F.col("x"), F.col("y"), F.col("z")], [0.0, 0.0, 0.0], 1.0, 4),
    )
    header = OpenCosmoHeader(box_size=1.0)
    ds = Dataset(df, header=header)
    region = make_box((0.2, 0.1, 0.0), (0.61, 0.73, 0.41))
    out = ds.bound(region)
    return out.df.select("l_orderkey", "l_linenumber")


# =====================================================================
# LLM-pipeline operators: text analysis / dedup / similarity
# =====================================================================
def q30_text_profile(spark, sf):
    # the full per-document text-analysis pass (formerly q30 + q32 +
    # q38 + q41 + q48, + the Gopher word rules and the self-trained
    # bigram-LM cross-entropy since round 6): char/token stats,
    # language-ID heuristic, quality score, whitespace/BPE-ish token
    # counts, gopher-style repetition signals — one scan, pure JVM —
    # plus the LM scoring joins (hash-keyed model tables,
    # integer-micro log-probs for cross-engine exactness).
    from opencosmo_spark.pipeline.text import (
        quality_score,
        repetition_stats,
        token_count,
    )

    d = _t(spark, sf, "documents")
    # char/token/lang-score algebra as SQL text (r15 — the _litarr
    # idiom applied to the entry glue; same expression trees)
    nospace = "length(regexp_replace(text, ' ', ''))"
    tokens = f"(length(text) - {nospace} + 1)"
    s = "concat(' ', lower(text), ' ')"

    def cnt(word):
        pat = f" {word} "
        return (
            f"((length({s}) - length(regexp_replace({s}, '{pat}', '')))"
            f" / {len(pat)})"
        )

    score = f"({cnt('the')} + {cnt('a')} + {cnt('of')})"
    stats = repetition_stats("text")
    # Gopher quality rules (pipeline/clean.py; Rae et al. 2021 A1.1) —
    # the word-level slice that is exactly mirrorable in SQL; the
    # synthetic vocabulary holds at most one of the paper's stopwords,
    # so the presence threshold is 1 here
    from opencosmo_spark.pipeline.clean import gopher_quality_flags

    g = gopher_quality_flags(d, min_stopword_hits=1)

    # self-trained bigram LM (pipeline/lm.py; CCNet-style signal):
    # every bigram is in-model, so the add-alpha conditional applies
    # everywhere; log-probs quantized to integer micros BEFORE the
    # per-doc sum (the q64 idiom) so the oracle matches bit-for-bit.
    # r15: the LAZY model form — the eager train_bigram_lm ran two
    # count JOBS at construction time (guide §5, driver does no data
    # work while planning); V now rides the plan as a broadcast 1-row
    # cross join, arithmetic bit-identical (0.1D * cast(vocab as
    # double) is the same double multiply the literal path ran).
    from opencosmo_spark.pipeline.lm import (
        _bigram_frame,
        train_bigram_lm_lazy,
    )

    lm = train_bigram_lm_lazy(d)
    bgr = _bigram_frame(d, "text", "doc_id")
    lm_agg = (
        bgr.join(lm["bigrams"], ["h1", "h2"], "left")
        .join(lm["unigrams"], ["h1"], "left")
        .crossJoin(F.broadcast(lm["vocab_scalar"]))
        .selectExpr(
            "doc_id",
            "cast(round(log((cast(coalesce(c12, 0) as double) + 0.1D) /"
            " (cast(coalesce(c1, 0) as double) + 0.1D *"
            " cast(vocab as double))) * 1000000.0D, 0) as bigint)"
            " AS __lpm",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__lpm").alias("lp_micro_sum"),
        )
    )
    g = g.join(lm_agg, "doc_id", "left")

    # URL featurization lane (pipeline/web.py, new r7): deterministic
    # synthetic URLs (documents has no url column) through the REAL
    # url_features / url_suffixes operators — registered-domain
    # heuristic incl. compound ccTLDs, path depth, and the suffix-
    # match blocklist semantics of url_filter, all oracle-mirrored.
    # r15: rendered as SQL text (same CASE/concat tree, one parse).
    from opencosmo_spark.pipeline.web import _url_suffixes_sql, url_features

    url_txt = (
        "concat('https://',"
        " CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END,"
        " source, '.',"
        " CASE WHEN doc_id % 4 = 0 THEN 'com'"
        " WHEN doc_id % 4 = 1 THEN 'co.uk'"
        " WHEN doc_id % 4 = 2 THEN 'org' ELSE 'net' END,"
        " CASE WHEN doc_id % 7 = 0"
        " THEN concat('/a/b/', cast(doc_id as string))"
        " ELSE concat('/p/', cast(doc_id as string)) END)"
    )
    g = url_features(
        g.withColumn("url", F.expr(url_txt)), "url"
    ).withColumn(
        "u_blocked",
        F.expr(
            f"arrays_overlap({_url_suffixes_sql('url')},"
            " cast(array('src3.com', 'src7.co.uk', 'src11.org')"
            " as array<string>))"
        ),
    )
    # Gopher A1.2 repetition slice (pipeline/clean.py, new r7): the
    # heaviest repeated 2-gram's char coverage and the duplicated
    # 5-gram mass, through the REAL gopher_repetition_flags helpers —
    # integer mass / integer content length, exactly SQL-mirrorable.
    # r15: the helpers' SQL-text twins (same sorted run-length scan).
    from opencosmo_spark.pipeline.clean import (
        _dup_gram_mass_sql,
        _top_gram_mass_sql,
        _word_grams_sql,
    )

    rep_words = "filter(split(trim(text), '\\\\s+'), w -> w != '')"
    rep_cl = (
        f"cast(greatest(length(concat_ws(' ', {rep_words})), 1) as double)"
    )
    r_top2 = (
        f"round(cast({_top_gram_mass_sql(_word_grams_sql(rep_words, 2))}"
        f" as double) / {rep_cl}, 6)"
    )
    r_dup5 = (
        f"round(least(cast("
        f"{_dup_gram_mass_sql(_word_grams_sql(rep_words, 5))}"
        f" as double) / {rep_cl}, 1.0D), 6)"
    )

    # per-domain cap lane (pipeline/sample.py::cap_per_group, r9): the
    # RefinedWeb anti-domination rule through the REAL operator —
    # survivors are the 5 smallest md5 ':cap' lanes per registered
    # domain, membership mirrored lane-exactly in the oracle
    from opencosmo_spark.pipeline.sample import cap_per_group

    cap = cap_per_group(
        g.select("doc_id", "url_domain"), "url_domain", 5
    ).select("doc_id", F.lit(True).alias("__cap"))
    g = g.join(cap, "doc_id", "left")

    # chat-render lane (pipeline/chat.py, r9; token spans r10): a
    # synthetic 3-turn conversation per doc through the REAL
    # render_chat — rendered length, the assistant turn's
    # supervised-span CHAR offsets, and (r10) its TOKEN offsets
    # (token_mode="whitespace": per-part \S+ counts) are pure
    # string/length algebra, mirrored exactly in the oracle

    from opencosmo_spark.pipeline.chat import render_chat

    msgs_txt = (
        "array(named_struct('role', 'system',"
        " 'content', 'You are helpful.'),"
        " named_struct('role', 'user',"
        " 'content', substring(text, 1, 40)),"
        " named_struct('role', 'assistant',"
        " 'content', substring(text, 41, 60)))"
    )
    chat = render_chat(
        d.selectExpr("doc_id", f"{msgs_txt} AS messages"),
        "messages",
        token_mode="whitespace",
    ).selectExpr(
        "doc_id",
        "length(text) AS chat_len",
        "element_at(supervised_spans, 1).start AS chat_sup_start",
        "element_at(supervised_spans, 1).`end` AS chat_sup_end",
        "cast(element_at(supervised_spans, 1).tok_start as bigint)"
        " AS chat_tok_start",
        "cast(element_at(supervised_spans, 1).tok_end as bigint)"
        " AS chat_tok_end",
    )
    g = g.join(chat, "doc_id", "left")

    # preference-pair lane (pipeline/preference.py, r10): a synthetic
    # (prompt, chosen, rejected) triple per doc through the REAL
    # render_preference_pairs + filter_preference_pairs flags — the
    # shared-prefix boundary, the completion span offsets (NULL when
    # the completion is empty: zero-length spans are dropped), and
    # the pair-hygiene flags are pure string/length algebra, mirrored
    # exactly in the oracle
    from opencosmo_spark.pipeline.preference import (
        filter_preference_pairs,
        render_preference_pairs,
    )

    def _msg(role, content):
        return f"array(named_struct('role', '{role}', 'content', {content}))"

    trip = d.selectExpr(
        "doc_id",
        f"{_msg('user', 'substring(text, 1, 30)')} AS prompt",
        f"{_msg('assistant', 'substring(text, 31, 40)')} AS chosen",
        f"{_msg('assistant', 'substring(text, 71, 20)')} AS rejected",
    )
    pp = filter_preference_pairs(
        render_preference_pairs(trip),
        min_completion_chars=0,
        drop_identical=False,
    ).selectExpr(
        "doc_id",
        "prompt_chars AS dpo_prompt_chars",
        "try_element_at(chosen_spans, 1).start AS dpo_chosen_start",
        "try_element_at(chosen_spans, 1).`end` AS dpo_chosen_end",
        "pp_rejected_chars AS dpo_rejected_chars",
        "pp_identical AS dpo_identical",
        "pp_len_ratio AS dpo_len_ratio",
    )
    g = g.join(pp, "doc_id", "left")

    return g.select(
        F.expr("doc_id"),
        F.expr("length(text)").alias("n_chars_calc"),
        F.expr(tokens).alias("n_tokens"),
        F.expr(f"cast({nospace} as double) / {tokens}").alias(
            "avg_word_len"
        ),
        F.expr(f"cast({score} as bigint)").alias("en_score"),
        F.expr(
            f"CASE WHEN {score} >= 2 THEN 'en' ELSE 'other' END"
        ).alias("lang_guess"),
        quality_score("text").alias("quality"),
        token_count("text", "whitespace").alias("n_ws"),
        token_count("text", "bpe").alias("n_bpe"),
        F.expr(r_top2).alias("r_top2gram_cf"),
        F.expr(r_dup5).alias("r_dup5gram_cf"),
        *[c.alias(name) for name, c in stats.items()],
        F.expr("g_word_count"),
        F.expr("g_mean_word_len"),
        F.expr("g_alpha_word_ratio"),
        F.expr("g_stopword_hits"),
        F.expr(
            "(g_ok_word_count AND g_ok_mean_word_len"
            " AND g_ok_alpha_word_ratio AND g_ok_stopwords)"
        ).alias("g_keep"),
        F.expr("coalesce(n_bigrams, 0)").alias("n_bigrams"),
        F.expr("coalesce(lp_micro_sum, 0)").alias("lp_micro_sum"),
        F.expr("url_host").alias("u_host"),
        F.expr("url_domain").alias("u_domain"),
        F.expr("url_tld").alias("u_tld"),
        F.expr("url_path_depth").alias("u_depth"),
        F.expr("u_blocked"),
        F.expr("coalesce(__cap, false)").alias("u_cap_keep"),
        F.expr("chat_len"),
        F.expr("chat_sup_start"),
        F.expr("chat_sup_end"),
        F.expr("chat_tok_start"),
        F.expr("chat_tok_end"),
        F.expr("dpo_prompt_chars"),
        F.expr("dpo_chosen_start"),
        F.expr("dpo_chosen_end"),
        F.expr("dpo_rejected_chars"),
        F.expr("dpo_identical"),
        F.expr("dpo_len_ratio"),
    )


def q31_dedup_fingerprint(spark, sf):
    # exact near-dup fingerprint: md5 of text prefix; keep-first per
    # group (hash-groupBy dedup) — plus `churn:*` lanes running the
    # REAL pipeline.report churn aggregate (exact mode) between two
    # overlapping snapshot views of the table (old: doc_id%3!=0,
    # new: doc_id%2!=0), hash-checked against the oracle's
    # independent distinct-fingerprint set arithmetic. r14: the lanes
    # come from corpus_churn_lanes — the same one-pass aggregate kept
    # LAZY and unioned into the plan, where corpus_churn collected 7
    # scalars to the driver mid-construction and re-uploaded them via
    # createDataFrame (a full extra job + round-trip inside the timed
    # path; values identical, oracle-verified). r15: the SPLIT form —
    # both snapshots are %-predicates over the same table, so ONE
    # scan with per-row membership flags replaces the two filtered
    # scans (value-identical; equivalence-tested in test_report).
    from opencosmo_spark.pipeline.report import corpus_churn_lanes_split

    d = _t(spark, sf, "documents")
    f = d.select(F.md5(F.substring(F.col("text"), 1, 40)).alias("fp"), "doc_id")
    g = f.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keep_doc_id")
    )
    base = g.filter(F.col("n") > 1)
    lanes = corpus_churn_lanes_split(
        d, F.col("doc_id") % 3 != 0, F.col("doc_id") % 2 != 0
    ).select(
        F.concat(F.lit("churn:"), F.col("metric")).alias("fp"),
        F.col("value").alias("n"),
        F.lit(None).cast("bigint").alias("keep_doc_id"),
    )
    return base.unionByName(lanes)


def q33_cosine_topk(spark, sf):
    # brute-force cosine top-k against one query vector (ANN baseline)
    emb = _t(spark, sf, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    j = emb.crossJoin(F.broadcast(qv))

    def dot(a, b):
        prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
        return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)

    def nrm(a):
        sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
        return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))

    cos = dot(F.col("embedding"), F.col("qv")) / (
        nrm(F.col("embedding")) * nrm(F.col("qv"))
    )
    return (
        j.select("vec_id", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


def q34_neardup_cosine(spark, sf):
    # embedding-cosine near-duplicate pairs (brute pair join baseline;
    # LSH-bucketed variant in opencosmo_spark.pipeline for scale)
    emb = _t(spark, sf, "embeddings").filter(F.col("vec_id") < 200)
    a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    j = a.crossJoin(b).filter(F.col("a") < F.col("b"))

    def dot(x, y):
        prods = F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double"))
        return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)

    def nrm(x):
        sq = F.transform(x, lambda p: p.cast("double") * p.cast("double"))
        return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))

    cos = dot(F.col("ea"), F.col("eb")) / (nrm(F.col("ea")) * nrm(F.col("eb")))
    return j.select("a", "b", F.round(cos, 6).alias("cos_sim")).filter(
        F.col("cos_sim") > 0.3
    )


def q35_minhash_lsh(spark, sf):
    # hasher="md5": same banding/bucket-join/exact-verify algebra as
    # the xxhash64 scale default, but every hash lane is reproducible
    # in DuckDB — so this pipeline is value-checked end to end (the
    # q40 literal-parameter pattern, applied to the hash primitive).
    from opencosmo_spark.pipeline.dedup import minhash_lsh_candidates

    d = _t(spark, sf, "documents")
    return minhash_lsh_candidates(
        d, text_col="text", id_col="doc_id", hasher="md5"
    )


def q36_simhash(spark, sf):
    from opencosmo_spark.pipeline.dedup import simhash

    d = _t(spark, sf, "documents")
    return simhash(d, text_col="text", id_col="doc_id", bits=60, hasher="md5")


def q37_sessionize(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag("ts").over(w)  # nanos
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000_000), 1).otherwise(0)
    sess = ev.withColumn(
        "sid",
        F.sum(new_sess).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    return sess.groupBy("user_id").agg(F.max("sid").alias("n_sessions"))


def q39_ngram_jaccard(spark, sf):
    # exact n-gram Jaccard dedup via inverted shingle index: explode
    # shingles, codegen equi-self-join on the shingle hash with the
    # size-ratio prune (min/max >= t), groupBy-count = intersection.
    # Only docs sharing >=1 shingle ever pair up, so no all-pairs
    # blowup. Production composition: run exact_dedup FIRST — byte
    # -identical copies are the main source of long posting lists and
    # collapse for one hash-groupBy, vs rediscovering each clique
    # pairwise here; this corpus is pre-deduplicated so the query runs
    # the similarity stage directly.
    from opencosmo_spark.pipeline.dedup import ngram_jaccard_pairs

    d = _t(spark, sf, "documents")
    return ngram_jaccard_pairs(d, k=3, threshold=0.5)


def q40_ann_lsh(spark, sf):
    # bucketed ANN scale path: random-hyperplane LSH, Hamming<=1 probing
    from opencosmo_spark.pipeline.similarity import lsh_bucket_ann

    emb = _t(spark, sf, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return lsh_bucket_ann(emb, [float(x) for x in qv], k=10, planes=8, seed=7)


def q42_unit_convention(spark, sf):
    # §2.9 unit layer end-to-end: scalefree -> physical (littleh removal
    # x scale-factor), a unit-keyed BLANKET conversion (Mpc -> kpc hits
    # every Mpc column after the switch, reference dataset.py:1055-1060)
    # and a per-column km -> m override, all as a Catalyst projection
    # rewrite (constants folded; no data pass).
    from opencosmo_spark import Dataset, OpenCosmoHeader
    from opencosmo_spark.header import Cosmology
    from opencosmo_spark.units import parse_unit

    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_quantity"
    )
    header = OpenCosmoHeader(cosmology=Cosmology(H0=70.0), redshift=0.25)
    ds = Dataset(
        li,
        header=header,
        units={
            "l_extendedprice": parse_unit("Mpc / h"),
            "l_discount": parse_unit("Mpc / h"),
            "l_quantity": parse_unit("km"),
        },
        convention="scalefree",
    )
    out = ds.with_units("physical", conversions={"Mpc": "kpc"}, l_quantity="m")
    return out.df.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 6).alias("price_kpc"),
        F.round("l_discount", 6).alias("disc_kpc"),
        F.round("l_quantity", 6).alias("qty_m"),
    )


def q43_grouping_sets(spark, sf):
    # grouping-sets family (absent in the reference — SURVEY §2.5 notes
    # it comes free in Spark; formerly q43 ROLLUP + q54 CUBE): each
    # variant computes all its subtotal combinations in ONE pass / one
    # shuffle — vs N scans for the manual union-of-groupbys.
    li = _t(spark, sf, "lineitem")

    # r14: ONE cube aggregation serves both variants. rollup's grouping
    # sets {(rf,ls),(rf),()} are exactly the cube's minus the ls-only
    # set, and grouping_id() tells the sets apart exactly (gid 2 =
    # ls-only; data NULLs cannot be confused with subtotal NULLs). Each
    # cube group row fans out to its tags with ONE explode — "cube"
    # always, plus "rollup" unless gid 2 — so the whole query is one
    # scan + one 4-set Expand + one exchange (guide §2.4: the old
    # rollup∪cube union ran two scans and two Expand+agg passes; a
    # filter-above-union form defeats ReusedExchange because the gid
    # predicate pushes below the exchange). Row-multiset identical to
    # the old form (oracle-verified).
    cub = li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(_cents(F.col("l_quantity")).cast("decimal(19,0)"))
        .cast("long")
        .alias("sum_qty_c"),
        F.count(F.lit(1)).alias("n"),
        F.grouping_id().alias("__gid"),
    )
    tags = F.when(
        F.col("__gid") != 2, F.array(F.lit("cube"), F.lit("rollup"))
    ).otherwise(F.array(F.lit("cube")))
    return cub.select(
        F.explode(tags).alias("gs"),
        "l_returnflag",
        "l_linestatus",
        "sum_qty_c",
        "n",
    )


def q44_asof_join(spark, sf):
    # as-of join: each event picks the latest order by the same customer
    # at-or-before the event time (union + ordered-window plan — one
    # shuffle, no range-join blowup; see opencosmo_spark/joins.py).
    from opencosmo_spark.joins import asof_join

    ev = _t(spark, sf, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
    )
    res = asof_join(
        ev,
        o,
        on="user_id",
        # ts is long nanos after _t's normalization; align orders to
        # nanos exactly
        left_time=F.col("ts"),
        # o_orderdate is TIMESTAMP_NTZ; session TZ is UTC so the cast
        # to TIMESTAMP is an identity relabeling
        right_time=F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        * F.lit(1000),
        tiebreak="o_orderkey",
    )
    return res.select("event_id", "user_id", "o_orderkey", "o_totalprice")


def q45_ivf_ann(spark, sf):
    # IVF-style ANN: deterministic coarse quantizer (first nlist ids),
    # probe the 2 nearest cells, exact rerank inside them.
    from opencosmo_spark.pipeline.similarity import ivf_ann

    emb = _t(spark, sf, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return ivf_ann(emb, [float(x) for x in qv], k=10, nlist=8, nprobe=2)


def q46_range_join(spark, sf):
    # point-in-interval range join via bin-bucketing (joins.py): for
    # each event, how many ERROR events (any user) occurred in the hour
    # before it. A bare inequality join plans BroadcastNestedLoop — the
    # bin join is an equi-join whose shuffle is O(events + 2x errors).
    from opencosmo_spark.joins import point_in_interval_join

    HOUR = 3_600_000_000  # microseconds
    ev = _t(spark, sf, "events").select(
        "event_id", F.expr("ts div 1000").alias("t_us")
    )
    err = (
        _t(spark, sf, "events")
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.expr("ts div 1000").alias("w_start"),
            (F.expr("ts div 1000") + F.lit(HOUR)).alias("w_end"),
        )
    )
    # (t_err, t_err + 1h] — strictly-after start, up to one hour later
    j = point_in_interval_join(
        ev, err, "t_us", "w_start", "w_end", HOUR, include_end=True
    ).filter(F.col("t_us") != F.col("w_start"))
    cnt = j.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_err_1h"))
    return (
        ev.select("event_id")
        .join(cnt, "event_id", "left")
        .select(
            "event_id",
            F.coalesce(F.col("n_err_1h"), F.lit(0)).alias("n_err_1h"),
        )
    )


def q47_dedup_clusters(spark, sf):
    # the dedup ENDGAME: MinHash-LSH candidate pairs -> connected
    # components (iterative min-label propagation, one shuffle per
    # round, rounds = graph diameter) -> per-doc canonical cluster id.
    # md5 hash lane so every step is reproducible in the SQL oracle
    # (transitive closure via recursive CTE).
    from opencosmo_spark.pipeline.dedup import (
        connected_components,
        minhash_lsh_candidates,
    )

    d = _t(spark, sf, "documents")
    pairs = minhash_lsh_candidates(d, text_col="text", id_col="doc_id", hasher="md5")
    return connected_components(pairs, d.select("doc_id"), id_col="doc_id")


def q49_ivf_lloyd_step(spark, sf):
    # the value-checkable IVF-training proof: ONE deterministic Lloyd
    # iteration (md5-lane seed init -> JVM argmax assignment ->
    # posexplode integer-exact update) emitted as per-(cell, pos)
    # counts and means — the same machinery train_ivf_codebook loops
    # (whose multi-round form stays non-SQL; full-probe==brute
    # invariants live in test_pipeline.py).
    from opencosmo_spark.pipeline.similarity import ivf_lloyd_step

    emb = _t(spark, sf, "embeddings")
    return ivf_lloyd_step(emb, nlist=8, hasher="md5")


def q50_stratified_sample(spark, sf):
    # per-stratum deterministic downsampling — the training-mix
    # operation (keep 50% of A, 10% of N, 25% of R), reproducible
    # across engines via the md5 hash lane (q07 pattern, per-stratum)
    from opencosmo_spark._parallel import spread_small_input
    from opencosmo_spark.pipeline.sample import stratified_sample

    # r14: the sampler lanes are scan-fused filters, so ALL their md5
    # work runs inside the scan stage — which on a single-row-group
    # local file is ONE task (stage metrics: 1.08 s of 1.85 s in a
    # 3-task stage; guide §2.5 input skew). Spread BOTH branches,
    # KEYED by the row id: hash repartition needs no
    # sort-before-repartition (the keyless form's local sort
    # serializes in the very task this relieves) and is retry-safe
    # (deterministic key); the stratified filter still pushes below
    # the exchange so only survivors shuffle, the split/epoch md5s
    # and the wrs rank key run post-exchange on all cores, and the
    # two branches' reduce stages overlap. No-op on already-parallel
    # inputs (the 100 TB case); row-wise lanes are partition-
    # independent, so the result is unchanged. Interleaved same-
    # session A/B best-of-4: none 2.32 s / lane-only 2.37 s / both
    # 1.75 s.
    li = spread_small_input(
        _t(spark, sf, "lineitem").withColumn(
            "k", F.col("l_orderkey") * 10 + F.col("l_linenumber")
        ),
        key=F.col("k"),
    )
    out = stratified_sample(
        li, {"A": 0.5, "N": 0.1, "R": 0.25}, "l_returnflag", id_col="k"
    )
    # split lane (new r7): deterministic train/val/test membership —
    # disjoint lane ranges, oracle-mirrored with the same integer
    # boundaries. r14: split_label is the one-pass column form of
    # split_corpus (same lane, same boundaries, row-identical to the
    # old union-of-three-filtered-scans — which re-scanned lineitem
    # and re-ran the lane md5 once PER split; oracle-verified
    # unchanged)
    from opencosmo_spark.pipeline.sample import split_label

    labeled = split_label(
        out, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="k"
    )
    # epoch lane (new r7): the REAL epoch_sample materializes the
    # multi-epoch side of the mix (N repeats twice, A carries a
    # half-lane of second copies) — copies = floor(rate) + fractional
    # lane, oracle-mirrored with the same integer boundary
    from opencosmo_spark.pipeline.sample import epoch_sample

    labeled = epoch_sample(
        labeled, {"A": 1.5, "N": 2.0, "R": 1.0}, "l_returnflag",
        id_col="k", salt="e",
    )
    out = labeled.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "split",
        F.col("epoch").cast("long").alias("epoch"),
    )
    # exact-k lane (new r7): the REAL weighted_reservoir_sample (A-ES,
    # Efraimidis-Spirakis) picks the 500 quantity-weighted winners —
    # integer-micro rank key + id tiebreak, oracle-mirrored, emitted as
    # membership-only rows in the shared (split, epoch) schema
    from opencosmo_spark.pipeline.sample import weighted_reservoir_sample

    wrs = weighted_reservoir_sample(
        li, "l_quantity", k=500, id_col="k", salt="w"
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.lit("wrs").alias("split"),
        F.lit(0).cast("long").alias("epoch"),
    )
    return out.unionByName(wrs)


def q51_tpch_q3(spark, sf):
    # TPC-H Q3 shape: 3-way join (filtered dim broadcast), agg, top-k.
    # Exact integer money (cents x (100 - discount-cents)) so the sum
    # is order-independent and hash-matches the oracle.
    c = (
        _t(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = _t(spark, sf, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    cents = _cents(F.col("l_extendedprice"))
    dc = _cents(F.col("l_discount"))
    j = li.join(
        o, li["l_orderkey"] == o["o_orderkey"]
    ).join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    g = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        (
            F.sum(cents * (F.lit(100) - dc)).cast("double") / 10000.0
        ).alias("revenue")
    )
    return (
        g.select(
            "l_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_orderpriority",
            F.round("revenue", 2).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def q56_pack_chunks(spark, sf):
    # chunk + SHARDED sequence packing in one pipeline (merged former
    # q55): explode each doc into <=64-token pieces, then assign
    # chunks to 256-token training sequences by cumulative fill in
    # (doc, chunk) order WITHIN each of 8 hash shards — the scale form
    # (window partitioned by shard, parallel per-shard sorts, packs
    # never span shards), not the single-reducer global sort.
    # chunk_text rides through, proving the chunk content too.
    from opencosmo_spark.pipeline.text import chunk_documents, pack_chunks

    d = _t(spark, sf, "documents")
    chunks = chunk_documents(d, max_tokens=64).withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(8)).cast("int")
    )
    packed = pack_chunks(
        chunks, budget=256, shard_col="shard", keep_cols=("chunk_text",)
    )
    # block-packer lanes (pipeline/text.py::block_pack_ids, r10): the
    # PRETRAINING concat-and-chunk through the REAL operator — token
    # ids are dummies (1..n; block boundaries depend only on lengths)
    # so the oracle mirrors the whole thing with window arithmetic.
    # SHARDED scale form (r12): docs hash into 4 block shards and
    # each shard concatenates/packs independently — the partitioned
    # window the 100-TB path uses, not the single-reducer global
    # sort. Lane rows: shard=-(bshard+1) marker (-1..-4, disjoint
    # from the >=0 chunk lanes), doc_id=per-shard block_id,
    # chunk_idx=#docs in the block, n_tokens=block fill,
    # pack_id=first doc in the block (the spans' offset-0 entry —
    # equals the shard's MIN(doc_id) in the block because docs
    # concatenate in id order within each shard)
    from opencosmo_spark.pipeline.text import block_pack_ids, token_count

    ids_df = d.select(
        "doc_id",
        F.sequence(
            F.lit(1), token_count("text", "whitespace").cast("int")
        ).alias("input_ids"),
    ).withColumn("bshard", F.pmod(F.col("doc_id"), F.lit(4)).cast("int"))
    blocks = block_pack_ids(
        ids_df, 256, shard_col="bshard", drop_last=False
    )
    lane = blocks.select(
        (-(F.col("bshard") + 1)).cast("int").alias("shard"),
        F.col("block_id").cast("long").alias("doc_id"),
        F.size("doc_spans").cast("long").alias("chunk_idx"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.lit("block").alias("chunk_text"),
        F.element_at("doc_spans", 1)["doc_id"].cast("long").alias(
            "pack_id"
        ),
    )
    return packed.unionByName(lane.select(*packed.columns))


def q57_sky_crossmatch(spark, sf):
    # nearest-neighbor sky cross-match via dynamic-neighbor bin join
    # (spatial/crossmatch.py) — deterministic synthetic sky derived
    # from customer/supplier keys; sep rounded to 6 before the argmin
    # so the DuckDB all-pairs oracle selects identically.
    from opencosmo_spark.spatial.crossmatch import crossmatch_sky

    def sky(df, key):
        return df.select(
            F.col(key).alias("id"),
            ((F.col(key) * 7919 % 36000) / 100.0).alias("ra"),
            (((F.col(key) * 104729) % 16000) / 100.0 - 80.0).alias("dec"),
        )

    left = sky(_t(spark, sf, "customer"), "c_custkey").withColumnRenamed(
        "id", "lid"
    )
    right = sky(_t(spark, sf, "supplier"), "s_suppkey").withColumnRenamed(
        "id", "rid"
    )
    return crossmatch_sky(
        left, right, 2.0, "lid", "rid", bin_deg=2.0, sep_decimals=6
    )


def q58_decontaminate(spark, sf):
    # benchmark decontamination: per-corpus-doc 4-gram overlap vs an
    # eval slice (docs with id % 20 == 0). The eval gram universe is
    # broadcast; the corpus is never shuffled by gram — only the
    # per-doc hit-count aggregation shuffles, keyed by doc id.
    from opencosmo_spark.pipeline.decontaminate import ngram_overlap

    d = _t(spark, sf, "documents")
    ev = d.filter(F.col("doc_id") % 20 == 0)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    return ngram_overlap(corpus, ev, k=4)


def q59_pii_scrub(spark, sf):
    # PII scrub over deterministic synthetic PII (the corpus itself is
    # clean, so each doc gets an email + IP + phone appended, SSN on
    # even ids): per-family counts + the fully redacted text, all JVM
    # regexp — the counts see the progressively-redacted text, so no
    # cross-family double counting.
    from opencosmo_spark.pipeline.pii import scrub_pii

    d = _t(spark, sf, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call 555-123-4567"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(" ssn 123-45-6789")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return scrub_pii(aug).select(
        "doc_id", "n_email", "n_ip", "n_ssn", "n_phone", "text"
    )


def q60_semantic_dedup(spark, sf):
    # SemDeDup-style embedding dedup: IVF-cell partition (first-8-ids
    # codebook, the q45 quantizer), within-cell pairwise cosine, mark
    # each vector's earliest same-cell match at sim >= 0.35 — the
    # quadratic term is bounded by cell population, never the corpus.
    from opencosmo_spark.pipeline.similarity import semantic_dedup

    emb = _t(spark, sf, "embeddings")
    return semantic_dedup(emb, threshold=0.35, nlist=8)


def q61_shard_assign(spark, sf):
    # deterministic global shuffle for training output: md5-lane hash
    # -> shard = lane mod 16, position = rank of lane within shard.
    # Same (shard, pos) on every run/engine/retry — the reproducible
    # data-loader order; write_sharded materializes it as file order.
    from opencosmo_spark.pipeline.shard import assign_shards

    li = _t(spark, sf, "lineitem").withColumn(
        "k", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    return assign_shards(li, 16, id_col="k").select("k", "shard", "shard_pos")


def q62_line_dedup(spark, sf):
    # corpus-level duplicate-line scrub (RefinedWeb boilerplate
    # removal), exercised at word granularity (sep=' ': the synthetic
    # corpus is single-line): any token appearing in >= 390/500 of
    # docs is boilerplate and is deleted from every doc; survivors
    # keep their order, emptied docs survive as text=''.
    # Second lane (r9): the same scrub through the DISCOVERY path —
    # discover_boilerplate_lines (per-doc-distinct explode +
    # frequent_items exact mode, k unbinding) feeds
    # line_dedup(hot_lines=...); with k above the vocabulary size the
    # discovered hot set must equal the exact min-dup set, so
    # text_disc hash-matches the oracle's independent recomputation.
    from opencosmo_spark.pipeline.dedup import line_dedup
    from opencosmo_spark.pipeline.sketch import discover_boilerplate_lines

    d = _t(spark, sf, "documents")
    base = line_dedup(d, sep=" ", min_dup=390).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    hot = discover_boilerplate_lines(d, k=100_000, min_dup=390, sep=" ")
    disc = line_dedup(d, sep=" ", hot_lines=hot).select(
        "doc_id", F.col("text").alias("text_disc")
    )
    return base.join(disc, "doc_id")


def q63_bm25_topk(spark, sf):
    # corpus keyword search: BM25 top-10 for a 3-term query. Per-term
    # tf is a pure array projection (no explode); corpus stats (N,
    # avgdl, per-term df) are ONE single-row aggregate broadcast back;
    # the top-k is TakeOrderedAndProject. "dup" is rare (idf ~3) so
    # the engineered near-dup docs rank first — a visible, stable
    # ordering.
    from opencosmo_spark.pipeline.search import bm25_topk

    d = _t(spark, sf, "documents")
    return bm25_topk(d, _BM25_TERMS, k=10)


def q64_nb_classify(spark, sf):
    # distributed Naive Bayes: train per-lang token models on the 80%
    # split (doc_id % 5 != 0), score the held-out 20%. Log-probs are
    # quantized to integer micro-nats so every sum is exact long
    # arithmetic — bit-reproducible across engines and partitionings.
    from opencosmo_spark.pipeline.classify import nb_classify

    d = _t(spark, sf, "documents")
    train = d.filter(F.col("doc_id") % 5 != 0)
    score = d.filter(F.col("doc_id") % 5 == 0)
    return nb_classify(train, score, num_features=64)


def q67_take_range_distributed(spark, sf):
    # distributed positional take: rows [1000, 1400) of orders in
    # o_orderkey order through the bucket-rank path (head_max=0 forces
    # it — the page is small at sf0.01 but the PLAN is the 100-TB
    # shape: quantile buckets + per-bucket row_number + broadcast
    # offsets, no single-partition window; plan pin in
    # tests/test_plan_shapes.py). Oracle: ORDER BY ... LIMIT/OFFSET.
    from opencosmo_spark.dataset import Dataset

    o = _t(spark, sf, "orders")
    ds = Dataset(o).sort_by("o_orderkey")
    return ds.take_range(1000, 1400, head_max=0).spark_df.select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def q65_dup_spans(spark, sf):
    # exact duplicated-span profile (substring-dedup niche): for each
    # doc, how many of its distinct 8-word windows appear in >= 2 docs
    # corpus-wide. Hash-combined windows (zip_with over shifted
    # slices), one explode keyed by span hash — never all-pairs.
    from opencosmo_spark.pipeline.dedup import duplicate_spans

    d = _t(spark, sf, "documents")
    return duplicate_spans(d, span=8, min_docs=2)


# =====================================================================
# registry
# =====================================================================
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # 51 entries: 50 fill the driver's 50-row correctness window
        # (every one gets a driver oracle row), and q67 — the 51st,
        # added r13 under the documented overflow contract (commit
        # a30246a) — sits OUTSIDE that window and is oracle-checked
        # in-repo instead (tools/check_oracle.py covers all 51).
        # Formerly-separate trivial queries were merged, keeping
        # operator coverage: q02+q03 -> q02_select_drop, q10+q11 ->
        # q10_derived_cols, q24+q25+q23 -> q24_set_ops (the anti-join
        # family member joined in round 6, freeing a slot for the
        # pair-engine parity row q66), and q30+q32+q38+q41+q48 ->
        # q30_text_profile (see COVERAGE.md).
        "q01_scan_filter_project": q01_scan_filter_project,
        "q02_select_drop": q02_select_drop,
        "q04_filter_compound": q04_filter_compound,
        "q06_filter_scalar_mean": q06_filter_scalar_mean,
        "q07_sample_hash": q07_sample_hash,
        "q08_sort_topk": q08_sort_topk,
        "q10_derived_cols": q10_derived_cols,
        "q13_zscore": q13_zscore,
        "q14_quantile_filter": q14_quantile_filter,
        "q15_tpch_q1": q15_tpch_q1,
        "q16_degrade": q16_degrade,
        "q17_histogram": q17_histogram,
        "q19_join_1n": q19_join_1n,
        "q20_join_left": q20_join_left,
        "q21_semi_cascade": q21_semi_cascade,
        "q22_join_nested_agg": q22_join_nested_agg,
        "q66_pair_counts": q66_pair_counts,
        "q24_set_ops": q24_set_ops,
        "q26_window_topk": q26_window_topk,
        "q27_window_running": q27_window_running,
        "q28_time_window": q28_time_window,
        "q29_spatial_box": q29_spatial_box,
        "q30_text_profile": q30_text_profile,
        "q31_dedup_fingerprint": q31_dedup_fingerprint,
        "q33_cosine_topk": q33_cosine_topk,
        "q34_neardup_cosine": q34_neardup_cosine,
        "q35_minhash_lsh": q35_minhash_lsh,
        "q36_simhash": q36_simhash,
        "q37_sessionize": q37_sessionize,
        "q39_ngram_jaccard": q39_ngram_jaccard,
        "q40_ann_lsh": q40_ann_lsh,
        "q42_unit_convention": q42_unit_convention,
        "q43_grouping_sets": q43_grouping_sets,
        "q44_asof_join": q44_asof_join,
        "q45_ivf_ann": q45_ivf_ann,
        "q46_range_join": q46_range_join,
        "q47_dedup_clusters": q47_dedup_clusters,
        "q49_ivf_lloyd_step": q49_ivf_lloyd_step,
        "q50_stratified_sample": q50_stratified_sample,
        "q51_tpch_q3": q51_tpch_q3,
        "q56_pack_chunks": q56_pack_chunks,
        "q57_sky_crossmatch": q57_sky_crossmatch,
        "q58_decontaminate": q58_decontaminate,
        "q59_pii_scrub": q59_pii_scrub,
        "q60_semantic_dedup": q60_semantic_dedup,
        "q61_shard_assign": q61_shard_assign,
        "q62_line_dedup": q62_line_dedup,
        "q63_bm25_topk": q63_bm25_topk,
        "q64_nb_classify": q64_nb_classify,
        "q65_dup_spans": q65_dup_spans,
        "q67_take_range_distributed": q67_take_range_distributed,
    }


_MD5_LANE = "('0x' || substring(md5({x}), 1, 15))::BIGINT"

# q63 query terms — shared by the Spark query and its oracle
_BM25_TERMS = ["dup", "vector", "key"]


def _bm25_oracle_sql(terms=None, k1=1.2, b=0.75, k=10) -> str:
    """DuckDB twin of q63, generated from the same term list. Literal
    association order mirrors pipeline/search.py exactly (every
    constant cast ::DOUBLE — DuckDB decimal literals would otherwise
    run decimal, not IEEE double, arithmetic)."""
    terms = terms or _BM25_TERMS
    toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    tf_cols = ",\n                     ".join(
        f"len(list_filter({toks}, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n                     ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    terms_sql = "\n                     + ".join(
        f"ln(1.0::DOUBLE + (n - CAST(df{i} AS DOUBLE) + 0.5::DOUBLE)"
        f" / (CAST(df{i} AS DOUBLE) + 0.5::DOUBLE))"
        f" * CAST(tf{i} AS DOUBLE) * {k1 + 1.0}::DOUBLE"
        f" / (CAST(tf{i} AS DOUBLE) + {k1}::DOUBLE * ({1.0 - b}::DOUBLE"
        f" + {b}::DOUBLE * dl / (CAST(sumdl AS DOUBLE) / n)))"
        for i in range(len(terms))
    )
    hit = " OR ".join(f"tf{i} > 0" for i in range(len(terms)))
    return f"""
            WITH tf AS (
              SELECT doc_id, len({toks}) AS dl,
                     {tf_cols}
              FROM documents
            ), s AS (
              SELECT count(*) AS n, SUM(dl) AS sumdl,
                     {df_cols}
              FROM tf
            )
            SELECT doc_id,
                   round({terms_sql}, 6) AS bm25
            FROM tf, s
            WHERE {hit}
            ORDER BY bm25 DESC, doc_id
            LIMIT {k}
        """


def _pii_oracle_sql() -> str:
    """DuckDB twin of q59: the synthetic-PII augmentation, then one CTE
    per PII family applying count + redact on the PROGRESSIVELY
    redacted text — the pattern strings are imported from
    pipeline.pii.PII_PATTERNS, so both engines run literally the same
    regexes in the same order (both are RE2-compatible by contract)."""
    from opencosmo_spark.pipeline.pii import PII_PATTERNS

    sql = """
        WITH s0 AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id || '@example.com from 10.0.'
                      || (doc_id % 256) || '.7 call 555-123-4567'
                      || CASE WHEN doc_id % 2 = 0
                              THEN ' ssn 123-45-6789' ELSE '' END AS text
          FROM documents
        )"""
    carried: list[str] = []
    for i, (name, pat, repl) in enumerate(PII_PATTERNS, 1):
        p = pat.replace("'", "''")
        cols = ", ".join(carried + [""]) if carried else ""
        sql += f""", s{i} AS (
          SELECT doc_id, {cols}
                 CAST(len(regexp_extract_all(text, '{p}')) AS INTEGER)
                 AS n_{name},
                 regexp_replace(text, '{p}', '{repl}', 'g') AS text
          FROM s{i - 1}
        )"""
        carried.append(f"n_{name}")
    sql += f"""
        SELECT doc_id, {", ".join(carried)}, text FROM s{len(PII_PATTERNS)}
    """
    return sql


def _minhash_oracle_sql(
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.2,
) -> str:
    """DuckDB twin of minhash_lsh_candidates(hasher='md5'): identical
    md5-lane shingles, signatures, band keys, bucket join, and
    exact-Jaccard verify."""
    k = shingle_k
    rows = num_hashes // bands
    lane_sh = _MD5_LANE.format(x=f"array_to_string(ws[i:i+{k - 1}], ' ')")
    sig_lanes = ", ".join(
        "list_min(list_transform(sh, h -> "
        + _MD5_LANE.format(x=f"h::VARCHAR || ':{j}'")
        + "))"
        for j in range(num_hashes)
    )
    band_keys = ", ".join(
        _MD5_LANE.format(
            x="'"
            + str(b)
            + "' || ':' || "
            + " || ':' || ".join(
                f"sig[{b * rows + r + 1}]::VARCHAR" for r in range(rows)
            )
        )
        for b in range(bands)
    )
    return f"""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, greatest(len(ws) - {k - 1}, 1)),
                   i -> {lane_sh})) AS sh
          FROM w
        ), sig AS (
          SELECT doc_id, sh, [{sig_lanes}] AS sig FROM sh
        ), banded AS (
          SELECT doc_id, UNNEST([{band_keys}]) AS band_key FROM sig
        ), cand AS (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM banded x JOIN banded y USING (band_key)
          WHERE x.doc_id < y.doc_id
        )
        SELECT a, b,
               round(len(list_intersect(sa.sh, sb.sh))::DOUBLE
                     / len(list_distinct(sa.sh || sb.sh)), 6) AS jaccard
        FROM cand
        JOIN sh sa ON sa.doc_id = a
        JOIN sh sb ON sb.doc_id = b
        WHERE round(len(list_intersect(sa.sh, sb.sh))::DOUBLE
                    / len(list_distinct(sa.sh || sb.sh)), 6) >= {threshold}
    """


def _simhash_oracle_sql(bits: int = 60) -> str:
    """DuckDB twin of simhash(hasher='md5', bits=60): per-word md5
    lanes, ±1 bit sums, sign-bit reassembly."""
    lane = _MD5_LANE.format(x="w")
    bit_terms = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN {1 << i}::BIGINT ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
        WITH e AS (
          SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
        ), h AS (
          SELECT doc_id, {lane} AS h FROM e WHERE w <> ''
        )
        SELECT doc_id, {bit_terms} AS simhash
        FROM h GROUP BY doc_id
    """


def _ann_lsh_oracle_sql(dim: int = 64, planes: int = 8, seed: int = 7) -> str:
    """DuckDB oracle for q40: regenerate the seed-deterministic
    hyperplanes used by ``lsh_bucket_ann`` and embed them as literals."""
    import random

    rng = random.Random(seed)
    hps = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(repr(v) for v in hp)}]) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, hp in enumerate(hps)
    )
    probe = ", ".join(str(1 << i) for i in range(planes))
    return f"""
        WITH b AS (
          SELECT vec_id, embedding, {bucket_terms} AS bucket FROM embeddings
        ), q AS (
          SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0
        ), c AS (
          SELECT b.vec_id, b.embedding, q.qv FROM b, q
          WHERE b.bucket = q.qb OR xor(b.bucket, q.qb) IN ({probe})
        ), z AS (
          SELECT vec_id,
                 CAST(UNNEST(embedding) AS DOUBLE) AS a,
                 CAST(UNNEST(qv) AS DOUBLE) AS qvv
          FROM c
        )
        SELECT vec_id,
               round(SUM(a*qvv) / (sqrt(SUM(a*a)) * sqrt(SUM(qvv*qvv))), 6)
               AS cos_sim
        FROM z GROUP BY vec_id ORDER BY cos_sim DESC, vec_id LIMIT 10
    """


def oracle_sql() -> dict[str, str]:
    cents = "CAST(round(l_extendedprice*100, 0) AS BIGINT)"
    dc = "CAST(round(l_discount*100, 0) AS BIGINT)"
    tc = "CAST(round(l_tax*100, 0) AS BIGINT)"
    vi = "CAST(round(round(value, 6)*1000000, 0) AS BIGINT)"
    return {
        "q01_scan_filter_project": """
            SELECT l_orderkey, l_linenumber, l_extendedprice
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 25
        """,
        "q02_select_drop": """
            SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber FROM lineitem
        """,
        "q04_filter_compound": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE (l_quantity >= 30 AND l_discount < 0.05)
               OR l_returnflag IN ('R', 'A')
        """,
        "q06_filter_scalar_mean": f"""
            SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            WHERE {cents} * (SELECT count(*) FROM lineitem)
                  > (SELECT SUM({cents}) FROM lineitem)
        """,
        "q07_sample_hash": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE substr(md5(CAST(l_orderkey*10 + l_linenumber AS VARCHAR)), 1, 2) <= '14'
        """,
        "q08_sort_topk": """
            SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 300
        """,
        "q10_derived_cols": """
            WITH t AS (
              SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
                     l_tax, l_extendedprice,
                     l_extendedprice * (1 - l_discount) * (1 + l_tax) AS rev
              FROM lineitem
            )
            SELECT l_orderkey, l_linenumber, rev,
                   round(log10(rev), 6) AS lg,
                   round(sqrt(rev), 6) AS sq,
                   round(asin(rev / 1000000.0), 6) AS ang,
                   sqrt(l_quantity*l_quantity + l_discount*l_discount
                        + l_tax*l_tax) AS norm,
                   round(-2.5 * log10(pow(10, l_discount*-0.4)
                                      + pow(10, l_tax*-0.4)), 6) AS mag,
                   -- derived gas fields (same operand order as the
                   -- engine exprs; consts are exact double literals)
                   round(mu, 9) AS mu,
                   round(log10((mu * ((l_quantity*10000.0) * 1e10))
                               * 8.076500851845762e-09), 6) AS gtemp,
                   round(log10((((1.0 - (l_discount+0.24)*0.5)
                                 * (1.0 - (l_discount+0.24)))
                                * (l_extendedprice*1e-30))
                               * (l_quantity*1e39)
                               * 3.5744105239080025e+47), 6) AS gem
            FROM (
              SELECT *,
                     1.0 / (((1.0 - (l_discount+0.24)) * 2.0
                             + (l_discount+0.24) * 0.75)
                            + ((l_tax*10.0) * 0.012899) * 0.03125) AS mu
              FROM t
            )
        """,
        "q13_zscore": f"""
            -- z = (pc*n - s)/sqrt(n*ss - s^2), integer-exact inputs.
            -- The radicand goes HUGEINT -> VARCHAR -> DOUBLE because
            -- DuckDB's direct HUGEINT->DOUBLE cast is not correctly
            -- rounded (1 ULP off vs IEEE round-to-nearest).
            WITH s AS (
              SELECT SUM({cents}) AS s, SUM({cents}*{cents}) AS ss,
                     count(*) AS n
              FROM lineitem
            )
            SELECT l_orderkey, l_linenumber,
                   CAST(CAST({cents}*s.n - s.s AS VARCHAR) AS DOUBLE)
                   / sqrt(CAST(CAST(s.n*s.ss - s.s*s.s AS VARCHAR) AS DOUBLE))
                   AS z
            FROM lineitem, s
        """,
        "q14_quantile_filter": """
            SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            WHERE l_extendedprice >
                  (SELECT quantile_cont(l_extendedprice, 0.9) FROM lineitem)
        """,
        "q15_tpch_q1": f"""
            WITH e AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(l_quantity AS BIGINT) AS qi,
                     {cents} AS pc, {dc} AS dcc, {tc} AS tcc
              FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            )
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(qi) AS DOUBLE) AS sum_qty,
                   CAST(SUM(pc) AS DOUBLE)/100.0 AS sum_base_price,
                   CAST(SUM(pc*(100-dcc)) AS DOUBLE)/10000.0 AS sum_disc_price,
                   CAST(SUM(pc*(100-dcc)*(100+tcc)) AS DOUBLE)/1000000.0 AS sum_charge,
                   CAST(SUM(qi) AS DOUBLE)/count(*) AS avg_qty,
                   CAST(SUM(pc) AS DOUBLE)/count(*)/100.0 AS avg_price,
                   count(*) AS count_order
            FROM e GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q16_degrade": f"""
            SELECT CAST(floor(user_id / 16) AS BIGINT) AS bucket,
                   CAST(SUM({vi}) AS DOUBLE)/count(*)/1000000.0 AS avg_value,
                   count(*) AS n
            FROM events GROUP BY 1
        """,
        "q17_histogram": """
            SELECT CAST(floor(o_totalprice / 20000) AS BIGINT) AS bin,
                   count(*) AS n
            FROM orders GROUP BY 1
        """,
        "q19_join_1n": """
            SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_totalprice > 200000
        """,
        "q20_join_left": """
            SELECT o_orderkey, c_name
            FROM orders LEFT JOIN
                 (SELECT * FROM customer WHERE c_acctbal < -900) c
                 ON o_custkey = c.c_custkey
        """,
        "q21_semi_cascade": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_orderkey IN (
              SELECT o_orderkey FROM orders WHERE o_custkey IN (
                SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))
        """,
        "q22_join_nested_agg": f"""
            SELECT n_name,
                   CAST(SUM({cents} * (100 - {dc})) AS DOUBLE)/10000.0 AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "q67_take_range_distributed": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders ORDER BY o_orderkey LIMIT 400 OFFSET 1000
        """,
        "q66_pair_counts": """
            WITH pp AS (
              SELECT doc_id AS id,
                ((('0x' || substring(md5('p:' || doc_id || ':x'), 1, 15))::BIGINT)::DOUBLE
                 / 1152921504606846976.0) * 100.0 AS x,
                ((('0x' || substring(md5('p:' || doc_id || ':y'), 1, 15))::BIGINT)::DOUBLE
                 / 1152921504606846976.0) * 100.0 AS y,
                ((('0x' || substring(md5('p:' || doc_id || ':z'), 1, 15))::BIGINT)::DOUBLE
                 / 1152921504606846976.0) * 100.0 AS z
              FROM documents
            ), qq AS (
              SELECT vec_id AS id,
                ((('0x' || substring(md5('q:' || vec_id || ':x'), 1, 15))::BIGINT)::DOUBLE
                 / 1152921504606846976.0) * 100.0 AS x,
                ((('0x' || substring(md5('q:' || vec_id || ':y'), 1, 15))::BIGINT)::DOUBLE
                 / 1152921504606846976.0) * 100.0 AS y,
                ((('0x' || substring(md5('q:' || vec_id || ':z'), 1, 15))::BIGINT)::DOUBLE
                 / 1152921504606846976.0) * 100.0 AS z
              FROM embeddings
            ), ddp AS (
              -- dist rounded to 6 decimals on both engines before
              -- binning: edge-ulp pairs can't bin differently
              SELECT round(sqrt(
                pow(least(abs(a.x - b.x), 100.0 - abs(a.x - b.x)), 2)
              + pow(least(abs(a.y - b.y), 100.0 - abs(a.y - b.y)), 2)
              + pow(least(abs(a.z - b.z), 100.0 - abs(a.z - b.z)), 2)), 6) AS dist
              FROM pp a JOIN pp b ON a.id < b.id
            ), drp AS (
              SELECT round(sqrt(
                pow(least(abs(a.x - b.x), 100.0 - abs(a.x - b.x)), 2)
              + pow(least(abs(a.y - b.y), 100.0 - abs(a.y - b.y)), 2)
              + pow(least(abs(a.z - b.z), 100.0 - abs(a.z - b.z)), 2)), 6) AS dist
              FROM pp a CROSS JOIN qq b
            ), ddb AS (
              SELECT CASE WHEN dist >= 0 AND dist < 5 THEN 0
                          WHEN dist >= 5 AND dist < 10 THEN 1 END AS bin,
                     count(*) AS dd
              FROM ddp WHERE dist < 10 GROUP BY 1
            ), drb AS (
              SELECT CASE WHEN dist >= 0 AND dist < 5 THEN 0
                          WHEN dist >= 5 AND dist < 10 THEN 1 END AS bin,
                     count(*) AS dr
              FROM drp WHERE dist < 10 GROUP BY 1
            )
            SELECT g.bin,
                   CAST(COALESCE(ddb.dd, 0) AS BIGINT) AS dd,
                   CAST(COALESCE(drb.dr, 0) AS BIGINT) AS dr
            FROM (VALUES (0), (1)) AS g(bin)
            LEFT JOIN ddb ON ddb.bin = g.bin
            LEFT JOIN drb ON drb.bin = g.bin
            ORDER BY g.bin
        """,
        "q24_set_ops": """
            SELECT event_type AS tag, count(*) AS val FROM (
              SELECT * FROM events WHERE value > 50
              UNION ALL
              SELECT * FROM events WHERE event_type = 'click'
            ) GROUP BY event_type
            UNION ALL
            SELECT 'ix_custkey' AS tag, c_custkey AS val FROM (
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
              INTERSECT
              SELECT c_custkey FROM customer WHERE c_acctbal > 0
            )
            UNION ALL
            SELECT 'anti_orderkey' AS tag, CAST(o_orderkey AS BIGINT) AS val
            FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM lineitem
                              WHERE l_orderkey = o_orderkey)
            UNION ALL
            SELECT 'rl:' || l_returnflag || l_linestatus AS tag,
                   CAST(0 AS BIGINT) AS val
            FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
        """,
        "q26_window_topk": """
            SELECT o_custkey, o_orderkey, rn, rnk, drnk, quartile,
                   next_ok, prev_ok
            FROM (
              SELECT o_custkey, o_orderkey,
                     row_number() OVER w AS rn,
                     CAST(rank() OVER w AS BIGINT) AS rnk,
                     CAST(dense_rank() OVER w AS BIGINT) AS drnk,
                     CAST(ntile(4) OVER w AS INTEGER) AS quartile,
                     lead(o_orderkey, 1) OVER w AS next_ok,
                     lag(o_orderkey, 1) OVER w AS prev_ok
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey))
            WHERE rn <= 3
        """,
        "q27_window_running": f"""
            SELECT user_id, event_id,
                   CAST(SUM({vi}) OVER wr AS BIGINT) AS run_micros,
                   CAST(count(*) OVER wh AS BIGINT) AS n_1h,
                   CAST(SUM({vi}) OVER wh AS BIGINT) AS sum_vi_1h
            FROM events
            WINDOW wr AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW),
                   wh AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
                          RANGE BETWEEN 3600000000000 PRECEDING
                                AND CURRENT ROW)
        """,
        "q28_time_window": f"""
            SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
                   count(*) AS n,
                   CAST(SUM({vi}) AS DOUBLE)/1000000.0 AS sum_value
            FROM events GROUP BY 1
        """,
        "q29_spatial_box": """
            SELECT l_orderkey, l_linenumber FROM lineitem
            WHERE l_quantity/51.0 >= 0.2 AND l_quantity/51.0 < 0.61
              AND l_discount*9.0 >= 0.1 AND l_discount*9.0 < 0.73
              AND l_tax*11.0 >= 0.0 AND l_tax*11.0 < 0.41
        """,
        "q30_text_profile": r"""
            WITH stats AS (
              SELECT doc_id,
                     length(text) AS n_chars_calc,
                     length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
                     CAST(length(replace(text, ' ', '')) AS DOUBLE)
                       / (length(text) - length(replace(text, ' ', '')) + 1)
                     AS avg_word_len
              FROM documents
            ), lt AS (
              SELECT doc_id, ' ' || lower(text) || ' ' AS s FROM documents
            ), lang AS (
              SELECT doc_id,
                     (length(s) - length(replace(s, ' the ', ''))) / 5.0
                   + (length(s) - length(replace(s, ' a ', ''))) / 3.0
                   + (length(s) - length(replace(s, ' of ', ''))) / 4.0 AS score
              FROM lt
            ), qm AS (
              SELECT doc_id,
                     length(text) AS len,
                     len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
                     length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
                     length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS punct
              FROM documents
            ), qs AS (
              SELECT doc_id,
                     least(len / 500.0, 1.0) AS len_score,
                     CASE WHEN CAST(alpha AS DOUBLE) / greatest(n_tok, 1)
                               BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END AS word_score,
                     CAST(alpha AS DOUBLE) / greatest(len, 1) AS alpha_ratio,
                     CASE WHEN CAST(punct AS DOUBLE) / greatest(len, 1) < 0.1
                          THEN 1.0 ELSE 0.3 END AS punct_score
              FROM qm
            ), tok AS (
              SELECT doc_id,
                     len(regexp_split_to_array(trim(text), '\s+')) AS n_ws,
                     len(regexp_extract_all(text,
                         '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS n_bpe
              FROM documents
            ), rw AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(text), '\s+') AS ws
              FROM documents
            ), rb AS (
              SELECT doc_id, ws, len(ws) AS n,
                     list_transform(
                       generate_series(1, greatest(len(ws) - 1, 1)),
                       i -> concat_ws(' ', ws[i], ws[i+1])) AS bg
              FROM rw
            ), rep AS (
              SELECT doc_id,
                     CAST(n AS BIGINT) AS n_words,
                     round(1.0 - len(list_distinct(ws))::DOUBLE
                           / greatest(n, 1), 6) AS dup_word_frac,
                     round(list_max(list_transform(list_distinct(ws),
                             x -> len(list_filter(ws, y -> y = x))))::DOUBLE
                           / greatest(n, 1), 6) AS top_word_frac,
                     round(1.0 - len(list_distinct(bg))::DOUBLE
                           / greatest(len(bg), 1), 6) AS dup_bigram_frac
              FROM rb
            )
            , lw AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS lws
              FROM documents
            ), lbg AS (
              SELECT doc_id,
                     UNNEST(list_transform(
                       range(1, greatest(len(lws), 1)),
                       i -> {'w1': lws[i], 'w2': lws[i+1]}),
                       recursive := true)
              FROM lw
            ), lc12 AS (
              SELECT w1, w2, count(*) AS c12 FROM lbg GROUP BY 1, 2
            ), lc1 AS (
              SELECT w1, count(*) AS c1 FROM lbg GROUP BY 1
            ), lv AS (
              SELECT count(DISTINCT w) AS v
              FROM (SELECT UNNEST(lws) AS w FROM lw)
            ), lsc AS (
              SELECT b.doc_id,
                     CAST(round(ln((c.c12 + 0.1::DOUBLE)
                                   / (u.c1 + 0.1::DOUBLE * lv.v))
                                * 1000000, 0) AS BIGINT) AS lpm
              FROM lbg b
              JOIN lc12 c ON b.w1 = c.w1 AND b.w2 = c.w2
              JOIN lc1 u ON b.w1 = u.w1
              CROSS JOIN lv
            ), lagg AS (
              SELECT doc_id, count(*) AS n_bigrams,
                     CAST(SUM(lpm) AS BIGINT) AS lp_micro_sum
              FROM lsc GROUP BY doc_id
            ), gq AS (
              SELECT doc_id,
                     len(ws) AS g_word_count,
                     round(list_aggregate(list_transform(ws,
                             w -> CAST(length(w) AS DOUBLE)), 'sum')
                           / greatest(len(ws), 1), 6) AS g_mean_word_len,
                     round(CAST(len(list_filter(ws,
                             w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                           / greatest(len(ws), 1), 6) AS g_alpha_word_ratio,
                     len(list_filter(
                           ['the','be','to','of','and','that','have','with'],
                           st -> list_contains(
                                   list_transform(ws, x -> lower(x)), st)))
                       AS g_stopword_hits
              FROM rw
            )
            , rgw AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents
            ), rgg AS (
              SELECT doc_id,
                     greatest(length(array_to_string(ws, ' ')), 1) AS cl,
                     CASE WHEN len(ws) >= 2 THEN
                       list_transform(generate_series(1, len(ws) - 1),
                         i -> concat_ws(' ', ws[i], ws[i+1]))
                     ELSE CAST([] AS VARCHAR[]) END AS g2,
                     CASE WHEN len(ws) >= 5 THEN
                       list_transform(generate_series(1, len(ws) - 4),
                         i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2],
                                        ws[i+3], ws[i+4]))
                     ELSE CAST([] AS VARCHAR[]) END AS g5
              FROM rgw
            ), rgm AS (
              SELECT doc_id,
                     round(COALESCE(list_max(list_transform(
                         list_distinct(g2),
                         g -> CASE WHEN len(list_filter(g2, y -> y = g)) >= 2
                              THEN len(list_filter(g2, y -> y = g))
                                   * length(g)
                              ELSE 0 END)), 0)::DOUBLE / cl, 6)
                       AS r_top2gram_cf,
                     round(least(COALESCE(list_sum(list_transform(
                         list_distinct(g5),
                         g -> CASE WHEN len(list_filter(g5, y -> y = g)) >= 2
                              THEN len(list_filter(g5, y -> y = g))
                                   * length(g)
                              ELSE 0 END)), 0)::DOUBLE / cl, 1.0), 6)
                       AS r_dup5gram_cf
              FROM rgg
            )
            , uu AS (
              SELECT doc_id,
                     source || '.' ||
                     (CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
                           WHEN 2 THEN 'org' ELSE 'net' END) AS dom,
                     (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END) AS sub,
                     (CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'uk'
                           WHEN 2 THEN 'org' ELSE 'net' END) AS tld,
                     (CASE WHEN doc_id % 7 = 0 THEN 3 ELSE 2 END)::INTEGER
                       AS depth
              FROM documents
            )
            , cap AS (
              SELECT doc_id,
                     row_number() OVER (
                       PARTITION BY dom
                       ORDER BY ('0x' || substring(
                           md5(doc_id::VARCHAR || ':cap'), 1, 15))::BIGINT,
                         doc_id
                     ) AS rn
              FROM uu
            )
            -- chat-render lane mirror: template <|role|>\ncontent\n per
            -- turn; fixed system part is 28 chars, user header 10 +
            -- len(u), assistant header 14 -> supervised content starts
            -- at 52 + len(u). Token coordinates (whitespace mode,
            -- per-part \S+ counts): system part = 1 header + 3
            -- content tokens, each other header 1 token, footers 0 ->
            -- assistant content tokens start at 6 + tokens(u)
            , chat AS (
              SELECT doc_id,
                     52 + length(substr(text, 1, 40)) AS chat_sup_start,
                     52 + length(substr(text, 1, 40))
                        + length(substr(text, 41, 60)) AS chat_sup_end,
                     6 + length(regexp_extract_all(
                           substr(text, 1, 40), '\S+'))
                       AS chat_tok_start,
                     6 + length(regexp_extract_all(
                           substr(text, 1, 40), '\S+'))
                       + length(regexp_extract_all(
                           substr(text, 41, 60), '\S+'))
                       AS chat_tok_end
              FROM documents
            )
            -- preference-pair lane mirror: prompt = <|user|>\nU\n ->
            -- prompt_chars = 10 + len(U); completion content starts
            -- 14 chars (the assistant header) past the shared prefix;
            -- empty completions drop their zero-length span (NULL
            -- offsets); hygiene flags are pure content-length algebra
            , dpo AS (
              SELECT doc_id,
                     10 + length(substr(text, 1, 30)) AS dpo_prompt_chars,
                     substr(text, 31, 40) AS cch,
                     substr(text, 71, 20) AS rch
              FROM documents
            )
            SELECT s.doc_id, s.n_chars_calc, s.n_tokens, s.avg_word_len,
                   CAST(l.score AS BIGINT) AS en_score,
                   CASE WHEN l.score >= 2 THEN 'en' ELSE 'other' END AS lang_guess,
                   round(0.3*q.len_score + 0.2*q.word_score
                         + 0.3*q.alpha_ratio + 0.2*q.punct_score, 6) AS quality,
                   t.n_ws, t.n_bpe,
                   rg.r_top2gram_cf, rg.r_dup5gram_cf,
                   r.n_words, r.dup_word_frac, r.top_word_frac, r.dup_bigram_frac,
                   g.g_word_count, g.g_mean_word_len, g.g_alpha_word_ratio,
                   g.g_stopword_hits,
                   (g.g_word_count BETWEEN 50 AND 100000
                    AND g.g_mean_word_len BETWEEN 3 AND 10
                    AND g.g_alpha_word_ratio >= 0.8
                    AND g.g_stopword_hits >= 1) AS g_keep,
                   COALESCE(la.n_bigrams, 0) AS n_bigrams,
                   COALESCE(la.lp_micro_sum, 0) AS lp_micro_sum,
                   u.sub || u.dom AS u_host,
                   u.dom AS u_domain,
                   u.tld AS u_tld,
                   u.depth AS u_depth,
                   u.dom IN ('src3.com', 'src7.co.uk', 'src11.org')
                     AS u_blocked,
                   (c.rn <= 5) AS u_cap_keep,
                   ch.chat_sup_end + 1 AS chat_len,
                   ch.chat_sup_start,
                   ch.chat_sup_end,
                   ch.chat_tok_start,
                   ch.chat_tok_end,
                   dp.dpo_prompt_chars,
                   CASE WHEN length(dp.cch) > 0
                        THEN dp.dpo_prompt_chars + 14 END AS dpo_chosen_start,
                   CASE WHEN length(dp.cch) > 0
                        THEN dp.dpo_prompt_chars + 14 + length(dp.cch)
                   END AS dpo_chosen_end,
                   length(dp.rch) AS dpo_rejected_chars,
                   dp.cch = dp.rch AS dpo_identical,
                   CASE WHEN length(dp.cch) > 0 AND length(dp.rch) > 0
                        THEN round(
                          CAST(greatest(length(dp.cch), length(dp.rch))
                               AS DOUBLE)
                          / least(length(dp.cch), length(dp.rch)), 6)
                   END AS dpo_len_ratio
            FROM stats s
            JOIN lang l USING (doc_id)
            JOIN qs q USING (doc_id)
            JOIN tok t USING (doc_id)
            JOIN rep r USING (doc_id)
            JOIN rgm rg USING (doc_id)
            JOIN gq g USING (doc_id)
            JOIN uu u USING (doc_id)
            JOIN cap c USING (doc_id)
            JOIN chat ch USING (doc_id)
            JOIN dpo dp USING (doc_id)
            LEFT JOIN lagg la USING (doc_id)
        """,
        "q31_dedup_fingerprint": """
            WITH g AS (
              SELECT md5(substr(text, 1, 40)) AS fp, count(*) AS n,
                     min(doc_id) AS keep_doc_id
              FROM documents GROUP BY 1 HAVING count(*) > 1
            ),
            o AS (
              SELECT DISTINCT
                     md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
              FROM documents WHERE doc_id % 3 <> 0
            ),
            nw AS (
              SELECT DISTINCT
                     md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
              FROM documents WHERE doc_id % 2 <> 0
            ),
            c AS (SELECT count(*) AS cnt FROM o JOIN nw USING (fp)),
            lanes(fp, n) AS (
              SELECT 'churn:docs_old',
                     (SELECT count(*) FROM documents WHERE doc_id % 3 <> 0)
              UNION ALL SELECT 'churn:docs_new',
                     (SELECT count(*) FROM documents WHERE doc_id % 2 <> 0)
              UNION ALL SELECT 'churn:distinct_old', (SELECT count(*) FROM o)
              UNION ALL SELECT 'churn:distinct_new', (SELECT count(*) FROM nw)
              UNION ALL SELECT 'churn:common', (SELECT cnt FROM c)
              UNION ALL SELECT 'churn:added',
                     (SELECT count(*) FROM nw) - (SELECT cnt FROM c)
              UNION ALL SELECT 'churn:removed',
                     (SELECT count(*) FROM o) - (SELECT cnt FROM c)
            )
            SELECT fp, n, keep_doc_id FROM g
            UNION ALL
            SELECT fp, n, CAST(NULL AS BIGINT) AS keep_doc_id FROM lanes
        """,
        "q33_cosine_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            z AS (
              SELECT e.vec_id,
                     CAST(UNNEST(e.embedding) AS DOUBLE) AS a,
                     CAST(UNNEST(q.qv) AS DOUBLE) AS b
              FROM embeddings e, q
            )
            SELECT vec_id,
                   round(SUM(a*b) / (sqrt(SUM(a*a)) * sqrt(SUM(b*b))), 6) AS cos_sim
            FROM z GROUP BY vec_id
            ORDER BY cos_sim DESC, vec_id LIMIT 10
        """,
        "q34_neardup_cosine": """
            WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
            p AS (
              SELECT x.vec_id AS a, y.vec_id AS b,
                     CAST(UNNEST(x.embedding) AS DOUBLE) AS xa,
                     CAST(UNNEST(y.embedding) AS DOUBLE) AS yb
              FROM e x, e y WHERE x.vec_id < y.vec_id
            )
            SELECT a, b,
                   round(SUM(xa*yb) / (sqrt(SUM(xa*xa)) * sqrt(SUM(yb*yb))), 6)
                   AS cos_sim
            FROM p GROUP BY a, b
            HAVING round(SUM(xa*yb) / (sqrt(SUM(xa*xa)) * sqrt(SUM(yb*yb))), 6) > 0.3
        """,
        "q37_sessionize": """
            WITH l AS (
              SELECT user_id, ts, event_id,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
              FROM events
            ), f AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN pts IS NULL
                          OR epoch_ns(ts) - epoch_ns(pts) > 1800000000000
                          THEN 1 ELSE 0 END AS ns
              FROM l
            ), s AS (
              SELECT user_id,
                     CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS BIGINT)
                     AS sid
              FROM f
            )
            SELECT user_id, CAST(max(sid) AS BIGINT) AS n_sessions FROM s GROUP BY user_id
        """,
        "q39_ngram_jaccard": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS words FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(words) - 2, 1) + 1),
                       i -> array_to_string(words[i:i+2], ' '))) AS sh
              FROM w
            ), ex AS (
              SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM sh
            )
            SELECT x.doc_id AS a, y.doc_id AS b,
                   round(CAST(count(*) AS DOUBLE)
                         / (x.n + y.n - count(*)), 6) AS jaccard
            FROM ex x JOIN ex y ON x.g = y.g AND x.doc_id < y.doc_id
            GROUP BY x.doc_id, y.doc_id, x.n, y.n
            HAVING round(CAST(count(*) AS DOUBLE)
                         / (x.n + y.n - count(*)), 6) >= 0.5
        """,
        "q40_ann_lsh": _ann_lsh_oracle_sql(),
        "q42_unit_convention": """
            SELECT l_orderkey, l_linenumber,
                   round(l_extendedprice * 1.4285714285714286 * 0.8 * 1000.0, 6)
                     AS price_kpc,
                   round(l_discount * 1.4285714285714286 * 0.8 * 1000.0, 6)
                     AS disc_kpc,
                   round(l_quantity * 0.8 * 1000.0, 6) AS qty_m
            FROM lineitem
        """,
        "q43_grouping_sets": """
            SELECT 'rollup' AS gs, l_returnflag, l_linestatus,
                   CAST(SUM(CAST(round(l_quantity*100, 0) AS BIGINT))
                        AS BIGINT) AS sum_qty_c,
                   count(*) AS n
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
            UNION ALL
            SELECT 'cube' AS gs, l_returnflag, l_linestatus,
                   CAST(SUM(CAST(round(l_quantity*100, 0) AS BIGINT))
                        AS BIGINT) AS sum_qty_c,
                   count(*) AS n
            FROM lineitem
            GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "q56_pack_chunks": r"""
            WITH w AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(text), '\s+') AS ws
              FROM documents
            ), c AS (
              SELECT doc_id, len(ws) AS n, ws,
                     UNNEST(generate_series(
                       0, greatest(CAST(ceil(len(ws)/64.0) AS BIGINT) - 1, 0)
                     )) AS i
              FROM w
            ), t AS (
              SELECT doc_id,
                     CAST(doc_id % 8 AS INTEGER) AS shard,
                     CAST(i AS BIGINT) AS chunk_idx,
                     array_to_string(ws[i*64 + 1 : least((i+1)*64, n)], ' ')
                     AS chunk_text,
                     CAST(least(64, n - i*64) AS BIGINT) AS n_tokens
              FROM c
            )
            , bp AS (
              -- block-packer lane mirror, SHARDED: doc start offsets
              -- in each shard's concatenated token stream (docs in
              -- id order within shard = doc_id % 4)
              SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS bshard,
                     len(ws) AS n,
                     COALESCE(SUM(len(ws)) OVER (
                       PARTITION BY doc_id % 4
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS st
              FROM w
            ), bpx AS (
              SELECT doc_id, bshard, n, st,
                     UNNEST(generate_series(
                       CAST(floor(st / 256.0) AS BIGINT),
                       CAST(floor((st + n - 1) / 256.0) AS BIGINT)
                     )) AS b
              FROM bp
            ), blk AS (
              SELECT bshard, b,
                     CAST(SUM(least(n, (b+1)*256 - st)
                              - greatest(0, b*256 - st)) AS BIGINT)
                       AS n_tokens,
                     CAST(COUNT(*) AS BIGINT) AS n_docs,
                     MIN(doc_id) AS first_doc
              FROM bpx GROUP BY bshard, b
            )
            SELECT shard, doc_id, chunk_idx, n_tokens, chunk_text,
                   CAST(floor(
                     (SUM(n_tokens) OVER (PARTITION BY shard
                                          ORDER BY doc_id, chunk_idx
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND CURRENT ROW)
                      - n_tokens) / 256.0) AS BIGINT) AS pack_id
            FROM t
            UNION ALL
            SELECT CAST(-(bshard + 1) AS INTEGER) AS shard,
                   b AS doc_id,
                   n_docs AS chunk_idx,
                   n_tokens,
                   'block' AS chunk_text,
                   first_doc AS pack_id
            FROM blk
        """,
        "q44_asof_join": """
            WITH o AS (
              SELECT user_id, o_orderkey, o_orderdate, o_totalprice FROM (
                SELECT o_custkey AS user_id, o_orderkey, o_orderdate,
                       o_totalprice,
                       row_number() OVER (
                         PARTITION BY o_custkey, o_orderdate
                         ORDER BY o_orderkey DESC) AS rn
                FROM orders) WHERE rn = 1
            )
            SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
            FROM events e ASOF LEFT JOIN o
              ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
        """,
        "q45_ivf_ann": """
            WITH c AS (
              SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings WHERE vec_id < 8
            ), q AS (
              SELECT CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id = 0
            ), vc AS (
              SELECT e.vec_id, c.cid,
                     round(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv)
                           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                    CAST(e.embedding AS DOUBLE[])))
                              * sqrt(list_dot_product(c.cv, c.cv))), 6) AS sim
              FROM embeddings e CROSS JOIN c
            ), assign AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid, row_number() OVER (
                  PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
                FROM vc) WHERE rn = 1
            ), qc AS (
              SELECT c.cid,
                     round(list_dot_product(q.qv, c.cv)
                           / (sqrt(list_dot_product(q.qv, q.qv))
                              * sqrt(list_dot_product(c.cv, c.cv))), 6) AS sim
              FROM c, q
            ), probe AS (
              SELECT cid FROM qc ORDER BY sim DESC, cid LIMIT 2
            ), z AS (
              SELECT e.vec_id,
                     CAST(UNNEST(e.embedding) AS DOUBLE) AS a,
                     CAST(UNNEST(q.qv) AS DOUBLE) AS b
              FROM embeddings e
              JOIN assign ac ON e.vec_id = ac.vec_id
              JOIN probe p ON ac.cid = p.cid
              CROSS JOIN q
            )
            SELECT vec_id,
                   round(SUM(a*b) / (sqrt(SUM(a*a)) * sqrt(SUM(b*b))), 6)
                   AS cos_sim
            FROM z GROUP BY vec_id
            ORDER BY cos_sim DESC, vec_id LIMIT 10
        """,
        "q46_range_join": """
            SELECT e.event_id, count(x.event_id) AS n_err_1h
            FROM events e LEFT JOIN events x
              ON x.event_type = 'error'
             AND x.ts < e.ts AND e.ts <= x.ts + INTERVAL 1 HOUR
            GROUP BY e.event_id
        """,
        "q57_sky_crossmatch": """
            WITH l AS (
              SELECT c_custkey AS lid,
                     (c_custkey*7919 % 36000)/100.0 AS ra,
                     ((c_custkey*104729) % 16000)/100.0 - 80.0 AS dec
              FROM customer
            ), r AS (
              SELECT s_suppkey AS rid,
                     (s_suppkey*7919 % 36000)/100.0 AS ra,
                     ((s_suppkey*104729) % 16000)/100.0 - 80.0 AS dec
              FROM supplier
            ), p AS (
              SELECT l.lid, r.rid,
                     round(degrees(2*asin(least(sqrt(
                       pow(sin(radians(r.dec - l.dec)/2), 2)
                       + cos(radians(l.dec))*cos(radians(r.dec))
                         *pow(sin(radians(r.ra - l.ra)/2), 2)
                     ), 1.0))), 6) AS sep
              FROM l CROSS JOIN r
            ), f AS (
              SELECT lid, rid, sep,
                     row_number() OVER (PARTITION BY lid
                                        ORDER BY sep, rid) AS rn
              FROM p WHERE sep <= 2.0
            )
            SELECT lid, rid, round(sep, 8) AS sep_deg FROM f WHERE rn = 1
        """,
        "q35_minhash_lsh": _minhash_oracle_sql(),
        "q36_simhash": _simhash_oracle_sql(),
        "q50_stratified_sample": f"""
            WITH t AS (
              SELECT l_orderkey, l_linenumber, l_returnflag,
                     ('0x' || substring(md5(
                        CAST(l_orderkey*10 + l_linenumber AS VARCHAR) || ':s'
                      ), 1, 15))::BIGINT AS lane
              FROM lineitem
            )
            , kept AS (
              SELECT l_orderkey, l_linenumber, l_returnflag,
                     CASE WHEN ('0x' || substring(md5(
                            CAST(l_orderkey*10 + l_linenumber AS VARCHAR)
                            || ':split'), 1, 15))::BIGINT
                            < {int(0.8 * (1 << 60))} THEN 'train'
                          WHEN ('0x' || substring(md5(
                            CAST(l_orderkey*10 + l_linenumber AS VARCHAR)
                            || ':split'), 1, 15))::BIGINT
                            < {int((0.8 + 0.1) * (1 << 60))}
                            THEN 'val'
                          ELSE 'test' END AS split,
                     (CASE l_returnflag WHEN 'N' THEN 2 ELSE 1 END)
                     + (CASE WHEN l_returnflag = 'A'
                             AND ('0x' || substring(md5(
                               CAST(l_orderkey*10 + l_linenumber AS VARCHAR)
                               || ':e'), 1, 15))::BIGINT
                               < {int(0.5 * (1 << 60))}
                             THEN 1 ELSE 0 END) AS copies
              FROM t
              WHERE lane < CASE l_returnflag
                             WHEN 'A' THEN {int(0.5 * (1 << 60))}
                             WHEN 'N' THEN {int(0.1 * (1 << 60))}
                             WHEN 'R' THEN {int(0.25 * (1 << 60))}
                             ELSE 0 END
            )
            SELECT l_orderkey, l_linenumber, l_returnflag, split,
                   unnest(range(0, copies)) AS epoch
            FROM kept
            UNION ALL
            -- A-ES weighted reservoir (k=500, weight l_quantity):
            -- rank key floor(ln(u)/w * 1e6) with id tiebreak, the
            -- same integer-micro quantization as the engine
            SELECT l_orderkey, l_linenumber, l_returnflag,
                   'wrs' AS split, 0 AS epoch
            FROM (
              SELECT l_orderkey, l_linenumber, l_returnflag,
                     CAST(floor(
                       ln((CAST(('0x' || substring(md5(
                            CAST(l_orderkey*10 + l_linenumber AS VARCHAR)
                            || ':w'), 1, 15))::BIGINT AS DOUBLE) + 0.5)
                          / 1152921504606846976.0)
                       / CAST(l_quantity AS DOUBLE) * 1e6
                     ) AS BIGINT) AS eskey
              FROM lineitem
              WHERE l_quantity > 0
              ORDER BY eskey DESC,
                       (l_orderkey*10 + l_linenumber) ASC
              LIMIT 500
            )
        """,
        "q51_tpch_q3": f"""
            SELECT l_orderkey,
                   CAST(o_orderdate AS VARCHAR) AS o_orderdate,
                   o_orderpriority,
                   round(CAST(SUM({cents} * (100 - {dc})) AS DOUBLE)/10000.0, 2)
                   AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15'
              AND l_shipdate > TIMESTAMP '1995-03-15'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
        "q47_dedup_clusters": f"""
            WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
            edges AS (
              SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
            ),
            reach AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
              WHERE e.b <> r.a
            ),
            minr AS (SELECT a AS doc_id, min(b) AS mb FROM reach GROUP BY a)
            SELECT d.doc_id,
                   least(d.doc_id, coalesce(m.mb, d.doc_id)) AS cluster_id
            FROM documents d LEFT JOIN minr m ON d.doc_id = m.doc_id
        """,
        "q49_ivf_lloyd_step": f"""
            WITH lane AS (
              SELECT vec_id, embedding,
                     {_MD5_LANE.format(x="CAST(vec_id AS VARCHAR)")} AS lane
              FROM embeddings
            ), seeds AS (
              SELECT row_number() OVER (ORDER BY lane, vec_id) - 1 AS cid,
                     CAST(embedding AS DOUBLE[]) AS cv
              FROM lane ORDER BY lane, vec_id LIMIT 8
            ), sims AS (
              SELECT e.vec_id, s.cid,
                     round(list_dot_product(CAST(e.embedding AS DOUBLE[]), s.cv)
                           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                    CAST(e.embedding AS DOUBLE[])))
                              * sqrt(list_dot_product(s.cv, s.cv))), 6) AS sim
              FROM embeddings e CROSS JOIN seeds s
            ), assign AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid, row_number() OVER (
                  PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
                FROM sims) WHERE rn = 1
            ), px AS (
              SELECT a.cid AS cell, e.embedding,
                     UNNEST(generate_series(1, len(e.embedding))) AS p
              FROM assign a JOIN embeddings e USING (vec_id)
            ), vals AS (
              SELECT cell, p - 1 AS pos,
                     CAST(round(round(CAST(embedding[p] AS DOUBLE), 6)
                                * 1000000, 0) AS BIGINT) AS vi
              FROM px
            )
            SELECT cell, CAST(pos AS INTEGER) AS pos,
                   count(*) AS n,
                   round(CAST(SUM(vi) AS DOUBLE) / count(*) / 1000000.0, 6)
                   AS mean_v
            FROM vals GROUP BY cell, pos
        """,
        "q58_decontaminate": """
            WITH ws AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ), g AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(w) - 3, 1) + 1),
                       i -> array_to_string(w[i:i+3], ' '))) AS gs
              FROM ws
            ), corpus AS (
              SELECT * FROM g WHERE doc_id % 20 != 0
            ), eg AS (
              SELECT DISTINCT UNNEST(gs) AS gram FROM g
              WHERE doc_id % 20 = 0
            ), ex AS (
              SELECT doc_id, UNNEST(gs) AS gram FROM corpus
            ), hit AS (
              SELECT doc_id, count(*) AS n_hit
              FROM ex JOIN eg USING (gram) GROUP BY doc_id
            )
            SELECT c.doc_id,
                   CAST(len(c.gs) AS INTEGER) AS n_grams,
                   CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
                   round(CAST(coalesce(h.n_hit, 0) AS DOUBLE)
                         / len(c.gs), 6) AS frac
            FROM corpus c LEFT JOIN hit h USING (doc_id)
        """,
        "q59_pii_scrub": _pii_oracle_sql(),
        "q60_semantic_dedup": """
            WITH c AS (
              SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings WHERE vec_id < 8
            ), vc AS (
              SELECT e.vec_id, c.cid,
                     round(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv)
                           / (sqrt(list_dot_product(
                                CAST(e.embedding AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])))
                              * sqrt(list_dot_product(c.cv, c.cv))), 6) AS sim
              FROM embeddings e CROSS JOIN c
            ), assign AS (
              SELECT vec_id, cid AS cell FROM (
                SELECT vec_id, cid, row_number() OVER (
                  PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
                FROM vc) WHERE rn = 1
            ), pairs AS (
              SELECT a.vec_id AS aid, b.vec_id AS bid
              FROM assign a
              JOIN assign b ON a.cell = b.cell AND b.vec_id < a.vec_id
              JOIN embeddings ea ON ea.vec_id = a.vec_id
              JOIN embeddings eb ON eb.vec_id = b.vec_id
              WHERE round(
                      list_dot_product(CAST(ea.embedding AS DOUBLE[]),
                                       CAST(eb.embedding AS DOUBLE[]))
                      / (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]),
                                               CAST(ea.embedding AS DOUBLE[])))
                         * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]),
                                                 CAST(eb.embedding AS DOUBLE[])))),
                      6) >= 0.35
            ), dup AS (
              SELECT aid, min(bid) AS dup_of FROM pairs GROUP BY aid
            )
            SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell, d.dup_of
            FROM assign s LEFT JOIN dup d ON s.vec_id = d.aid
        """,
        "q61_shard_assign": """
            WITH t AS (
              SELECT l_orderkey*10 + l_linenumber AS k FROM lineitem
            ), s AS (
              SELECT k,
                     ('0x' || substring(md5(CAST(k AS VARCHAR) || ':'), 1, 15)
                     )::BIGINT AS lane
              FROM t
            )
            SELECT k,
                   CAST(lane % 16 AS INTEGER) AS shard,
                   CAST(row_number() OVER (
                     PARTITION BY lane % 16 ORDER BY lane, k) - 1
                   AS INTEGER) AS shard_pos
            FROM s
        """,
        "q62_line_dedup": """
            WITH ex AS (
              SELECT doc_id,
                     UNNEST(string_split(text, ' ')) AS line,
                     UNNEST(range(len(string_split(text, ' ')))) AS pos
              FROM documents
            ), hot AS (
              SELECT line FROM ex WHERE len(line) >= 1
              GROUP BY line HAVING count(DISTINCT doc_id) >= 390
            ), kept AS (
              SELECT ex.* FROM ex ANTI JOIN hot USING (line)
            ), reb AS (
              SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS text
              FROM kept GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(r.text, '') AS text,
                   d.lang, d.source, d.n_chars,
                   coalesce(r.text, '') AS text_disc
            FROM documents d LEFT JOIN reb r USING (doc_id)
        """,
        "q63_bm25_topk": _bm25_oracle_sql(),
        "q64_nb_classify": f"""
            WITH tr AS (
              SELECT doc_id, lang,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
              FROM documents WHERE doc_id % 5 <> 0
            ), cnts AS (
              SELECT lang, ({_MD5_LANE.format(x="tok")}) % 64 AS feat,
                     count(*) AS c
              FROM (SELECT lang, UNNEST(ts) AS tok FROM tr)
              GROUP BY lang, feat
            ), tot AS (
              SELECT lang, SUM(c) AS t FROM cnts GROUP BY lang
            ), dense AS (
              SELECT l.lang, f.feat,
                     CAST(round(ln((coalesce(c.c, 0) + 1.0::DOUBLE)
                                   / (tot.t + 64.0::DOUBLE)) * 1000000, 0)
                          AS BIGINT) AS ll
              FROM (SELECT DISTINCT lang FROM tr) l
              CROSS JOIN (SELECT UNNEST(range(64)) AS feat) f
              JOIN tot ON tot.lang = l.lang
              LEFT JOIN cnts c ON c.lang = l.lang AND c.feat = f.feat
            ), pri AS (
              SELECT lang,
                     CAST(round(ln(CAST(count(*) AS DOUBLE)
                                   / CAST((SELECT count(*) FROM tr) AS DOUBLE))
                                * 1000000, 0) AS BIGINT) AS prior
              FROM tr GROUP BY lang
            ), sc AS (
              SELECT doc_id, ({_MD5_LANE.format(x="tok")}) % 64 AS feat,
                     count(*) AS c
              FROM (SELECT doc_id,
                           UNNEST(regexp_extract_all(lower(text),
                                                     '[a-z0-9]+')) AS tok
                    FROM documents WHERE doc_id % 5 = 0)
              GROUP BY doc_id, feat
            ), scored AS (
              SELECT s.doc_id, d.lang,
                     CAST(SUM(s.c * d.ll) + p.prior AS BIGINT) AS score_micros
              FROM sc s
              JOIN dense d ON s.feat = d.feat
              JOIN pri p ON p.lang = d.lang
              GROUP BY s.doc_id, d.lang, p.prior
            )
            SELECT doc_id, lang AS pred_lang, score_micros FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id
                ORDER BY score_micros DESC, lang) AS rn
              FROM scored) WHERE rn = 1
        """,
        "q65_dup_spans": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ), s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(ws) - 7, 1) + 1),
                       i -> array_to_string(ws[i:i+7], ' '))) AS sh
              FROM w
            ), ex AS (
              SELECT doc_id, len(sh) AS n_spans, UNNEST(sh) AS g FROM s
            ), hot AS (
              SELECT g FROM ex GROUP BY g HAVING count(*) >= 2
            ), hits AS (
              SELECT doc_id, count(*) AS n_dup
              FROM ex JOIN hot USING (g) GROUP BY doc_id
            )
            SELECT b.doc_id, CAST(b.n_spans AS BIGINT) AS n_spans,
                   CAST(coalesce(h.n_dup, 0) AS BIGINT) AS n_dup_spans,
                   round(CAST(coalesce(h.n_dup, 0) AS DOUBLE) / b.n_spans, 6)
                   AS dup_frac
            FROM (SELECT DISTINCT doc_id, n_spans FROM ex) b
            LEFT JOIN hits h USING (doc_id)
        """,
    }
