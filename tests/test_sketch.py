"""frequent_items / top_ngrams (SpaceSaving two-pass heavy hitters)
and weighted_reservoir_sample (A-ES exact-k weighted sampling)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _zipf_corpus(spark, n_rows=20000, n_items=2000, seed=11, parts=8):
    rng = np.random.default_rng(seed)
    # Zipf-ish: item i drawn with prob ~ 1/(i+1)
    p = 1.0 / np.arange(1, n_items + 1)
    p /= p.sum()
    items = rng.choice(n_items, size=n_rows, p=p)
    pdf = pd.DataFrame({"item": [f"it{i:05d}" for i in items]})
    return spark.createDataFrame(pdf).repartition(parts)


def test_frequent_items_exact_matches_groupby(spark):
    """Exact mode must reproduce the true top-k of a full groupBy for
    every item above the N/capacity guarantee threshold (here capacity
    is generous, so the WHOLE top-k is guaranteed)."""
    from opencosmo_spark.pipeline.sketch import frequent_items

    df = _zipf_corpus(spark)
    got = frequent_items(df, "item", k=20, capacity=400).toPandas()
    truth = (
        df.groupBy("item")
        .count()
        .orderBy(F.col("count").desc(), F.col("item").asc())
        .limit(20)
        .toPandas()
    )
    assert list(got["item"]) == list(truth["item"])
    assert list(got["count"]) == list(truth["count"])


def test_frequent_items_sketch_bounds_bracket_truth(spark):
    """Sketch-only mode: lower <= true <= upper for every returned
    item, and every item above N/capacity is present."""
    from opencosmo_spark.pipeline.sketch import frequent_items

    df = _zipf_corpus(spark)
    n_total = df.count()
    cap = 300
    sk = frequent_items(df, "item", k=50, capacity=cap, exact=False).toPandas()
    truth = {
        r["item"]: r["count"]
        for r in df.groupBy("item").count().collect()
    }
    for _, row in sk.iterrows():
        t = truth[row["item"]]
        assert row["count_lower"] <= t <= row["count_upper"], (
            row["item"], row["count_lower"], t, row["count_upper"]
        )
    # guarantee: items with true count > N/capacity must appear in a
    # k large enough to hold them all
    thresh = n_total / cap
    heavy = sorted(i for i, c in truth.items() if c > thresh)
    assert len(heavy) <= 50
    got_items = set(sk["item"])
    assert all(h in got_items for h in heavy)


def test_frequent_items_candidate_volume_is_bounded(spark):
    """The phase-1 shuffle is <= partitions x capacity rows no matter
    the universe: a high-cardinality column (every row distinct) must
    not leak its universe into the candidate exchange."""
    from opencosmo_spark.pipeline.sketch import (
        _CAND_SCHEMA,
        _spacesaving_partition,
    )

    n, parts, cap = 30000, 6, 64
    df = (
        spark.range(n)
        .select(F.concat(F.lit("u"), F.col("id")).alias("item"))
        .repartition(parts)
    )
    cands = df.mapInPandas(_spacesaving_partition(cap, "item"), _CAND_SCHEMA)
    assert cands.count() <= parts * cap


def test_top_ngrams_finds_planted_boilerplate(spark):
    """A template sentence planted in 30% of docs dominates the
    5-gram table; counts are exact and match a hand count."""
    from opencosmo_spark.pipeline.sketch import top_ngrams

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    boiler = "click here to subscribe now"
    docs = []
    n_boiler = 0
    for i in range(600):
        body = " ".join(rng.choice(vocab, size=20))
        if i % 3 == 0:
            docs.append(body + " " + boiler)
            n_boiler += 1
        else:
            docs.append(body)
    df = spark.createDataFrame(pd.DataFrame({"text": docs})).repartition(4)
    got = top_ngrams(df, "text", n=5, k=5).toPandas()
    assert got.iloc[0]["gram"] == boiler
    assert got.iloc[0]["count"] == n_boiler


def test_frequent_items_accepts_expression_and_validates(spark):
    from opencosmo_spark.pipeline.sketch import frequent_items

    df = spark.range(100).select((F.col("id") % 3).alias("v"))
    got = frequent_items(df, F.col("v") * 10, k=2).toPandas()
    assert set(got["item"]) <= {"0", "10", "20"}
    with pytest.raises(ValueError):
        frequent_items(df, "v", k=0)
    with pytest.raises(ValueError):
        frequent_items(df, "v", k=10, capacity=5)


# ---- weighted_reservoir_sample ----


def _wdf(spark, n=4000, seed=5, parts=7):
    rng = np.random.default_rng(seed)
    w = np.where(rng.uniform(size=n) < 0.1, 20.0, 1.0)
    pdf = pd.DataFrame({"doc_id": np.arange(n), "w": w})
    return spark.createDataFrame(pdf).repartition(parts), w


def test_wrs_exact_k_and_deterministic(spark):
    from opencosmo_spark.pipeline.sample import weighted_reservoir_sample

    df, _ = _wdf(spark)
    a = weighted_reservoir_sample(df, "w", k=300)
    ids_a = sorted(r[0] for r in a.select("doc_id").collect())
    assert len(ids_a) == 300
    ids_b = sorted(
        r[0]
        for r in weighted_reservoir_sample(df, "w", k=300)
        .select("doc_id")
        .collect()
    )
    assert ids_a == ids_b
    assert set(a.columns) == {"doc_id", "w"}


def test_wrs_partition_invariant(spark):
    """The survivor set must not depend on the physical layout — the
    md5 lane + integer-micro key + id tiebreak make the top-k a pure
    function of the data."""
    from opencosmo_spark.pipeline.sample import weighted_reservoir_sample

    df, w = _wdf(spark)
    base = sorted(
        r[0]
        for r in weighted_reservoir_sample(df, "w", k=250)
        .select("doc_id")
        .collect()
    )
    re = sorted(
        r[0]
        for r in weighted_reservoir_sample(df.repartition(37), "w", k=250)
        .select("doc_id")
        .collect()
    )
    assert base == re


def test_wrs_weight_proportional_inclusion(spark):
    """Across many salts, heavy rows (w=20) must be included ~20x as
    often as light rows (w=1) while k << n (A-ES inclusion probability
    is ~proportional to weight in that regime)."""
    from opencosmo_spark.pipeline.sample import weighted_reservoir_sample

    df, w = _wdf(spark, n=2000)
    df = df.cache()
    heavy_ids = set(np.flatnonzero(w == 20.0).tolist())
    heavy_hits = light_hits = 0
    n_heavy = len(heavy_ids)
    n_light = 2000 - n_heavy
    for s in range(12):
        kept = {
            r[0]
            for r in weighted_reservoir_sample(df, "w", k=100, salt=f"s{s}")
            .select("doc_id")
            .collect()
        }
        heavy_hits += len(kept & heavy_ids)
        light_hits += len(kept) - len(kept & heavy_ids)
    df.unpersist()
    rate_ratio = (heavy_hits / n_heavy) / (light_hits / n_light)
    assert 12.0 < rate_ratio < 30.0, rate_ratio


def test_wrs_excludes_nonpositive_and_null_weights(spark):
    from opencosmo_spark.pipeline.sample import weighted_reservoir_sample

    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3, 4], "w": [1.0, 0.0, -2.0, None, 5.0]}
    )
    df = spark.createDataFrame(pdf)
    got = sorted(
        r[0]
        for r in weighted_reservoir_sample(df, "w", k=10)
        .select("doc_id")
        .collect()
    )
    assert got == [0, 4]
    with pytest.raises(ValueError):
        weighted_reservoir_sample(df, "w", k=0)


def test_wrs_plan_is_take_ordered(spark):
    """sort+limit must compile to TakeOrderedAndProject (per-partition
    top-k heap, no full sort, no corpus shuffle)."""
    from opencosmo_spark.pipeline.sample import weighted_reservoir_sample

    df, _ = _wdf(spark)
    plan = (
        weighted_reservoir_sample(df, "w", k=50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_discover_boilerplate_lines_and_hot_feed(spark):
    """Planted template lines dominate document frequency; discovery
    surfaces them (exact and sketch modes) and line_dedup(hot_lines=)
    scrubs them WITHOUT its own counting pass — content lines
    survive even when they repeat within one document (per-doc
    distinctness means within-doc repeats don't inflate counts)."""
    from pyspark.sql import Row

    from opencosmo_spark.pipeline.dedup import line_dedup
    from opencosmo_spark.pipeline.sketch import discover_boilerplate_lines

    banner = "accept all cookies"
    nav = "home | products | about"
    rows = [
        Row(
            doc_id=i,
            text="\n".join(
                [banner, f"unique content {i}", f"unique content {i}", nav]
            ),
        )
        for i in range(30)
    ] + [Row(doc_id=100, text="no boilerplate here\njust text")]
    df = spark.createDataFrame(rows)

    hot = discover_boilerplate_lines(df, k=2, min_dup=5)
    got = {r["line"]: r["count"] for r in hot.collect()}
    assert got == {banner: 30, nav: 30}  # doc frequency, not row count

    # sketch mode brackets the same winners (count = upper bound)
    sk = discover_boilerplate_lines(df, k=2, min_dup=5, exact=False)
    assert {r["line"] for r in sk.collect()} == {banner, nav}
    for r in sk.collect():
        assert r["count"] >= 30

    scrubbed = line_dedup(df, hot_lines=hot).toPandas().set_index("doc_id")
    assert scrubbed.loc[5, "text"] == "unique content 5\nunique content 5"
    assert banner not in "".join(scrubbed["text"])
    assert scrubbed.loc[100, "text"] == "no boilerplate here\njust text"


def test_curate_discovers_and_scrubs_planted_template(spark):
    """End-to-end: curate_corpus(boilerplate_top_k=...) discovers a
    planted template line and scrubs it from every survivor without
    the template being hand-listed anywhere."""
    import numpy as np
    from pyspark.sql import Row

    from opencosmo_spark.pipeline import curate_corpus

    rng = np.random.default_rng(77)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    template = "subscribe to our newsletter for updates"
    rows = [
        Row(
            doc_id=i,
            text=template
            + "\n"
            + " ".join(rng.choice(words, 25))
            + "\nmore body text "
            + str(i),
        )
        for i in range(25)
    ]
    df = spark.createDataFrame(rows)
    out, counts = curate_corpus(
        df,
        boilerplate_top_k=5,
        min_quality=0.0,
        min_tokens=1,
        jaccard_threshold=0.95,
    )
    texts = [r["text"] for r in out.collect()]
    assert texts and all(template not in t for t in texts)
    assert all("more body text" in t for t in texts)
    assert counts["line_dedup"] == 25  # scrub rewrites, never drops
