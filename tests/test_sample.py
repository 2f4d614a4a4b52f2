"""Deterministic sampling: stability, rate accuracy, stratification."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from opencosmo_spark.pipeline.sample import (
    deterministic_sample,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def test_deterministic_and_rate(docs):
    a = deterministic_sample(docs, 0.3).toPandas()
    b = deterministic_sample(docs, 0.3).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)  # stable across runs
    n = docs.count()
    assert abs(len(a) / n - 0.3) < 0.08  # binomial tolerance at n=500
    # nested property: a lower rate selects a SUBSET (same hash lane)
    c = deterministic_sample(docs, 0.1).toPandas()
    assert set(c.doc_id) <= set(a.doc_id)
    # different salt -> different (decorrelated) row set
    d = deterministic_sample(docs, 0.3, salt="other").toPandas()
    assert sorted(d.doc_id) != sorted(a.doc_id)


def test_stratified_rates(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    li = li.withColumn(
        "k", F.concat(F.col("l_orderkey") * 10 + F.col("l_linenumber"))
    )
    out = stratified_sample(
        li,
        {"A": 0.5, "N": 0.1},
        stratum_col="l_returnflag",
        id_col="k",
    ).toPandas()
    tot = li.groupBy("l_returnflag").count().toPandas().set_index("l_returnflag")
    got = out.groupby("l_returnflag").size()
    assert abs(got.get("A", 0) / tot.loc["A", "count"] - 0.5) < 0.05
    assert abs(got.get("N", 0) / tot.loc["N", "count"] - 0.1) < 0.05
    assert "R" not in got.index  # default_rate=0 drops unlisted strata


def test_sample_filter_is_pushable(docs):
    """The sampler is a bare filter: no shuffle, no UDF in the plan."""
    plan = (
        deterministic_sample(docs.select("doc_id"), 0.2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_plan_mixture_exact_arithmetic(spark):
    from opencosmo_spark.pipeline.sample import plan_mixture

    rows = (
        [(f"w{i}", "web", "tok " * 99 + "tok") for i in range(10)]     # 1000 tok
        + [(f"b{i}", "books", "tok " * 49 + "tok") for i in range(4)]  # 200 tok
        + [(f"c{i}", "code", "tok " * 9 + "tok") for i in range(5)]    # 50 tok
        + [(f"x{i}", "junk", "noise") for i in range(3)]               # excluded
    )
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    plan = plan_mixture(
        df,
        weights={"web": 0.6, "books": 0.2, "code": 0.2},
        budget_tokens=500,
        max_epochs=2.0,
    )
    assert plan["inventory"] == {
        "web": (10, 1000), "books": (4, 200), "code": (5, 50)
    }
    # web wants 300 of 1000 -> rate 0.3; books 100 of 200 -> 0.5;
    # code wants 100 of 50 -> 2 epochs (at the cap), no shortfall
    assert plan["rates"] == {"web": 0.3, "books": 0.5, "code": 2.0}
    assert plan["epochs"]["code"] == 2.0
    assert plan["shortfall_tokens"] == {"web": 0, "books": 0, "code": 0}
    assert plan["tokens_planned"] == {"web": 300, "books": 100, "code": 100}
    # cap below need -> shortfall reported, not reassigned
    plan2 = plan_mixture(
        df,
        weights={"web": 0.6, "books": 0.2, "code": 0.2},
        budget_tokens=500,
        max_epochs=1.0,
    )
    assert plan2["rates"]["code"] == 1.0
    assert plan2["shortfall_tokens"]["code"] == 50
    # the handoff: rates (clamped) drive stratified_sample
    from opencosmo_spark.pipeline.sample import stratified_sample

    clamped = {k: min(1.0, v) for k, v in plan["rates"].items()}
    kept = stratified_sample(df, clamped, "source").count()
    assert 0 < kept < len(rows)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no rows"):
        plan_mixture(df, weights={"absent": 1.0}, budget_tokens=10)
    with _pytest.raises(ValueError, match="at least one"):
        plan_mixture(df, weights={}, budget_tokens=10)


def test_cap_per_group_deterministic(spark):
    from opencosmo_spark.pipeline.sample import cap_per_group

    rows = [(f"d{i:02d}", f"g{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    a = cap_per_group(df, "grp", 4).toPandas()
    assert a.groupby("grp").size().tolist() == [4, 4, 4]
    b = cap_per_group(df, "grp", 4).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)  # reproducible
    # under-cap groups keep everything
    small = cap_per_group(df, "grp", 100).count()
    assert small == 30
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        cap_per_group(df, "grp", 0)


def test_curate_corpus_domain_cap(spark):
    from opencosmo_spark.pipeline import curate_corpus

    rows = [
        (
            f"d{i:02d}",
            f"https://{'big' if i < 12 else 'small'}.example.com/p/{i}",
            f"Perfectly ordinary document text number {i} for the gate.",
        )
        for i in range(16)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    curated, counts = curate_corpus(
        df, min_quality=0.0, min_tokens=2, cap_per_domain=5
    )
    out = curated.toPandas()
    # big./small. are SUBDOMAINS of example.com: the cap groups by
    # REGISTERED domain, so they cap as ONE domain of 16 -> 5 survive
    assert counts["domain_cap"] == 5
    assert len(out) == 5
    # distinct registered domains cap independently
    rows2 = [
        (f"e{i:02d}", f"https://site{i % 4}.org/p/{i}", "Doc text here ok.")
        for i in range(16)
    ]
    df2 = spark.createDataFrame(rows2, ["doc_id", "url", "text"])
    _, counts2 = curate_corpus(
        df2, min_quality=0.0, min_tokens=2, cap_per_domain=2
    )
    assert counts2["domain_cap"] == 8  # 4 domains x cap 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="url"):
        curate_corpus(df2.drop("url"), cap_per_domain=2, min_quality=0.0)


def test_split_corpus_partition_properties(spark):
    from opencosmo_spark.pipeline.sample import split_corpus

    df = spark.createDataFrame(
        [(f"d{i:04d}",) for i in range(2000)], ["doc_id"]
    )
    splits = split_corpus(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    parts = {k: set(r.doc_id for r in v.collect()) for k, v in splits.items()}
    # disjoint and exhaustive
    all_ids = set.union(*parts.values())
    assert len(all_ids) == 2000
    assert sum(len(p) for p in parts.values()) == 2000
    # approximate proportions (hash uniformity)
    assert 1500 < len(parts["train"]) < 1700
    assert 150 < len(parts["val"]) < 250
    # deterministic + stable under corpus growth: the original rows
    # keep their split when new rows arrive
    grown = df.union(
        spark.createDataFrame([(f"x{i}",) for i in range(500)], ["doc_id"])
    )
    parts2 = {
        k: set(r.doc_id for r in v.collect())
        for k, v in split_corpus(
            grown, {"train": 0.8, "val": 0.1, "test": 0.1}
        ).items()
    }
    for k in parts:
        assert parts[k] == {i for i in parts2[k] if i.startswith("d")}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 1"):
        split_corpus(df, {"train": 0.5, "val": 0.1})
    with _pytest.raises(ValueError, match="at least one"):
        split_corpus(df, {})


def test_split_corpus_grouped_is_leakage_free(spark):
    """group_col splits whole near-dup clusters to one side: no two
    rows sharing a group straddle splits, and the composition with
    connected_components keeps planted near-dup twins together."""
    from pyspark.sql import functions as F

    from opencosmo_spark.pipeline.dedup import connected_components
    from opencosmo_spark.pipeline.sample import split_corpus

    # 300 docs in 100 clusters of 3 (ids c{k}_{j}), group = cluster k
    rows = [(f"c{k}_{j}", k) for k in range(100) for j in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    parts = split_corpus(
        df, {"train": 0.6, "val": 0.2, "test": 0.2}, group_col="grp"
    )
    seen: dict[int, str] = {}
    for name, part in parts.items():
        for r in part.collect():
            assert seen.setdefault(r.grp, name) == name, (
                f"group {r.grp} straddles {seen[r.grp]} and {name}"
            )
    assert len(seen) == 100  # every group landed somewhere
    sizes = {k: v.count() for k, v in parts.items()}
    assert sum(sizes.values()) == 300
    assert sizes["train"] > sizes["val"]  # proportions hold over groups

    # composition: cluster near-dup edges, then split on the cluster id
    edges = spark.createDataFrame(
        [(f"c{k}_0", f"c{k}_1") for k in range(100)]
        + [(f"c{k}_1", f"c{k}_2") for k in range(100)],
        ["a", "b"],
    )
    clustered = connected_components(edges, df.select("doc_id"))
    labeled = df.join(clustered, "doc_id")
    parts2 = split_corpus(
        labeled, {"train": 0.8, "test": 0.2}, group_col="cluster_id"
    )
    train_ids = {r.doc_id for r in parts2["train"].collect()}
    test_ids = {r.doc_id for r in parts2["test"].collect()}
    for k in range(100):
        members = {f"c{k}_{j}" for j in range(3)}
        assert members <= train_ids or members <= test_ids

    # NULL group refuses loudly rather than skewing one split
    import pytest as _pytest

    withnull = df.withColumn(
        "grp", F.when(F.col("doc_id") == "c0_0", None).otherwise(F.col("grp"))
    )
    nullparts = split_corpus(
        withnull, {"train": 0.5, "test": 0.5}, group_col="grp"
    )
    with _pytest.raises(Exception, match="NULL in group_col"):
        sum(p.count() for p in nullparts.values())


def test_epoch_sample_materializes_multi_epoch_mixture(spark):
    """Rates > 1 replicate deterministically (floor copies + a lane of
    extras that EQUALS the stratified_sample survivor set at the
    fractional rate), rates <= 1 reproduce stratified_sample exactly,
    and the epoch column indexes copies 0..n-1."""
    from pyspark.sql import functions as F

    from opencosmo_spark.pipeline.sample import (
        epoch_sample,
        stratified_sample,
    )

    rows = [(f"d{i}", "big" if i < 600 else "small") for i in range(800)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])

    out = epoch_sample(
        df, {"big": 0.4, "small": 2.5}, "source"
    ).toPandas()

    # downsampled stratum: exactly the stratified_sample survivors,
    # every copy at epoch 0
    big = out[out.source == "big"]
    ref = stratified_sample(
        df.filter(F.col("source") == "big"), {"big": 0.4}, "source"
    ).toPandas()
    assert set(big.doc_id) == set(ref.doc_id)
    assert (big.epoch == 0).all()

    # upsampled stratum: every doc >= 2 copies; third copies are the
    # 0.5-lane survivors, i.e. stratified_sample at the fractional rate
    small = out[out.source == "small"]
    per = small.groupby("doc_id").epoch.agg(["count", "max"])
    assert set(per["count"].unique()) <= {2, 3}
    assert (per["max"] == per["count"] - 1).all()  # epochs are 0..n-1
    thirds = set(per[per["count"] == 3].index)
    frac_ref = stratified_sample(
        df.filter(F.col("source") == "small"), {"small": 0.5}, "source"
    ).toPandas()
    assert thirds == set(frac_ref.doc_id)
    # expected total = 2.5 * 200 = 500; the lane draw is the only
    # variance source and it's pinned by the exact set check above
    assert len(small) == 2 * 200 + len(frac_ref)

    # determinism
    again = epoch_sample(df, {"big": 0.4, "small": 2.5}, "source").toPandas()
    assert sorted(zip(again.doc_id, again.epoch)) == sorted(
        zip(out.doc_id, out.epoch)
    )

    # plan_mixture handoff: epochs > 1 rates flow straight in
    from opencosmo_spark.pipeline.sample import plan_mixture

    tdf = df.withColumn("text", F.lit("seven words of filler text here ok"))
    plan = plan_mixture(
        tdf, {"big": 0.3, "small": 0.7}, budget_tokens=4000,
        max_epochs=3.0,
    )
    assert plan["epochs"]["small"] > 1  # the small domain must repeat
    mixed = epoch_sample(tdf, plan["rates"], "source")
    assert mixed.count() > 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="already exists"):
        epoch_sample(
            df.withColumn("epoch", F.lit(1)), {"big": 1.0}, "source"
        )
    with _pytest.raises(ValueError, match="non-negative"):
        epoch_sample(df, {"big": -0.5}, "source")


def test_split_label_matches_split_corpus(spark):
    # the one-pass column form must agree row-for-row with the
    # union-of-filtered-frames form it optimizes away (q50's shape)
    from opencosmo_spark.pipeline.sample import split_corpus, split_label

    df = spark.createDataFrame(
        [(f"d{i:04d}",) for i in range(1500)], ["doc_id"]
    )
    fracs = {"train": 0.8, "val": 0.1, "test": 0.1}
    via_frames = {
        name: set(r.doc_id for r in part.collect())
        for name, part in split_corpus(df, fracs).items()
    }
    labeled = split_label(df, fracs).collect()
    assert len(labeled) == 1500
    for r in labeled:
        assert r.doc_id in via_frames[r.split], (r.doc_id, r.split)
    # grouped form agrees too (leakage-free unit)
    gdf = spark.createDataFrame(
        [(f"d{i}", f"g{i % 7}") for i in range(300)],
        ["doc_id", "cluster"],
    )
    via_g = {
        name: set(r.doc_id for r in part.collect())
        for name, part in split_corpus(
            gdf, fracs, group_col="cluster"
        ).items()
    }
    for r in split_label(gdf, fracs, group_col="cluster").collect():
        assert r.doc_id in via_g[r.split]
