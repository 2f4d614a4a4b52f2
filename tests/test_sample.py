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
