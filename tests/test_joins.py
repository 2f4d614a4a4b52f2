"""asof_join semantics: backward/forward, exact-time matches, ties,
left-outer nulls — verified against a hand-computed truth table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opencosmo_spark.joins import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            # (event id, key, t)
            (1, 10, 100),
            (2, 10, 205),   # between r-rows at 200 and 300
            (3, 10, 300),   # exactly simultaneous with a right row
            (4, 10, 50),    # before any right row -> null
            (5, 20, 500),   # key with a single right row
            (6, 30, 500),   # key with no right rows -> null
        ],
        "eid INT, k INT, t INT",
    )
    right = spark.createDataFrame(
        [
            # (key, t, payload, tiebreak id)
            (10, 100, "a", 1),
            (10, 200, "b", 2),
            (10, 200, "b2", 3),  # tie at t=200
            (10, 300, "c", 4),
            (20, 400, "d", 5),
        ],
        "k INT, t INT, v STRING, rid INT",
    )
    return left, right


def _lookup(df):
    return {
        r["eid"]: (r["v"], r["rid"])
        for r in df.select("eid", "v", "rid").collect()
    }


def test_backward(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t", tiebreak="rid"
    )
    assert out.count() == left.count()
    m = _lookup(out)
    assert m[1] == ("a", 1)      # exact time counts
    assert m[2] == ("b2", 3)     # tie at 200 -> max tiebreak
    assert m[3] == ("c", 4)
    assert m[4] == (None, None)  # nothing at or before 50
    assert m[5] == ("d", 5)
    assert m[6] == (None, None)  # key has no right rows


def test_forward(spark, frames):
    left, right = frames
    out = asof_join(
        left,
        right,
        on="k",
        left_time="t",
        right_time="t",
        direction="forward",
        tiebreak="rid",
    )
    m = _lookup(out)
    assert m[1] == ("a", 1)      # exact time counts
    assert m[2] == ("c", 4)      # next at-or-after 205 is 300
    assert m[3] == ("c", 4)
    assert m[4] == ("a", 1)      # first at-or-after 50 is 100
    assert m[5] == (None, None)  # nothing at or after 500 for key 20


def test_column_collision_suffix(spark, frames):
    left, right = frames
    # right's time column collides with left's "t"
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        suffix="_r", tiebreak="rid",
    )
    assert set(out.columns) == {"eid", "k", "t", "t_r", "v", "rid"}


def test_single_shuffle_no_join_node(spark, frames):
    """The union+window plan must not contain a join operator and must
    shuffle exactly once (hash by key for the window sort)."""
    left, right = frames
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t", tiebreak="rid"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_point_in_interval_join(spark):
    from opencosmo_spark.joins import point_in_interval_join

    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 250), (3, 2, 100), (4, 1, 300)],
        "lid INT, k INT, t LONG",
    )
    right = spark.createDataFrame(
        [
            (10, 1, 50, 150),    # contains t=100 (key 1)
            (11, 1, 100, 300),   # contains 100, 250; 300 only if inclusive
            (12, 2, 90, 110),    # contains 100 (key 2)
            (13, 1, 400, 500),   # matches nothing
        ],
        "rid INT, k INT, s LONG, e LONG",
    )
    out = point_in_interval_join(
        left, right, "t", "s", "e", bin_width=100, on="k"
    )
    pairs = {(r.lid, r.rid) for r in out.collect()}
    assert pairs == {(1, 10), (1, 11), (2, 11), (3, 12)}

    inc = point_in_interval_join(
        left, right, "t", "s", "e", bin_width=100, on="k", include_end=True
    )
    assert {(r.lid, r.rid) for r in inc.collect()} == pairs | {(4, 11)}

    # equi-join plan, never a nested-loop/cartesian
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_point_in_interval_join_matches_inequality_join(spark):
    """Bin join == brute-force inequality join on random data."""
    import random

    from opencosmo_spark.joins import point_in_interval_join

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(i, rng.randrange(0, 1000)) for i in range(300)], "lid INT, t LONG"
    )
    right_rows = []
    for i in range(120):
        s = rng.randrange(0, 950)
        right_rows.append((i, s, s + rng.randrange(0, 120)))
    right = spark.createDataFrame(right_rows, "rid INT, s LONG, e LONG")

    out = point_in_interval_join(left, right, "t", "s", "e", bin_width=64)
    got = {(r.lid, r.rid) for r in out.collect()}
    # collect each side ONCE: the inner comprehension list used to sit
    # inside the outer loop, re-running right.collect() — a full Spark
    # job — per left row (300 jobs, ~100 s of pure test overhead)
    lrows = [(r.lid, r.t) for r in left.collect()]
    rrows = [(r.rid, r.s, r.e) for r in right.collect()]
    brute = {
        (lr, rr)
        for (lr, t) in lrows
        for (rr, s, e) in rrows
        if s <= t < e
    }
    assert got == brute


def test_tolerance(spark, frames):
    """pandas merge_asof(tolerance=...) semantics: a match whose gap
    exceeds the tolerance is rejected (nulled), not replaced."""
    left, right = frames
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        tiebreak="rid", tolerance=10,
    )
    m = _lookup(out)
    assert m[1] == ("a", 1)      # gap 0 <= 10
    assert m[2] == ("b2", 3)     # 205-200 = 5 <= 10
    assert m[3] == ("c", 4)      # gap 0
    assert m[5] == (None, None)  # 500-400 = 100 > 10 -> rejected
    assert m[6] == (None, None)

    fwd = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        direction="forward", tiebreak="rid", tolerance=60,
    )
    mf = _lookup(fwd)
    assert mf[4] == ("a", 1)     # 100-50 = 50 <= 60
    assert mf[2] == (None, None)  # 300-205 = 95 > 60


def test_tolerance_single_shuffle(spark, frames):
    """tolerance must not add a shuffle or a join: both window
    expressions share the one hash exchange."""
    left, right = frames
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        tiebreak="rid", tolerance=10,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, 37])
def test_asof_matches_pandas_merge_asof(spark, direction, tolerance):
    """Differential test against pandas.merge_asof (the canonical
    asof semantics) on random data with duplicate times and sparse
    keys. Right times are unique per key (merge_asof's winner among
    exact right-side time ties is positional, not value-determined, so
    a fair comparison needs unique times; asof_join's tiebreak=
    covers that case in test_backward/test_forward)."""
    import random

    import pandas as pd

    rng = random.Random(11)
    left = pd.DataFrame(
        {
            "lid": range(200),
            "k": [rng.randrange(5) for _ in range(200)],
            "t": [rng.randrange(0, 500) for _ in range(200)],
        }
    )
    seen = set()
    rows = []
    for i in range(100):
        k = rng.randrange(6)  # key 5 never appears on the left
        t = rng.randrange(0, 500)
        if (k, t) in seen:
            continue
        seen.add((k, t))
        rows.append((i, k, t))
    right = pd.DataFrame(rows, columns=["rid", "k", "rt"])

    expected = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("rt").rename(columns={"rt": "t"}),
        on="t",
        by="k",
        direction=direction,
        tolerance=tolerance,
        allow_exact_matches=True,
    ).set_index("lid")["rid"]

    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_time="t",
        right_time="rt",
        direction=direction,
        tolerance=tolerance,
    ).toPandas().set_index("lid")["rid"]

    for lid in left.lid:
        e, g = expected.get(lid), out.get(lid)
        assert (pd.isna(e) and pd.isna(g)) or e == g, (lid, e, g)


def test_salted_join_matches_plain_join(spark):
    """Salting must not change the result set, only the key
    distribution: verify against the unsalted join on a skewed key."""
    from opencosmo_spark.joins import salted_join

    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 900), (3, 901)], ["k", "v"]
    )
    right = spark.createDataFrame([(1, "hot"), (2, "cold")], ["k", "name"])

    got = (
        salted_join(left, right, "k", salt=8)
        .orderBy("v")
        .collect()
    )
    want = left.join(right, "k").orderBy("v").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    # left join keeps unmatched left rows exactly once
    got_l = salted_join(left, right, "k", salt=8, how="left").count()
    assert got_l == left.count()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")


def test_salted_join_keys_include_salt(spark):
    """The join condition must carry the salt column — that is what
    spreads a hot key over `salt` reducers (partition-count assertions
    are meaningless under AQE coalescing at test scale)."""
    from opencosmo_spark.joins import salted_join

    left = spark.createDataFrame([(1, i) for i in range(1000)], ["k", "v"])
    right = spark.createDataFrame([(1, "hot")], ["k", "name"])
    out = salted_join(left, right, "k", salt=8)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__salt" in plan and "Join" in plan
