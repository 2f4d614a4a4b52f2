"""Bounded-shuffle frequency sketches for corpus analysis.

The question "what are the most common 5-grams / URLs / boilerplate
lines in this 100 TB corpus?" is an exact ``groupBy().count()`` at
small scale — but the shuffle of that groupBy is proportional to the
ITEM UNIVERSE, and n-gram universes at web scale exceed any shuffle
budget (every distinct gram crosses the wire once per partition it
appears in; even the map-side combiner's hash map blows executor
memory at billions of distinct keys per partition).

``frequent_items`` bounds the shuffle instead: a per-partition
SpaceSaving sketch (Metwally, Agrawal & El Abbadi 2005) emits at most
``capacity`` candidate rows per partition regardless of universe
size, the candidates merge in one tiny aggregation, and (optionally)
one more corpus pass recounts just the surviving candidates exactly.
The guarantees transfer through the merge when done carefully:

* lower bound — ``sum over partitions where present of (cnt - err)``
  (occurrences observed since the item's last insertion there);
* upper bound — ``sum where present of cnt`` PLUS, for every
  partition whose summary does NOT hold the item, that partition's
  eviction floor (its final minimum counter): an absent item may
  still have occurred there up to the floor. Merging without the
  floor term is the classic correctness mistake — it silently turns
  the "upper" bound into neither bound;
* completeness — any item with true global count >
  ``sum of partition floors`` is present in at least one summary
  (and that sum is <= N/capacity · #partitions-worth of slack; with
  the default generous capacity the practical threshold is far below
  any item a top-k user cares about).

The reference engine has no frequency-sketch operator — this is part
of the beyond-parity training-data toolkit, next to the dedup and
report layers.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

_CAND_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType()),
        T.StructField("cnt", T.LongType()),  # SpaceSaving count (upper, local)
        T.StructField("err", T.LongType()),  # local overestimate bound
        T.StructField("pid", T.IntegerType()),  # partition id
        T.StructField("pfloor", T.LongType()),  # partition eviction floor
    ]
)


def _spacesaving_partition(capacity: int, item_field: str):
    """Build the mapInPandas worker: one SpaceSaving summary per
    partition, fed by per-batch ``value_counts`` (batch pre-aggregation
    keeps the python loop over DISTINCT items per batch, not rows).
    Emits the partition's eviction floor on every row: the largest
    count an item ABSENT from this summary could have here (the final
    minimum counter once the summary filled; 0 if it never filled —
    nothing was ever evicted)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        counters: dict[str, int] = {}
        errors: dict[str, int] = {}
        for pdf in batches:
            vc = pdf[item_field].dropna().value_counts()
            for item, n in vc.items():
                n = int(n)
                if item in counters:
                    counters[item] += n
                elif len(counters) < capacity:
                    counters[item] = n
                    errors[item] = 0
                else:
                    # evict the minimum counter (SpaceSaving step):
                    # the newcomer inherits min+n with error bound min
                    evict = min(counters, key=counters.get)
                    m = counters.pop(evict)
                    errors.pop(evict)
                    counters[item] = m + n
                    errors[item] = m
        if counters:
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else -1
            floor = (
                min(counters.values()) if len(counters) >= capacity else 0
            )
            yield pd.DataFrame(
                {
                    "item": list(counters.keys()),
                    "cnt": list(counters.values()),
                    "err": [errors[i] for i in counters],
                    "pid": pid,
                    "pfloor": floor,
                }
            )

    return run


def frequent_items(
    df: DataFrame,
    item_col: str | Column,
    k: int,
    capacity: int | None = None,
    exact: bool = True,
) -> DataFrame:
    """Top-``k`` most frequent items with a shuffle bounded by
    ``partitions x capacity`` instead of the item universe.

    Phase 1: per-partition SpaceSaving with ``capacity`` counters
    (default ``max(8k, 256)``) over ``item_col`` (a column name or
    expression — pass an exploded n-gram, a URL host, a line).
    Phase 2: candidates merge by summation; the upper bound adds the
    eviction floors of the partitions whose summary lacks the item
    (see module docstring). Phase 3 (``exact=True``): a second corpus
    pass recounts ONLY the top ``4k`` candidates by upper bound
    (broadcast hash semi-join — the candidate list is driver-small by
    construction), so the returned counts are EXACT and the top-k
    ordering is true wherever the completeness guarantee holds.

    Returns ``(item, count)`` ordered by count desc (exact mode) or
    ``(item, count_lower, count_upper)`` (sketch-only mode).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    cap = int(capacity) if capacity is not None else max(8 * k, 256)
    if cap < k:
        raise ValueError(f"capacity {cap} must be >= k {k}")
    c = F.col(item_col) if isinstance(item_col, str) else item_col
    items = df.select(c.cast("string").alias("item"))
    # the summary frame is consumed TWICE below (total-floor scalar +
    # per-item candidate agg); without a persist each consumer re-runs
    # the whole corpus sketch pass — two MapInPandas scans in the plan
    # (guide §5 caching rule: reused AND expensive). The cached frame
    # is bounded by partitions x capacity rows BY CONSTRUCTION (the
    # SpaceSaving invariant), never by the item universe; the caller
    # frees it via release_cached once the result is materialized.
    from pyspark import StorageLevel

    rows = items.mapInPandas(
        _spacesaving_partition(cap, "item"), _CAND_SCHEMA
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # total eviction floor across ALL partitions (one value per pid) —
    # a single-row frame, broadcast onto the candidates. Bounded: the
    # distinct is over <= #partitions rows.
    total_floor = (
        rows.select("pid", "pfloor")
        .distinct()
        .agg(F.coalesce(F.sum("pfloor"), F.lit(0)).alias("__tf"))
    )
    cands = (
        rows.groupBy("item")
        .agg(
            F.sum("cnt").alias("__cnt"),
            F.sum(F.col("cnt") - F.col("err")).alias("count_lower"),
            F.sum("pfloor").alias("__pf_present"),
        )
        .crossJoin(F.broadcast(total_floor))
        .select(
            "item",
            "count_lower",
            (
                F.col("__cnt") + F.col("__tf") - F.col("__pf_present")
            ).alias("count_upper"),
        )
    )
    from .dedup import _attach_cached

    if not exact:
        return _attach_cached(
            cands.orderBy(
                F.col("count_upper").desc(), F.col("item").asc()
            ).limit(int(k)),
            [rows],
        )
    short = cands.orderBy(
        F.col("count_upper").desc(), F.col("item").asc()
    ).limit(int(4 * k))
    return _attach_cached(
        items.join(F.broadcast(short.select("item")), "item", "inner")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("item").asc())
        .limit(int(k)),
        [rows],
    )


def top_ngrams(
    df: DataFrame,
    text_col: str,
    n: int,
    k: int,
    capacity: int | None = None,
    exact: bool = True,
) -> DataFrame:
    """Corpus-wide most frequent word n-grams — the boilerplate /
    template detector (the C4 and RefinedWeb cleaning analyses both
    start from exactly this table). Tokenization is the shared
    ``words_expr`` lowercased-word convention; the explode happens
    INSIDE the sketch scan, so gram rows never materialize beyond the
    per-partition summaries."""
    from .text import words_expr

    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    words = words_expr(text_col)
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = df.select(F.explode(grams).alias("gram"))
    return frequent_items(
        exploded, "gram", k, capacity=capacity, exact=exact
    ).withColumnRenamed("item", "gram")


def discover_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    min_dup: int = 2,
    min_line_chars: int = 1,
    sep: str = "\n",
    capacity: int | None = None,
    exact: bool = True,
) -> DataFrame:
    """Top-``k`` most document-frequent LINES — the boilerplate
    discovery pass (nav menus, cookie banners, licence stubs) that
    feeds ``line_dedup(hot_lines=...)``. Returns ``(line, count)``
    with ``count`` = number of DISTINCT documents containing the line
    (>= ``min_dup``), document-frequency order, line asc tiebreak.

    Per-document distinctness is row-local (``array_distinct`` on the
    split — no (doc, line) shuffle), so the sketch/groupBy sees one
    occurrence per (doc, line) and its counts ARE document
    frequencies. With ``exact=False`` the SpaceSaving path bounds
    per-partition state at ``capacity`` regardless of the line
    universe — the 100 TB mode; ``count`` is then the sketch's
    ``count_upper`` (a true upper bound; completeness per the module
    contract). The top-k cutoff, unlike ``line_dedup``'s own exact
    min-dup count, bounds the hot set size by construction.
    """
    lines = df.select(
        F.explode(
            F.array_distinct(F.split(F.col(text_col), sep))
        ).alias("line")
    ).filter(F.length("line") >= min_line_chars)
    hot = frequent_items(lines, "line", k, capacity=capacity, exact=exact)
    if exact:
        hot = hot.withColumnRenamed("item", "line")
    else:
        hot = hot.select(
            F.col("item").alias("line"),
            F.col("count_upper").alias("count"),
        )
    return hot.filter(F.col("count") >= min_dup)
