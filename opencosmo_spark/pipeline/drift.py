"""Corpus drift monitoring: distribution comparison between two
snapshots of a table (yesterday's corpus vs today's, corpus vs a new
source, train vs eval), as PSI — the population stability index used
in production data monitoring (public formula:
``PSI = sum_i (p_cur_i - p_ref_i) * ln(p_cur_i / p_ref_i)``, with the
usual reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).

Shape: numeric columns are bucketed by the REFERENCE side's quantile
edges (one ``approx_percentile`` pass over the reference), then each
side pays one aggregation keyed by (column, bucket); categorical
columns aggregate by value with a top-k cap so a high-cardinality id
column can't blow up the report. Everything that crosses the wire is
(column, bucket, count) rows — the report itself is driver-sized by
construction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

_EPS = 1e-6


def _numeric_edges(
    ref: DataFrame, columns: list[str], bins: int
) -> dict[str, list[float]]:
    """Per-column interior quantile edges from the reference snapshot —
    one aggregation for ALL columns."""
    qs = [i / bins for i in range(1, bins)]
    aggs = [
        F.percentile_approx(F.col(c).cast("double"), qs, 10_000).alias(c)
        for c in columns
    ]
    row = ref.agg(*aggs).first()
    return {c: sorted(set(row[c] or [])) for c in columns}


def _bucketize(df: DataFrame, col: str, edges: list[float]) -> F.Column:
    """Bucket index by the reference edges — a CASE chain (edges are
    driver-small), NULLs to bucket -1."""
    b = F.lit(len(edges))
    v = F.col(col).cast("double")
    for i, e in enumerate(reversed(edges)):
        b = F.when(v <= F.lit(float(e)), F.lit(len(edges) - 1 - i)).otherwise(b)
    return F.when(v.isNull(), F.lit(-1)).otherwise(b)


def _bucket_fracs(
    df: DataFrame, col: str, edges: list[float]
) -> dict[int, float]:
    rows = (
        df.groupBy(_bucketize(df, col, edges).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(r["n"] for r in rows) or 1
    return {int(r["b"]): r["n"] / total for r in rows}


def _value_fracs(df: DataFrame, col: str, top_k: int) -> dict[str, float]:
    rows = (
        df.groupBy(F.col(col).cast("string").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("v"))
        .limit(top_k)
        .collect()
    )
    total_all = df.count() or 1
    out = {r["v"]: r["n"] / total_all for r in rows}
    tail = 1.0 - sum(out.values())
    if tail > 0:
        out["__other__"] = tail
    return out


def _psi(p_ref: dict, p_cur: dict) -> float:
    keys = set(p_ref) | set(p_cur)
    s = 0.0
    for k in keys:
        a = max(p_ref.get(k, 0.0), _EPS)
        b = max(p_cur.get(k, 0.0), _EPS)
        s += (b - a) * math.log(b / a)
    return s


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
    bins: int = 10,
    top_k: int = 50,
) -> dict[str, float]:
    """Per-column PSI between two snapshots. Numeric columns bucket by
    the reference's quantile edges (both sides use the SAME edges —
    that is what makes the comparison meaningful); categorical columns
    compare top-``top_k`` value frequencies with the tail folded into
    one bucket. Returns {column: psi}.
    """
    numeric_cols = numeric_cols or []
    categorical_cols = categorical_cols or []
    report: dict[str, float] = {}
    if numeric_cols:
        edges = _numeric_edges(ref, numeric_cols, bins)
        for c in numeric_cols:
            report[c] = _psi(
                _bucket_fracs(ref, c, edges[c]),
                _bucket_fracs(cur, c, edges[c]),
            )
    for c in categorical_cols:
        report[c] = _psi(
            _value_fracs(ref, c, top_k), _value_fracs(cur, c, top_k)
        )
    return report
