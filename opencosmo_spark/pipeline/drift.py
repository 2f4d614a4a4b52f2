"""Corpus drift monitoring: distribution comparison between two
snapshots of a table (yesterday's corpus vs today's, corpus vs a new
source, train vs eval), as PSI — the population stability index used
in production data monitoring (public formula:
``PSI = sum_i (p_cur_i - p_ref_i) * ln(p_cur_i / p_ref_i)``, with the
usual reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).

Shape, per snapshot side: ONE quantile pass over the reference fixes
every numeric column's bucket edges, then ONE aggregation covers ALL
numeric columns at once (each row explodes to its (column, bucket)
pairs — numeric-col-count small integers per row, grouped by
(column, bucket)), and ONE aggregation per categorical column (value-
keyed, with the row total taken from the numeric pass or a single
count). Everything that crosses the wire is (column, bucket, count)
rows — the report itself is driver-sized by construction.
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


def _bucketize(col: str, edges: list[float]) -> F.Column:
    """Bucket index by the reference edges — a CASE chain (edges are
    driver-small), NULLs to bucket -1."""
    b = F.lit(len(edges))
    v = F.col(col).cast("double")
    for i, e in enumerate(reversed(edges)):
        b = F.when(v <= F.lit(float(e)), F.lit(len(edges) - 1 - i)).otherwise(b)
    return F.when(v.isNull(), F.lit(-1)).otherwise(b)


def _all_numeric_fracs(
    df: DataFrame, edges: dict[str, list[float]]
) -> tuple[dict[str, dict[int, float]], int]:
    """{col: {bucket: fraction}} for every numeric column in ONE
    aggregation: each row contributes one (col, bucket) struct per
    column, exploded and counted. Also returns the row total."""
    cols = list(edges)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"), _bucketize(c, edges[c]).alias("b")
            )
            for c in cols
        ]
    )
    rows = (
        df.select(F.explode(structs).alias("z"))
        .groupBy(F.col("z.col").alias("col"), F.col("z.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_col: dict[str, dict[int, float]] = {c: {} for c in cols}
    totals: dict[str, int] = {c: 0 for c in cols}
    for r in rows:
        totals[r["col"]] += r["n"]
    for r in rows:
        per_col[r["col"]][int(r["b"])] = r["n"] / (totals[r["col"]] or 1)
    total_rows = next(iter(totals.values()), 0)
    return per_col, total_rows


def _value_fracs(
    df: DataFrame, col: str, top_k: int, total: int
) -> dict[str, float]:
    rows = (
        df.groupBy(F.col(col).cast("string").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("v"))
        .limit(top_k)
        .collect()
    )
    total = total or 1
    out = {r["v"]: r["n"] / total for r in rows}
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

    Job count: one quantile pass (reference only), one bucket
    aggregation per side covering all numeric columns, one
    aggregation per categorical column per side, plus at most one
    row-count per side (skipped when the numeric pass already supplied
    it).
    """
    numeric_cols = numeric_cols or []
    categorical_cols = categorical_cols or []
    report: dict[str, float] = {}
    n_ref = n_cur = None
    if numeric_cols:
        edges = _numeric_edges(ref, numeric_cols, bins)
        fr, n_ref = _all_numeric_fracs(ref, edges)
        fc, n_cur = _all_numeric_fracs(cur, edges)
        for c in numeric_cols:
            report[c] = _psi(fr[c], fc[c])
    if categorical_cols:
        if n_ref is None:
            n_ref, n_cur = ref.count(), cur.count()
        for c in categorical_cols:
            report[c] = _psi(
                _value_fracs(ref, c, top_k, n_ref),
                _value_fracs(cur, c, top_k, n_cur),
            )
    return report
