"""Deterministic sampling for training-data pipelines.

Corpus curation constantly downsamples per stratum (language, domain,
quality band) with different rates. ``sampleBy`` does that with an RNG;
these variants are HASH-deterministic — the same row set survives on
every run, every engine, and every retry, which is what a reproducible
training mix needs (and what makes the result value-checkable against
a SQL oracle, the q07 pattern generalized per-stratum).

Mechanics: keep a row iff the first 15 hex digits of
``md5(id || ':' || salt)`` — 60 bits, uniform — fall below
``rate * 2^60``. Pure JVM expressions, embarrassingly parallel, no
shuffle, and the predicate pushes through column pruning like any
filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SCALE = 1 << 60


def _lane(c: Column) -> Column:
    """60-bit uniform hash lane from md5 (reproducible in any engine)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("decimal(38,0)")


def deterministic_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "s",
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by hash — stable across runs."""
    key = F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    return df.filter(_lane(key) < F.lit(int(rate * _SCALE)).cast("decimal(38,0)"))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "s",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each key in ``rates`` keeps
    its own fraction; strata not listed keep ``default_rate``.

    The rate lookup compiles to a literal CASE chain (strata counts are
    small — languages, domains), so the whole operator is a single
    pushable filter; no join, no shuffle, no RNG state.
    """
    key = F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    rate_expr = F.lit(int(default_rate * _SCALE)).cast("decimal(38,0)")
    for k, r in sorted(rates.items()):
        rate_expr = (
            F.when(
                F.col(stratum_col) == k,
                F.lit(int(r * _SCALE)).cast("decimal(38,0)"),
            ).otherwise(rate_expr)
        )
    return df.filter(_lane(key) < rate_expr)
