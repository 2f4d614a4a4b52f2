"""Corpus keyword search: BM25 scoring and top-k retrieval.

The query-side design is deliberately *not* an inverted index. For a
small set of query terms (the interactive case), per-term frequencies
are pure JVM projections over each document's token array — no
explode, no shuffle. The only exchanges in the whole plan are

  1. one single-row aggregate (corpus size, total length, per-term
     document frequencies), broadcast back via ``crossJoin``, and
  2. the final top-k, which Catalyst plans as TakeOrderedAndProject
     (per-partition heaps + driver merge of k rows).

At 100 TB this reads the corpus once, keeps every row inside
whole-stage codegen, and moves O(|terms|) + O(k) rows to the driver.
A persistent inverted index (posting lists materialized at ingest,
the batch-query case) is the ``line_dedup``/``ngram_overlap`` shape
and composes from the same primitives.

Scoring is Robertson/Spärck Jones BM25 (public formula):

  idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  s(d, t) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_WORD_RE = "[a-z0-9]+"


def _tokens(text_col: str) -> Column:
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_WORD_RE), 0)


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    decimals: int = 6,
) -> DataFrame:
    """Per-document BM25 score for ``query_terms``; documents matching
    no term are dropped. Returns ``(id_col, bm25)``.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = _tokens(text_col)
    def _tf(term: str):
        # one-arg lambda: a second (defaulted) parameter would make
        # PySpark bind it as the (element, index) form
        return F.size(F.filter(F.col("__toks"), lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"__tf_{i}") for i, t in enumerate(query_terms)]
    base = df.select(F.col(id_col), toks.alias("__toks")).select(
        id_col, F.size("__toks").alias("__dl"), *tf_cols
    )
    nterms = len(query_terms)
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__dl").alias("__sumdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(nterms)
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("__sumdl").cast("double") / F.col("__n")
    score: Column | None = None
    hit: Column | None = None
    for i in range(nterms):
        tf = F.col(f"__tf_{i}").cast("double")
        dfi = F.col(f"__df_{i}").cast("double")
        idf = F.log(F.lit(1.0) + (F.col("__n") - dfi + F.lit(0.5)) / (dfi + F.lit(0.5)))
        term = (
            idf
            * tf
            * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / avgdl))
        )
        score = term if score is None else score + term
        h = F.col(f"__tf_{i}") > 0
        hit = h if hit is None else hit | h
    return j.filter(hit).select(
        F.col(id_col), F.round(score, decimals).alias("bm25")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    decimals: int = 6,
) -> DataFrame:
    """Top-k documents by BM25 (ties broken by ascending id —
    deterministic across engines and runs)."""
    scored = bm25_scores(
        df,
        query_terms,
        id_col=id_col,
        text_col=text_col,
        k1=k1,
        b=b,
        decimals=decimals,
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)
