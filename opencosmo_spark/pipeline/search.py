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

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import words_expr as _tokens


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
    # base feeds BOTH the stats aggregate and the scoring pass; without
    # a persist each subtree re-scans the corpus and re-tokenizes —
    # the expensive leg runs twice (guide §5 caching: reused AND
    # expensive to recompute). The cached frame is (id, dl, tf...) —
    # a few longs per doc, never the text. Caller releases via
    # dedup.release_cached once the result is materialized.
    from .dedup import _attach_cached

    base = base.persist()
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
    return _attach_cached(
        j.filter(hit).select(
            F.col(id_col), F.round(score, decimals).alias("bm25")
        ),
        [base],
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
    out = scored.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)
    # carry the cache-release handle across the derived frame
    out._oc_cached = list(getattr(scored, "_oc_cached", []))
    return out


def build_term_index(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materializable inverted index: one row per (doc, term) with the
    term frequency and the doc's length — the batch-query amortization
    of ``bm25_topk``. At ingest, write this clustered on ``term`` so a
    query's posting lists prune to a handful of files; corpus-level
    stats (N, avgdl, per-term df) are cheap aggregates over it.
    """
    toks = _tokens(text_col)
    # dl rides the explode so the index is ONE pass + one shuffle —
    # no re-tokenize, no join back
    return (
        df.select(F.col(id_col), toks.alias("__t"))
        .select(
            F.col(id_col),
            F.size("__t").alias("dl"),
            F.explode("__t").alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )


def bm25_batch(
    df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    decimals: int = 6,
    index: DataFrame | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Top-k per query for a WHOLE TABLE of queries at once — the
    batch/offline retrieval shape (mining query-document training
    pairs, eval-set retrieval). ``queries_df`` holds one row per
    (query_id, term).

    Plan: the per-(doc, term) inverted index (``index`` if you have it
    materialized, else built inline) inner-joins the query terms —
    only posting lists of queried terms survive the join; per-term
    document frequencies and corpus stats are aggregates; scoring is
    one groupBy (query, doc) and top-k one window per query. Every
    shuffle is keyed by term, (query, doc), or query — never all
    query x doc pairs.

    ``broadcast_queries=True`` (default) hints the query-term side for
    the interactive/eval case; set it False at query-MINING scale
    (millions of (query_id, term) rows), where a forced broadcast
    would hit the driver/8 GB broadcast limits — the joins then run
    term-keyed shuffles, which is the right plan at that size.

    With a materialized ``index``, corpus stats (N, avgdl) come from
    the index too — the corpus TEXT is never touched. That counts only
    docs with >= 1 token toward N/avgdl; ``bm25_scores`` counts
    token-less docs as well, so scores can differ in the (degenerate)
    presence of empty documents.
    """
    maybe_b = F.broadcast if broadcast_queries else (lambda d: d)
    if index is not None:
        idx = index
        stats = (
            idx.groupBy(id_col)
            .agg(F.first("dl").alias("dl"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sumdl"))
        )
    else:
        idx = build_term_index(df, id_col=id_col, text_col=text_col)
        # inline build: stats from the corpus, matching bm25_scores
        # (token-less docs count toward N/avgdl)
        stats = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size(_tokens(text_col))).alias("sumdl"),
        )
    qterms = queries_df.select(query_id_col, F.col(term_col).alias("term")).distinct()
    dfreq = (
        idx.join(maybe_b(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    hits = (
        idx.join(maybe_b(qterms), "term")
        .join(maybe_b(dfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sumdl").cast("double") / F.col("n")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    term_score = (
        idf
        * tf
        * F.lit(k1 + 1.0)
        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
    )
    scored = (
        hits.select(query_id_col, id_col, term_score.alias("s"))
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("s"), decimals).alias("bm25"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
