"""Distributed quality/domain classification: multinomial Naive Bayes
over hashed token features, trained and scored entirely as DataFrame
aggregations (the fastText-style linear-classifier niche — e.g. CCNet
quality buckets or language filtering — without leaving the JVM).

Training is one shuffle keyed by (label, feature): per-class token
counts -> Laplace-smoothed log-likelihoods. The model is a small dense
(label x num_features) table; scoring broadcasts it, pre-aggregates
each document to (feature, count) with map-side combine, and takes a
per-document argmax. Nothing iterative, no driver-side math beyond
the broadcast.

Log-probabilities are quantized to integer micro-nats
(``round(ln(p) * 1e6)`` as BIGINT) so every downstream sum is exact
long arithmetic — scores are reproducible bit-for-bit across engines,
partitionings, and retries (same trick as the event-value micros in
the window queries). Feature hashing uses the 60-bit md5 lane
(`dedup.md5_lane`) for the same reason.

At 100 TB: the token explode is O(corpus tokens) — the irreducible
cost of reading the text — and everything after it is pre-aggregated.
Dense models are right for num_features <= ~2^16; beyond that store
the sparse (label, feat) rows plus the per-label unseen-feature
default and left-join instead of the dense inner join.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import md5_lane
from .text import words_expr

_SCALE = 1_000_000


def _doc_features(
    df: DataFrame, id_cols: list[str], text_col: str, num_features: int
) -> DataFrame:
    """(id_cols..., feat, c): hashed-token counts per document —
    pre-aggregated so later joins fan out over distinct features, not
    raw tokens."""
    toks = words_expr(text_col)
    return (
        df.select(*id_cols, F.explode(toks).alias("__tok"))
        .select(
            *id_cols,
            F.pmod(md5_lane(F.col("__tok")), F.lit(num_features)).alias("feat"),
        )
        .groupBy(*id_cols, "feat")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def nb_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    num_features: int = 256,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB. Returns ``(model, priors)``:

    - model:  (label, feat, ll) — dense over all ``num_features``
      features, ``ll = round(ln((count + alpha) /
      (label_total + alpha*num_features)) * 1e6)`` as BIGINT.
    - priors: (label, prior) — ``round(ln(docs_label / N) * 1e6)``.
    """
    spark = df.sparkSession
    # _doc_features grouped by [label] already returns one row per
    # (label, feat) with the total token count — just rename it
    counts = _doc_features(df, [label_col], text_col, num_features).select(
        label_col, "feat", F.col("c").alias("cnt")
    )
    totals = counts.groupBy(label_col).agg(F.sum("cnt").alias("tot"))
    labels = df.select(label_col).distinct()
    feats = spark.range(num_features).select(F.col("id").cast("long").alias("feat"))
    dense = (
        labels.crossJoin(feats)
        .join(totals, label_col)
        .join(counts, [label_col, "feat"], "left")
        .select(
            label_col,
            "feat",
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(float(alpha)))
                    / (F.col("tot") + F.lit(float(alpha * num_features)))
                )
                * _SCALE,
                0,
            )
            .cast("long")
            .alias("ll"),
        )
    )
    # N comes from summing the per-label doc counts (a few rows) — no
    # extra pass over the corpus just to count it
    nd = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("nd"))
    n_all = nd.agg(F.sum("nd").alias("n_all"))
    priors = nd.crossJoin(F.broadcast(n_all)).select(
        label_col,
        F.round(
            F.log(F.col("nd").cast("double") / F.col("n_all")) * _SCALE, 0
        )
        .cast("long")
        .alias("prior"),
    )
    return dense, priors


def nb_predict(
    df: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    num_features: int = 256,
) -> DataFrame:
    """Score documents against a trained model. Returns one row per
    document: ``(id_col, pred_<label_col>, score_micros)`` — the
    argmax label (ties broken by ascending label) and its exact
    integer score. Documents with no tokens are dropped (score them
    with priors alone upstream if they matter).
    """
    feats = _doc_features(df, [id_col], text_col, num_features)
    scored = (
        feats.join(F.broadcast(model), "feat")
        .groupBy(id_col, label_col)
        .agg(F.sum(F.col("c") * F.col("ll")).alias("s"))
        .join(F.broadcast(priors), label_col)
        .select(
            id_col,
            label_col,
            (F.col("s") + F.col("prior")).alias("score_micros"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micros").desc(), F.col(label_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            F.col(label_col).alias(f"pred_{label_col}"),
            "score_micros",
        )
    )


def nb_classify(
    train_df: DataFrame,
    score_df: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    num_features: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """Train on ``train_df``, score ``score_df`` — the one-call path."""
    model, priors = nb_train(
        train_df,
        text_col=text_col,
        label_col=label_col,
        num_features=num_features,
        alpha=alpha,
    )
    return nb_predict(
        score_df,
        model,
        priors,
        id_col=id_col,
        text_col=text_col,
        label_col=label_col,
        num_features=num_features,
    )
