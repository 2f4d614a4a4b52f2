"""N-gram language-model perplexity scoring — the CCNet-style corpus
quality signal (Wenzek et al. 2020 score documents by the perplexity
of a KenLM model trained on trusted text; here the model is a
DataFrame-native add-alpha bigram LM, so training AND scoring scale
with the cluster instead of a single-node binary).

Scale design: the trained model is a pair of count TABLES keyed by
8-byte word hashes (bigram and unigram), NOT a driver-side object —
for web-scale vocabularies the model itself is data. Scoring explodes
each document into its bigrams (the shifted-slice zip, zero shuffle)
and joins the two count tables; both joins are hash-keyed equi-joins
that AQE broadcasts automatically when the model is small. Scores are
exact, deterministic, and engine-independent given the same
tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import words_expr


def _bigram_frame(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, h1, h2) — one row per adjacent word pair, hashes of the
    lowered words; documents with < 2 words produce no rows."""
    words = words_expr(text_col)
    wh = F.transform(words, lambda w: F.xxhash64(w))
    base = df.select(F.col(id_col), wh.alias("__wh"))
    c = F.col("__wh")
    n = F.size(c)
    pairs = F.zip_with(
        F.slice(c, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(c, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("h1"), b.alias("h2")),
    )
    return base.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        id_col, F.col("bg.h1").alias("h1"), F.col("bg.h2").alias("h2")
    )


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> dict:
    """Count tables for an add-alpha bigram LM from a trusted corpus.

    Returns ``{"bigrams": (h1, h2, c12), "unigrams": (h1, c1),
    "vocab_df": (h), "vocab": V, "total": N}`` — the DataFrames stay
    distributed; ``vocab``/``total`` are the only driver scalars. Counts follow
    the conditional convention: ``c1`` counts tokens in FIRST-of-pair
    position (i.e. all but each document's last token), so
    ``sum(c12 over h2) == c1`` exactly and the add-alpha conditionals
    normalize."""
    bg = _bigram_frame(df, text_col, id_col)
    bigrams = bg.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("c12"))
    unigrams = bg.groupBy("h1").agg(F.count(F.lit(1)).alias("c1"))
    vocab_df = (
        df.select(F.explode(words_expr(text_col)).alias("__w"))
        .select(F.xxhash64("__w").alias("h"))
        .distinct()
    )
    vocab = vocab_df.count()
    total = bg.count()
    return {
        "bigrams": bigrams,
        "unigrams": unigrams,
        "vocab_df": vocab_df,
        "vocab": int(vocab),
        "total": int(total),
    }


def perplexity_score(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
    oov_log_prob: float | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Per-document bigram cross-entropy and perplexity under the
    trained model with add-alpha smoothing:

    ``p(w2 | w1) = (c12 + alpha) / (c1 + alpha * V)``

    A predicted word OUTSIDE the training vocabulary instead scores
    ``oov_log_prob`` (default ``log(alpha / (N + alpha * V))`` — the
    mass of a never-seen unigram, KenLM's ``<unk>`` posture). Without
    this, an all-OOV document would degrade to the uniform ``1/V``
    conditional and out-of-domain gibberish could score BETTER than
    in-vocabulary-but-unseen word order at small V. Returns
    ``(id, n_bigrams, cross_entropy, perplexity)`` — cross-entropy in
    nats per bigram, perplexity = ``exp(H)``; documents with < 2
    words get NULL scores rather than a fake perfect score. Low
    perplexity = in-domain (CCNet keeps the low tail; its
    head/middle/tail split is a ``quantile`` call away).
    """
    if alpha <= 0:
        raise ValueError("alpha must be positive (unsmoothed zeros give "
                         "infinite cross-entropy on any unseen bigram)")
    v = float(model["vocab"])
    if oov_log_prob is None:
        import math

        oov_log_prob = math.log(alpha / (model["total"] + alpha * v))
    bg = _bigram_frame(df, text_col, id_col)
    in_vocab = model["vocab_df"].select(
        F.col("h").alias("h2"), F.lit(True).alias("__known")
    )
    scored = (
        bg.join(model["bigrams"], ["h1", "h2"], "left")
        .join(model["unigrams"], ["h1"], "left")
        .join(in_vocab, ["h2"], "left")
        .select(
            id_col,
            F.when(F.col("__known").isNull(), F.lit(float(oov_log_prob)))
            .otherwise(
                F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)).cast("double") + alpha)
                    / (
                        F.coalesce(F.col("c1"), F.lit(0)).cast("double")
                        + alpha * v
                    )
                )
            )
            .alias("__lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.avg("__lp")).alias("__h"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(F.col("__h"), decimals).alias("cross_entropy"),
            F.round(F.exp(F.col("__h")), decimals).alias("perplexity"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
    splits: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    rel_err: float = 0.001,
) -> DataFrame:
    """The CCNet head/middle/tail split (Wenzek et al. 2020): score
    every document's perplexity, then label the lowest-perplexity
    ``splits[0]`` fraction "head", the next band "middle", the rest
    "tail" (head = most in-domain; CCNet trains on head+middle).
    Documents too short to score (NULL perplexity) are labeled
    "unscored" rather than silently joining a band.

    The two thresholds come from ONE ``approxQuantile`` pass
    (``rel_err`` rank accuracy — at corpus scale the exact quantile
    is statistically meaningless anyway); the labeling itself is a
    pushable CASE projection. Returns the ``perplexity_score``
    columns plus ``ppl_bucket``.
    """
    scored = perplexity_score(df, model, text_col, id_col, alpha)
    qs = scored.filter(F.col("perplexity").isNotNull()).approxQuantile(
        "perplexity", [float(splits[0]), float(splits[1])], rel_err
    )
    if len(qs) < 2:  # nothing scorable: every row is 'unscored'
        return scored.withColumn(
            "ppl_bucket",
            F.when(F.col("perplexity").isNull(), F.lit("unscored"))
            .otherwise(F.lit("head")),
        )
    lo, hi = qs
    return scored.withColumn(
        "ppl_bucket",
        F.when(F.col("perplexity").isNull(), F.lit("unscored"))
        .when(F.col("perplexity") <= lo, F.lit("head"))
        .when(F.col("perplexity") <= hi, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
