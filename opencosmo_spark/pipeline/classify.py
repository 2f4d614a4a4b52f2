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

from pyspark.sql import DataFrame, functions as F

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
    from pyspark import StorageLevel

    spark = df.sparkSession
    # _doc_features grouped by [label] already returns one row per
    # (label, feat) with the total token count — just rename it.
    # counts is consumed TWICE below (totals + the dense left join);
    # without a persist each consumer re-runs the whole
    # tokenize+explode+shuffle pass over the corpus (two extra scans
    # in the plan — guide §5 caching rule: reused AND expensive). The
    # cached frame is bounded by labels x num_features rows BY
    # CONSTRUCTION, never by corpus size.
    counts = (
        _doc_features(df, [label_col], text_col, num_features)
        .select(label_col, "feat", F.col("c").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = counts.groupBy(label_col).agg(F.sum("cnt").alias("tot"))
    # label universe = totals' keys: a distinct over the raw corpus
    # would re-scan train only to be intersected right back against
    # totals by the inner join below (labels with zero token-bearing
    # docs drop either way) — one full pass + exchange saved
    feats = spark.range(num_features).select(F.col("id").cast("long").alias("feat"))
    dense = (
        totals.crossJoin(F.broadcast(feats))
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
    from .dedup import _attach_cached

    return _attach_cached(dense, [counts]), priors


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

    The argmax is a struct-min hash aggregate — ``min((-score,
    label))`` is lexicographically (score desc, label asc), the same
    tie-break a window sort would give, but with map-side partial
    aggregation and no per-document sort (one shuffle saved vs the
    row_number formulation; scores are exact longs so the negation is
    lossless).
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
    best = F.min(
        F.struct(
            (-F.col("score_micros")).alias("__ns"),
            F.col(label_col).alias("__lb"),
        )
    ).alias("__b")
    return (
        scored.groupBy(id_col)
        .agg(best)
        .select(
            id_col,
            F.col("__b.__lb").alias(f"pred_{label_col}"),
            (-F.col("__b.__ns")).alias("score_micros"),
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
    from .dedup import _attach_cached

    # propagate the counts cache riding on the model frame so
    # release_cached on the one-call result frees it too
    return _attach_cached(
        nb_predict(
            score_df,
            model,
            priors,
            id_col=id_col,
            text_col=text_col,
            label_col=label_col,
            num_features=num_features,
        ),
        getattr(model, "_oc_cached", []),
    )


# ---------------------------------------------------------------------
# Trainable quality classifier: hashed-n-gram logistic regression — the
# third canonical curation signal next to heuristic quality_score and
# LM perplexity (the "Wikipedia-vs-CommonCrawl classifier" of the
# GPT-3 / LLaMA data recipes: train on trusted-positive vs
# crawl-negative examples, score the corpus, keep/importance-sample by
# probability). Brown et al. 2020 App. A; Touvron et al. 2023 §2.
#
# Spark shape: features are tf-normalized hashed word uni+bigrams
# (md5-lane, JVM expressions); the model is a driver-small weight
# vector (num_features is the cap), trained by full-batch gradient
# descent where EVERY iteration is one job over a persisted feature
# frame — margins via a broadcast sparse weight table, errors, and the
# per-feature gradient in a single plan, collecting only the
# (<= num_features + 1)-row gradient. Per-row products are quantized
# to integer micros before every sum, so training is bit-reproducible
# across partitionings, engines, and retries.
# ---------------------------------------------------------------------


def _lr_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_features: int,
    bigrams: bool,
    label_col: str | None = None,
) -> DataFrame:
    """(id[, label], feat, val): tf-normalized hashed uni(+bi)gram
    features plus one intercept row (feat = num_features, val = 1) per
    document; documents with no tokens produce no rows."""
    words = words_expr(text_col)
    toks = words
    if bigrams:
        n = F.size(words)
        win = F.greatest(n - 1, F.lit(0))
        bg = F.zip_with(
            F.slice(words, 1, win),
            F.slice(words, 2, win),
            lambda a, b: F.concat_ws("_", a, b),
        )
        toks = F.concat(words, bg)
    names = [id_col] + ([label_col] if label_col else [])
    base = df.select(*names, toks.alias("__t")).filter(F.size("__t") > 0)
    per = (
        base.select(
            *names,
            F.size("__t").alias("__n"),
            F.explode("__t").alias("__tok"),
        )
        .select(
            *names,
            "__n",
            F.pmod(md5_lane(F.col("__tok")), F.lit(num_features)).alias("feat"),
        )
        .groupBy(*names, "__n", "feat")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            *names, "feat", (F.col("c") / F.col("__n")).alias("val")
        )
    )
    icept = base.select(
        *names,
        F.lit(int(num_features)).cast("long").alias("feat"),
        F.lit(1.0).alias("val"),
    )
    return per.unionByName(icept)


def _micro_dot(val: F.Column, w: F.Column) -> F.Column:
    """sum of per-row val*w quantized to integer micros — exact long
    arithmetic, independent of partition/merge order (the repo's
    integer-micro idiom; a raw double sum could differ by ulps across
    layouts and walk the gradient onto a different trajectory)."""
    return (
        F.sum(F.round(val * w * F.lit(1e6), 0).cast("long")) / F.lit(1e6)
    )


def train_quality_classifier(
    df: DataFrame,
    *,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    num_features: int = 1 << 15,
    iters: int = 30,
    lr: float = 0.5,
    reg: float = 1e-4,
    bigrams: bool = True,
) -> dict:
    """Full-batch logistic regression over hashed n-gram features.
    ``label_col`` holds 1 (positive / trusted) or 0 (negative).
    Returns ``{"weights": ndarray[num_features], "bias": float,
    "num_features", "bigrams", "n_docs"}`` for
    ``quality_classifier_score``.

    One Spark job per iteration over a persisted (id, y, feat, val)
    frame; the driver holds only the weight vector and the collected
    per-feature gradient (both bounded by ``num_features``, never by
    corpus size). L2 regularization applies to feature weights, not
    the intercept. Deterministic: md5-lane hashing + integer-micro
    sums make the final weights identical on any partitioning.
    """
    import numpy as np
    import pandas as pd
    from pyspark import StorageLevel

    if iters < 1 or lr <= 0:
        raise ValueError("iters must be >= 1 and lr positive")
    spark = df.sparkSession
    feats = (
        _lr_features(df, id_col, text_col, num_features, bigrams, label_col)
        .withColumn("__y", F.col(label_col).cast("double"))
        .drop(label_col)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # one intercept row per doc: counts docs AND materializes the cache
    nd = feats.filter(F.col("feat") == num_features).count()
    if nd == 0:
        feats.unpersist()
        raise ValueError("no documents with tokens to train on")
    # NULL labels must fail too: ~isin() is NULL (not true) for NULL,
    # so a bare negation would let them slip through and silently
    # poison the gradient sums with NULL errors
    bad = feats.filter(
        F.col("__y").isNull() | ~F.col("__y").isin(0.0, 1.0)
    ).limit(1).count()
    if bad:
        feats.unpersist()
        raise ValueError(f"{label_col} must be 0/1 and non-NULL")

    w = np.zeros(num_features + 1)
    try:
        for _ in range(iters):
            # ship nonzero weights via Arrow (a pandas frame), not
            # per-row Python serialization — at num_features = 2^20
            # this is the difference between ~ms and seconds per iter
            nzi = np.flatnonzero(w)
            wtab = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "feat": (nzi if len(nzi) else np.array([0])).astype("int64"),
                        "w": w[nzi] if len(nzi) else np.array([0.0]),
                    }
                )
            )
            margins = (
                feats.join(F.broadcast(wtab), "feat", "left")
                .groupBy(id_col, "__y")
                .agg(
                    _micro_dot(
                        F.col("val"), F.coalesce(F.col("w"), F.lit(0.0))
                    ).alias("m")
                )
            )
            errs = margins.select(
                id_col,
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))
                    - F.col("__y")
                ).alias("e"),
            )
            grad_rows = (
                feats.join(errs, id_col)
                .groupBy("feat")
                .agg(_micro_dot(F.col("val"), F.col("e")).alias("g"))
                .collect()
            )
            g = np.zeros(num_features + 1)
            for r in grad_rows:
                g[int(r["feat"])] = r["g"]
            g /= nd
            g[:num_features] += reg * w[:num_features]
            w = w - lr * g
    finally:
        feats.unpersist()
    return {
        "weights": w[:num_features],
        "bias": float(w[num_features]),
        "num_features": int(num_features),
        "bigrams": bool(bigrams),
        "n_docs": int(nd),
    }


def quality_classifier_score(
    df: DataFrame,
    model: dict,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    decimals: int = 6,
) -> DataFrame:
    """Score documents under a trained classifier: one row per
    document with tokens, ``(id_col, margin, quality_prob)`` —
    ``quality_prob = sigmoid(w . x + b)`` rounded to ``decimals``.
    Feed ``quality_prob`` to ``importance_sample`` (or a threshold
    filter) for the classifier-gated curation step.

    The model ships as a sparse (feat, weight) broadcast table — the
    same model-as-data posture as the NB and LM scorers, so a
    web-scale feature space never lands in a closure."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    nf = int(model["num_features"])
    warr = np.asarray(model["weights"], dtype="float64")
    nzi = np.flatnonzero(warr)
    wtab = spark.createDataFrame(
        pd.DataFrame(
            {
                "feat": np.append(nzi, nf).astype("int64"),
                "w": np.append(warr[nzi], float(model["bias"])),
            }
        )
    )
    feats = _lr_features(df, id_col, text_col, nf, bool(model["bigrams"]))
    m = F.col("m")
    return (
        feats.join(F.broadcast(wtab), "feat", "left")
        .groupBy(id_col)
        .agg(
            _micro_dot(F.col("val"), F.coalesce(F.col("w"), F.lit(0.0))).alias("m")
        )
        .select(
            id_col,
            F.round(m, decimals).alias("margin"),
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-m)), decimals
            ).alias("quality_prob"),
        )
    )


def calibration_report(
    scored: DataFrame,
    labels: DataFrame,
    prob_col: str = "quality_prob",
    label_col: str = "label",
    id_col: str = "doc_id",
    bins: int = 10,
) -> DataFrame:
    """Reliability table for a probabilistic classifier — the check
    that turns "the classifier says 0.9" into a statement about the
    world (a well-calibrated 0.9 bucket is ~90% positive; a gate
    thresholding miscalibrated scores silently shifts its true
    operating point). One row per probability bin:
    ``(bin, p_lo, p_hi, n, mean_pred, frac_pos, abs_gap)`` plus the
    expected calibration error as every row's ``ece`` (n-weighted mean
    of ``abs_gap`` — constant per row so the table stays one frame).

    One join (scores to labels, keyed by id) and one aggregation over
    ``bins`` groups; at 100 TB run it on the labeled holdout, which is
    classifier-eval-sized by construction. ``prob = 1.0`` lands in the
    top bin (no phantom ``bins+1`` bucket), out-of-range probs clamp
    into the edge bins (a bin row outside [0, bins) would silently
    pollute the table and the ECE weighting), and NULL-prob rows are
    dropped before binning — an unscored row says nothing about
    calibration.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    j = (
        scored.select(id_col, prob_col)
        .filter(F.col(prob_col).isNotNull())
        .join(labels.select(id_col, label_col), id_col)
    )
    b = F.greatest(
        F.lit(0),
        F.least(
            F.floor(F.col(prob_col) * bins).cast("int"), F.lit(bins - 1)
        ),
    )
    per = (
        j.select(
            b.alias("bin"),
            F.col(prob_col).alias("__p"),
            F.col(label_col).cast("double").alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("__p"), 6).alias("mean_pred"),
            F.round(F.avg("__y"), 6).alias("frac_pos"),
        )
        .select(
            "bin",
            F.round(F.col("bin") / bins, 6).alias("p_lo"),
            F.round((F.col("bin") + 1) / bins, 6).alias("p_hi"),
            "n",
            "mean_pred",
            "frac_pos",
            F.round(
                F.abs(F.col("mean_pred") - F.col("frac_pos")), 6
            ).alias("abs_gap"),
        )
    )
    ece = per.agg(
        F.round(
            F.coalesce(
                F.sum(F.col("abs_gap") * F.col("n")) / F.sum("n"),
                F.lit(0.0),
            ),
            6,
        ).alias("ece")
    )
    return per.crossJoin(F.broadcast(ece)).orderBy("bin")
