"""Corpus reporting: the "dataset card" numbers (doc/token/byte
totals, length quantiles, quality and duplication estimates, language
mix) — the summary block every published dataset release ships (C4's
table 1, Dolma's datasheet, the Pile's §2 per-set stats).

Scale shape: the corpus TEXT is read exactly once — all signals
(token count, quality, fingerprint, language) are projected in one
scan into a ~50-byte/row profile, which is persisted and then
aggregated. Distinct-document and duplication estimates use
HyperLogLog (``approx_count_distinct``), quantiles the
t-digest-backed ``percentile_approx``: per-group state is sketch-
bounded no matter the corpus size, and the shuffle cardinality is the
number of report groups. Nothing collects more than the report rows.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, functions as F

from .text import language_id, quality_score, token_count


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = "doc_id",
    group_by: str | Column | None = None,
    with_language: bool = True,
    quantiles: tuple[float, ...] = (0.5, 0.95),
    accuracy: int = 10_000,
    top_ngrams: tuple[int, int] | None = None,
    ngrams_exact: bool = True,
) -> DataFrame:
    """One row per group (one total row when ``group_by`` is None)
    with the dataset-card statistics:

    - ``docs``, ``distinct_ids`` (HLL; NULL when ``id_col`` is None),
    - ``total_tokens`` / ``total_chars`` / ``total_bytes`` (UTF-8),
    - ``tokens_p50`` / ``tokens_p95`` / ... per requested quantile,
    - ``mean_quality`` (the heuristic gate score),
    - ``approx_distinct_texts`` — HLL distinct count of exact text
      fingerprints (``dup_rate`` derives the pre-dedup duplication
      level from it),
    - ``lang_top`` / ``lang_top_frac`` — modal language and its share
      (stopword-vote classifier; ``with_language=False`` skips the
      classifier's regexp work),
    - ``top_ngrams`` (when ``top_ngrams=(n, k)`` is given) — the
      CORPUS-WIDE ``k`` most frequent word ``n``-grams as an
      ``array<struct<gram, count>>`` column (identical on every group
      row) — the C4-paper-style "most common n-grams" table;
      ``format_dataset_card`` renders it as its own section.
      ``ngrams_exact=False`` switches the underlying ``top_ngrams``
      operator to its SpaceSaving path (``count`` is then the
      sketch's upper bound) — the mode whose shuffle stays bounded
      when the gram universe is web-scale.

    All estimates are sketch-backed; for exact dedup numbers run the
    dedup stages themselves — this is the cheap profile you run FIRST.

    The result is an ACTION boundary, not a lazy view: the profile
    projection is persisted, aggregated, and unpersisted in-call, and
    the (tiny) report is returned as a materialized local DataFrame.
    """
    text = F.col(text_col)
    grp: list[Column] = []
    if group_by is not None:
        grp = [
            F.col(group_by).alias("group")
            if isinstance(group_by, str)
            else group_by.alias("group")
        ]

    proj = df.select(
        *grp,
        token_count(text).alias("__tok"),
        F.length(text).alias("__chars"),
        F.octet_length(text).alias("__bytes"),
        quality_score(text).alias("__q"),
        F.md5(text).alias("__fp"),
        *([language_id(text).alias("__lang")] if with_language else []),
        *([F.col(id_col).alias("__id")] if id_col else []),
    )
    # two aggregations (card + language argmax) consume the profile
    # when the language pass is on — persist so the text scans once;
    # without it there is exactly one consumer, so persisting would
    # only add cache traffic
    if with_language:
        proj = proj.persist(StorageLevel.MEMORY_AND_DISK)

    key = ["group"] if grp else []
    try:
        card = proj.groupBy(*key).agg(
            F.count("*").alias("docs"),
            (
                F.approx_count_distinct("__id").alias("distinct_ids")
                if id_col
                else F.lit(None).cast("long").alias("distinct_ids")
            ),
            F.sum("__tok").alias("total_tokens"),
            F.sum("__chars").alias("total_chars"),
            F.sum("__bytes").alias("total_bytes"),
            *[
                F.percentile_approx("__tok", q, accuracy).alias(
                    f"tokens_p{int(q * 100)}"
                )
                for q in quantiles
            ],
            F.round(F.avg("__q"), 6).alias("mean_quality"),
            F.approx_count_distinct("__fp").alias("approx_distinct_texts"),
        )
        if with_language:
            # modal language: per-(group, lang) counts (tiny), argmax
            # via the struct-min idiom (map-side partial agg, no sort)
            top = (
                proj.groupBy(*key, "__lang")
                .agg(F.count("*").alias("__n"))
                .groupBy(*key)
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("__n")).alias("neg"),
                            F.col("__lang").alias("lang"),
                            F.col("__n").alias("n"),
                        )
                    ).alias("m")
                )
                .select(
                    *key,
                    F.col("m.lang").alias("lang_top"),
                    F.col("m.n").alias("__topn"),
                )
            )
            card = (
                (card.join(top, key) if key else card.crossJoin(top))
                .withColumn(
                    "lang_top_frac",
                    F.round(F.col("__topn") / F.col("docs"), 6),
                )
                .drop("__topn")
            )
        if top_ngrams is not None:
            from .sketch import top_ngrams as _top_ngrams

            n, k = top_ngrams
            grams = _top_ngrams(
                df, text_col, n, k, exact=ngrams_exact
            )
            cnt = "count" if ngrams_exact else "count_upper"
            gram_row = grams.agg(
                F.collect_list(
                    F.struct(
                        F.col("gram"),
                        F.col(cnt).cast("long").alias("count"),
                    )
                ).alias("__g")
            ).select(
                F.array_sort(
                    F.col("__g"),
                    lambda a, b: F.when(a["count"] > b["count"], -1)
                    .when(a["count"] < b["count"], 1)
                    .when(a["gram"] < b["gram"], -1)
                    .when(a["gram"] > b["gram"], 1)
                    .otherwise(0),
                ).alias("top_ngrams")
            )
            card = card.crossJoin(gram_row)
        rows = card.collect()
        spark = df.sparkSession
        return spark.createDataFrame(rows, card.schema)
    finally:
        if with_language:
            proj.unpersist()


def dup_rate(report_df: DataFrame) -> DataFrame:
    """Attach ``dup_rate`` = 1 - distinct_texts/docs to a report."""
    return report_df.select(
        "*",
        F.round(
            1.0 - F.col("approx_distinct_texts") / F.col("docs"), 6
        ).alias("dup_rate"),
    )


def format_dataset_card(report_df: DataFrame, title: str = "Corpus") -> str:
    """Render a report as a markdown datasheet block (driver-side;
    the report is already group-cardinality small). A ``top_ngrams``
    column (from ``corpus_report(top_ngrams=(n, k))``) renders as its
    own "Most common n-grams" section — the C4-paper-style table —
    rather than inline in the stats row."""
    rows = report_df.collect()
    cols = [c for c in report_df.columns if c != "top_ngrams"]
    lines = [f"# {title}", ""]
    lines.append("| " + " | ".join(cols) + " |")
    lines.append("|" + "---|" * len(cols))
    for r in rows:
        lines.append(
            "| "
            + " | ".join("" if r[c] is None else str(r[c]) for c in cols)
            + " |"
        )
    if "top_ngrams" in report_df.columns and rows:
        grams = rows[0]["top_ngrams"] or []
        lines += ["", "## Most common n-grams", ""]
        lines.append("| gram | count |")
        lines.append("|---|---|")
        for g in grams:
            lines.append(f"| {g['gram']} | {g['count']} |")
    return "\n".join(lines)
