"""Named public web-corpus cleaning recipes, as JVM expression
pipelines: the Gopher quality rules (Rae et al. 2021, "Scaling
Language Models: Methods, Analysis & Insights from Training Gopher",
appendix A1.1) and the C4 cleaning heuristics (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning with a Unified
Text-to-Text Transformer", section 2.2).

Both are pure ``pyspark.sql.functions`` pipelines — split / transform
/ filter / regexp over the text column, zero Python in the hot path,
so at 100 TB they are embarrassingly parallel projections that fuse
into whole-stage codegen with whatever scan feeds them. Each operator
returns PER-RULE columns, not just a verdict: corpus curation tuning
is the act of reading rule-level fail rates, so the flags are the
product, and the boolean `keep` is their conjunction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# the Gopher paper's stopword-presence rule uses a tiny fixed list
_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# minimal demonstrative deny-list for the C4 bad-words rule; the real
# recipe uses the public "List of Dirty, Naughty, Obscene..." list —
# plug it in via the parameter
_C4_DEFAULT_BADWORDS: list[str] = ["lorem ipsum"]

_TERMINAL_PUNCT = (".", "!", "?", '"', "'")


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Attach the Gopher quality-rule columns (Rae et al. 2021 A1.1):

    - ``g_word_count`` in [min_words, max_words]
    - ``g_mean_word_len`` in [min_mean_word_len, max_mean_word_len]
    - ``g_symbol_ratio``: (# + ...) occurrences per word <= cap
    - ``g_bullet_ratio`` / ``g_ellipsis_ratio``: fraction of lines
      starting with a bullet / ending with an ellipsis
    - ``g_alpha_word_ratio``: fraction of words containing at least
      one alphabetic character
    - ``g_stopword_hits``: how many of the paper's 8 common English
      words appear
    - per-rule booleans ``g_ok_*`` and the conjunction ``keep``

    Thresholds are the paper's defaults, overridable per corpus.

    Rendered as parsed SQL text (the _litarr idiom, r15): the Column
    form registered 8 higher-order-function lambdas (~20 ms of py4j
    round-trips each) plus 15 chained withColumn projections per call
    — ~0.3-0.9 s of serial driver time per construction (guide §4's
    boundary cost at the driver↔JVM boundary). Same expressions:
    split's regex, the 0.0D aggregate init, the int->double cast
    points and round(…, 6) are all spelled identically, and the flags
    are value-checked by the oracle (q30) and the clean tests.
    """
    from .._litarr import sql_ident, sql_str

    t = sql_ident(text_col)
    words = f"filter(split(trim({t}), '\\\\s+'), w -> w != '')"
    safe_n = f"cast(greatest(size({words}), 1) as double)"
    mean_wlen = (
        f"aggregate({words}, 0.0D,"
        f" (acc, w) -> acc + cast(length(w) as double)) / {safe_n}"
    )
    n_hash = f"(length({t}) - length(regexp_replace({t}, '#', '')))"
    n_ellipsis = f"size(regexp_extract_all({t}, '(\\\\.\\\\.\\\\.|…)', 0))"
    symbol_ratio = f"cast(({n_hash} + {n_ellipsis}) as double) / {safe_n}"
    lines = f"filter(split({t}, '\\n'), ln -> trim(ln) != '')"
    n_lines = f"cast(greatest(size({lines}), 1) as double)"
    bullet_ratio = (
        f"cast(size(filter({lines},"
        f" ln -> trim(ln) rlike '^([\\\\-\\\\*•‣◦])')) as double)"
        f" / {n_lines}"
    )
    ellipsis_ratio = (
        f"cast(size(filter({lines},"
        f" ln -> rtrim(ln) rlike '(\\\\.\\\\.\\\\.|…)$')) as double)"
        f" / {n_lines}"
    )
    alpha_ratio = (
        f"cast(size(filter({words}, w -> w rlike '[A-Za-z]')) as double)"
        f" / {safe_n}"
    )
    stops = ", ".join(sql_str(w) for w in _GOPHER_STOPWORDS)
    stop_hits = (
        f"size(array_intersect(array_distinct("
        f"transform({words}, w -> lower(w))), array({stops})))"
    )
    out = df.withColumns(
        {
            "g_word_count": F.expr(f"size({words})"),
            "g_mean_word_len": F.expr(f"round({mean_wlen}, 6)"),
            "g_symbol_ratio": F.expr(f"round({symbol_ratio}, 6)"),
            "g_bullet_ratio": F.expr(f"round({bullet_ratio}, 6)"),
            "g_ellipsis_ratio": F.expr(f"round({ellipsis_ratio}, 6)"),
            "g_alpha_word_ratio": F.expr(f"round({alpha_ratio}, 6)"),
            "g_stopword_hits": F.expr(stop_hits),
        }
    )
    checks = {
        "g_ok_word_count": (
            f"g_word_count BETWEEN {int(min_words)} AND {int(max_words)}"
        ),
        "g_ok_mean_word_len": (
            f"g_mean_word_len BETWEEN {float(min_mean_word_len)!r}D"
            f" AND {float(max_mean_word_len)!r}D"
        ),
        "g_ok_symbol_ratio": (
            f"g_symbol_ratio <= {float(max_symbol_ratio)!r}D"
        ),
        "g_ok_bullet_ratio": (
            f"g_bullet_ratio <= {float(max_bullet_ratio)!r}D"
        ),
        "g_ok_ellipsis_ratio": (
            f"g_ellipsis_ratio <= {float(max_ellipsis_ratio)!r}D"
        ),
        "g_ok_alpha_word_ratio": (
            f"g_alpha_word_ratio >= {float(min_alpha_word_ratio)!r}D"
        ),
        "g_ok_stopwords": f"g_stopword_hits >= {int(min_stopword_hits)}",
    }
    out = out.withColumns({k: F.expr(v) for k, v in checks.items()})
    return out.withColumn("keep", F.expr(" AND ".join(checks.keys())))


def _dup_beyond_first(arr: Column) -> Column:
    """Per-row duplicate census of a string array: struct with ``dups``
    (# occurrences beyond each element's first) and ``dupchars`` (their
    summed char lengths). Sort-then-scan inside the row — array_sort
    puts equal elements adjacent, one aggregate pass counts repeats —
    so the whole census is a JVM expression: no explode, no shuffle,
    cost O(k log k) in the row's own element count."""
    srt = F.array_sort(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("dups"),
        F.lit(0).cast("long").alias("dupchars"),
    )
    return F.aggregate(
        srt,
        init,
        lambda acc, x: F.struct(
            x.alias("prev"),
            (
                acc["dups"]
                + F.when(x.eqNullSafe(acc["prev"]), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("dups"),
            (
                acc["dupchars"]
                + F.when(
                    x.eqNullSafe(acc["prev"]), F.length(x).cast("long")
                ).otherwise(F.lit(0))
            ).alias("dupchars"),
        ),
    )


def _word_grams(words: Column, n: int) -> Column:
    """Space-joined word ``n``-grams of a word array, as a JVM
    expression (sequence of window starts -> slice -> concat_ws).
    Empty array when the row has fewer than ``n`` words — the CASE
    guard keeps ``sequence`` from ever seeing start > stop."""
    n_words = F.size(words)
    starts = F.sequence(F.lit(1), n_words - F.lit(n - 1))
    return F.when(
        n_words >= F.lit(n),
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(words, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def _top_gram_mass(grams: Column) -> Column:
    """Characters covered by the heaviest repeated gram: the maximum
    of ``count * length(gram)`` over grams occurring >= 2 times (the
    most frequent gram, up to frequency ties broken toward the longer
    gram), 0 when nothing repeats — count < 2 is not repetition.
    Run-length scan over ``array_sort`` — one aggregate, row-local."""
    srt = F.array_sort(grams)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best_mass"),
    )
    scanned = F.aggregate(
        srt,
        init,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best_mass"],
                F.when(
                    x.eqNullSafe(acc["prev"]),
                    (acc["run"] + 1) * F.length(x).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ).alias("best_mass"),
        ),
    )
    return scanned["best_mass"]


def _dup_gram_mass(grams: Column) -> Column:
    """Characters covered by ALL duplicated grams — every occurrence
    (including the first) of any gram appearing >= 2 times contributes
    its char length. Same sorted run-length scan as
    ``_top_gram_mass``; when a run reaches its second element the
    first occurrence's mass is back-filled."""
    srt = F.array_sort(grams)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("mass"),
    )
    scanned = F.aggregate(
        srt,
        init,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            (
                acc["mass"]
                + F.when(
                    x.eqNullSafe(acc["prev"]),
                    # this occurrence, plus the run's first occurrence
                    # the moment the gram proves duplicated (run 1->2)
                    F.length(x).cast("long")
                    * F.when(acc["run"] == 1, F.lit(2)).otherwise(F.lit(1)),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("mass"),
        ),
    )
    return scanned["mass"]


# ----- SQL-text twins of the gram helpers (the _litarr idiom, r15) --
# Each takes/returns SQL TEXT instead of Columns: the Column forms
# register one interpreted-lambda aggregate per call (~20 ms of py4j
# round-trips), and q30's repetition lane builds four of them per
# construction. Same expressions: array_sort + run-length aggregate,
# <=> for eqNullSafe, the same long casts and CASE arithmetic.


def _word_grams_sql(words: str, n: int) -> str:
    """SQL-text twin of :func:`_word_grams` over a words EXPRESSION."""
    return (
        f"CASE WHEN size({words}) >= {n} THEN "
        f"transform(sequence(1, size({words}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({words}, i, {n}))) "
        f"ELSE cast(array() as array<string>) END"
    )


def _top_gram_mass_sql(grams: str) -> str:
    """SQL-text twin of :func:`_top_gram_mass`."""
    return (
        f"aggregate(array_sort({grams}), "
        "named_struct('prev', cast(null as string), 'run', 0L, "
        "'best_mass', 0L), "
        "(acc, x) -> named_struct("
        "'prev', x, "
        "'run', CASE WHEN x <=> acc.prev THEN acc.run + 1L ELSE 1L END, "
        "'best_mass', greatest(acc.best_mass, "
        "CASE WHEN x <=> acc.prev "
        "THEN (acc.run + 1L) * cast(length(x) as bigint) "
        "ELSE 0L END)), "
        "acc -> acc.best_mass)"
    )


def _dup_gram_mass_sql(grams: str) -> str:
    """SQL-text twin of :func:`_dup_gram_mass`."""
    return (
        f"aggregate(array_sort({grams}), "
        "named_struct('prev', cast(null as string), 'run', 0L, "
        "'mass', 0L), "
        "(acc, x) -> named_struct("
        "'prev', x, "
        "'run', CASE WHEN x <=> acc.prev THEN acc.run + 1L ELSE 1L END, "
        "'mass', acc.mass + CASE WHEN x <=> acc.prev "
        "THEN cast(length(x) as bigint) * "
        "(CASE WHEN acc.run = 1L THEN 2L ELSE 1L END) "
        "ELSE 0L END), "
        "acc -> acc.mass)"
    )


# (threshold, signal kind) per Rae et al. 2021 Table A1, repetition rows
_GOPHER_TOP_GRAM_CAPS = {2: 0.20, 3: 0.18, 4: 0.16}
_GOPHER_DUP_GRAM_CAPS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def gopher_repetition_flags(
    df: DataFrame,
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_dup_para_char_frac: float = 0.20,
    top_gram_caps: dict[int, float] | None = None,
    dup_gram_caps: dict[int, float] | None = None,
) -> DataFrame:
    """The Gopher REPETITION rules (Rae et al. 2021 appendix A1.1,
    Table A1's repetition rows) — the companion filter to
    ``gopher_quality_flags``: documents dominated by repeated lines,
    paragraphs, or n-grams (boilerplate loops, SEO spam, scraper
    echo) are flagged. Attaches per-signal fractions, per-rule
    booleans ``r_ok_*``, and their conjunction ``keep``:

    - ``r_dup_line_frac`` / ``r_dup_para_frac``: fraction of non-blank
      lines / paragraphs that are repeats of an earlier one (occurrence
      count beyond first / total), capped at 0.30;
    - ``r_dup_line_char_frac`` / ``r_dup_para_char_frac``: the same
      repeats weighted by char length over the summed element length,
      capped at 0.20;
    - ``r_top_{2,3,4}gram_char_frac``: chars covered by the heaviest
      repeated word n-gram (max of count x gram length over grams
      appearing >= 2 times; 0 when nothing repeats) over the
      normalized content length, caps 0.20 / 0.18 / 0.16;
    - ``r_dup_{5..10}gram_char_frac``: chars covered by ALL word
      n-grams occurring >= 2 times (every occurrence weighted, clamped
      to 1.0), caps 0.15 down to 0.10.

    Conventions (deterministic, documented because the paper leaves
    them loose): lines split on ``\\n``, paragraphs on blank lines,
    both trimmed with blanks dropped; words are whitespace tokens;
    the n-gram denominators use the length of the space-normalized
    word join. The dup-n-gram signal counts every duplicated
    occurrence WITHOUT overlap marking — an upper bound on the
    paper's span-marked fraction (a doc it passes, the paper's form
    passes too); the exact form needs per-row span bookkeeping that
    would force the text through Python at 100 TB.

    Everything is ``array_sort`` + run-length ``aggregate`` JVM
    expressions — row-local, shuffle-free, scan-fused; cost is
    O(words x 9 sorts) per document and nothing leaves the row.
    """
    top_caps = dict(_GOPHER_TOP_GRAM_CAPS if top_gram_caps is None
                    else top_gram_caps)
    dup_caps = dict(_GOPHER_DUP_GRAM_CAPS if dup_gram_caps is None
                    else dup_gram_caps)
    t = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(t, "\n"), F.trim), lambda x: x != F.lit("")
    )
    paras = F.filter(
        F.transform(F.split(t, r"\n{2,}"), F.trim), lambda x: x != F.lit("")
    )
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != F.lit(""))
    content_len = F.greatest(
        F.length(F.concat_ws(" ", words)), F.lit(1)
    ).cast("double")

    def elem_fracs(arr: Column, prefix: str) -> dict[str, Column]:
        census = _dup_beyond_first(arr)
        n = F.greatest(F.size(arr), F.lit(1)).cast("double")
        total_chars = F.greatest(
            F.aggregate(
                arr,
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.length(x).cast("long"),
            ),
            F.lit(1),
        ).cast("double")
        return {
            f"r_dup_{prefix}_frac": F.round(
                census["dups"].cast("double") / n, 6
            ),
            f"r_dup_{prefix}_char_frac": F.round(
                census["dupchars"].cast("double") / total_chars, 6
            ),
        }

    cols: dict[str, Column] = {}
    cols.update(elem_fracs(lines, "line"))
    cols.update(elem_fracs(paras, "para"))
    for n in sorted(top_caps):
        cols[f"r_top_{n}gram_char_frac"] = F.round(
            _top_gram_mass(_word_grams(words, n)).cast("double")
            / content_len,
            6,
        )
    for n in sorted(dup_caps):
        cols[f"r_dup_{n}gram_char_frac"] = F.round(
            F.least(
                _dup_gram_mass(_word_grams(words, n)).cast("double")
                / content_len,
                F.lit(1.0),
            ),
            6,
        )
    out = df
    for name, c in cols.items():
        out = out.withColumn(name, c)

    checks: dict[str, Column] = {
        "r_ok_dup_line_frac": F.col("r_dup_line_frac") <= max_dup_line_frac,
        "r_ok_dup_para_frac": F.col("r_dup_para_frac") <= max_dup_para_frac,
        "r_ok_dup_line_char_frac": F.col("r_dup_line_char_frac")
        <= max_dup_line_char_frac,
        "r_ok_dup_para_char_frac": F.col("r_dup_para_char_frac")
        <= max_dup_para_char_frac,
    }
    for n, cap in sorted(top_caps.items()):
        checks[f"r_ok_top_{n}gram"] = (
            F.col(f"r_top_{n}gram_char_frac") <= cap
        )
    for n, cap in sorted(dup_caps.items()):
        checks[f"r_ok_dup_{n}gram"] = (
            F.col(f"r_dup_{n}gram_char_frac") <= cap
        )
    keep: Column = F.lit(True)
    for name, cond in checks.items():
        out = out.withColumn(name, cond)
        keep = keep & F.col(name)
    return out.withColumn("keep", keep)


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 3,
    min_sentences: int = 3,
    badwords: list[str] | None = None,
) -> DataFrame:
    """The C4 cleaning pass (Raffel et al. 2020 §2.2), line level then
    document level:

    line keeps: ends in terminal punctuation, has >= min_line_words
    words, does not contain "javascript" (case-insensitive), is not a
    cookie/policy boilerplate line ("cookie"/"terms of use"/"privacy
    policy" per the paper's lines).

    document keeps (``keep``): >= min_sentences sentences after line
    cleaning, no curly brace, no deny-listed phrase
    (case-insensitive; plug the production list via ``badwords``).

    Returns the original columns plus ``c4_text`` (the line-cleaned
    text), ``c4_n_sentences``, per-rule doc booleans, and ``keep``.
    Line filtering and sentence counting are array expressions; the
    3-sentence-span dedup of the original pipeline is corpus-global
    and lives in ``dedup.line_dedup`` / ``dedup.duplicate_spans``.
    """
    bad = [b.lower() for b in (badwords if badwords is not None else _C4_DEFAULT_BADWORDS)]
    t = F.col(text_col)
    lines = F.split(t, "\n")

    def line_ok(ln: Column) -> Column:
        s = F.trim(ln)
        low = F.lower(s)
        n_words = F.size(F.filter(F.split(s, r"\s+"), lambda w: w != F.lit("")))
        ends_punct = F.lit(False)
        for p in _TERMINAL_PUNCT:
            ends_punct = ends_punct | s.endswith(p)
        return (
            (n_words >= min_line_words)
            & ends_punct
            & ~low.contains("javascript")
            & ~low.contains("cookie")
            & ~low.contains("terms of use")
            & ~low.contains("privacy policy")
        )

    kept = F.filter(lines, line_ok)
    c4_text = F.array_join(F.transform(kept, F.trim), "\n")
    n_sentences = F.size(
        F.regexp_extract_all(c4_text, F.lit(r"[^.!?]+[.!?]"), 0)
    )
    low_all = F.lower(c4_text)
    no_badword: Column = F.lit(True)
    for b in bad:
        no_badword = no_badword & ~low_all.contains(b)
    out = (
        df.withColumn("c4_text", c4_text)
        .withColumn("c4_n_sentences", n_sentences)
        .withColumn("c4_ok_sentences", n_sentences >= min_sentences)
        .withColumn("c4_ok_no_brace", ~F.col("c4_text").contains("{"))
        .withColumn("c4_ok_no_badword", no_badword)
    )
    return out.withColumn(
        "keep",
        F.col("c4_ok_sentences")
        & F.col("c4_ok_no_brace")
        & F.col("c4_ok_no_badword"),
    )


def normalize_text(col) -> Column:
    """Unicode normalization for crawled text — the deterministic
    subset of the ftfy-style cleanup the published recipes run before
    hashing (dedup keys must not split on a curly quote):

    - curly single/double quotes and primes -> ASCII quotes,
    - en/em/horizontal-bar dashes and the minus sign -> ``-``,
    - ellipsis character -> ``...``,
    - NBSP / thin / narrow / figure spaces -> plain space,
    - zero-width characters, BOM, soft hyphen removed,
    - C0/C1 control characters (except tab/newline) removed,
    - horizontal whitespace runs collapsed, edges trimmed.

    Pure JVM (``translate`` + ``regexp_replace``): scan-fused, safe
    on any column, idempotent. NOT a full NFKC pass — ligature and
    width folding change token identity and are a tokenizer decision;
    this fixes only the characters that are noise in every convention.
    """
    c = F.col(col) if isinstance(col, str) else col
    quotes_src = "\u2018\u2019\u201a\u201b\u2032"  # single + prime
    dquotes_src = "\u201c\u201d\u201e\u201f\u2033"  # double + prime
    dashes_src = "\u2013\u2014\u2015\u2212"          # en/em/bar/minus
    spaces_src = "\u00a0\u2009\u202f\u2007"          # nbsp/thin/narrow/figure
    c = F.translate(
        c,
        quotes_src + dquotes_src + dashes_src + spaces_src,
        "\'" * 5 + '"' * 5 + "-" * 4 + " " * 4,
    )
    c = F.regexp_replace(c, "\u2026", "...")
    # zero-width/BOM/soft-hyphen + C0/C1 controls (tab/newline survive)
    c = F.regexp_replace(
        c,
        "[\u200b\u200c\u200d\ufeff\u00ad]"
        "|[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]",
        "",
    )
    c = F.regexp_replace(c, "[ \t]+", " ")
    return F.trim(c)
