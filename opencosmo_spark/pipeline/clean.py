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
    """
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    words = F.filter(words, lambda w: w != F.lit(""))
    n_words = F.size(words)
    safe_n = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wlen = (
        F.aggregate(
            words, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
        )
        / safe_n
    )
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"(\.\.\.|…)"), 0))
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / safe_n
    lines = F.filter(
        F.split(t, "\n"), lambda ln: F.trim(ln) != F.lit("")
    )
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_ratio = (
        F.size(
            F.filter(
                lines,
                lambda ln: F.trim(ln).rlike(r"^([\-\*•‣◦])"),
            )
        ).cast("double")
        / n_lines
    )
    ellipsis_ratio = (
        F.size(
            F.filter(
                lines,
                lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$"),
            )
        ).cast("double")
        / n_lines
    )
    alpha_ratio = (
        F.size(
            F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))
        ).cast("double")
        / safe_n
    )
    lower_words = F.transform(words, F.lower)
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(lower_words),
            F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS]),
        )
    )

    out = (
        df.withColumn("g_word_count", n_words)
        .withColumn("g_mean_word_len", F.round(mean_wlen, 6))
        .withColumn("g_symbol_ratio", F.round(symbol_ratio, 6))
        .withColumn("g_bullet_ratio", F.round(bullet_ratio, 6))
        .withColumn("g_ellipsis_ratio", F.round(ellipsis_ratio, 6))
        .withColumn("g_alpha_word_ratio", F.round(alpha_ratio, 6))
        .withColumn("g_stopword_hits", stop_hits)
    )
    checks = {
        "g_ok_word_count": F.col("g_word_count").between(min_words, max_words),
        "g_ok_mean_word_len": F.col("g_mean_word_len").between(
            min_mean_word_len, max_mean_word_len
        ),
        "g_ok_symbol_ratio": F.col("g_symbol_ratio") <= max_symbol_ratio,
        "g_ok_bullet_ratio": F.col("g_bullet_ratio") <= max_bullet_ratio,
        "g_ok_ellipsis_ratio": F.col("g_ellipsis_ratio") <= max_ellipsis_ratio,
        "g_ok_alpha_word_ratio": F.col("g_alpha_word_ratio")
        >= min_alpha_word_ratio,
        "g_ok_stopwords": F.col("g_stopword_hits") >= min_stopword_hits,
    }
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
