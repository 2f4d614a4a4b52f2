"""Gopher / C4 cleaning rules: every rule must fire on a constructed
defect and pass on clean prose."""

import pytest
from pyspark.sql import Row, functions as F

from opencosmo_spark.pipeline.clean import c4_clean, gopher_quality_flags

GOOD = (
    "The quick brown fox jumps over the lazy dog and runs far away. "
    "It then returns to the field with a friend and they both rest. "
) * 5  # ~120 words of plain prose


def _flags(spark, texts, **kw):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    return (
        gopher_quality_flags(df, **kw)
        .toPandas()
        .set_index("doc_id")
    )


def test_gopher_passes_clean_prose(spark):
    out = _flags(spark, [GOOD])
    row = out.loc[0]
    assert bool(row.keep), row.to_dict()
    assert row.g_word_count == 130
    assert row.g_stopword_hits >= 4


def test_gopher_each_rule_fires(spark):
    too_short = "tiny doc."
    hashy = " ".join(["word##" for _ in range(60)])
    bullets = "\n".join([f"- item {i} ok" for i in range(20)])
    ellipses = "\n".join(
        [f"this line number {i} trails off..." for i in range(10)]
    )
    numeric = " ".join(str(i) for i in range(80))
    long_words = " ".join(["pneumonoultramicroscopic"] * 60)
    no_stop = " ".join(["zebra lion tiger puma jaguar"] * 15)
    out = _flags(
        spark,
        [too_short, hashy, bullets, ellipses, numeric, long_words, no_stop],
    )
    assert not out.loc[0].g_ok_word_count
    assert not out.loc[1].g_ok_symbol_ratio
    assert not out.loc[2].g_ok_bullet_ratio
    assert not out.loc[3].g_ok_ellipsis_ratio
    assert not out.loc[4].g_ok_alpha_word_ratio
    assert not out.loc[5].g_ok_mean_word_len
    assert not out.loc[6].g_ok_stopwords
    assert not out.keep.any()


def test_c4_line_and_doc_rules(spark):
    doc = "\n".join(
        [
            "This is a perfectly fine sentence with many words.",
            "Short one.",  # < 3 words -> dropped
            "no terminal punctuation here at all",  # dropped
            "Please enable javascript to continue browsing now.",  # dropped
            "We use cookie banners to track you everywhere online.",  # dropped
            "Another good sentence stays in the cleaned output here.",
            "A third good sentence keeps the document long enough.",
        ]
    )
    df = spark.createDataFrame([Row(doc_id=0, text=doc)])
    out = c4_clean(df).toPandas().loc[0]
    kept_lines = out.c4_text.split("\n")
    assert len(kept_lines) == 3
    assert all(ln.endswith(".") for ln in kept_lines)
    assert "javascript" not in out.c4_text.lower()
    assert out.c4_n_sentences == 3
    assert bool(out.keep)

    brace = "\n".join(
        ["A sentence mentioning {curly} braces in code output.",
         "Another full sentence to pad the document nicely here.",
         "And a third complete sentence to pass the length rule."]
    )
    lorem = "\n".join(
        ["Lorem ipsum dolor sit amet consectetur adipiscing elit now.",
         "Another full sentence to pad the document nicely here.",
         "And a third complete sentence to pass the length rule."]
    )
    short = "Only one good sentence lives inside this document here."
    df = spark.createDataFrame(
        [Row(doc_id=1, text=brace), Row(doc_id=2, text=lorem),
         Row(doc_id=3, text=short)]
    )
    out = c4_clean(df).toPandas().set_index("doc_id")
    assert not out.loc[1].c4_ok_no_brace
    assert not out.loc[2].c4_ok_no_badword
    assert not out.loc[3].c4_ok_sentences
    assert not out.keep.any()


def test_clean_stays_jvm(spark):
    df = spark.createDataFrame([Row(doc_id=0, text=GOOD)])
    for op in (gopher_quality_flags, c4_clean):
        plan = (
            op(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_normalize_text(spark):
    from opencosmo_spark.pipeline.clean import normalize_text

    raw = (
        "“Smart” quotes, it’s fine — really… "
        "a hard space, zero​width, ctrl\x07char, "
        "range 1–2 and −5"
    )
    df = spark.createDataFrame([(raw,), ("",)], ["text"])
    got = df.select(normalize_text("text").alias("t")).collect()
    assert got[0]["t"] == (
        '"Smart" quotes, it\'s fine - really... '
        "a hard space, zerowidth, ctrlchar, range 1-2 and -5"
    )
    assert got[1]["t"] == ""
    # idempotent and newline-preserving
    two = spark.createDataFrame([("line1\nline2\t end",)], ["text"])
    once = two.select(normalize_text("text").alias("t")).first()["t"]
    again = (
        two.select(normalize_text(normalize_text("text")).alias("t"))
        .first()["t"]
    )
    assert once == again == "line1\nline2 end"


def test_curate_normalize_unicode_stage(spark):
    from opencosmo_spark.pipeline import curate_corpus

    # two docs identical up to typography: normalization must make
    # exact dedup collapse them
    a = "It’s a “test” — done…  with words enough to pass the gate."
    b = 'It\'s a "test" - done...  with words enough to pass the gate.'
    df = spark.createDataFrame(
        [(1, a), (2, b)], ["doc_id", "text"]
    )
    curated, counts = curate_corpus(
        df, min_quality=0.0, min_tokens=2, normalize_unicode=True
    )
    assert counts["exact_dedup"] == 1
    assert curated.count() == 1
    # without normalization they stay distinct
    _, counts2 = curate_corpus(df, min_quality=0.0, min_tokens=2)
    assert counts2["exact_dedup"] == 2


# ---------------------------------------------------------------- A1.2


def _rep_twin(text: str) -> dict:
    """Python reference for gopher_repetition_flags' documented
    conventions — duplicates beyond first, heaviest repeated gram
    (max count*len), all-duplicated-occurrence gram mass."""
    import re
    from collections import Counter

    lines = [x.strip() for x in text.split("\n") if x.strip()]
    paras = [x.strip() for x in re.split(r"\n{2,}", text) if x.strip()]
    words = [w for w in re.split(r"\s+", text.strip()) if w]
    content_len = max(len(" ".join(words)), 1)

    def dup(arr, prefix):
        seen, d, dc = set(), 0, 0
        for x in arr:
            if x in seen:
                d += 1
                dc += len(x)
            else:
                seen.add(x)
        return {
            f"r_dup_{prefix}_frac": d / max(len(arr), 1),
            f"r_dup_{prefix}_char_frac": dc
            / max(sum(len(x) for x in arr), 1),
        }

    out = {}
    out.update(dup(lines, "line"))
    out.update(dup(paras, "para"))
    for n in (2, 3, 4):
        grams = Counter(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        mass = max(
            (c * len(g) for g, c in grams.items() if c >= 2), default=0
        )
        out[f"r_top_{n}gram_char_frac"] = mass / content_len
    for n in range(5, 11):
        grams = Counter(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        mass = sum(c * len(g) for g, c in grams.items() if c >= 2)
        out[f"r_dup_{n}gram_char_frac"] = min(mass / content_len, 1.0)
    return out


def test_gopher_repetition_matches_python_twin(spark):
    from opencosmo_spark.pipeline.clean import gopher_repetition_flags

    texts = [
        GOOD,  # prose repeated x5: heavy n-gram repetition by design
        "the same line\nthe same line\nthe same line\nanother one",
        "para one is here\n\npara one is here\n\npara two differs",
        " ".join(["buy cheap pills now"] * 30),
        "completely unique words " + " ".join(f"w{i}" for i in range(200)),
        "one two three four five six seven eight nine ten "
        "one two three four five six seven eight nine ten extra",
        "short",
        "a\n\n\na\nb\n\nb  b",  # blank-run paragraphs, trim edge cases
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = (
        gopher_repetition_flags(df)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, t in enumerate(texts):
        want = _rep_twin(t)
        for k, v in want.items():
            assert abs(got.loc[i, k] - v) < 1e-6, (i, k, got.loc[i, k], v)


def test_gopher_repetition_flags_fire_and_pass(spark):
    from opencosmo_spark.pipeline.clean import gopher_repetition_flags

    clean = (
        "Different sentences carry different words so nothing repeats "
        "here at all. Every line brings fresh content and the corpus "
        "filter should keep this document without firing any rule."
    )
    line_spam = "\n".join(["identical boilerplate line"] * 8 + ["unique"])
    gram_spam = " ".join(["click here to win big prizes today"] * 12)
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=clean),
            Row(doc_id=1, text=line_spam),
            Row(doc_id=2, text=gram_spam),
        ]
    )
    out = gopher_repetition_flags(df).toPandas().set_index("doc_id")
    assert bool(out.loc[0, "keep"]), out.loc[0].to_dict()
    assert not bool(out.loc[1, "keep"])
    assert not bool(out.loc[1, "r_ok_dup_line_frac"])
    assert not bool(out.loc[2, "keep"])
    assert not bool(out.loc[2, "r_ok_top_2gram"])
    assert not bool(out.loc[2, "r_ok_dup_5gram"])


def test_gopher_repetition_stays_jvm(spark):
    from opencosmo_spark.pipeline.clean import gopher_repetition_flags

    df = spark.createDataFrame([Row(doc_id=0, text=GOOD)])
    plan = (
        gopher_repetition_flags(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_gram_mass_sql_twins_match_column_forms(spark):
    # the SQL-text twins used by q30's repetition lane must agree with
    # the Column originals (still used by gopher_repetition_flags) on
    # every row shape: repeats, no repeats, short docs, empties
    import pyspark.sql.functions as F

    from opencosmo_spark.pipeline.clean import (
        _dup_gram_mass,
        _dup_gram_mass_sql,
        _top_gram_mass,
        _top_gram_mass_sql,
        _word_grams,
        _word_grams_sql,
    )

    texts = [
        "a b a b a b c",
        "x y z",
        "one",
        "",
        "dup dup dup dup dup",
        "p q r p q r p q",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    words_col = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != F.lit("")
    )
    words_sql = "filter(split(trim(text), '\\\\s+'), w -> w != '')"
    for n in (2, 5):
        got = df.select(
            _top_gram_mass(_word_grams(words_col, n)).alias("tc"),
            F.expr(_top_gram_mass_sql(_word_grams_sql(words_sql, n))).alias("ts"),
            _dup_gram_mass(_word_grams(words_col, n)).alias("dc"),
            F.expr(_dup_gram_mass_sql(_word_grams_sql(words_sql, n))).alias("ds"),
        ).collect()
        for r in got:
            assert r.tc == r.ts and r.dc == r.ds, (n, r)


def test_text_helper_sql_paths_match_column_paths(spark):
    # token_count / quality_score / repetition_stats string-name path
    # (SQL text) must equal the Column path value-for-value
    import pyspark.sql.functions as F

    from opencosmo_spark.pipeline.text import (
        quality_score,
        repetition_stats,
        token_count,
    )

    texts = [
        "The quick brown fox. Jumps over!",
        "a a a a a",
        "  padded   words  here ",
        "punct,,,;;; !!! ???",
        "one two",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    cols = {
        "tc_ws_s": token_count("text", "whitespace"),
        "tc_ws_c": token_count(F.col("text"), "whitespace"),
        "tc_bpe_s": token_count("text", "bpe"),
        "tc_bpe_c": token_count(F.col("text"), "bpe"),
        "q_s": quality_score("text"),
        "q_c": quality_score(F.col("text")),
    }
    for name, c in repetition_stats("text").items():
        cols[f"rs_s_{name}"] = c
    for name, c in repetition_stats(F.col("text")).items():
        cols[f"rs_c_{name}"] = c
    rows = df.select(*[c.alias(n) for n, c in cols.items()]).collect()
    for r in rows:
        assert r.tc_ws_s == r.tc_ws_c and r.tc_bpe_s == r.tc_bpe_c, r
        assert r.q_s == r.q_c, r
        for name in ("n_words", "dup_word_frac", "top_word_frac", "dup_bigram_frac"):
            assert r[f"rs_s_{name}"] == r[f"rs_c_{name}"], (name, r)
    # sub-two-word documents ("" splits to [''] — one element too):
    # repetition_stats' bigram window probes element_at(w, 2) on a
    # 1-element array — an ANSI out-of-bounds error PRE-EXISTING in
    # the Column path; parity means the SQL path raises the SAME
    # error, not that either silently succeeds
    import pytest as _pytest

    for text in ("one", ""):
        one = spark.createDataFrame([(text,)], "text string")
        for stats in (
            repetition_stats("text"),
            repetition_stats(F.col("text")),
        ):
            with _pytest.raises(Exception, match="INVALID_ARRAY_INDEX"):
                one.select(
                    stats["dup_bigram_frac"].alias("x")
                ).collect()
