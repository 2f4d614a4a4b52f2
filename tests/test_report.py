"""corpus_report vs exact pandas-computed statistics on a corpus with
known duplication, language mix, and group structure."""

import pytest

from opencosmo_spark.pipeline.report import (
    corpus_report,
    dup_rate,
    format_dataset_card,
)

EN = "the quick brown fox jumps over the lazy dog and runs away fast"
FR = "le chat est sur la table et il regarde les oiseaux dans le jardin"
DOCS = (
    [(f"e{i}", "web", EN + f" variant {i}") for i in range(8)]
    + [(f"f{i}", "web", FR) for i in range(3)]          # exact dups
    + [(f"b{i}", "books", EN + f" book text {i}") for i in range(5)]
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "source", "text"])


def test_global_report_exact_counts(spark, corpus):
    rep = corpus_report(corpus).toPandas()
    assert len(rep) == 1
    r = rep.iloc[0]
    assert r["docs"] == len(DOCS)
    # HLL default rsd is 5% — allow +-1 at this scale
    assert abs(r["distinct_ids"] - len(DOCS)) <= 1
    # exact totals
    exp_tokens = sum(len(t.split()) for _, _, t in DOCS)
    assert r["total_tokens"] == exp_tokens
    assert r["total_chars"] == sum(len(t) for _, _, t in DOCS)
    assert r["total_bytes"] == sum(len(t.encode()) for _, _, t in DOCS)
    # the 3 identical FR docs collapse in the distinct-text estimate
    assert abs(r["approx_distinct_texts"] - (len(DOCS) - 2)) <= 1
    assert r["lang_top"] == "en"
    assert r["lang_top_frac"] == pytest.approx(13 / 16, abs=1e-6)
    d = dup_rate(spark.createDataFrame(rep)).first()["dup_rate"]
    assert d == pytest.approx(2 / 16, abs=1 / 16 + 1e-6)


def test_grouped_report_and_quantiles(spark, corpus):
    rep = (
        corpus_report(corpus, group_by="source", quantiles=(0.5,))
        .toPandas()
        .set_index("group")
    )
    assert sorted(rep.index) == ["books", "web"]
    assert rep.loc["web", "docs"] == 11
    assert rep.loc["books", "docs"] == 5
    assert "tokens_p50" in rep.columns
    web_tokens = sorted(
        len(t.split()) for _, s, t in DOCS if s == "web"
    )
    assert rep.loc["web", "tokens_p50"] == web_tokens[len(web_tokens) // 2]


def test_report_without_language_or_ids(spark, corpus):
    rep = corpus_report(
        corpus, id_col=None, with_language=False
    ).toPandas()
    assert rep.iloc[0]["distinct_ids"] is None or str(
        rep.iloc[0]["distinct_ids"]
    ) in ("nan", "<NA>")
    assert "lang_top" not in rep.columns


def test_format_dataset_card(spark, corpus):
    card = format_dataset_card(
        corpus_report(corpus, group_by="source"), title="Test corpus"
    )
    assert card.startswith("# Test corpus")
    assert "| books |" in card.replace("|books", "| books")
    assert "docs" in card


def test_report_top_ngrams_section(spark, corpus):
    """corpus_report(top_ngrams=(n, k)) attaches the corpus-wide
    top-k gram table (count-desc, gram-asc tiebreak; exact counts
    match a brute-force python twin) and format_dataset_card renders
    it as its own 'Most common n-grams' section."""
    import re
    from collections import Counter

    rep = corpus_report(corpus, top_ngrams=(3, 5))
    rows = rep.toPandas()
    assert len(rows) == 1
    got = [(g["gram"], g["count"]) for g in rows.iloc[0]["top_ngrams"]]

    # brute-force twin on the same lowercased-word convention
    cnt = Counter()
    for _, _, text in DOCS:
        words = re.findall(r"[a-z0-9']+", text.lower())
        for i in range(len(words) - 2):
            cnt[" ".join(words[i : i + 3])] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == want

    card = format_dataset_card(rep, title="Grams")
    assert "## Most common n-grams" in card
    top_gram = want[0][0]
    assert f"| {top_gram} | {want[0][1]} |" in card
    # the array column must NOT leak into the stats table header
    header = card.splitlines()[2]
    assert "top_ngrams" not in header

    # grouped report: gram column is corpus-wide, identical per row
    grp = corpus_report(
        corpus, group_by="source", top_ngrams=(3, 3)
    ).toPandas()
    lists = [
        tuple((g["gram"], g["count"]) for g in row)
        for row in grp["top_ngrams"]
    ]
    assert len(set(lists)) == 1

    # sketch mode carries the winners too (counts are upper bounds)
    sk = corpus_report(
        corpus, top_ngrams=(3, 5), ngrams_exact=False
    ).toPandas()
    sk_rows = sk.iloc[0]["top_ngrams"]
    sk_grams = {g["gram"] for g in sk_rows}
    assert want[0][0] in sk_grams  # the clear winner always surfaces
    by_gram = {g["gram"]: g["count"] for g in sk_rows}
    for gram, true_count in want:
        if gram in by_gram:
            assert by_gram[gram] >= true_count  # true upper bound


def test_corpus_churn_lanes_matches_eager(spark):
    # the lazy frame form must emit exactly the eager dict's values
    from opencosmo_spark.pipeline.report import corpus_churn, corpus_churn_lanes

    old = spark.createDataFrame(
        [(1, "a b"), (2, "dup text"), (3, "gone"), (4, None)],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(5, "a  B"), (6, "dup text"), (7, "fresh"), (8, None)],
        ["doc_id", "text"],
    )
    eager = corpus_churn(old, new)
    lanes = {
        r.metric: r.value for r in corpus_churn_lanes(old, new).collect()
    }
    for k in (
        "docs_old", "docs_new", "distinct_old", "distinct_new",
        "added", "removed", "common",
    ):
        assert lanes[k] == eager[k], (k, lanes[k], eager[k])
    # empty-input doc counts coalesce to 0 like the eager form
    empty = old.filter("doc_id < 0")
    lanes0 = {
        r.metric: r.value for r in corpus_churn_lanes(empty, empty).collect()
    }
    assert lanes0["docs_old"] == 0 and lanes0["docs_new"] == 0


def test_corpus_churn_lanes_split_matches_union(spark):
    # the one-scan predicate form must emit exactly the union form's
    # values for predicate views of the same table — including rows in
    # neither view, overlapping views, NULL texts, and empty views
    import pyspark.sql.functions as F

    from opencosmo_spark.pipeline.report import (
        corpus_churn_lanes,
        corpus_churn_lanes_split,
    )

    d = spark.createDataFrame(
        [
            (1, "a b"),
            (2, "dup  text"),
            (3, "dup text"),
            (4, None),
            (5, "only old"),
            (6, "only new"),
            (12, "both sides"),
        ],
        ["doc_id", "text"],
    )
    old_cond = F.col("doc_id") % 3 != 0
    new_cond = F.col("doc_id") % 2 != 0
    union = {
        r.metric: r.value
        for r in corpus_churn_lanes(
            d.filter(old_cond), d.filter(new_cond)
        ).collect()
    }
    split = {
        r.metric: r.value
        for r in corpus_churn_lanes_split(d, old_cond, new_cond).collect()
    }
    assert split == union, (split, union)
    # both views empty -> zero doc counts, no NULL metrics
    empty = {
        r.metric: r.value
        for r in corpus_churn_lanes_split(
            d, F.lit(False), F.lit(False)
        ).collect()
    }
    assert empty["docs_old"] == 0 and empty["docs_new"] == 0
