

def test_curate_return_dropped_attribution(spark):
    """Every dropped doc is attributed to exactly the stage that
    dropped it; survivors never appear in the audit."""
    from opencosmo_spark.pipeline import curate_corpus

    good = "This is a perfectly reasonable document with plenty of words."
    rows = [
        (1, "https://ok.org/a", good + " one"),
        (2, "https://spam.biz/x", good + " two"),     # url_gate
        (3, "https://ok.org/b", "tiny"),              # quality gate
        (4, "https://ok.org/c", good + " one"),       # dup of 1? no — text differs by suffix
        (5, "https://ok.org/d", good + " one"),       # exact dup of 1... and 4
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    curated, counts, dropped = curate_corpus(
        df,
        min_quality=0.0,
        min_tokens=3,
        url_block_domains=["spam.biz"],
        return_dropped=True,
    )
    audit = {r["doc_id"]: r["stage"] for r in dropped.collect()}
    survivors = {r["doc_id"] for r in curated.collect()}
    assert audit[2] == "url_gate"
    assert audit[3] == "quality_gate"
    # docs 1/4/5: 1 and 4 and 5 — 4 and 5 share 1's text ("... one"):
    # exact dedup keeps min id 1, drops 4 and 5
    assert audit[4] == "exact_dedup" and audit[5] == "exact_dedup"
    assert survivors == {1}
    assert set(audit) | survivors == {1, 2, 3, 4, 5}
    assert not (set(audit) & survivors)
    # requires report mode
    import pytest as _pytest

    with _pytest.raises(ValueError, match="report"):
        curate_corpus(df, return_dropped=True, report=False)
