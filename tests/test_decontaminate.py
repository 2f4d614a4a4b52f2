

def test_corpus_overlap_exact_counts(spark):
    """Overlap report vs hand-computed gram sets on a tiny corpus."""
    from opencosmo_spark.pipeline.decontaminate import corpus_overlap

    a = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "epsilon zeta eta theta"),
            (3, "unique words only here"),
        ],
        ["doc_id", "text"],
    )
    b = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta extra"),   # shares doc 1's grams
            (11, "totally different content words"),
        ],
        ["doc_id", "text"],
    )
    rep = corpus_overlap(a, b, k=2)
    # a's 2-gram windows: 3 per 4-word doc x 3 docs = 9 distinct
    # b's: 4 + 3 = 7 distinct; shared = doc1 x doc10 prefix = 3
    assert rep["grams_a"] == 9 and rep["grams_b"] == 7
    assert rep["shared_grams"] == 3
    assert rep["jaccard"] == round(3 / 13, 6)
    assert rep["containment_a_in_b"] == round(3 / 9, 6)
    assert rep["docs_affected_a"] == 1 and rep["docs_affected_b"] == 1
    assert rep["docs_a"] == 3 and rep["docs_b"] == 2
    # disjoint corpora: all zeros
    rep0 = corpus_overlap(a.limit(1), b.filter("doc_id = 11"), k=2)
    assert rep0["shared_grams"] == 0 and rep0["jaccard"] == 0.0
