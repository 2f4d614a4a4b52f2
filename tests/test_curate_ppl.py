"""The CCNet perplexity gate inside curate_corpus (Wenzek et al.
2020): planted out-of-domain gibberish must be dropped by the
perplexity stage — not by quality/dedup — while in-domain text
survives, with the stage visible in the attrition report."""

import numpy as np
import pytest
from pyspark.sql import Row

from opencosmo_spark.pipeline import curate_corpus

VOCAB = ["the", "cat", "dog", "sat", "ran", "mat", "on", "a"]
GIBBERISH = ["zq", "xw", "vv", "kj", "pq", "mn", "zz", "yy"]


def _docs(rng, words, n, start, length=25):
    return [
        Row(doc_id=start + i, text=" ".join(rng.choice(words, length)))
        for i in range(n)
    ]


def test_curate_corpus_perplexity_gate_drops_ood(spark):
    rng = np.random.default_rng(53)
    trusted = spark.createDataFrame(_docs(rng, VOCAB, 20, 1000, 30))
    in_domain = _docs(rng, VOCAB, 20, 0)
    ood = _docs(rng, GIBBERISH, 10, 500)
    df = spark.createDataFrame(in_domain + ood)

    out, counts = curate_corpus(
        df,
        ppl_train_df=trusted,
        min_quality=0.0,
        min_tokens=1,
        jaccard_threshold=0.95,
    )
    kept = {r["doc_id"] for r in out.collect()}
    # every OOD doc dies at the perplexity stage (the tail third of a
    # 30-doc corpus is exactly the 10 gibberish docs — their OOV
    # penalty dwarfs any in-domain perplexity)
    assert all(d < 500 for d in kept)
    assert len(kept) >= 15  # in-domain text survives (minus any dups)
    # stage accounting: the gate (not quality, not dedup) did the drop
    assert counts["quality_gate"] == 30
    assert counts["perplexity_gate"] == 20
    # stage order: perplexity gate runs BEFORE the dedup stages
    names = list(counts)
    assert names.index("perplexity_gate") < names.index("exact_dedup")


def test_curate_corpus_perplexity_gate_trained_model_and_errors(spark):
    from opencosmo_spark.pipeline.lm import train_trigram_lm

    rng = np.random.default_rng(59)
    trusted = spark.createDataFrame(_docs(rng, VOCAB, 20, 1000, 30))
    model = train_trigram_lm(trusted)
    df = spark.createDataFrame(
        _docs(rng, VOCAB, 12, 0) + _docs(rng, GIBBERISH, 6, 500)
    )
    # pre-trained trigram model via ppl_model; auto-dispatches scorer
    out, counts = curate_corpus(
        df,
        ppl_model=model,
        min_quality=0.0,
        min_tokens=1,
        jaccard_threshold=0.95,
    )
    assert all(r["doc_id"] < 500 for r in out.collect())
    assert counts["perplexity_gate"] == 12

    with pytest.raises(ValueError, match="ONE of ppl_model"):
        curate_corpus(df, ppl_model=model, ppl_train_df=trusted)
    with pytest.raises(ValueError, match="unknown ppl_keep"):
        curate_corpus(df, ppl_model=model, ppl_keep=("head", "bogus"))
    with pytest.raises(ValueError, match="at least one bucket"):
        curate_corpus(df, ppl_model=model, ppl_keep=())


@pytest.mark.parametrize("scorer", ["bigram", "trigram"])
def test_curate_corpus_in_call_training_both_scorers(spark, scorer):
    """ppl_scorer + ppl_train_df trains the REQUESTED model in-call
    (trigram included — previously only bigram trained in-call), with
    the same planted-OOD invariant under either scorer."""
    rng = np.random.default_rng(61)
    trusted = spark.createDataFrame(_docs(rng, VOCAB, 20, 1000, 30))
    df = spark.createDataFrame(
        _docs(rng, VOCAB, 12, 0) + _docs(rng, GIBBERISH, 6, 500)
    )
    out, counts = curate_corpus(
        df,
        ppl_train_df=trusted,
        ppl_scorer=scorer,
        min_quality=0.0,
        min_tokens=1,
        jaccard_threshold=0.95,
    )
    assert all(r["doc_id"] < 500 for r in out.collect())
    assert counts["perplexity_gate"] == 12
