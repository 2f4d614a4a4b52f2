"""Bigram-LM perplexity scoring vs a hand-computed oracle."""

import math

import numpy as np
import pytest
from pyspark.sql import Row

from opencosmo_spark.pipeline.lm import perplexity_score, train_bigram_lm


def test_bigram_lm_hand_oracle(spark):
    """Tiny corpus, exact expected cross-entropy by hand."""
    train = spark.createDataFrame([Row(doc_id=0, text="a b a b a c")])
    model = train_bigram_lm(train)
    # bigrams: (a,b)x2 (b,a)x2 (a,c)x1 ; c1: a=3, b=2 ; V=3, N=5
    assert model["vocab"] == 3 and model["total"] == 5

    doc = spark.createDataFrame([Row(doc_id=1, text="a b c"),
                                 Row(doc_id=2, text="solo")])
    out = perplexity_score(doc, model, alpha=0.5).toPandas().set_index("doc_id")
    a = 0.5
    p_ab = (2 + a) / (3 + a * 3)   # c12=2, c1(a)=3
    p_bc = (0 + a) / (2 + a * 3)   # unseen bigram, c1(b)=2
    want_h = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert out.loc[1, "n_bigrams"] == 2
    assert out.loc[1, "cross_entropy"] == pytest.approx(want_h, abs=1e-6)
    assert out.loc[1, "perplexity"] == pytest.approx(math.exp(want_h), abs=1e-5)
    # a 1-word document scores NULL, not perfect
    assert out.loc[2, "n_bigrams"] == 0
    assert np.isnan(out.loc[2, "cross_entropy"])


def test_bigram_lm_separates_domains(spark):
    """In-domain prose scores lower perplexity than shuffled words,
    which scores lower than out-of-vocabulary gibberish."""
    rng = np.random.default_rng(37)
    sent = ("the cat sat on the mat and the dog ran to the cat "
            "while the mat lay on the floor near the dog ")
    train = spark.createDataFrame(
        [Row(doc_id=i, text=sent) for i in range(20)]
    )
    model = train_bigram_lm(train)

    words = sent.split()
    shuffled = list(words)
    rng.shuffle(shuffled)
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=sent),
            Row(doc_id=1, text=" ".join(shuffled)),
            Row(doc_id=2, text="zq xw vv kj pq mn zz yy xx ww uu tt"),
        ]
    )
    out = perplexity_score(docs, model).toPandas().set_index("doc_id")
    assert out.loc[0, "perplexity"] < out.loc[1, "perplexity"]
    assert out.loc[1, "perplexity"] < out.loc[2, "perplexity"]
    # in-domain text is DRAMATICALLY more likely
    assert out.loc[0, "perplexity"] * 3 < out.loc[2, "perplexity"]


def test_bigram_lm_conditional_normalizes(spark):
    """sum over h2 of c12 == c1 for every h1 (the counting convention
    the smoothing formula depends on)."""
    from pyspark.sql import functions as F

    train = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(
            ["a b c a b", "b b a", "c a c a c"])]
    )
    model = train_bigram_lm(train)
    chk = (
        model["bigrams"].groupBy("h1").agg(F.sum("c12").alias("s"))
        .join(model["unigrams"], "h1")
        .filter(F.col("s") != F.col("c1"))
        .count()
    )
    assert chk == 0


@pytest.mark.parametrize("scorer", ["bigram", "trigram"])
def test_perplexity_buckets_ccnet_split(spark, scorer):
    """Thirds split under BOTH scorers: band populations ~ equal,
    ordering head < middle < tail by perplexity, short docs land in
    'unscored'. The trigram path exercises the auto-dispatch too."""
    from opencosmo_spark.pipeline.lm import (
        perplexity_buckets,
        train_trigram_lm,
    )

    rng = np.random.default_rng(47)
    vocab = ["the", "cat", "dog", "sat", "ran", "mat", "on", "a"]
    train = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(rng.choice(vocab, 30))) for i in range(40)]
    )
    model = (
        train_bigram_lm(train) if scorer == "bigram"
        else train_trigram_lm(train)
    )
    docs = [Row(doc_id=i, text=" ".join(rng.choice(vocab, 25))) for i in range(90)]
    docs.append(Row(doc_id=999, text="single"))
    # "auto" must resolve to the scorer matching the trained model
    out = perplexity_buckets(
        spark.createDataFrame(docs), model, scorer="auto"
    ).toPandas().set_index("doc_id")
    assert ("n_trigrams" if scorer == "trigram" else "n_bigrams") in out.columns
    assert out.loc[999, "ppl_bucket"] == "unscored"
    scored = out.drop(999)
    counts = scored.ppl_bucket.value_counts()
    assert set(counts.index) <= {"head", "middle", "tail"}
    assert counts.min() >= 20  # ~30 each over 90 docs
    assert (
        scored[scored.ppl_bucket == "head"].perplexity.max()
        <= scored[scored.ppl_bucket == "middle"].perplexity.min()
    )
    assert (
        scored[scored.ppl_bucket == "middle"].perplexity.max()
        <= scored[scored.ppl_bucket == "tail"].perplexity.min()
    )
    with pytest.raises(ValueError, match="scorer must be"):
        perplexity_buckets(spark.createDataFrame(docs), model, scorer="nope")
    if scorer == "bigram":
        with pytest.raises(ValueError, match="trigram tables"):
            perplexity_buckets(
                spark.createDataFrame(docs), model, scorer="trigram"
            )


def _py_trigram_score(train_texts, doc, lambdas=(0.6, 0.25, 0.1, 0.05)):
    """Reference implementation of the interpolated trigram model."""
    import re as _re
    from collections import Counter

    def words(t):
        return _re.findall(r"[a-z0-9]+", t.lower())

    tri, ctx3, bi, c1, tok = Counter(), Counter(), Counter(), Counter(), Counter()
    vocab = set()
    nt = 0
    for t in train_texts:
        ws = words(t)
        vocab.update(ws)
        nt += len(ws)
        tok.update(ws)
        for i in range(len(ws) - 1):
            bi[(ws[i], ws[i + 1])] += 1
            c1[ws[i]] += 1
        for i in range(len(ws) - 2):
            tri[(ws[i], ws[i + 1], ws[i + 2])] += 1
            ctx3[(ws[i], ws[i + 1])] += 1
    l3, l2, l1, l0 = lambdas
    v = len(vocab)
    ws = words(doc)
    lps = []
    for i in range(2, len(ws)):
        w1, w2, w3 = ws[i - 2], ws[i - 1], ws[i]
        if w3 not in vocab:
            lps.append(math.log(l0 / (v + 1)))
            continue
        p = l0 / v
        if ctx3.get((w1, w2)):
            p += l3 * tri.get((w1, w2, w3), 0) / ctx3[(w1, w2)]
        if c1.get(w2):
            p += l2 * bi.get((w2, w3), 0) / c1[w2]
        p += l1 * tok.get(w3, 0) / nt
        lps.append(math.log(p))
    if not lps:
        return 0, None
    h = -sum(lps) / len(lps)
    return len(lps), h


def test_trigram_lm_matches_python_reference(spark):
    from opencosmo_spark.pipeline.lm import (
        train_trigram_lm,
        trigram_perplexity_score,
    )

    train_texts = [
        "the cat sat on the mat and the cat ran to the mat",
        "a dog ran on the mat while the cat sat near a dog",
    ]
    train = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(train_texts)]
    )
    model = train_trigram_lm(train)
    docs = [
        (0, "the cat sat on the mat"),       # fully in-domain
        (1, "a dog sat on the zebra mat"),   # one OOV word
        (2, "xx yy"),                        # too short for a trigram
    ]
    out = (
        trigram_perplexity_score(
            spark.createDataFrame(docs, ["doc_id", "text"]), model
        )
        .toPandas()
        .set_index("doc_id")
    )
    for i, t in docs:
        n, h = _py_trigram_score(train_texts, t)
        assert out.loc[i, "n_trigrams"] == n
        if h is None:
            assert np.isnan(out.loc[i, "cross_entropy"])
        else:
            assert out.loc[i, "cross_entropy"] == pytest.approx(h, abs=1e-6)


def test_trigram_sharper_than_bigram_in_domain(spark):
    """On text the model has actually seen, the trigram interpolation
    must assign lower perplexity than the bigram add-alpha model —
    that is what buying the extra order is for."""
    from opencosmo_spark.pipeline.lm import (
        train_trigram_lm,
        trigram_perplexity_score,
    )

    sent = ("the cat sat on the mat and the dog ran to the cat "
            "while the mat lay on the floor near the dog ")
    train = spark.createDataFrame(
        [Row(doc_id=i, text=sent) for i in range(10)]
    )
    tri_model = train_trigram_lm(train)
    bi_model = {k: tri_model[k] for k in
                ("bigrams", "unigrams", "vocab_df", "vocab", "total")}
    doc = spark.createDataFrame([Row(doc_id=0, text=sent)])
    tri = trigram_perplexity_score(doc, tri_model).collect()[0]
    bi = perplexity_score(doc, bi_model).collect()[0]
    assert tri["perplexity"] < bi["perplexity"]
    with pytest.raises(ValueError, match="sum to 1"):
        trigram_perplexity_score(doc, tri_model, lambdas=(1, 1, 1, 1))
