"""Round-5 additions: BM25 search, Naive Bayes classification,
duplicated-span profiling."""

import hashlib
import math

import pytest
from pyspark.sql import Row

from opencosmo_spark.pipeline import (
    bm25_scores,
    bm25_topk,
    duplicate_spans,
    nb_classify,
    nb_train,
)


def _bm25_ref(docs, terms, k1=1.2, b=0.75):
    """Brute-force BM25 over {id: text} in plain Python."""
    toks = {i: t.lower().split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if any(t in v for t in terms):
            out[i] = s
    return out


# ---------------------------------------------------------------- bm25
def test_bm25_scores_match_bruteforce(spark):
    docs = {
        1: "spark shuffles data across the cluster",
        2: "shuffle shuffle shuffle tiny",
        3: "broadcast joins avoid the shuffle entirely in spark",
        4: "nothing relevant here at all",
    }
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs.items()])
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, ["shuffle", "spark"]).collect()
    }
    want = _bm25_ref(docs, ["shuffle", "spark"])
    assert set(got) == set(want)  # doc 4 dropped
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-6)


def test_bm25_topk_order_and_ties(spark):
    rows = [Row(doc_id=i, text="common word") for i in range(5)]
    rows.append(Row(doc_id=99, text="unrelated text"))
    df = spark.createDataFrame(rows)
    top = bm25_topk(df, ["common"], k=3).collect()
    # five identical docs: deterministic tie-break by ascending id
    assert [r["doc_id"] for r in top] == [0, 1, 2]


def test_bm25_plan_single_row_broadcast(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    plan = bm25_topk(df, ["a"], k=5)._jdf.queryExecution().executedPlan().toString()
    # corpus stats reach the scorer via broadcast, and the top-k is a
    # TakeOrderedAndProject — not a global sort
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------- naive bayes
def test_nb_classify_separable(spark):
    train = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta alpha", lang="aa") for i in range(5)]
        + [Row(doc_id=10 + i, text="gamma delta delta", lang="bb") for i in range(5)]
    )
    score = spark.createDataFrame(
        [
            Row(doc_id=100, text="alpha alpha beta beta"),
            Row(doc_id=101, text="delta gamma gamma"),
        ]
    )
    got = {r["doc_id"]: r["pred_lang"] for r in nb_classify(train, score).collect()}
    assert got == {100: "aa", 101: "bb"}


def test_nb_scores_exact_integer_micros(spark):
    # one label, two tokens -> verify the quantized model values
    # against an independent Python computation (md5 lane + ln micros)
    train = spark.createDataFrame([Row(doc_id=1, text="xx yy", lang="zz")])
    model, priors = nb_train(train, num_features=16)
    got = {
        (r["lang"], r["feat"]): r["ll"] for r in model.collect()
    }

    def lane(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 16

    # each of the two tokens occurs once; total tokens = 2, nf = 16
    for tok in ("xx", "yy"):
        want = round(math.log((1 + 1.0) / (2 + 16.0)) * 1_000_000)
        assert got[("zz", lane(tok))] == want
    unseen = round(math.log(1.0 / (2 + 16.0)) * 1_000_000)
    seen_feats = {lane("xx"), lane("yy")}
    for (_, f), v in got.items():
        if f not in seen_feats:
            assert v == unseen
    assert priors.collect()[0]["prior"] == 0  # ln(1) == 0


def test_nb_tie_breaks_by_label(spark):
    # two labels with identical token distributions and priors: the
    # argmax must deterministically pick the lexicographically smaller
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text="tok tok", lang="bb"),
            Row(doc_id=2, text="tok tok", lang="aa"),
        ]
    )
    score = spark.createDataFrame([Row(doc_id=9, text="tok")])
    assert nb_classify(train, score).collect()[0]["pred_lang"] == "aa"


# ---------------------------------------------------------------- dup spans
def test_duplicate_spans_bruteforce(spark):
    a = "one two three four five six"
    b = "zz one two three four qq rr"
    c = "totally different words in this document here"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=a), Row(doc_id=2, text=b), Row(doc_id=3, text=c)]
    )
    got = {r["doc_id"]: r for r in duplicate_spans(df, span=4).collect()}

    def spans(t, k=4):
        w = t.split()
        if len(w) <= k:
            return {" ".join(w)}
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    sa, sb, sc = spans(a), spans(b), spans(c)
    assert got[1]["n_spans"] == len(sa) and got[3]["n_spans"] == len(sc)
    assert got[1]["n_dup_spans"] == len(sa & sb) == 1  # "one two three four"
    assert got[2]["n_dup_spans"] == len(sb & sa) == 1
    assert got[3]["n_dup_spans"] == 0
    assert got[3]["dup_frac"] == 0.0
    assert got[1]["dup_frac"] == pytest.approx(1 / len(sa), abs=1e-6)


def test_duplicate_spans_short_docs(spark):
    # docs shorter than span form one partial window; identical short
    # docs count as duplicated, distinct ones do not
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="tiny doc"),
            Row(doc_id=2, text="tiny doc"),
            Row(doc_id=3, text="other"),
        ]
    )
    got = {r["doc_id"]: r for r in duplicate_spans(df, span=8).collect()}
    assert got[1]["n_spans"] == 1 and got[1]["n_dup_spans"] == 1
    assert got[2]["dup_frac"] == 1.0
    assert got[3]["n_dup_spans"] == 0


# ------------------------------------------------------------ incremental
def _inc_corpora(spark):
    from pyspark.sql import Row

    base = "the quick brown fox jumps over the lazy dog again and again"
    existing = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text="completely unrelated existing document here"),
        ]
    )
    incoming = spark.createDataFrame(
        [
            Row(doc_id=100, text=base),  # exact copy of existing 1
            Row(doc_id=101, text=base.replace("dog", "cat")),  # near-dup of 1
            Row(doc_id=102, text="a genuinely novel incoming document full of new words"),
            Row(doc_id=103, text="a genuinely novel incoming document full of new words"),  # exact in-batch dup
            Row(doc_id=104, text="shared shingle soup alpha beta gamma delta epsilon zeta"),
            Row(doc_id=105, text="shared shingle soup alpha beta gamma delta epsilon eta"),  # near-dup of 104
        ]
    )
    return existing, incoming


def test_incremental_dedup_exact_only(spark):
    from opencosmo_spark.pipeline import incremental_dedup

    existing, incoming = _inc_corpora(spark)
    out = sorted(
        r["doc_id"]
        for r in incremental_dedup(existing, incoming, near_dup=False).collect()
    )
    # 100 dies (exact cross), 103 dies (exact in-batch, keep 102)
    assert out == [101, 102, 104, 105]


def test_incremental_dedup_near_dup(spark):
    from opencosmo_spark.pipeline import incremental_dedup

    existing, incoming = _inc_corpora(spark)
    out = sorted(
        r["doc_id"]
        for r in incremental_dedup(
            existing, incoming, jaccard_threshold=0.5
        ).collect()
    )
    # plus: 101 dies (near-dup of existing 1), 105 collapses onto 104
    assert out == [102, 104]


def test_incremental_dedup_keeps_schema(spark):
    from opencosmo_spark.pipeline import incremental_dedup

    existing, incoming = _inc_corpora(spark)
    out = incremental_dedup(existing, incoming, near_dup=False)
    assert out.columns == incoming.columns


# ---------------------------------------------------------------- bm25 batch
def test_bm25_batch_matches_single_query_path(spark):
    from opencosmo_spark.pipeline.search import bm25_batch, bm25_scores

    docs = {
        1: "spark shuffles data across the cluster",
        2: "shuffle shuffle shuffle tiny",
        3: "broadcast joins avoid the shuffle entirely in spark",
        4: "nothing relevant here at all",
        5: "data data data and more data",
    }
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs.items()])
    q1 = ["shuffle", "spark"]
    q2 = ["data"]
    queries = spark.createDataFrame(
        [Row(query_id=1, term=t) for t in q1]
        + [Row(query_id=2, term=t) for t in q2]
    )
    got = {
        (r["query_id"], r["doc_id"]): r["bm25"]
        for r in bm25_batch(df, queries, k=10).collect()
    }
    for qid, terms in ((1, q1), (2, q2)):
        want = {
            r["doc_id"]: r["bm25"] for r in bm25_scores(df, terms).collect()
        }
        batch_docs = {d for (q, d) in got if q == qid}
        assert batch_docs == set(want)
        for d, s in want.items():
            assert got[(qid, d)] == pytest.approx(s, abs=2e-6), (qid, d)


def test_bm25_batch_accepts_materialized_index(spark, tmp_path):
    from opencosmo_spark.pipeline.search import (
        bm25_batch,
        build_term_index,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta doc{i}") for i in range(10)]
    )
    p = str(tmp_path / "term_index")
    build_term_index(df).write.parquet(p)
    idx = spark.read.parquet(p)
    queries = spark.createDataFrame([Row(query_id=1, term="alpha")])
    out = bm25_batch(df, queries, k=3, index=idx).collect()
    assert len(out) == 3 and all(r["query_id"] == 1 for r in out)


def test_incremental_dedup_with_materialized_index(spark, tmp_path):
    """The on-disk index path must give identical results to the
    recompute-from-text path, without reading the corpus text."""
    from opencosmo_spark.pipeline import incremental_dedup, write_dedup_index

    existing, incoming = _inc_corpora(spark)
    p = str(tmp_path / "dedup_index")
    write_dedup_index(existing, p, buckets=4)
    idx = spark.read.parquet(p)
    assert set(idx.columns) == {"doc_id", "fp", "shingles", "sig"}

    got_idx = sorted(
        r["doc_id"]
        for r in incremental_dedup(
            None, incoming, jaccard_threshold=0.5, existing_index=idx
        ).collect()
    )
    got_txt = sorted(
        r["doc_id"]
        for r in incremental_dedup(
            existing, incoming, jaccard_threshold=0.5
        ).collect()
    )
    assert got_idx == got_txt == [102, 104]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        incremental_dedup(None, incoming)


def test_dedup_index_params_validated(spark, tmp_path):
    """An index probed with different shingle/hash parameters silently
    misses every duplicate — the params sidecar makes it fail loudly."""
    from opencosmo_spark.pipeline import (
        incremental_dedup,
        read_dedup_index,
        write_dedup_index,
    )

    existing, incoming = _inc_corpora(spark)
    p = str(tmp_path / "idx_p")
    wrote = write_dedup_index(existing, p, shingle_k=5)
    idx, params = read_dedup_index(spark, p)
    assert params == wrote and params["shingle_k"] == 5

    # matching params: runs fine
    ok = incremental_dedup(
        None, incoming, shingle_k=5, existing_index=idx, index_params=params
    )
    assert ok.count() > 0

    # mismatched shingle_k: loud error, not silent misses
    import pytest as _pytest

    with _pytest.raises(ValueError, match="different parameters"):
        incremental_dedup(
            None, incoming, shingle_k=3, existing_index=idx, index_params=params
        )
