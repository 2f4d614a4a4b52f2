"""Hard-negative mining: exact numpy twin for the broadcast path,
positives/max_sim exclusion semantics, and the IVF path's equi-join
candidate generation against the exact path on clustered data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from opencosmo_spark.pipeline.similarity import mine_hard_negatives


def _twin(qmat, qids, cmat, cids, positives, k, max_sim=None):
    """Exact python reference for the documented semantics."""
    out = {}
    cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    sims = np.round(qn @ cn.T, 6)
    for qi, qid in enumerate(qids):
        cand = [
            (float(sims[qi, ci]), cid)
            for ci, cid in enumerate(cids)
            if (qid, cid) not in positives
            and (max_sim is None or sims[qi, ci] < max_sim)
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        out[qid] = cand[:k]
    return out


@pytest.fixture(scope="module")
def emb_tables(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = emb.toPandas()
    cmat = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    cids = pdf.vec_id.tolist()
    # 6 queries drawn from the corpus itself: each query's own row is
    # its trivially-nearest neighbor, i.e. a planted false negative
    qids = cids[:6]
    qmat = cmat[:6]
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(qids, qmat)],
        ["query_id", "embedding"],
    )
    return queries, emb, qmat, qids, cmat, cids


def test_hard_negatives_matches_twin_and_excludes_positives(
    spark, emb_tables
):
    queries, emb, qmat, qids, cmat, cids = emb_tables
    # label each query's own row as its positive
    positives = spark.createDataFrame(
        [(int(i), int(i)) for i in qids], ["query_id", "doc_id"]
    )
    out = mine_hard_negatives(
        queries,
        emb.withColumnRenamed("vec_id", "doc_id"),
        positives_df=positives,
        k=4,
        corpus_id_col="doc_id",
    ).toPandas()
    want = _twin(qmat, qids, cmat, cids, {(i, i) for i in qids}, 4)
    for qid in qids:
        got = out[out.query_id == qid].sort_values("neg_rank")
        assert qid not in set(got.doc_id), "positive leaked into negatives"
        assert list(got.doc_id) == [cid for _, cid in want[qid]]
        assert np.allclose(
            got.cos_sim.to_numpy(), [s for s, _ in want[qid]], atol=1e-6
        )
        assert list(got.neg_rank) == [1, 2, 3, 4]


def test_hard_negatives_max_sim_guard(spark, emb_tables):
    queries, emb, qmat, qids, cmat, cids = emb_tables
    out = mine_hard_negatives(
        queries,
        emb.withColumnRenamed("vec_id", "doc_id"),
        k=4,
        corpus_id_col="doc_id",
        max_sim=0.99,
    ).toPandas()
    # without positives the query's own row (sim 1.0) would win rank 1;
    # the cap drops it and everything at/above 0.99
    assert (out.cos_sim < 0.99).all()
    want = _twin(qmat, qids, cmat, cids, set(), 4, max_sim=0.99)
    for qid in qids:
        got = out[out.query_id == qid].sort_values("neg_rank")
        assert list(got.doc_id) == [cid for _, cid in want[qid]]


def test_hard_negatives_ivf_path_candidates(spark, emb_tables):
    from opencosmo_spark.pipeline.similarity import train_ivf_codebook

    queries, emb, qmat, qids, cmat, cids = emb_tables
    corpus = emb.withColumnRenamed("vec_id", "doc_id")
    cb = train_ivf_codebook(emb, nlist=4, iters=3)
    out = mine_hard_negatives(
        queries, corpus, k=3, corpus_id_col="doc_id",
        method="ivf", codebook=cb, nprobe=4,
    ).toPandas()
    # nprobe == nlist probes every cell -> identical to the exact path
    exact = mine_hard_negatives(
        queries, corpus, k=3, corpus_id_col="doc_id"
    ).toPandas()
    for qid in qids:
        g = out[out.query_id == qid].sort_values("neg_rank")
        e = exact[exact.query_id == qid].sort_values("neg_rank")
        assert list(g.doc_id) == list(e.doc_id)
    # a 1-probe search returns at most one cell's worth of candidates,
    # all well-formed
    narrow = mine_hard_negatives(
        queries, corpus, k=3, corpus_id_col="doc_id",
        method="ivf", codebook=cb, nprobe=1,
    ).toPandas()
    assert set(narrow.columns) >= {"query_id", "doc_id", "cos_sim",
                                   "neg_rank"}
    assert (narrow.groupby("query_id").neg_rank.max() <= 3).all()

    with pytest.raises(ValueError, match="codebook"):
        mine_hard_negatives(queries, corpus, method="ivf")
    with pytest.raises(ValueError, match="broadcast|ivf"):
        mine_hard_negatives(queries, corpus, method="nope")


def test_hard_negatives_broadcast_plan(spark, emb_tables):
    queries, emb, *_ = emb_tables
    plan = (
        mine_hard_negatives(
            queries, emb.withColumnRenamed("vec_id", "doc_id"),
            k=2, corpus_id_col="doc_id",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # queries broadcast; the corpus is never shuffled for scoring
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ann_recall_report_sweep(spark, emb_tables):
    """Recall@k sweep: nprobe = nlist recovers recall 1.0 exactly
    (probing every cell IS the exact scan), recall is monotonically
    nondecreasing in nprobe, and every value is a valid fraction."""
    from opencosmo_spark.pipeline.similarity import (
        ann_recall_report,
        train_ivf_codebook,
    )

    queries, emb, qmat, qids, cmat, cids = emb_tables
    emb = emb.withColumnRenamed("vec_id", "doc_id")
    cb = train_ivf_codebook(
        emb.withColumnRenamed("doc_id", "vec_id"), nlist=4, iters=3
    )
    rep = (
        ann_recall_report(
            queries, emb, cb, k=5, nprobes=(1, 2, 4)
        )
        .toPandas()
        .sort_values("nprobe")
        .reset_index(drop=True)
    )
    assert list(rep.nprobe) == [1, 2, 4]
    assert (rep.n_queries == 6).all()
    assert (rep.recall_at_k >= 0).all() and (rep.recall_at_k <= 1).all()
    # monotone in nprobe; full probe = exact
    assert rep.recall_at_k.is_monotonic_increasing
    assert rep.recall_at_k.iloc[-1] == 1.0
    # probing 1 of 4 cells must lose SOMETHING on this clustered data
    # or the sweep isn't discriminating (it does: planted geometry)
    assert rep.recall_at_k.iloc[0] < 1.0
