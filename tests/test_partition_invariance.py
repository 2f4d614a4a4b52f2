"""Partition-invariance suite — the analog of the reference's MPI
parallel tests (reference test/parallel/: every global operation must
return the same answer regardless of rank count / data distribution).
Here the axis is Spark partitioning: each core operation runs under
two deliberately different physical layouts —

  - "narrow": 2 shuffle partitions, whole files as single splits,
  - "wide": 37 shuffle partitions (prime, never divides anything
    evenly), 256 KB file splits —

and must produce IDENTICAL results. This pins the determinism claims
the engine's design makes (md5-lane sampling, integer-micro sums,
id-tiebroken top-k, fixpoint CC labels): none of them may depend on
how rows happen to be split across tasks.
"""

import pandas as pd
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

NARROW = {
    "spark.sql.shuffle.partitions": "2",
    "spark.sql.files.maxPartitionBytes": "1g",
    "spark.sql.files.minPartitionNum": "1",
    "spark.sql.leafNodeDefaultParallelism": "2",
}
WIDE = {
    "spark.sql.shuffle.partitions": "37",
    "spark.sql.files.maxPartitionBytes": "262144",
    "spark.sql.files.minPartitionNum": "16",
    "spark.sql.leafNodeDefaultParallelism": "16",
}


def _run_under(spark, settings, fn):
    old = {}
    for k in settings:
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 - unset conf
            old[k] = None
    for k, v in settings.items():
        spark.conf.set(k, v)
    try:
        pdf = fn(spark).toPandas()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


# the core slice: global sorted take, global scalar reduction feeding a
# row expression, multi-stage semi-join cascade, iterative CC fixpoint,
# hash-lane stratified sampling, set ops, windowed ranking
CORE_QUERIES = [
    "q08_sort_topk",
    "q13_zscore",
    "q21_semi_cascade",
    "q24_set_ops",
    "q26_window_topk",
    "q31_dedup_fingerprint",
    "q35_minhash_lsh",
    "q47_dedup_clusters",
    "q50_stratified_sample",
    "q63_bm25_topk",
    "q64_nb_classify",
]


@pytest.mark.parametrize("qname", CORE_QUERIES)
def test_partition_invariance(spark, qname):
    q = entry.queries()[qname]
    narrow = _run_under(spark, NARROW, lambda s: q(s, SF_DIR))
    wide = _run_under(spark, WIDE, lambda s: q(s, SF_DIR))
    pd.testing.assert_frame_equal(narrow, wide, check_exact=True)
    assert len(narrow) > 0, f"{qname} returned no rows at sf0.001"


def test_star_cc_partition_invariance(spark):
    """The star CC fixpoint must give identical labels under both
    layouts (its per-round argmin/checksum must not be order-bound)."""
    import numpy as np

    from opencosmo_spark.pipeline.dedup import connected_components

    rng = np.random.default_rng(23)
    n = 500
    ea = rng.integers(0, n, 600).tolist()
    eb = rng.integers(0, n, 600).tolist()

    def run(s):
        edges = s.createDataFrame(pd.DataFrame({"a": ea, "b": eb}))
        edges = edges.filter("a != b")
        nodes = s.createDataFrame(pd.DataFrame({"doc_id": list(range(n))}))
        return connected_components(
            edges, nodes, id_col="doc_id", algorithm="star",
            max_iterations=50,
        )

    narrow = _run_under(spark, NARROW, run)
    wide = _run_under(spark, WIDE, run)
    pd.testing.assert_frame_equal(narrow, wide, check_exact=True)


def test_new_ops_partition_invariance(spark):
    """Round-6 operators that claim determinism must also be
    layout-invariant: span removal (ordered reassembly), perplexity
    (integer-exact counts feeding float formula per row), importance
    sampling (hash-lane acceptance after a float bisection whose
    probes are order-independent sums of identical doubles... the
    bisection threshold itself is asserted stable by the equality)."""
    from pyspark.sql import functions as F

    from opencosmo_spark.pipeline.dedup import remove_duplicate_spans
    from opencosmo_spark.pipeline.lm import perplexity_score, train_bigram_lm
    from opencosmo_spark.pipeline.sample import importance_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)

    def span_run(s):
        return remove_duplicate_spans(docs, span=6, min_docs=2)

    def ppl_run(s):
        model = train_bigram_lm(docs)
        return perplexity_score(docs, model)

    wdf = docs.select("doc_id").withColumn(
        "w", (F.col("doc_id") % 7 + 1).cast("double")
    )

    def imp_run(s):
        return importance_sample(wdf, "w", 0.4)

    for fn in (span_run, ppl_run, imp_run):
        narrow = _run_under(spark, NARROW, fn)
        wide = _run_under(spark, WIDE, fn)
        pd.testing.assert_frame_equal(narrow, wide, check_exact=True)
        assert len(narrow) > 0
