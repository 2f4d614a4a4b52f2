"""End-to-end example: curate a raw document corpus, build search and
ANN indexes over the survivors, and dedup a later incremental batch.

Run against the synthetic fixtures:

    python examples/curation_pipeline.py [sf_dir]

Everything here is the public package API; each step prints what it
did. At real scale the same calls run unchanged on a cluster — the
operators' scale posture is documented per-function and in SCALE.md.
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from opencosmo_spark import get_spark  # noqa: E402
from opencosmo_spark.pipeline import (  # noqa: E402
    bm25_topk,
    brute_force_cosine_topk,
    curate_corpus,
    incremental_dedup,
    ivf_ann,
    train_ivf_codebook,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main():
    spark = get_spark("example")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    # 1. one-call curation: quality gate, Gopher rules, C4 line scrub,
    #    PII scrub, exact + near dedup, span gate, temperature training
    #    mix, 8 loader shards
    curated, counts = curate_corpus(
        docs,
        min_quality=0.2,
        gopher={"min_words": 10, "min_stopword_hits": 1},
        c4_lines=False,  # synthetic docs have no line structure
        jaccard_threshold=0.8,
        max_dup_span_frac=0.8,
        mix_col="lang",
        mix_alpha=0.7,
        mix_target_frac=0.7,
        n_shards=8,
        report=True,
    )
    print("curation attrition:", counts)

    # 1b. perplexity triage under a self-trained bigram LM: the CCNet
    #     head/middle/tail bands over the curated corpus
    from opencosmo_spark.pipeline import perplexity_buckets, train_bigram_lm

    lm = train_bigram_lm(curated)
    bands = (
        perplexity_buckets(curated, lm)
        .groupBy("ppl_bucket")
        .count()
        .collect()
    )
    print("perplexity bands:", {r["ppl_bucket"]: r["count"] for r in bands})

    # 1c. trainable quality classifier (the Wikipedia-vs-CommonCrawl
    #     recipe): label the perplexity head band positive, the tail
    #     negative, train the hashed-n-gram logistic regression, and
    #     score the whole corpus — quality_prob then feeds a threshold
    #     or importance_sample
    from opencosmo_spark.pipeline import (
        quality_classifier_score,
        train_quality_classifier,
    )

    labeled = (
        perplexity_buckets(curated, lm)
        .filter(F.col("ppl_bucket").isin("head", "tail"))
        .select(
            "doc_id",
            F.when(F.col("ppl_bucket") == "head", 1).otherwise(0).alias("label"),
        )
        .join(curated.select("doc_id", "text"), "doc_id")
    )
    clf = train_quality_classifier(
        labeled, num_features=4096, iters=10, lr=1.0
    )
    scored = quality_classifier_score(curated, clf)
    hi = scored.filter(F.col("quality_prob") > 0.5).count()
    print(f"classifier: {hi}/{scored.count()} docs above p=0.5")

    # 1c'. is the classifier's 0.9 actually a 0.9? reliability table
    #      against the training labels (run on a held-out set in
    #      production)
    from opencosmo_spark.pipeline.classify import calibration_report

    cal = calibration_report(scored, labeled, bins=5).collect()
    print(
        f"calibration: ece={cal[0]['ece']:.3f} over "
        f"{len(cal)} occupied bins"
    )

    # 1d. dataset card with the C4-style most-common-trigrams section,
    #     straight off corpus_report
    from opencosmo_spark.pipeline.report import (
        corpus_report,
        format_dataset_card,
    )

    card = format_dataset_card(
        corpus_report(curated, top_ngrams=(3, 5)), title="Curated corpus"
    )
    print(card.split("## Most common n-grams")[1].strip()[:200])

    # 1e. fixed-budget selection: exactly 200 documents, inclusion
    #     probability proportional to the classifier score (the
    #     "best k docs, stochastically" budget-first phrasing)
    best, bcounts = curate_corpus(
        scored.select("doc_id", "quality_prob").join(
            curated.select("doc_id", "text", "lang", "source"), "doc_id"
        ),
        min_quality=0.0,
        min_tokens=1,
        jaccard_threshold=0.95,
        budget_docs=200,
        budget_weight_col="quality_prob",
        report=True,
    )
    print(f"budget mix: {bcounts['mix']} survivors (asked 200)")

    # 2. keyword search over the curated corpus
    hits = bm25_topk(curated, ["vector", "key"], k=5)
    print("bm25 top-5:", [(r["doc_id"], r["bm25"]) for r in hits.collect()])

    # 3. ANN over embeddings: train an IVF codebook, probe 2 cells
    codebook = train_ivf_codebook(emb, nlist=8, iters=3)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    ann = ivf_ann(emb, q, k=5, nlist=8, nprobe=2, codebook=codebook)
    exact = brute_force_cosine_topk(emb, q, k=5)
    print("ivf top-5:  ", [r["vec_id"] for r in ann.collect()])
    print("exact top-5:", [r["vec_id"] for r in exact.collect()])

    # 4. a later batch arrives: dedup it against the curated corpus
    batch = docs.limit(50).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang",
        "source", "n_chars",
    )
    fresh = incremental_dedup(curated, batch, jaccard_threshold=0.8)
    print(f"incremental batch: {batch.count()} in -> {fresh.count()} new")

    # 4b. the release chain: this release publishes its dedup index,
    #     the next curate probes it (stages 4+5 in one pass, old text
    #     never re-read) and publishes the extended index for the one
    #     after
    import tempfile as _tf

    chain = _tf.mkdtemp(prefix="release_chain_")
    _, c_v1 = curate_corpus(
        docs.limit(120), min_quality=0.0, min_tokens=1,
        publish_dedup_index_path=chain + "/idx_v1",
    )
    next_snap = docs.limit(160).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    v2, c_v2 = curate_corpus(
        next_snap, min_quality=0.0, min_tokens=1,
        dedup_index_path=chain + "/idx_v1",
        publish_dedup_index_path=chain + "/idx_v2",
    )
    print(
        f"release chain: v1 kept {c_v1['near_dedup']}, v2 probe kept "
        f"{c_v2['incremental_dedup']} of {c_v2['input']} "
        f"(dups of v1 dropped without re-reading v1 text)"
    )

    # 4c. the release also publishes its TOKENIZER: token ids are
    #     reproducible from the release directory alone (byte-level
    #     by default — lossless on any future text)
    from opencosmo_spark.pipeline.bpe import bpe_encode_ids, read_tokenizer

    v3, _ = curate_corpus(
        docs.limit(80), min_quality=0.0, min_tokens=1,
        tokenizer_path=chain + "/tok_v1", tokenizer_merges=40,
    )
    tok = read_tokenizer(spark, chain + "/tok_v1")
    n_ids = bpe_encode_ids(
        v3.select("doc_id", "text"), tok["merges"], tok["vocab"],
        mode=tok["mode"],
    ).count()
    print(
        f"tokenizer artifact: mode={tok['mode']}, "
        f"{len(tok['vocab'])} tokens; re-encoded {n_ids} release docs "
        f"from the stored artifact alone"
    )
    import shutil as _sh

    _sh.rmtree(chain)

    # 5. the mergeable-artifact layer: profile the corpus per source
    #    shard, append the rows to a parquet artifact, and answer the
    #    card question from the ARTIFACT (no rescans); then size the
    #    old-vs-new churn and the cross-corpus overlap without joins
    import tempfile

    from opencosmo_spark.pipeline.decontaminate import corpus_overlap_sketch
    from opencosmo_spark.pipeline.report import (
        corpus_churn,
        corpus_profile,
        merge_corpus_profiles,
    )

    with tempfile.TemporaryDirectory() as tdir:
        prof_path = tdir + "/profile"
        corpus_profile(curated, shard_col="source").write.parquet(prof_path)
        stored = spark.read.parquet(prof_path)
        merged = merge_corpus_profiles(stored).collect()[0]
        print(
            f"profile artifact: {stored.count()} shard rows -> card "
            f"docs={merged['docs']} distinct~{merged['approx_distinct_texts']} "
            f"p50={merged['tokens_p50']}"
        )
    ch = corpus_churn(docs, curated)
    print(
        f"churn raw->curated: kept~{ch['common']} removed~{ch['removed']} "
        f"({ch['churn']:.3f} churn)"
    )
    ov = corpus_overlap_sketch(curated, batch, k=5)
    print(f"overlap sketch jaccard: {ov['jaccard']:.3f}")

    spark.stop()


if __name__ == "__main__":
    main()
