"""End-to-end example: the embedding-side curation recipe —
PCA-reduce the corpus, train an IVF codebook with k-means|| seeds,
materialize a cell-clustered layout, ANN-probe it, and semantic-dedup
in the reduced space.

Run against the synthetic fixtures:

    python examples/embedding_pipeline.py [sf_dir]

Everything here is the public package API. At 100 TB the same calls
run unchanged: PCA training is one sweep + one dim^2 reduction, the
clustered write makes every later probe a file-pruned scan of the
probed cells only, and SemDeDup's quadratic term is bounded per cell.
"""

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from opencosmo_spark import get_spark  # noqa: E402
from opencosmo_spark.pipeline import (  # noqa: E402
    assign_ivf_cells,
    ivf_ann,
    pca_project,
    pca_train,
    semantic_dedup,
    train_ivf_codebook,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main():
    spark = get_spark("embedding-example")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    print(f"corpus: {emb.count()} vectors, dim {dim}")

    # 1. PCA: train on one sweep, project to k dims, drop the wide
    #    column — every downstream consumer scans k doubles per row
    model = pca_train(emb, k=8)
    var = sum(model["explained_variance"])
    print(f"pca: kept k=8 axes, explained variance {var:.4f}")
    reduced = pca_project(emb, model, out_col="pca", drop_input=True)

    # 2. codebook with k-means|| seeds, then cell-clustered layout
    cb = train_ivf_codebook(
        reduced, nlist=8, iters=3, vec_col="pca", init="kmeans||"
    )
    stamped = assign_ivf_cells(reduced, cb, vec_col="pca")
    out_dir = tempfile.mkdtemp(prefix="ivf_cells_")
    (
        stamped.repartitionByRange("__ivf_cell")
        .sortWithinPartitions("__ivf_cell")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    print(f"clustered layout written: {out_dir}")

    # 3. ANN probe over the clustered table (file-pruned at scale)
    stored = spark.read.parquet(out_dir)
    q = stored.select("pca").first()[0]
    top = ivf_ann(
        stored, list(q), k=5, codebook=cb, nprobe=2, vec_col="pca"
    )
    print("ann top-5:")
    top.show(truncate=False)

    # 4. semantic dedup in the reduced space
    flags = semantic_dedup(
        stored, threshold=0.999, vec_col="pca", codebook=cb
    )
    n_dup = flags.filter(F.col("dup_of").isNotNull()).count()
    print(f"semantic dedup: {n_dup} near-duplicate vectors flagged")

    # 5. the persistent form: one call writes the cell-partitioned
    #    artifact with its quantizers in the sidecar; a later session
    #    (or a later batch append) needs only the path
    from opencosmo_spark.pipeline import (
        ann_index_search,
        append_to_ann_index,
        read_ann_index,
        write_ann_index,
    )

    idx_dir = tempfile.mkdtemp(prefix="ann_index_")
    write_ann_index(
        reduced, idx_dir, nlist=8, ivf_iters=3,
        vec_col="pca", id_col="vec_id",
    )
    idx = read_ann_index(spark, idx_dir)
    hit = ann_index_search(idx, list(q), k=1, nprobe=2).first()
    print(f"index search: top-1 id={hit[0]} sim={hit['cos_sim']}")
    n_new = append_to_ann_index(
        idx_dir,
        reduced.select((F.col("vec_id") + 10_000).alias("vec_id"), "pca"),
    )
    total = read_ann_index(spark, idx_dir)["df"].count()
    print(f"index append: +{n_new} vectors -> {total} total")

    # long-document recipe: treat every 4 vectors as one document's
    # chunks, pool to a doc vector (token-weighted), and measure the
    # IVF recall/nprobe trade on the pooled index
    from opencosmo_spark.pipeline.embed import pool_embeddings
    from opencosmo_spark.pipeline.similarity import ann_recall_report

    chunks = emb.select(
        (F.col("vec_id") / 4).cast("long").alias("doc_id"),
        "embedding",
        (F.col("vec_id") % 3 + 1).alias("w"),
    )
    docs = pool_embeddings(chunks, weight_col="w", normalize=True)
    qdocs = docs.limit(5).select(
        F.col("doc_id").alias("query_id"), "embedding"
    )
    cb = train_ivf_codebook(
        docs.withColumnRenamed("doc_id", "vec_id"), nlist=8, iters=3
    )
    rec = ann_recall_report(
        qdocs, docs, cb, k=5, nprobes=(1, 8)
    ).collect()
    by = {r["nprobe"]: r["recall_at_k"] for r in rec}
    print(
        f"pooled docs: {docs.count()} vectors; recall@5 "
        f"nprobe=1 {by[1]:.2f} -> nprobe=8 {by[8]:.2f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
