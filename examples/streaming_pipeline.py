"""End-to-end example: the Structured-Streaming layer over a staged
event stream — windowed aggregation, session windows, streaming
dedup, stateful running stats, and the SpaceSaving heavy-hitters
sketch in the state store.

    python examples/streaming_pipeline.py [events_parquet]

Each query runs against a file-source directory staged in two pieces
so the stream really sees multiple micro-batches; processAllAvailable
drives it to completion (the test/smoke harness — production swaps
the memory sink for parquet/Kafka and just keeps running). Every
operator's state is BOUNDED: windows and sessions expire by
watermark, dedup state lives one watermark horizon, the
heavy-hitters sketch is n_lanes x capacity counters forever.
"""

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from opencosmo_spark import get_spark  # noqa: E402
from opencosmo_spark.streaming import (  # noqa: E402
    dedup_stream,
    event_time_expr,
    frequent_items_stream,
    read_event_stream,
    run_stream_to_memory,
    running_user_stats,
    sessionize_stream,
    streaming_top_items,
    windowed_aggregate,
)

EVENTS = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/testdata/sf0.001/events.parquet"
)


def stage_stream_dir(spark) -> str:
    """Split the fixture into two files so the source produces
    multiple micro-batches."""
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="events_stream_")
    t = pq.read_table(EVENTS)
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), f"{d}/part-0.parquet")
    pq.write_table(t.slice(half), f"{d}/part-1.parquet")
    return d


def main():
    spark = get_spark("streaming-example")
    events_dir = stage_stream_dir(spark)
    batch = spark.read.parquet(EVENTS)
    batch = batch.withColumn(
        "event_time", event_time_expr(batch.schema["ts"].dataType)
    )
    print(f"events: {batch.count()} rows staged as 2 micro-batches")

    # 1. tumbling-window aggregate with watermark (batch twin: q28)
    stream = read_event_stream(spark, events_dir)
    win = run_stream_to_memory(
        windowed_aggregate(stream, window="10 minutes"),
        "ex_win",
    )
    print(f"windowed agg: {win.count()} (window, kind) rows")

    # 2. session windows by 30-minute gap (batch twin: q37)
    stream = read_event_stream(spark, events_dir)
    sess = run_stream_to_memory(
        sessionize_stream(stream, gap="30 minutes"), "ex_sess"
    )
    print(f"sessions: {sess.count()} user sessions")

    # 3. streaming exact dedup within the watermark horizon
    stream = read_event_stream(spark, events_dir)
    ded = run_stream_to_memory(
        dedup_stream(stream, key_cols=["user_id", "event_type"]), "ex_dedup"
    )
    print(
        f"dedup: {batch.count()} events -> "
        f"{ded.count()} first-arrival (user, event_type) rows"
    )

    # 4. custom stateful operator: per-user running stats emitted per
    #    batch from the state store
    stream = read_event_stream(spark, events_dir)
    stats = run_stream_to_memory(
        running_user_stats(stream), "ex_stats", mode="update"
    )
    final = stats.groupBy("user_id").agg(
        F.max("n_events").alias("n_events")
    )
    print(f"running stats: {final.count()} users tracked")

    # 5. heavy hitters in the state store: trending event kinds
    stream = read_event_stream(spark, events_dir)
    sk = frequent_items_stream(
        stream.select(F.col("event_type").alias("item")),
        capacity=16,
        n_lanes=4,
    )
    sink = run_stream_to_memory(sk, "ex_hh", mode="update")
    top = streaming_top_items(sink, k=3).collect()
    print(
        "top kinds:",
        [(r["item"], int(r["count_upper"])) for r in top],
    )
    truth = (
        batch.groupBy("event_type").count().orderBy(F.desc("count")).first()
    )
    assert top[0]["item"] == truth["event_type"], "sketch missed the modal kind"

    # 6. streaming corpus profiling: each document micro-batch lands
    #    one mergeable profile row; the card is a merge over the
    #    artifact, identical to batch-profiling everything seen so far
    from opencosmo_spark.pipeline.report import merge_corpus_profiles
    from opencosmo_spark.streaming import corpus_profile_stream

    doc_dir = tempfile.mkdtemp(prefix="docs_stream_")
    art_dir = tempfile.mkdtemp(prefix="profile_art_")
    docs_fixture = EVENTS.rsplit("/", 1)[0] + "/documents.parquet"
    spark.read.parquet(docs_fixture).limit(200).repartition(2).write.mode(
        "overwrite"
    ).parquet(doc_dir)
    doc_stream = (
        spark.readStream.schema(spark.read.parquet(doc_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(doc_dir)
    )
    corpus_profile_stream(
        doc_stream, art_dir + "/table", art_dir + "/ckpt"
    )
    prof = spark.read.parquet(art_dir + "/table")
    card = merge_corpus_profiles(prof).collect()[0]
    print(
        f"stream profile: {prof.count()} batch rows -> card "
        f"docs={card['docs']} p50={card['tokens_p50']}"
    )
    shutil.rmtree(doc_dir)
    shutil.rmtree(art_dir)

    # 7. streaming ANN-index ingest: arriving embedding micro-batches
    #    are stamped with the persisted index's own quantizer and land
    #    as exactly-once increments; queries read base + live rows
    #    with directory pruning on both scans
    from opencosmo_spark.pipeline.similarity import (
        ann_index_search_batch,
        read_ann_index,
        write_ann_index,
    )
    from opencosmo_spark.streaming import ann_index_stream

    emb_fixture = EVENTS.rsplit("/", 1)[0] + "/embeddings.parquet"
    emb = spark.read.parquet(emb_fixture)
    ann_dir = tempfile.mkdtemp(prefix="ann_stream_")
    write_ann_index(
        emb.filter(F.col("vec_id") < 50), ann_dir + "/index", nlist=4
    )
    new_dir = ann_dir + "/new"
    emb.filter(
        (F.col("vec_id") >= 50) & (F.col("vec_id") < 80)
    ).repartition(2).write.parquet(new_dir)
    vec_stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(new_dir)
    )
    ann_index_stream(
        vec_stream, ann_dir + "/updates", ann_dir + "/ann_ckpt",
        ann_dir + "/index",
    )
    merged = read_ann_index(
        spark, ann_dir + "/index", updates_dir=ann_dir + "/updates"
    )
    qvec = emb.filter(F.col("vec_id") == 60).first()["embedding"]
    queries = spark.createDataFrame(
        [(0, [float(x) for x in qvec])],
        "query_id long, embedding array<double>",
    )
    hit = (
        ann_index_search_batch(merged, queries, k=1, nprobe=4)
        .first()
    )
    print(
        f"streamed vector retrievable: top-1 for its own query = "
        f"{hit['vec_id']} (expect 60), cos = {hit['cos_sim']:.4f}"
    )
    shutil.rmtree(ann_dir)

    # 8. streaming pretraining ingestion: tokenized docs arrive in
    #    micro-batches, fixed blocks leave with globally consecutive
    #    ids; the ragged tail carries between batches as an artifact
    from opencosmo_spark.streaming import block_pack_stream

    bp_dir = tempfile.mkdtemp(prefix="block_pack_")
    tok = spark.read.parquet(docs_fixture).limit(60).select(
        "doc_id",
        F.transform(
            F.split(F.trim("text"), r"\s+"),
            lambda w: F.abs(F.hash(w)) % 1000,
        ).alias("input_ids"),
    )
    tok.repartition(2).write.parquet(bp_dir + "/toks")
    tok_stream = (
        spark.readStream.schema(spark.read.parquet(bp_dir + "/toks").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(bp_dir + "/toks")
    )
    block_pack_stream(
        tok_stream, bp_dir + "/blocks", bp_dir + "/ckpt",
        bp_dir + "/tail", block_size=256, eos_id=0,
    )
    blk = spark.read.parquet(bp_dir + "/blocks")
    nblk = blk.count()
    ok = blk.filter(F.col("n_tokens") != 256).count() == 0
    print(
        f"stream blocks: {nblk} x 256 tokens, all full = {ok}, "
        f"ids consecutive = "
        f"{sorted(r['block_id'] for r in blk.select('block_id').collect()) == list(range(nblk))}"
    )
    shutil.rmtree(bp_dir)

    shutil.rmtree(events_dir)
    print("streaming pipeline complete")
    spark.stop()


if __name__ == "__main__":
    main()
