"""Structured Streaming tests: the streaming windowed aggregate must
equal its batch twin over the same file set (memory sink +
processAllAvailable drives the stream to completion).
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from opencosmo_spark.streaming import (
    event_time_expr,
    read_event_stream,
    run_stream_to_memory,
    sessionize_stream,
    windowed_aggregate,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # the streaming file source needs a directory; stage the file in
    # two pieces so the stream actually sees multiple micro-batches
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("events_stream")
    t = pq.read_table(EVENTS)
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), d / "part-0.parquet")
    pq.write_table(t.slice(half), d / "part-1.parquet")
    return str(d)


@pytest.fixture(scope="module")
def batch_events(spark):
    df = spark.read.parquet(EVENTS)
    return df.withColumn("event_time", event_time_expr(df.schema["ts"].dataType))


def test_windowed_aggregate_matches_batch(spark, batch_events, events_dir):
    stream = read_event_stream(spark, events_dir)
    agg = windowed_aggregate(stream, window="1 hour")
    out = run_stream_to_memory(agg, "win_out", mode="append").toPandas()

    batch = (
        batch_events.groupBy(F.window("event_time", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
        .toPandas()
    )
    merged = out.merge(
        batch, on=["window_start", "event_type"], suffixes=("_s", "_b")
    )
    # append mode emits only watermark-closed windows; all emitted
    # windows must match the batch result exactly
    assert len(merged) == len(out) > 0
    assert (merged.n_s == merged.n_b).all()


def test_sessionize_stream_runs(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    sess = sessionize_stream(stream, gap="30 minutes")
    out = run_stream_to_memory(sess, "sess_out", mode="append").toPandas()
    assert len(out) > 0
    assert (out.n_events > 0).all()
    # session windows must not overlap per user
    for _, g in out.groupby("user_id"):
        g = g.sort_values("session_start")
        assert (g.session_start.shift(-1)[:-1] >= g.session_end[:-1]).all()


def test_running_user_stats_matches_batch(spark, batch_events, events_dir):
    from opencosmo_spark.streaming import running_user_stats

    stream = read_event_stream(spark, events_dir)
    out = run_stream_to_memory(
        running_user_stats(stream), "run_out", mode="update"
    ).toPandas()
    assert len(out) > 0
    # the LAST update per user must equal the batch aggregate (state
    # accumulated across both micro-batches)
    final = out.groupby("user_id").last()
    batch = (
        batch_events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
        .set_index("user_id")
    )
    merged = final.join(batch, lsuffix="_s", rsuffix="_b")
    assert (merged.n_events_s == merged.n_events_b).all()
    assert (abs(merged.sum_value_s - merged.sum_value_b) < 1e-6).all()
    assert (merged.max_value_s == merged.max_value_b).all()


def test_dedup_stream_drops_cross_batch_duplicates(
    spark, tmp_path_factory, batch_events
):
    """Duplicate event_ids arriving in a LATER micro-batch must be
    dropped; the surviving set equals batch dropDuplicates."""
    import pyarrow.parquet as pq

    from opencosmo_spark.streaming import dedup_stream

    d = tmp_path_factory.mktemp("events_dedup")
    t = pq.read_table(EVENTS)
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), d / "part-0.parquet")
    # second batch overlaps the first (rows 1/4..3/4): every row in the
    # first half's tail is a cross-batch duplicate
    pq.write_table(t.slice(half // 2, half), d / "part-1.parquet")

    stream = read_event_stream(spark, str(d))
    out = run_stream_to_memory(
        dedup_stream(stream, ["event_id"]), "dedup_out"
    ).toPandas()

    assert len(out) == t.num_rows // 2 + half // 2  # staged distinct rows
    assert out.event_id.is_unique
    expected = set(
        r.event_id
        for r in spark.read.parquet(str(d)).dropDuplicates(["event_id"]).collect()
    )
    assert set(out.event_id) == expected


def test_interval_join_stream_matches_batch(spark, batch_events, events_dir):
    """Stream-stream bin join == the batch inequality join over the
    same files: every (event, error-in-prior-hour) pair, no dupes."""
    from opencosmo_spark.streaming import interval_join_stream

    ev = read_event_stream(spark, events_dir)
    err = read_event_stream(spark, events_dir).filter(
        F.col("event_type") == "error"
    )
    out = run_stream_to_memory(
        interval_join_stream(ev, err, window_seconds=3600), "ij_out"
    ).toPandas()

    b = batch_events.select("event_id", "event_time", "event_type").toPandas()
    errs = b[b.event_type == "error"]
    expected = set()
    import pandas as pd

    for _, m in errs.iterrows():
        hi = m.event_time + pd.Timedelta(seconds=3600)
        hits = b[(b.event_time > m.event_time) & (b.event_time <= hi)]
        expected.update((e, m.event_id) for e in hits.event_id)
    got = set(zip(out.e_id, out.m_id))
    assert len(out) == len(got)  # bin trick must not duplicate pairs
    assert got == expected


def test_dedup_survives_restart_from_checkpoint(spark, tmp_path_factory):
    """Exactly-once across a RESTART: the checkpoint restores source
    offsets and dedup state, so a second query run sees only the new
    file and still drops ids first seen before the restart."""
    import pyarrow.parquet as pq

    from opencosmo_spark.streaming import dedup_stream, run_stream_to_parquet

    src = tmp_path_factory.mktemp("events_restart_src")
    out = str(tmp_path_factory.mktemp("events_restart_out"))
    ckpt = str(tmp_path_factory.mktemp("events_restart_ckpt"))
    t = pq.read_table(EVENTS)
    half = t.num_rows // 2

    # run 1: only part-0 exists
    pq.write_table(t.slice(0, half), src / "part-0.parquet")
    stream = dedup_stream(read_event_stream(spark, str(src)), ["event_id"])
    run_stream_to_parquet(stream, out, ckpt)
    n1 = len(spark.read.parquet(out).collect())
    assert n1 == half

    # run 2: part-1 overlaps part-0's tail; a FRESH query resumes from
    # the checkpoint (new lineage, same state store)
    pq.write_table(t.slice(half // 2, half), src / "part-1.parquet")
    stream2 = dedup_stream(read_event_stream(spark, str(src)), ["event_id"])
    run_stream_to_parquet(stream2, out, ckpt)

    final = spark.read.parquet(out).toPandas()
    # part-0 not re-emitted; overlap ids dropped by restored state
    assert len(final) == half + half // 2
    assert final.event_id.is_unique
    expected = set(
        r.event_id
        for r in spark.read.parquet(str(src)).dropDuplicates(["event_id"]).collect()
    )
    assert set(final.event_id) == expected


def test_pipeline_scrub_runs_on_stream(spark, tmp_path):
    """The corpus-hygiene operators are stateless projections, so the
    SAME expressions run unchanged on a readStream — prove it: stream
    the documents fixture through scrub_pii + add_text_features and
    match the batch twin row-for-row."""
    import pyarrow.parquet as pq

    from opencosmo_spark.pipeline import scrub_pii
    from opencosmo_spark.pipeline.text import add_text_features

    src = "/root/testdata/sf0.001/documents.parquet"
    d = tmp_path / "docs_stream"
    d.mkdir()
    t = pq.read_table(src)
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), d / "part-0.parquet")
    pq.write_table(t.slice(half), d / "part-1.parquet")

    batch_df = spark.read.parquet(src)

    def xform(df):
        return add_text_features(scrub_pii(df)).select(
            "doc_id", "n_email", "n_ip", "text", "n_tokens", "quality"
        )

    stream = spark.readStream.schema(batch_df.schema).parquet(str(d))
    q = (
        xform(stream)
        .writeStream.format("memory")
        .queryName("scrub_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = (
        spark.table("scrub_out").toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = xform(batch_df).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(want) > 0
    for c in out.columns:
        assert (out[c].astype(str) == want[c].astype(str)).all(), c


def test_corpus_dedup_stream_matches_batch_incremental(spark, tmp_path):
    """Streaming ingest dedup (stream-static anti-join + within-stream
    dedup) must keep exactly the docs the batch incremental exact
    stage keeps, even when the duplicate of a batch-1 doc arrives in
    batch 2."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opencosmo_spark.streaming import corpus_dedup_stream

    existing = spark.createDataFrame(
        [(1, "already curated text"), (2, "another existing doc")],
        ["doc_id", "text"],
    )
    batch1 = pa.table(
        {"doc_id": [100, 101], "text": ["already curated text", "brand new doc"]}
    )
    # 102 duplicates 101 across the micro-batch boundary
    batch2 = pa.table(
        {"doc_id": [102, 103], "text": ["brand new doc", "second new doc"]}
    )
    d = tmp_path / "docs_inc"
    d.mkdir()
    pq.write_table(batch1, d / "part-0.parquet")
    pq.write_table(batch2, d / "part-1.parquet")

    stream = spark.readStream.schema("doc_id LONG, text STRING").parquet(str(d))
    q = (
        corpus_dedup_stream(stream, existing)
        .writeStream.format("memory")
        .queryName("corpus_dedup_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r.doc_id for r in spark.table("corpus_dedup_out").collect())
    # 100 dies (exists in corpus), 102 dies (cross-batch stream dup)
    assert got == [101, 103]


def test_drift_monitor_stream_matches_batch_psi(spark, tmp_path):
    """Per-micro-batch PSI from the streaming monitor must equal
    psi_report(ref, that_batch) computed in batch — and the drifted
    batch must score far above the in-distribution one."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opencosmo_spark.pipeline.drift import psi_report
    from opencosmo_spark.streaming.events import drift_monitor_stream

    rng = __import__("numpy").random.default_rng(5)
    ref_vals = rng.normal(0, 1, 4000)
    same_vals = rng.normal(0, 1, 1000)
    drifted_vals = rng.normal(3, 1, 1000)  # mean-shifted

    ref = spark.createDataFrame(
        [(float(v), "a" if v < 0 else "b") for v in ref_vals],
        ["x", "cat"],
    )
    b1 = pa.table({"x": same_vals, "cat": ["a" if v < 0 else "b" for v in same_vals]})
    b2 = pa.table({"x": drifted_vals, "cat": ["a" if v < 0 else "b" for v in drifted_vals]})
    d = tmp_path / "drift_in"
    d.mkdir()
    pq.write_table(b1, d / "part-0.parquet")
    pq.write_table(b2, d / "part-1.parquet")
    # the file source orders batches by modification time; the two
    # writes can land in the same clock tick, flipping batch order
    # nondeterministically — pin it
    import os
    import time as _time

    now = _time.time()
    os.utime(d / "part-0.parquet", (now - 60, now - 60))
    os.utime(d / "part-1.parquet", (now, now))

    stream = (
        spark.readStream.schema("x DOUBLE, cat STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    seen = []
    start, reports = drift_monitor_stream(
        stream,
        ref,
        numeric_cols=["x"],
        categorical_cols=["cat"],
        on_report=lambda bid, rep: seen.append(bid),
    )
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert [r["batch_id"] for r in reports] == [0, 1] == seen
    # batch twin: same numbers
    for rep, tbl in zip(reports, (b1, b2)):
        batch_df = spark.createDataFrame(tbl.to_pandas())
        want = psi_report(
            ref, batch_df, numeric_cols=["x"], categorical_cols=["cat"]
        )
        assert rep["x"] == pytest.approx(want["x"], rel=1e-9)
        assert rep["cat"] == pytest.approx(want["cat"], rel=1e-9)
    # drifted batch stands out
    assert reports[0]["x"] < 0.1 < 1.0 < reports[1]["x"]


def test_samplers_run_on_streams(spark, tmp_path):
    """deterministic_sample / stratified_sample compile to stateless
    pushable filters, so the SAME calls run unchanged on a readStream
    — and keep exactly the rows the batch form keeps."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opencosmo_spark.pipeline.sample import (
        deterministic_sample,
        stratified_sample,
    )

    rows = pa.table(
        {
            "doc_id": list(range(200)),
            "lang": [("en", "de", "fr")[i % 3] for i in range(200)],
        }
    )
    d = tmp_path / "sample_in"
    d.mkdir()
    pq.write_table(rows, d / "part-0.parquet")

    batch_df = spark.read.parquet(str(d))
    stream = spark.readStream.schema("doc_id LONG, lang STRING").parquet(str(d))

    for name, fn in (
        ("det", lambda df: deterministic_sample(df, 0.4, id_col="doc_id")),
        (
            "strat",
            lambda df: stratified_sample(
                df, {"en": 0.5, "de": 0.2}, "lang", id_col="doc_id"
            ),
        ),
    ):
        want = sorted(r.doc_id for r in fn(batch_df).collect())
        q = (
            fn(stream)
            .writeStream.format("memory")
            .queryName(f"sampled_{name}")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            r.doc_id for r in spark.table(f"sampled_{name}").collect()
        )
        assert got == want and len(got) > 0


def test_frequent_items_stream_exact_and_sketch(spark, tmp_path):
    """Streaming SpaceSaving twin: with unbinding capacity the
    state-store counters equal the exact batch groupBy; with tight
    capacity the planted heavy hitter still wins and the emitted
    bounds bracket the true counts. Statefulness is real — the
    summaries accumulate across micro-batches."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from opencosmo_spark.streaming import (
        frequent_items_stream,
        run_stream_to_memory,
        streaming_top_items,
    )

    rng = np.random.default_rng(97)
    items = (
        ["hot_item"] * 500
        + ["warm_item"] * 120
        + [f"tail_{i}" for i in rng.integers(0, 400, size=800)]
    )
    rng.shuffle(items)
    d = tmp_path / "items_stream"
    d.mkdir()
    third = len(items) // 3
    for b in range(3):
        chunk = items[b * third : (b + 1) * third if b < 2 else len(items)]
        pd.DataFrame({"item": chunk}).to_parquet(d / f"part-{b}.parquet")
    truth = pd.Series(items).value_counts()

    schema = T.StructType([T.StructField("item", T.StringType())])
    # exact mode: capacity above the distinct-item count -> counters
    # ARE the true counts
    stream = spark.readStream.schema(schema).parquet(str(d))
    sk = frequent_items_stream(stream, "item", capacity=2000, n_lanes=4)
    sink = run_stream_to_memory(sk, "fi_exact", mode="update")
    top = streaming_top_items(sink, k=5).toPandas()
    assert list(top["item"][:2]) == ["hot_item", "warm_item"]
    for r in top.itertuples():
        assert r.count_lower == r.count_upper == truth[r.item]
    # every tracked counter (not just top-k) is exact
    latest = streaming_top_items(sink, k=10_000_000).toPandas()
    got = dict(zip(latest["item"], latest["count_upper"]))
    assert got == truth.to_dict()

    # sketch mode: tight capacity (8 per lane), bounds bracket truth,
    # heavy hitter survives eviction pressure
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force 3 micro-batches
        .parquet(str(d))
    )
    sk2 = frequent_items_stream(stream2, "item", capacity=8, n_lanes=4)
    sink2 = run_stream_to_memory(sk2, "fi_sketch", mode="update")
    # statefulness: at least one lane updated across >1 micro-batch
    assert sink2.agg(F.max("seq")).first()[0] > 1
    top2 = streaming_top_items(sink2, k=1).toPandas()
    assert top2.loc[0, "item"] == "hot_item"
    tracked = streaming_top_items(sink2, k=10_000_000).toPandas()
    for r in tracked.itertuples():
        true = int(truth.get(r.item, 0))
        assert r.count_lower <= true <= r.count_upper
    # state bound: no lane tracks more than capacity items
    from pyspark.sql import Window

    latest_rows = sink2.withColumn(
        "__mx", F.max("seq").over(Window.partitionBy("lane"))
    ).filter(F.col("seq") == F.col("__mx"))
    per_lane = latest_rows.groupBy("lane").count().toPandas()
    assert (per_lane["count"] <= 8).all()

    with pytest.raises(ValueError, match="positive"):
        frequent_items_stream(stream, "item", capacity=0)


def test_corpus_profile_stream_merges_to_batch_card(spark, tmp_path):
    """Streaming-built profile artifact: one profile row per
    micro-batch; merging the table gives EXACTLY the card that batch
    corpus_profile over everything gives (HLL merge law), and a
    restart with the same checkpoint neither re-reads files nor
    duplicates profile rows (dynamic-partition idempotency)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opencosmo_spark.pipeline.report import (
        corpus_profile,
        merge_corpus_profiles,
    )
    from opencosmo_spark.streaming import corpus_profile_stream

    rng = __import__("numpy").random.default_rng(13)
    words = ["data", "spark", "table", "row", "scan", "join", "agg"]

    def doc(n):
        return " ".join(rng.choice(words, size=n))

    texts = [doc(int(rng.integers(5, 30))) for _ in range(90)]
    texts[10] = texts[0]  # planted dup across batches
    texts[40] = texts[0]
    d = tmp_path / "docs_prof"
    d.mkdir()
    for b in range(3):
        chunk = texts[b * 30 : (b + 1) * 30]
        pq.write_table(
            pa.table(
                {
                    "doc_id": list(range(b * 30, b * 30 + 30)),
                    "text": chunk,
                }
            ),
            d / f"part-{b}.parquet",
        )
    prof_dir = str(tmp_path / "profile_tbl")
    ckpt = str(tmp_path / "profile_ckpt")
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)  # force 3 micro-batches
        .parquet(str(d))
    )
    corpus_profile_stream(stream, prof_dir, ckpt)

    stored = spark.read.parquet(prof_dir)
    assert stored.select("batch_id").distinct().count() == 3
    assert set(stored.columns) >= {"shard", "docs", "fp_hll", "tok_kll"}

    card = merge_corpus_profiles(stored).toPandas().iloc[0]
    batch_all = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    direct = merge_corpus_profiles(corpus_profile(batch_all)).toPandas().iloc[0]
    for c in [
        "docs",
        "total_tokens",
        "total_bytes",
        "approx_distinct_texts",
        "distinct_ids",
        "tokens_p50",
        "lang_top",
    ]:
        assert card[c] == direct[c], c

    # restart on the same checkpoint with no new files: no new rows
    stream2 = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    corpus_profile_stream(stream2, prof_dir, ckpt)
    assert spark.read.parquet(prof_dir).count() == stored.count()

    # a late 4th file: exactly one more profile row, merge still exact
    pq.write_table(
        pa.table({"doc_id": [900], "text": [doc(12)]}),
        d / "part-3.parquet",
    )
    stream3 = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    corpus_profile_stream(stream3, prof_dir, ckpt)
    grown = spark.read.parquet(prof_dir)
    assert grown.select("batch_id").distinct().count() == 4
    assert (
        merge_corpus_profiles(grown).toPandas().iloc[0]["docs"] == 91
    )


def test_decontaminate_stream_matches_batch(spark, tmp_path):
    """Index-probed streaming decontamination: survivors across all
    micro-batches equal batch decontaminate over the concatenated
    input (contamination planted in BOTH batches), and a checkpoint
    restart adds nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opencosmo_spark.pipeline.decontaminate import (
        decontaminate,
        read_decontamination_index,
        write_decontamination_index,
    )
    from opencosmo_spark.streaming import decontaminate_stream

    rng = __import__("numpy").random.default_rng(77)
    words = ["spark", "table", "scan", "join", "row", "agg", "key"]

    def doc(n):
        return " ".join(rng.choice(words, size=n))

    bench_texts = [doc(20) for _ in range(6)]
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(bench_texts)], ["doc_id", "text"]
    )
    idx_path = str(tmp_path / "bench_idx")
    write_decontamination_index(bench, idx_path, k=5)
    idx, params = read_decontamination_index(spark, idx_path)

    clean1 = [doc(20) for _ in range(15)]
    clean2 = [doc(20) for _ in range(15)]
    batch1 = clean1 + [bench_texts[0], bench_texts[1]]
    batch2 = clean2 + [bench_texts[2]]
    d = tmp_path / "docs_decon"
    d.mkdir()
    for i, texts in enumerate([batch1, batch2]):
        pq.write_table(
            pa.table(
                {
                    "doc_id": list(range(i * 100, i * 100 + len(texts))),
                    "text": texts,
                }
            ),
            d / f"part-{i}.parquet",
        )
    out_dir = str(tmp_path / "clean_out")
    ckpt = str(tmp_path / "decon_ckpt")
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    decontaminate_stream(stream, out_dir, ckpt, idx, params, k=5)

    got = sorted(
        r.doc_id for r in spark.read.parquet(out_dir).collect()
    )
    all_docs = spark.createDataFrame(
        [(i, t) for i, t in zip(range(0, 17), batch1)]
        + [(i, t) for i, t in zip(range(100, 116), batch2)],
        ["doc_id", "text"],
    )
    want = sorted(
        r.doc_id
        for r in decontaminate(
            all_docs, None, 5, eval_index=idx, index_params=params
        ).collect()
    )
    assert got == want
    # the planted contaminated docs (last of each batch) died; random
    # gram collisions may fell some clean docs too — identically on
    # both sides, which is what the equality above pins
    assert not {15, 16, 115} & set(got)

    # restart: nothing new
    stream2 = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    decontaminate_stream(stream2, out_dir, ckpt, idx, params, k=5)
    assert spark.read.parquet(out_dir).count() == len(got)


def test_near_dedup_stream_matches_batch_incremental(spark, tmp_path):
    """Streaming near-dup ingest against the persisted minhash index:
    survivors across all micro-batches equal batch incremental_dedup
    over the concatenated input probing the same base index. Planted:
    exact dups of the corpus, near-dups of the corpus, a cross-batch
    near-dup pair, a within-batch near-dup clique, and fresh docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opencosmo_spark.pipeline.dedup import (
        incremental_dedup,
        read_dedup_index,
        write_dedup_index,
    )
    from opencosmo_spark.streaming import near_dedup_stream

    rng = __import__("numpy").random.default_rng(31)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

    def doc(n=40):
        return " ".join(rng.choice(words, size=n))

    def perturb(t):
        toks = t.split()
        toks[-1] = "PERTURBED"
        return " ".join(toks)

    corpus_texts = [doc() for _ in range(10)]
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], ["doc_id", "text"]
    )
    idx_path = str(tmp_path / "nd_base_idx")
    write_dedup_index(corpus, idx_path, num_hashes=16, shingle_k=3)
    base_idx, params = read_dedup_index(spark, idx_path)

    cluster = doc()  # near-dup clique seed (pairwise-similar copies)
    batch1 = (
        [doc() for _ in range(8)]          # fresh
        + [corpus_texts[0]]                # exact dup of corpus
        + [perturb(corpus_texts[1])]       # near-dup of corpus
        + [cluster, perturb(cluster)]      # within-batch near-dup pair
    )
    batch2 = (
        [doc() for _ in range(8)]          # fresh
        + [corpus_texts[2]]                # exact dup of corpus
        + [cluster + " TAIL"]              # cross-batch near-dup of batch1's survivor
        + [batch1[0]]                      # cross-batch EXACT dup
    )
    d = tmp_path / "nd_docs"
    d.mkdir()
    t0 = time.time()
    for i, texts in enumerate([batch1, batch2]):
        f = d / f"part-{i}.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": list(range(i * 100, i * 100 + len(texts))),
                    "text": texts,
                }
            ),
            f,
        )
        # pin arrival order: FileStreamSource sorts by mtime and
        # back-to-back writes can tie at millisecond granularity,
        # inverting the planted cross-batch dup direction
        os.utime(f, (t0 + i, t0 + i))

    out_dir = str(tmp_path / "nd_out")
    ups_dir = str(tmp_path / "nd_updates")
    ckpt = str(tmp_path / "nd_ckpt")
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    near_dedup_stream(
        stream, out_dir, ckpt, idx_path, ups_dir,
        bands=4, jaccard_threshold=0.5,
    )
    got = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())

    all_docs = spark.createDataFrame(
        [(i, t) for i, t in zip(range(0, len(batch1)), batch1)]
        + [(i, t) for i, t in zip(range(100, 100 + len(batch2)), batch2)],
        ["doc_id", "text"],
    )
    want = sorted(
        r.doc_id
        for r in incremental_dedup(
            None,
            all_docs,
            existing_index=base_idx,
            index_params=params,
            bands=4,
            jaccard_threshold=0.5,
        ).collect()
    )
    assert got == want
    # the planted duplicates died: corpus exacts (8, 108), corpus
    # near-dup (9), clique loser (11), cross-batch near (109) and
    # exact (110)
    assert not {8, 9, 11, 108, 109, 110} & set(got)
    # the clique winner and fresh docs survived
    assert 10 in got

    # restart with the same checkpoint: nothing new lands
    stream2 = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    near_dedup_stream(
        stream2, out_dir, ckpt, idx_path, ups_dir,
        bands=4, jaccard_threshold=0.5,
    )
    assert sorted(
        r.doc_id for r in spark.read.parquet(out_dir).collect()
    ) == got


def test_ann_index_stream_matches_batch_stamping(spark, tmp_path):
    """Streaming ANN ingest: micro-batch increments carry exactly the
    rows batch stamping with the STORED quantizers would produce
    (cells AND PQ codes), the merged index's full-probe search equals
    brute force over base+new, and probe filters prune BOTH scans at
    the partition level."""
    import re

    import numpy as np
    import pyarrow.parquet as pq

    from opencosmo_spark.pipeline import brute_force_cosine_topk
    from opencosmo_spark.pipeline.similarity import (
        ann_index_search_batch,
        assign_ivf_cells,
        pq_encode,
        read_ann_index,
        write_ann_index,
    )
    from opencosmo_spark.streaming import ann_index_stream

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < 40)
    new = emb.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 60))

    idx_path = str(tmp_path / "ann_base")
    write_ann_index(
        base, idx_path, nlist=4, ivf_iters=2, pq_m=4, pq_ksub=8, pq_iters=2
    )

    # two micro-batches of new vectors via the file source
    d = tmp_path / "ann_new"
    d.mkdir()
    pdf = new.toPandas()
    pq.write_table(
        __import__("pyarrow").Table.from_pandas(pdf.iloc[:10]),
        d / "part-0.parquet",
    )
    pq.write_table(
        __import__("pyarrow").Table.from_pandas(pdf.iloc[10:]),
        d / "part-1.parquet",
    )
    ups_dir = str(tmp_path / "ann_updates")
    ckpt = str(tmp_path / "ann_ckpt")
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    ann_index_stream(stream, ups_dir, ckpt, idx_path)

    # 1) artifact equality: increments == batch stamping of the
    # concatenated input under the stored quantizers
    idx = read_ann_index(spark, idx_path)
    want = pq_encode(
        assign_ivf_cells(
            new.select("vec_id", "embedding"),
            idx["codebook"],
            cell_col="ivf_cell",
        ),
        idx["pq_codebooks"],
    )
    got_rows = spark.read.parquet(ups_dir).drop("batch_id")

    def norm(df):
        return sorted(
            (
                int(r["vec_id"]),
                int(r["ivf_cell"]),
                tuple(int(c) for c in r["pq_codes"]),
            )
            for r in df.collect()
        )

    assert norm(got_rows) == norm(want)
    assert spark.read.parquet(ups_dir).select("batch_id").distinct().count() == 2

    # 2) merged search at full probe == brute force over base + new
    # (score='flat': this checks ARTIFACT merging exactly, so force
    # exact cosine over the stored vectors rather than PQ-ADC)
    merged = read_ann_index(spark, idx_path, updates_dir=ups_dir)
    qrow = emb.filter(F.col("vec_id") == 45).toPandas().embedding[0]
    queries = spark.createDataFrame(
        [(0, [float(x) for x in qrow])], "query_id long, embedding array<double>"
    )
    got = (
        ann_index_search_batch(merged, queries, k=6, nprobe=4, score="flat")
        .toPandas()
        .sort_values("rank")
    )
    both = emb.filter(F.col("vec_id") < 60)
    brute = brute_force_cosine_topk(
        both, [float(x) for x in qrow], k=6
    ).toPandas()
    assert list(got.vec_id) == list(brute.vec_id)  # 45 itself wins
    np.testing.assert_allclose(got.cos_sim, brute.cos_sim, atol=1e-6)

    # 3) probe filters prune base AND updates at the directory level
    probed = merged["df"].filter(F.col("ivf_cell").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    hits = re.findall(r"PartitionFilters: \[[^\]]*ivf_cell[^\]]*IN", plan)
    assert len(hits) == 2, f"expected pruning on both scans:\n{plan[:1200]}"

    # 4) restart with the same checkpoint: nothing re-lands, rows stay
    stream2 = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    ann_index_stream(stream2, ups_dir, ckpt, idx_path)
    assert norm(spark.read.parquet(ups_dir).drop("batch_id")) == norm(want)

    # 5) an existing-but-EMPTY updates dir (stream started, no batch
    # committed yet) must behave like a missing one, not raise an
    # unable-to-infer-schema error
    empty = tmp_path / "ann_empty_ups"
    empty.mkdir()
    base_only = read_ann_index(spark, idx_path, updates_dir=str(empty))
    assert base_only["df"].count() == read_ann_index(spark, idx_path)[
        "df"
    ].count()

    # 6) compaction folds the per-batch increments into the base
    # cell layout: search results identical to the merged read, the
    # updates dir is gone, no batch x cell file sprawl remains (one
    # compacted file per touched cell), and a re-run is a no-op
    from opencosmo_spark.pipeline.similarity import compact_ann_index

    # snapshot the merged-read rows BEFORE compaction moves the files
    merged_rows = norm(merged["df"].select("vec_id", "ivf_cell", "pq_codes"))
    n_folded = compact_ann_index(spark, idx_path, ups_dir)
    assert n_folded == new.count()
    import os

    assert not os.path.exists(ups_dir)
    assert not os.path.exists(ups_dir + ".compacting")
    compacted = read_ann_index(spark, idx_path)
    got2 = (
        ann_index_search_batch(compacted, queries, k=6, nprobe=4, score="flat")
        .toPandas()
        .sort_values("rank")
    )
    assert list(got2.vec_id) == list(got.vec_id)
    np.testing.assert_allclose(got2.cos_sim, got.cos_sim, atol=1e-12)
    assert norm(
        compacted["df"].select("vec_id", "ivf_cell", "pq_codes")
    ) == merged_rows
    # file count bounded: each touched cell gained at most ONE
    # compacted file (the increments were one file per batch x cell)
    for cell_dir in os.listdir(idx_path):
        if cell_dir.startswith("ivf_cell="):
            files = [
                f
                for f in os.listdir(os.path.join(idx_path, cell_dir))
                if f.endswith(".parquet")
            ]
            assert len(files) <= 2, (cell_dir, files)
    assert compact_ann_index(spark, idx_path, ups_dir) == 0


def test_ann_compaction_resume_and_claim(spark, tmp_path):
    """compact_ann_index crash-resume and claim hygiene: (a) a resume
    that finds phase 2's marker reports the FULL cycle count from the
    ``_folded.<n>`` marker name even when phase 3 already moved every
    file (pre-fix it under-reported the unmoved remainder); (b) a
    staging dir claimed by another compactor (updates dir already
    renamed away) makes a second caller a 0-row no-op, not a racer;
    (c) a failed phase-3 rename raises instead of falling through to
    the staging delete."""
    import os

    from pyspark.sql import functions as F

    from opencosmo_spark.pipeline.similarity import (
        assign_ivf_cells,
        compact_ann_index,
        pq_encode,
        read_ann_index,
        write_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx_path = str(tmp_path / "ann_base")
    write_ann_index(
        emb.filter(F.col("vec_id") < 40), idx_path,
        nlist=4, ivf_iters=2, pq_m=4, pq_ksub=8, pq_iters=2,
    )
    idx = read_ann_index(spark, idx_path)
    new = emb.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 60))
    stamped = pq_encode(
        assign_ivf_cells(
            new.select("vec_id", "embedding"), idx["codebook"],
            cell_col="ivf_cell",
        ),
        idx["pq_codebooks"],
    ).withColumn("batch_id", F.lit(0))
    ups_dir = str(tmp_path / "ann_updates")
    stamped.write.partitionBy("batch_id", "ivf_cell").parquet(ups_dir)
    n_new = new.count()

    # (b) an in-flight staging claim next to a FRESH updates dir the
    # stream recreated: the call resumes the claimed cycle (folds the
    # staged rows) and leaves the fresh updates dir for the NEXT
    # cycle — it never mixes the two.
    owner_staging = ups_dir + ".compacting"
    os.rename(ups_dir, owner_staging)
    os.makedirs(ups_dir)  # stream recreated a fresh (empty) updates dir
    assert compact_ann_index(spark, idx_path, ups_dir) == n_new
    assert not os.path.exists(owner_staging)
    assert os.path.exists(ups_dir)  # next cycle's dir untouched
    os.rmdir(ups_dir)
    assert read_ann_index(spark, idx_path)["df"].count() == 60

    # (a) crash-resume count: phase 2 committed (marker present) and
    # phase 3 moved EVERYTHING, but the staging delete never ran.
    # The resume must report the marker's full count, not 0.
    os.makedirs(owner_staging)
    open(os.path.join(owner_staging, "_folded.%d" % 1234), "w").close()
    assert compact_ann_index(spark, idx_path, ups_dir) == 1234
    assert not os.path.exists(owner_staging)
    # and with staging fully gone, a fresh call is the no-op path
    assert compact_ann_index(spark, idx_path, ups_dir) == 0

    # (c) a phase-3 rename that cannot succeed (target cell path is a
    # FILE, so the per-file rename into it fails) raises and keeps
    # staging for resume instead of deleting the rows
    emb2 = emb.filter((F.col("vec_id") >= 60) & (F.col("vec_id") < 70))
    stamped2 = pq_encode(
        assign_ivf_cells(
            emb2.select("vec_id", "embedding"), idx["codebook"],
            cell_col="ivf_cell",
        ),
        idx["pq_codebooks"],
    ).withColumn("batch_id", F.lit(0))
    stamped2.write.partitionBy("batch_id", "ivf_cell").parquet(ups_dir)
    cells = [r[0] for r in stamped2.select("ivf_cell").distinct().collect()]
    blocker = os.path.join(idx_path, "ivf_cell=%d" % cells[0])
    import shutil

    shutil.rmtree(blocker)
    open(blocker, "w").close()  # a file where the cell DIR should be
    import pytest as _pytest

    with _pytest.raises(Exception):
        compact_ann_index(spark, idx_path, ups_dir)
    assert os.path.exists(ups_dir + ".compacting")  # kept for resume


def test_block_pack_stream_matches_batch(spark, tmp_path):
    """Streaming concat-and-chunk: blocks across all micro-batches
    equal batch block_pack_ids over the concatenated input — global
    block ids consecutive, token streams identical, spans identical
    after merging the batch-boundary splits; the carried tail
    conserves every token; checkpoint restart re-lands nothing."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opencosmo_spark.pipeline.text import block_pack_ids
    from opencosmo_spark.streaming import block_pack_stream

    rng = np.random.default_rng(83)
    B = 32
    docs = [
        (
            100 + i,
            [int(x) for x in rng.integers(5, 99, size=rng.integers(1, 50))],
        )
        for i in range(24)
    ]
    d = tmp_path / "bp_docs"
    d.mkdir()
    for k in range(3):
        chunk = docs[k * 8 : (k + 1) * 8]
        f = d / f"part-{k}.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": [c[0] for c in chunk],
                    "input_ids": [c[1] for c in chunk],
                }
            ),
            f,
        )
    # FileStreamSource orders by mtime; back-to-back writes can tie at
    # millisecond granularity and legally permute micro-batches. Pin
    # arrival order explicitly — the operator's contract is equality
    # in ARRIVAL order.
    t0 = time.time()
    for k in range(3):
        f = d / f"part-{k}.parquet"
        os.utime(f, (t0 + k, t0 + k))

    out_dir = str(tmp_path / "bp_out")
    tail_dir = str(tmp_path / "bp_tail")
    ckpt = str(tmp_path / "bp_ckpt")
    stream = (
        spark.readStream.schema("doc_id long, input_ids array<long>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    block_pack_stream(
        stream, out_dir, ckpt, tail_dir, block_size=B, eos_id=0
    )

    got = spark.read.parquet(out_dir).orderBy("block_id").collect()
    all_df = spark.createDataFrame(docs, "doc_id long, input_ids array<long>")
    want = (
        block_pack_ids(all_df, B, eos_id=0, drop_last=True)
        .orderBy("block_id")
        .collect()
    )
    assert [r["block_id"] for r in got] == list(range(len(want)))
    assert [list(r["input_ids"]) for r in got] == [
        list(r["input_ids"]) for r in want
    ]

    # spans equal DIRECTLY: the stream merges batch-boundary splits
    for g, w in zip(got, want):
        gm = [(s["doc_id"], s["start"], s["end"]) for s in g["doc_spans"]]
        wm = [(s["doc_id"], s["start"], s["end"]) for s in w["doc_spans"]]
        assert gm == wm, g["block_id"]

    # token conservation: emitted blocks + the final carried tail
    # hold every token of every doc (+1 eos each)
    tails = spark.read.parquet(tail_dir)
    last = tails.agg(F.max("batch_id")).first()[0]
    carry = (
        tails.filter((F.col("batch_id") == last) & (F.col("seq") >= 0))
        .collect()
    )
    total = sum(len(ids) + 1 for _, ids in docs)
    assert len(got) * B + sum(len(r["input_ids"]) for r in carry) == total
    nb = tails.filter(F.col("batch_id") == last).agg(
        F.max("next_block")
    ).first()[0]
    assert nb == len(got)

    # restart with the same checkpoint: nothing new
    stream2 = (
        spark.readStream.schema("doc_id long, input_ids array<long>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    block_pack_stream(
        stream2, out_dir, ckpt, tail_dir, block_size=B, eos_id=0
    )
    again = spark.read.parquet(out_dir).orderBy("block_id").collect()
    assert [list(r["input_ids"]) for r in again] == [
        list(r["input_ids"]) for r in got
    ]


def test_block_pack_stream_shuffle_seed_twin(spark, tmp_path):
    """shuffle_seed orders each micro-batch's arrivals by
    xxhash64(doc_id, seed): the stream equals the batch packer with
    explicit order key (arrival batch, hash) — the documented
    streaming form of the seeded epoch shuffle."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opencosmo_spark.pipeline.text import block_pack_ids
    from opencosmo_spark.streaming import block_pack_stream

    rng = np.random.default_rng(19)
    B, SEED = 16, 5
    docs = [
        (
            i,
            [int(x) for x in rng.integers(5, 99, size=rng.integers(1, 30))],
        )
        for i in range(12)
    ]
    d = tmp_path / "bps_docs"
    d.mkdir()
    t0 = time.time()
    for k in range(2):
        chunk = docs[k * 6 : (k + 1) * 6]
        f = d / f"part-{k}.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": [c[0] for c in chunk],
                    "input_ids": [c[1] for c in chunk],
                }
            ),
            f,
        )
        os.utime(f, (t0 + k, t0 + k))
    out_dir = str(tmp_path / "bps_out")
    stream = (
        spark.readStream.schema("doc_id long, input_ids array<long>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    block_pack_stream(
        stream,
        out_dir,
        str(tmp_path / "bps_ckpt"),
        str(tmp_path / "bps_tail"),
        block_size=B,
        eos_id=0,
        shuffle_seed=SEED,
    )
    got = spark.read.parquet(out_dir).orderBy("block_id").collect()
    all_df = spark.createDataFrame(
        [(i, ids, i // 6) for i, ids in docs],
        "doc_id long, input_ids array<long>, b int",
    ).withColumn(
        "__k",
        F.struct(
            F.col("b"), F.xxhash64(F.col("doc_id"), F.lit(SEED))
        ),
    )
    want = (
        block_pack_ids(all_df, B, eos_id=0, order_col="__k", drop_last=True)
        .orderBy("block_id")
        .collect()
    )
    assert [list(r["input_ids"]) for r in got] == [
        list(r["input_ids"]) for r in want
    ]
    for g, w in zip(got, want):
        gm = [(s["doc_id"], s["start"], s["end"]) for s in g["doc_spans"]]
        wm = [(s["doc_id"], s["start"], s["end"]) for s in w["doc_spans"]]
        assert gm == wm, g["block_id"]


def test_block_pack_stream_numeric_ids_order_natively(spark, tmp_path):
    """Mixed-width numeric ids (2 vs 10) within one micro-batch must
    concatenate in NATIVE order, matching batch block_pack_ids —
    string order would put "10" before "2" and silently break the
    documented bit-identical-to-batch equality."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opencosmo_spark.pipeline.text import block_pack_ids
    from opencosmo_spark.streaming import block_pack_stream

    B = 8
    docs = [
        (2, [21, 22, 23]),
        (10, [31, 32, 33, 34]),
        (100, [41, 42]),
        (3, [51, 52, 53, 54, 55]),
    ]
    d = tmp_path / "bpn_docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": [c[0] for c in docs],
                "input_ids": [c[1] for c in docs],
            }
        ),
        d / "part-0.parquet",
    )
    out_dir = str(tmp_path / "bpn_out")
    stream = (
        spark.readStream.schema("doc_id long, input_ids array<long>")
        .option("maxFilesPerTrigger", 4)
        .parquet(str(d))
    )
    block_pack_stream(
        stream,
        out_dir,
        str(tmp_path / "bpn_ckpt"),
        str(tmp_path / "bpn_tail"),
        block_size=B,
        eos_id=0,
    )
    got = spark.read.parquet(out_dir).orderBy("block_id").collect()
    all_df = spark.createDataFrame(docs, "doc_id long, input_ids array<long>")
    want = (
        block_pack_ids(all_df, B, eos_id=0, drop_last=True)
        .orderBy("block_id")
        .collect()
    )
    assert [list(r["input_ids"]) for r in got] == [
        list(r["input_ids"]) for r in want
    ]
    for g, w in zip(got, want):
        gm = [(s["doc_id"], s["start"], s["end"]) for s in g["doc_spans"]]
        wm = [(s["doc_id"], s["start"], s["end"]) for s in w["doc_spans"]]
        assert gm == wm, g["block_id"]


def test_image_decode_composes_with_streaming(spark, tmp_path):
    """decode_image_features is a stateless mapInPandas, so it
    composes with Structured Streaming unchanged: decoding a file
    stream of image payloads yields exactly the batch decode of the
    same rows — the multimodal ingest path needs no streaming twin."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opencosmo_spark.pipeline.multimodal import decode_image_features

    # two micro-batches of tiny PGMs (P5) + one undecodable payload
    def pgm(v, w=4, h=4):
        return b"P5\n%d %d\n255\n" % (w, h) + bytes([v] * (w * h))

    rows = [
        (1, pgm(10)),
        (2, pgm(200)),
        (3, b"not an image"),
        (4, pgm(77, 3, 5)),
    ]
    d = tmp_path / "img_stream"
    d.mkdir()
    t0 = time.time()
    for i in range(2):
        chunk = rows[i * 2 : (i + 1) * 2]
        f = d / f"part-{i}.parquet"
        pq.write_table(
            pa.table(
                {
                    "media_id": [r[0] for r in chunk],
                    "payload": [r[1] for r in chunk],
                }
            ),
            f,
        )
        os.utime(f, (t0 + i, t0 + i))

    schema = "media_id long, payload binary"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        decode_image_features(stream, feature_dim=8)
        .writeStream.format("memory")
        .queryName("img_decode_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["media_id"]: (list(r["features"]), r["decoder"])
        for r in spark.table("img_decode_out").collect()
    }
    want = {
        r["media_id"]: (list(r["features"]), r["decoder"])
        for r in decode_image_features(
            spark.read.parquet(str(d)), feature_dim=8
        ).collect()
    }
    assert got == want
    assert got[1][1] == "pnm" and got[3][1] == "stub-sha256"
