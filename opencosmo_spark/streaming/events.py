"""Streaming operators over event tables.

Design: identical logical transformations to the batch operators
(bench q28 tumbling window, q37 sessionize) expressed on an unbounded
source — Catalyst plans incremental execution; watermarks bound state.
At scale the source would be Kafka; locally the parquet directory
source provides exactly-once file streaming for tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# Fallback schema when the directory can't be probed. The fixture has
# shipped ``ts`` two ways across rounds (INT64 nanos read as long under
# ``nanosAsLong``; ``timestamp[us]`` read as TIMESTAMP_NTZ) — the
# actual stream schema is inferred from the files, never hardcoded.
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def event_time_expr(ts_type: T.DataType):
    """Event-time column for either ``ts`` representation.

    * timestamp / timestamp_ntz — identity relabel (session TZ is UTC);
    * long epoch-nanos — integer ns->us via ``div``: `/` on longs goes
      through double (ulp 256ns at epoch-nanos magnitude),
      mis-assigning boundary events; ``div`` stays in long arithmetic.
    """
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        return F.col("ts").cast("timestamp")
    return F.timestamp_micros(F.expr("ts div 1000"))


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based event stream with a proper event-time column.

    The schema (in particular the ``ts`` physical type) is probed from
    the files already in the directory with a batch read — streaming
    sources require an explicit schema, and hardcoding one broke when
    the fixture's ``ts`` dtype changed between rounds.
    """
    import os

    if os.path.isfile(path):
        raise ValueError(
            "the streaming file source needs a DIRECTORY of parquet "
            "files (new files appended = new micro-batches); got a "
            f"single file: {path}"
        )
    try:
        schema = spark.read.parquet(path).schema
    except Exception:  # noqa: BLE001 — empty dir: fall back to default
        schema = EVENT_SCHEMA
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    return raw.withColumn("event_time", event_time_expr(schema["ts"].dataType))


def windowed_aggregate(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts + sums per type."""
    w = (
        F.window("event_time", window, slide)
        if slide
        else F.window("event_time", window)
    )
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(w, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows per user via the native session_window operator
    (the streaming twin of the batch lag/cumsum sessionizer)."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def running_user_stats(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum, max)
    maintained across micro-batches via ``applyInPandasWithState`` —
    the escape hatch for stateful logic the built-in windowed/session
    aggregates can't express (here: emit an updated running row per
    user per batch, monotone across restarts from the state store).

    State is one (count, sum, vmax) triple per user — O(users), not
    O(events); the shuffle partitions by user_id exactly like the
    batch q27/q37 twins.
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
            T.StructField("max_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
            T.StructField("m", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += int(len(pdf))
            s += float(pdf["value"].sum())
            if len(pdf):
                m = max(m, float(pdf["value"].max()))
        state.update((n, s, m))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "max_value": [m],
            }
        )

    return (
        events.withWatermark("event_time", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first arrival of each key wins, duplicates
    arriving within the watermark horizon are dropped.

    ``dropDuplicatesWithinWatermark`` keeps state only until the
    watermark passes a key's first-seen event time, so state is
    O(keys per watermark window) — bounded, unlike a plain streaming
    ``dropDuplicates`` whose state grows forever. This is the streaming
    twin of ``pipeline.dedup.exact_dedup`` (same keys, same survivors
    when each duplicate group arrives within one watermark span).
    """
    keys = key_cols or ["event_id"]
    return events.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        keys
    )


def interval_join_stream(
    events: DataFrame,
    markers: DataFrame,
    window_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream join: each event pairs with every marker row (a
    filtered second stream, e.g. errors) whose event time falls in the
    preceding ``window_seconds`` — the streaming twin of the batch
    point-in-interval join (q46).

    Same trick as ``joins.point_in_interval_join``: a raw time-range
    condition between two streams gives Spark no equi-key to
    co-partition the state store on, so both sides are stamped with
    coarse time-bin keys — the marker with its own bin AND the
    successor bin (an event in ``(t, t + W]`` lands in one of exactly
    those two W-wide bins) — and the join becomes an EQUI-join on bin
    plus the exact range predicate. State per side is bounded by the
    watermark horizon, partitioned by bin instead of replicated.
    """
    w = f"{window_seconds} seconds"
    e = (
        events.withWatermark("event_time", watermark)
        .select(
            F.col("event_id").alias("e_id"),
            F.col("event_time").alias("e_time"),
            F.window("event_time", w).start.alias("bin"),
        )
    )
    bin0 = F.window("event_time", w).start
    m = markers.withWatermark("event_time", watermark).select(
        F.col("event_id").alias("m_id"),
        F.col("event_time").alias("m_time"),
        F.explode(
            F.array(
                bin0, bin0 + F.expr(f"INTERVAL {window_seconds} SECONDS")
            )
        ).alias("bin"),
    )
    cond = (
        (F.col("e_time") > F.col("m_time"))
        & (
            F.col("e_time")
            <= F.col("m_time") + F.expr(f"INTERVAL {window_seconds} SECONDS")
        )
    )
    return e.join(m, on=[e["bin"] == m["bin"], cond], how="inner").select(
        "e_id", "m_id", "e_time", "m_time"
    )


def run_stream_to_memory(
    stream_df: DataFrame, name: str, mode: str = "append"
) -> DataFrame:
    """Drive a streaming query to completion against the current file
    set (test/smoke harness): memory sink + processAllAvailable."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def run_stream_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drive a streaming query against the current file set into a
    parquet sink with a durable checkpoint, then stop.

    The checkpoint carries source offsets, the watermark, AND stateful
    operator state (dedup keys, window partials) — a later call with
    the SAME checkpoint resumes exactly where this one stopped:
    already-read files are not re-read, already-emitted rows are not
    re-emitted, and state-dependent decisions (e.g. duplicate drops)
    hold across the restart. This is Spark's exactly-once contract;
    the restart test exercises it."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def corpus_dedup_stream(
    docs: DataFrame,
    existing: DataFrame,
    *,
    text_col: str = "text",
    normalize: bool = True,
    ingest_time_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming corpus-ingest dedup: drop incoming documents whose
    normalized-text fingerprint already exists in a curated static
    corpus (stream-static LEFT ANTI join — Spark re-plans the static
    side per micro-batch, so pass the FINGERPRINT projection, not the
    full corpus, and persist it upstream when the corpus is large),
    then drop within-stream duplicates.

    The streaming twin of the exact stage of
    ``pipeline.dedup.incremental_dedup``, for the ingestion topology
    where batches arrive as files/Kafka rather than DataFrames.

    Within-stream state: with ``ingest_time_col`` set, duplicates are
    dropped via ``dropDuplicatesWithinWatermark`` — state is bounded
    by the watermark horizon, the only form that survives an unbounded
    run. Without an ingest-time column the fallback is a plain
    streaming ``dropDuplicates`` whose state grows with distinct
    fingerprints — acceptable for bounded backfills only.
    """
    t = F.col(text_col)
    if normalize:
        t = F.lower(F.regexp_replace(F.trim(t), r"\s+", " "))
    fp = F.md5(t)
    stream = docs.withColumn("__fp", fp)
    static_fp = existing.select(fp.alias("__fp")).distinct()
    fresh = stream.join(static_fp, "__fp", "left_anti")
    if ingest_time_col is not None:
        fresh = fresh.withWatermark(
            ingest_time_col, watermark
        ).dropDuplicatesWithinWatermark(["__fp"])
    else:
        fresh = fresh.dropDuplicates(["__fp"])
    return fresh.drop("__fp")


def corpus_profile_stream(
    docs: DataFrame,
    profile_dir: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    id_col: str | None = "doc_id",
    with_language: bool = True,
    lgk: int = 14,
    kll_k: int = 200,
    drive: bool = True,
):
    """Streaming twin of the ``corpus_profile`` artifact: every
    micro-batch of arriving documents is profiled (exact sums + HLL /
    KLL sketch state) and lands as rows in the append-only profile
    table at ``profile_dir`` — the dataset card is then
    ``merge_corpus_profiles`` over that table at ANY moment of the
    ingest, and the sketch merge laws make the streaming-built card
    IDENTICAL to batch-profiling everything seen so far.

    Each batch's rows are stamped ``batch_id`` and written with
    dynamic partition overwrite on that column: a batch re-run after
    failure recovery REPLACES its own partition instead of appending a
    duplicate profile row — foreachBatch's at-least-once delivery
    composes to exactly-once at the artifact level. The shard label is
    ``batch-<id>``; state per batch is the profile row itself (KB) —
    nothing streaming-stateful lives in the checkpoint beyond source
    offsets, so the operator scales with batch size, not stream
    length.

    ``drive=True`` (the test/backfill harness form) processes all
    currently-available input and stops, mirroring
    ``run_stream_to_parquet``; ``drive=False`` returns the running
    ``StreamingQuery`` for continuous ingestion.
    """
    from ..pipeline.report import corpus_profile

    def handle(batch_df, batch_id):
        prof = corpus_profile(
            batch_df,
            text_col=text_col,
            id_col=id_col,
            with_language=with_language,
            lgk=lgk,
            kll_k=kll_k,
        )
        out = prof.withColumn(
            "shard", F.concat(F.lit("batch-"), F.lit(str(batch_id)))
        ).withColumn("batch_id", F.lit(int(batch_id)))
        (
            out.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(profile_dir)
        )

    q = (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    if not drive:
        return q
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return None


def decontaminate_stream(
    docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    eval_index: DataFrame,
    index_params: dict | None = None,
    *,
    k: int = 8,
    max_frac: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    drive: bool = True,
):
    """Streaming twin of index-probed ``decontaminate``: each arriving
    micro-batch is checked against a PERSISTED benchmark gram index
    (``write_decontamination_index``) and its surviving documents land
    in ``out_dir`` partitioned by ``batch_id`` with dynamic partition
    overwrite — the same at-least-once-to-exactly-once composition as
    ``corpus_profile_stream``, and the batch_id partitioning doubles
    as natural ingest sharding.

    Decontamination is per-document (no cross-batch state), so the
    streaming form is exactly the batch operator applied per batch:
    results are IDENTICAL to batch-decontaminating the concatenated
    input, which the test asserts. State in the checkpoint is source
    offsets only; the index is a static side re-planned per batch —
    pass the slim hash table, and at benchmark scale (1e5-1e6 8-byte
    hashes) the join broadcasts.
    """
    from ..pipeline.decontaminate import decontaminate

    def handle(batch_df, batch_id):
        clean = decontaminate(
            batch_df,
            None,
            k,
            max_frac,
            text_col,
            id_col,
            eval_index=eval_index,
            index_params=index_params,
        )
        (
            clean.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    q = (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    if not drive:
        return q
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return None


def near_dedup_stream(
    docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    index_path: str,
    updates_dir: str,
    *,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    text_col: str = "text",
    drive: bool = True,
):
    """Streaming NEAR-duplicate ingest dedup against a persisted
    MinHash index — the live-crawl twin of
    ``incremental_dedup(existing_index=...)``. Each micro-batch:

    1. probes the base ``write_dedup_index`` artifact UNION the
       accumulated per-batch survivor signatures in ``updates_dir``
       (band-bucket join on stored signatures — corpus text is never
       re-read), dropping exact and near duplicates of everything
       already kept;
    2. collapses within-batch near-dup clusters (the batch operator's
       connected-components stage, batch-sized);
    3. lands survivors in ``out_dir`` AND their (id, fp, shingles,
       sig) index rows in ``updates_dir``, both partitioned by
       ``batch_id`` with dynamic partition overwrite — a recovered
       batch re-run REPLACES its own partitions, composing
       foreachBatch's at-least-once into exactly-once at the artifact
       level.

    Cross-batch state lives in the PERSISTED index increments, not
    the streaming state store: it is bounded by survivor count (not
    stream length), survives restarts by construction, doubles as the
    next batch job's ``existing_index``, and needs no watermark — a
    duplicate arriving a month late still probes the same artifact.
    When reading ``updates_dir`` the CURRENT batch_id partition is
    excluded, so a crash-recovery re-run never sees its own partial
    output and drops the whole batch as self-duplicates.

    Shingle/hash/normalization parameters come from the index sidecar
    (probing with different parameters silently misses every
    duplicate — the batch operator's loud-mismatch guard applies);
    ``bands``/``jaccard_threshold`` are per-run knobs.

    ``drive=True`` processes all currently-available input and stops
    (test/backfill harness); ``drive=False`` returns the running
    ``StreamingQuery``.
    """
    from ..pipeline.dedup import (
        dedup_index_rows,
        incremental_dedup,
        read_dedup_index,
    )

    spark = docs.sparkSession

    def handle(batch_df, batch_id):
        from ..io.ingest import hadoop_fs

        base, params = read_dedup_index(spark, index_path)
        id_col = params.get("id_col", "doc_id")
        _jvm, fs, jpath = hadoop_fs(spark, updates_dir)
        if fs.exists(jpath):
            ups = (
                spark.read.parquet(updates_dir)
                .filter(F.col("batch_id") != int(batch_id))
                .drop("batch_id")
            )
            index = base.unionByName(ups)
        else:  # first batch: no survivor increments yet
            index = base
        survivors = incremental_dedup(
            None,
            batch_df,
            text_col=text_col,
            id_col=id_col,
            normalize=params.get("normalize", True),
            near_dup=True,
            num_hashes=params.get("num_hashes", 16),
            bands=bands,
            shingle_k=params.get("shingle_k", 3),
            jaccard_threshold=jaccard_threshold,
            hasher=params.get("hasher", "xxhash64"),
            existing_index=index,
            index_params=params,
        )
        from pyspark import StorageLevel

        survivors = survivors.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            (
                survivors.withColumn("batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(out_dir)
            )
            rows = dedup_index_rows(
                survivors,
                text_col=text_col,
                id_col=id_col,
                num_hashes=params.get("num_hashes", 16),
                shingle_k=params.get("shingle_k", 3),
                hasher=params.get("hasher", "xxhash64"),
                normalize=params.get("normalize", True),
            )
            (
                rows.withColumn("batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(updates_dir)
            )
        finally:
            survivors.unpersist()

    q = (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    if not drive:
        return q
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return None


def ann_index_stream(
    vectors: DataFrame,
    updates_dir: str,
    checkpoint_dir: str,
    index_path: str,
    *,
    drive: bool = True,
):
    """Streaming ingest into a persisted ANN index — the live twin of
    ``similarity.append_to_ann_index``. Each arriving micro-batch of
    ``(id, vector)`` rows is stamped with the index's OWN quantizers
    (cell assignment, and PQ codes when the index carries codebooks —
    NEVER retrained: a new codebook would orphan the files already
    clustered) and lands in ``updates_dir`` partitioned by
    ``(batch_id, ivf_cell)`` with dynamic partition overwrite, so a
    crash-recovery re-run REPLACES its own partitions — the same
    at-least-once-to-exactly-once composition as the profile / dedup
    streams, chosen over ``mode("append")`` into the base index
    precisely because a retried append would duplicate vectors.

    ``ivf_cell`` stays a partition column in the increments, so
    ``read_ann_index(path, updates_dir=...)`` serves queries over
    base + live rows with directory-level pruning on BOTH scans, and
    cross-batch state is zero: the quantizer is static (read once at
    wiring — the never-retrain posture made explicit) and each batch
    is independent. Rebuild with ``write_ann_index`` when drift
    degrades cell balance, exactly as for batch appends.

    A long-running ingest accumulates one file per (batch, cell);
    fold them into the base cell layout with
    ``similarity.compact_ann_index(spark, index_path, updates_dir)``
    at stream quiesce points (crash-safe exactly-once; see its
    docstring).
    """
    from ..pipeline.similarity import (
        assign_ivf_cells,
        pq_encode,
        read_ann_index,
    )

    spark = vectors.sparkSession
    idx = read_ann_index(spark, index_path)
    params = idx["params"]
    id_col, vec_col = params["id_col"], params["vec_col"]

    def handle(batch_df, batch_id):
        stamped = assign_ivf_cells(
            batch_df.select(id_col, vec_col),
            idx["codebook"],
            vec_col=vec_col,
            cell_col="ivf_cell",
        )
        if idx.get("pq_codebooks"):
            from ..pipeline.similarity import _pq_encode_indexed

            stamped = _pq_encode_indexed(
                stamped,
                idx["codebook"],
                idx["pq_codebooks"],
                vec_col,
                residual=bool(params.get("pq_residual")),
            )
        (
            stamped.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "ivf_cell")
            .parquet(updates_dir)
        )

    q = (
        vectors.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    if not drive:
        return q
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return None


def block_pack_stream(
    docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    tail_dir: str,
    *,
    block_size: int = 2048,
    ids_col: str = "input_ids",
    id_col: str = "doc_id",
    eos_id: int | None = None,
    shuffle_seed: int | None = None,
    drive: bool = True,
):
    """Streaming PRETRAINING ingestion — the live twin of
    ``text.block_pack_ids``: tokenized documents arrive in
    micro-batches and leave as fixed ``block_size`` blocks with
    globally consecutive ``block_id`` and exact ``doc_spans``
    provenance, as if the whole stream had been concatenated and
    chunked in one pass.

    Cross-batch state is the carried TAIL (the ragged remainder of
    the concatenated stream, always < block_size tokens) plus the
    next block number — persisted per batch in ``tail_dir`` as
    (seq, doc, ids) piece rows so provenance survives the batch
    boundary, NOT held in the state store. Both the full blocks
    (``out_dir``) and the tail land under ``batch_id`` dynamic
    partition overwrite; a crash-recovery re-run reads only tails
    with ``batch_id < current`` (never its own partial write) and
    REPLACES its own partitions — the same exactly-once composition
    as the dedup/profile/ANN streams, and the reason the tail is an
    artifact: re-running batch k against tail k-1 is deterministic,
    while state-store carry would double-apply.

    Within a micro-batch, documents concatenate in NATIVE order of
    ``id_col`` — numeric ids order numerically, exactly as the batch
    packer's default does (string ids order lexically; carried tail
    pieces always come first). ``shuffle_seed`` instead orders the
    ARRIVING documents of each micro-batch by
    ``xxhash64(doc_id, seed)`` — the streaming form of the batch
    packer's seeded epoch shuffle. A stream can only permute within
    what has arrived: the result equals the batch packer with order
    key (arrival batch, hash, id), not a whole-corpus shuffle — the
    twin test pins exactly that form. ``eos_id`` appends the separator
    to each ARRIVING document only — carried tail tokens already
    contain theirs. A document may span batches; its pieces re-enter
    as separate tail rows, and the emitted blocks MERGE the resulting
    adjacent same-doc spans back together, so the output is
    bit-identical to the batch packer's — spans included (the test
    pins direct equality).
    """
    from ..io.ingest import hadoop_fs
    from ..pipeline.text import block_pack_ids

    spark = docs.sparkSession
    B = int(block_size)
    elem_t = docs.schema[ids_col].dataType.elementType
    id_t = docs.schema[id_col].dataType

    # Order key must sort like the BATCH packer's native id order:
    # casting numeric ids to string breaks it for mixed widths
    # ("10" < "2"), so numeric ids keep their own type and the tail
    # seq is cast INTO that type; string ids keep lexical order with
    # the zero-padded seq.
    id_is_numeric = isinstance(
        id_t,
        (
            T.ByteType,
            T.ShortType,
            T.IntegerType,
            T.LongType,
            T.FloatType,
            T.DoubleType,
            T.DecimalType,
        ),
    )

    def ord_struct(p: int, k) -> F.Column:
        if shuffle_seed is not None:
            key = k.cast("long")  # xxhash64 keys; tail seq casts in
        elif id_is_numeric:
            key = k.cast(id_t)
        else:
            key = k.cast("string")
        return F.struct(F.lit(int(p)).alias("p"), key.alias("k"))

    def handle(batch_df, batch_id):
        bid = int(batch_id)
        base_block = 0
        tail_rows = None
        _jvm, fs, jpath = hadoop_fs(spark, tail_dir)
        if fs.exists(jpath):
            prior = spark.read.parquet(tail_dir).filter(
                F.col("batch_id") < bid
            )
            last = prior.agg(F.max("batch_id")).first()[0]
            if last is not None:
                t = prior.filter(F.col("batch_id") == last)
                base_block = int(t.agg(F.max("next_block")).first()[0])
                tail_rows = t.filter(F.col("seq") >= 0).select(
                    ord_struct(0, F.format_string("%020d", "seq")).alias(
                        "__ord"
                    ),
                    F.col(id_col),
                    F.col(ids_col),
                )
        inc_ids = F.col(ids_col)
        if eos_id is not None:
            inc_ids = F.concat(
                inc_ids, F.array(F.lit(int(eos_id)).cast(elem_t))
            )
        inc_key = (
            F.xxhash64(F.col(id_col), F.lit(int(shuffle_seed)))
            if shuffle_seed is not None
            else F.col(id_col)
        )
        inc = batch_df.select(
            ord_struct(1, inc_key).alias("__ord"),
            F.col(id_col),
            inc_ids.alias(ids_col),
        )
        allrows = (
            tail_rows.unionByName(inc) if tail_rows is not None else inc
        )
        from pyspark import StorageLevel

        blocks = block_pack_ids(
            allrows, B, ids_col=ids_col, id_col=id_col,
            drop_last=False, order_col="__ord",
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # a doc that spanned a batch boundary re-entered as tail
            # pieces — merge its adjacent spans back so the artifact
            # equals the batch packer's spans exactly
            span_t = blocks.schema["doc_spans"].dataType

            def merge_spans(spans):
                def last(acc):
                    return F.element_at(acc, -1)

                return F.aggregate(
                    spans,
                    F.array().cast(span_t),
                    lambda acc, sp: F.when(
                        (F.size(acc) > 0)
                        & (last(acc)[id_col] == sp[id_col])
                        & (last(acc)["end"] == sp["start"]),
                        F.concat(
                            F.slice(acc, 1, F.size(acc) - 1),
                            F.array(
                                F.struct(
                                    sp[id_col].alias(id_col),
                                    last(acc)["start"].alias("start"),
                                    sp["end"].alias("end"),
                                )
                            ),
                        ),
                    ).otherwise(F.concat(acc, F.array(sp))),
                )

            full = blocks.filter(F.col("n_tokens") == B).select(
                (F.col("block_id") + base_block).alias("block_id"),
                ids_col,
                "n_tokens",
                merge_spans(F.col("doc_spans")).alias("doc_spans"),
            )
            n_full = full.count()
            (
                full.withColumn("batch_id", F.lit(bid))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(out_dir)
            )
            # the ragged remainder becomes the next batch's carry —
            # one piece row per doc slice, provenance intact; the
            # seq=-1 marker row carries next_block even when the
            # stream happens to align to the block boundary
            ragged = blocks.filter(F.col("n_tokens") < B)
            new_tail = ragged.select(
                F.posexplode("doc_spans").alias("seq", "__sp"),
                F.col(ids_col).alias("__bids"),
            ).select(
                F.col("seq").cast("int").alias("seq"),
                F.col(f"__sp.{id_col}").alias(id_col),
                F.slice(
                    "__bids",
                    (F.col("__sp.start") + 1).cast("int"),
                    (F.col("__sp.end") - F.col("__sp.start")).cast("int"),
                ).alias(ids_col),
            )
            marker = spark.range(1).select(
                F.lit(-1).cast("int").alias("seq"),
                F.lit(None).cast(id_t).alias(id_col),
                F.array().cast(f"array<{elem_t.simpleString()}>").alias(
                    ids_col
                ),
            )
            (
                new_tail.unionByName(marker)
                .withColumn("next_block", F.lit(base_block + n_full))
                .withColumn("batch_id", F.lit(bid))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(tail_dir)
            )
        finally:
            blocks.unpersist()

    q = (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    if not drive:
        return q
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return None


def drift_monitor_stream(
    stream_df: DataFrame,
    ref: DataFrame,
    *,
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
    bins: int = 10,
    top_k: int = 50,
    on_report=None,
):
    """Streaming twin of ``pipeline.drift.psi_report``: monitor each
    arriving micro-batch's distribution drift against a static
    reference snapshot via ``foreachBatch``.

    The reference side is computed ONCE before the query starts —
    quantile edges, reference bucket fractions, categorical top-k
    fractions, reference row count — so per batch the only work is
    the batch's own bucket/frequency aggregations (the same job
    shape ``psi_report`` documents for its "cur" side). Returns
    ``(start, reports)``: call ``start(stream_df.writeStream)``-style
    is NOT needed — ``start()`` takes no arguments, starts the
    query, and ``reports`` (a driver-side list) accumulates one
    ``{"batch_id": n, <column>: psi, ...}`` dict per micro-batch;
    ``on_report(batch_id, report)`` fires per batch for alert
    wiring. Driver state is O(batches x columns) floats — bounded by
    run length, not data.
    """
    from ..pipeline.drift import (
        _all_numeric_fracs,
        _numeric_edges,
        _psi,
        _value_fracs,
    )

    numeric_cols = numeric_cols or []
    categorical_cols = categorical_cols or []
    edges = _numeric_edges(ref, numeric_cols, bins) if numeric_cols else {}
    ref_fracs = {}
    n_ref = None
    if numeric_cols:
        ref_fracs, n_ref = _all_numeric_fracs(ref, edges)
    if categorical_cols and n_ref is None:
        n_ref = ref.count()
    ref_cat = {
        c: _value_fracs(ref, c, top_k, n_ref) for c in categorical_cols
    }
    reports: list[dict] = []

    def _on_batch(bdf: DataFrame, batch_id: int):
        if bdf.isEmpty():
            return
        rep: dict = {"batch_id": int(batch_id)}
        n_cur = None
        if numeric_cols:
            cur_fracs, n_cur = _all_numeric_fracs(bdf, edges)
            for c in numeric_cols:
                rep[c] = _psi(ref_fracs[c], cur_fracs[c])
        if categorical_cols:
            if n_cur is None:
                n_cur = bdf.count()
            for c in categorical_cols:
                rep[c] = _psi(ref_cat[c], _value_fracs(bdf, c, top_k, n_cur))
        reports.append(rep)
        if on_report is not None:
            on_report(int(batch_id), rep)

    def start():
        return stream_df.writeStream.foreachBatch(_on_batch).start()

    return start, reports


def frequent_items_stream(
    items: DataFrame,
    item_col: str = "item",
    capacity: int = 64,
    n_lanes: int = 8,
) -> DataFrame:
    """Streaming heavy hitters — the Structured-Streaming twin of
    ``pipeline.sketch.frequent_items``: per-lane SpaceSaving
    summaries (Metwally et al. 2005) maintained in the state store
    across micro-batches via ``applyInPandasWithState``, re-emitted
    per lane after every batch (update mode).

    Lanes partition the ITEM space by hash (``xxhash64(item) %
    n_lanes``) — every occurrence of an item lands in exactly ONE
    lane, so unlike the batch sketch's data-placement partitions, a
    tracked item's counter already holds its GLOBAL count bounds:
    lower = cnt − err, upper = cnt; an item tracked in no lane has
    true count ≤ its own lane's eviction floor. State is bounded at
    ``n_lanes × capacity`` counters no matter the stream length, and
    each lane updates from a per-batch ``value_counts`` (python loop
    over distinct items per batch, not rows).

    Emits one row per tracked item per batch:
    ``(lane, seq, item, cnt, err, lane_floor)`` with ``seq`` the
    lane's update counter — downstream takes each lane's max-seq rows
    for the current summary (``streaming_top_items`` does exactly
    that on a memory-sink table).
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    if capacity <= 0 or n_lanes <= 0:
        raise ValueError("capacity and n_lanes must be positive")

    out_schema = T.StructType(
        [
            T.StructField("lane", T.IntegerType()),
            T.StructField("seq", T.LongType()),
            T.StructField("item", T.StringType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("err", T.LongType()),
            T.StructField("lane_floor", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("its", T.ArrayType(T.StringType())),
            T.StructField("cnts", T.ArrayType(T.LongType())),
            T.StructField("errs", T.ArrayType(T.LongType())),
            T.StructField("seq", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            its, cnts, errs, seq = state.get
            counters = dict(zip(its, cnts))
            errors = dict(zip(its, errs))
        else:
            counters, errors, seq = {}, {}, 0
        for pdf in pdfs:
            vc = pdf["__item"].dropna().value_counts()
            for item, n in vc.items():
                n = int(n)
                if item in counters:
                    counters[item] += n
                elif len(counters) < capacity:
                    counters[item] = n
                    errors[item] = 0
                else:
                    evict = min(counters, key=counters.get)
                    m = counters.pop(evict)
                    errors.pop(evict)
                    counters[item] = m + n
                    errors[item] = m
        seq += 1
        state.update(
            (
                list(counters.keys()),
                [counters[i] for i in counters],
                [errors[i] for i in counters],
                seq,
            )
        )
        if counters:
            floor = (
                min(counters.values()) if len(counters) >= capacity else 0
            )
            yield pd.DataFrame(
                {
                    "lane": int(key[0]),
                    "seq": seq,
                    "item": list(counters.keys()),
                    "cnt": [counters[i] for i in counters],
                    "err": [errors[i] for i in counters],
                    "lane_floor": floor,
                }
            )

    lanes = items.select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(n_lanes))
        .cast("int")
        .alias("__lane"),
        F.col(item_col).cast("string").alias("__item"),
    )
    return lanes.groupBy("__lane").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_top_items(snapshot: DataFrame, k: int) -> DataFrame:
    """Collapse a ``frequent_items_stream`` sink table to the current
    global top-``k``: keep each lane's latest (max-seq) summary rows,
    rank by count upper bound (= ``cnt``: lanes partition the item
    space, so no cross-lane floor correction applies), tiebreak item
    asc. Returns ``(item, count_lower, count_upper)`` like the batch
    sketch. Driver-small input (≤ lanes × capacity rows per emitted
    batch)."""
    from pyspark.sql import Window  # noqa: PLC0415

    latest = (
        snapshot.withColumn(
            "__mx", F.max("seq").over(Window.partitionBy("lane"))
        )
        .filter(F.col("seq") == F.col("__mx"))
        .drop("__mx")
    )
    return (
        latest.select(
            "item",
            (F.col("cnt") - F.col("err")).alias("count_lower"),
            F.col("cnt").alias("count_upper"),
        )
        .orderBy(F.col("count_upper").desc(), F.col("item").asc())
        .limit(int(k))
    )
