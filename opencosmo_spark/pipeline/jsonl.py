"""JSONL corpus I/O — the interchange format the published corpora
actually ship (Dolma, RedPajama, the Pile all distribute
newline-delimited JSON, usually gzipped). Thin by design: Spark's
native JSON source already does distributed reading, schema
inference/enforcement, and transparent gzip — this module only adds
the corpus conventions (a guaranteed ``doc_id``, a normalized
``text`` column, deterministic compression on write).

Scale shape: identical to any Spark file source — one task per file
split (gzip members are single-split; shard your corpus into many
files, which the writers here do), filters and projections push into
the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import md5_lane


def read_jsonl(
    spark,
    path: str,
    text_field: str = "text",
    id_field: str | None = "id",
    schema=None,
) -> DataFrame:
    """Read a JSONL corpus into the pipeline's document convention:
    ``doc_id`` (the source's id field when present, else the md5 lane
    of the text — stable across re-reads), ``text``, plus every other
    source field unchanged. Pass ``schema`` to skip inference (always
    do this in production — inference is an extra full read)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if text_field not in df.columns:
        raise ValueError(
            f"field {text_field!r} not found in {path} "
            f"(saw: {df.columns})"
        )
    text = F.col(text_field)
    if id_field is not None and id_field in df.columns:
        doc_id = F.col(id_field).cast("string")
    else:
        doc_id = md5_lane(text).cast("string")
    keep = [
        c for c in df.columns if c not in (text_field, id_field, "doc_id")
    ]
    return df.select(
        doc_id.alias("doc_id"), text.alias("text"), *keep
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    n_files: int | None = None,
    compress: bool = True,
    mode: str = "error",
) -> None:
    """Write a corpus as (gzipped) JSONL shards. ``n_files`` controls
    the shard count (repartition — use the corpus's natural
    partitioning when None)."""
    out = df.repartition(int(n_files)) if n_files else df
    w = out.write.mode(mode)
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)
