"""WebDataset-style tar sharding: the loader-side twin of
``write_sharded``. Training loaders (the public WebDataset convention:
tar archives where each sample is a group of adjacently-stored files
sharing a basename — ``{key}.txt``, ``{key}.json``, ``{key}.bin``)
stream shards sequentially; this module writes a DataFrame into that
layout and reads it back as rows.

Scale shape: one shard = one tar = one ``applyInPandas`` group, the
same unit a loader worker consumes. The deterministic shard/position
stamp comes from ``assign_shards`` (md5-lane hash shuffle), so the
same corpus always produces byte-identical shard membership and
in-shard order. Writes land on the filesystem visible to executors —
a shared FS or object-store mount on a cluster (same contract as any
Spark file sink); tar members are written in shard-position order so
the loader's sequential read IS the deterministic shuffle. Reading
distributes whole tar FILES via ``binaryFile`` (a shard is the
parallelism unit) and parses with stdlib ``tarfile`` inside
``mapInPandas``.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _encode(value, ext: str) -> bytes:
    if value is None:
        return b""
    if ext == "json":
        return json.dumps(value, sort_keys=True).encode()
    if isinstance(value, (bytes, bytearray)):
        return bytes(value)
    return str(value).encode()


def write_tar_shards(
    df: DataFrame,
    path: str,
    columns: dict[str, str],
    n_shards: int | None = None,
    key_col: str = "doc_id",
    seed: str = "",
    shard_col: str = "shard",
    name_format: str = "shard-{:05d}.tar",
) -> DataFrame:
    """Write ``df`` as WebDataset-style tar shards under ``path``.

    ``columns`` maps column name -> member extension: ``{"text":
    "txt", "meta": "json", "payload": "bin"}`` writes members
    ``{key}.txt``, ``{key}.json``, ``{key}.bin`` per row. Strings
    encode UTF-8, binaries pass through, ``json`` extensions
    serialize the value (dicts/struct rows included) canonically.

    Pass ``n_shards`` to stamp shards in-call via ``assign_shards``
    (deterministic md5-lane shuffle), or pre-stamp ``shard_col``
    yourself. Returns a small manifest DataFrame ``(shard, path,
    n_samples, n_bytes)`` — one row per written tar. The manifest is
    LAZY like any DataFrame: the tars are written when you act on it
    (``.collect()`` / ``.count()`` / write it somewhere).
    """
    for c in (key_col, *columns):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in the input")
    staged = df
    if n_shards is not None:
        from .shard import assign_shards

        staged = assign_shards(
            staged, n_shards, id_col=key_col, seed=seed,
            shard_col=shard_col, pos_col="__pos",
        )
    elif shard_col not in df.columns:
        raise ValueError(
            f"pass n_shards or a pre-stamped {shard_col!r} column"
        )
    if "__pos" not in staged.columns:
        from .shard import shard_lane

        staged = staged.withColumn("__pos", shard_lane(key_col, seed))

    os.makedirs(path, exist_ok=True)
    sel = staged.select(
        F.col(shard_col).cast("int").alias("__shard"),
        F.col("__pos").cast("long"),
        F.col(key_col).cast("string").alias("__key"),
        *[F.col(c) for c in columns],
    )
    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("path", T.StringType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )
    col_items = list(columns.items())

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        fname = os.path.join(path, name_format.format(shard))
        pdf = pdf.sort_values(["__pos", "__key"], kind="mergesort")
        keys = pdf["__key"].tolist()
        series = [(pdf[col].tolist(), col, ext) for col, ext in col_items]
        tmp = fname + ".__tmp__"
        with tarfile.open(tmp, "w") as tar:
            for i, key in enumerate(keys):
                for values, _col, ext in series:
                    data = _encode(values[i], ext)
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0  # reproducible archives
                    tar.addfile(info, io.BytesIO(data))
        os.replace(tmp, fname)
        return pd.DataFrame(
            {
                "shard": [shard],
                "path": [fname],
                "n_samples": [len(pdf)],
                "n_bytes": [os.path.getsize(fname)],
            }
        )

    return sel.groupBy("__shard").applyInPandas(write_group, out_schema)


TAR_SCHEMA = T.StructType(
    [
        T.StructField("shard_file", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def read_tar_shards(
    spark,
    path: str,
    path_glob: str = "*.tar",
    extensions: tuple[str, ...] | None = None,
) -> DataFrame:
    """Read WebDataset-style tar shards back as one row per (sample,
    member): ``(shard_file, key, ext, data)``. Files distribute via
    ``binaryFile``; parsing is stdlib ``tarfile`` in ``mapInPandas``.
    ``extensions`` prunes members before they reach Spark."""
    src = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", path_glob)
        .load(path)
        .select("path", "content")
    )
    want = set(extensions) if extensions else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    for m in tar:
                        if not m.isfile():
                            continue
                        key, dot, ext = m.name.rpartition(".")
                        if not dot:
                            key, ext = m.name, ""
                        if want is not None and ext not in want:
                            continue
                        rows.append(
                            (fpath, key, ext, tar.extractfile(m).read())
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in TAR_SCHEMA])

    return src.mapInPandas(run, TAR_SCHEMA)


def samples_from_members(df: DataFrame, extensions: tuple[str, ...]) -> DataFrame:
    """Pivot ``read_tar_shards`` rows into one row per sample with a
    binary column per extension: ``(shard_file, key, <ext>...)``.
    One hash aggregation on (shard_file, key)."""
    aggs = [
        F.max(F.when(F.col("ext") == e, F.col("data"))).alias(e)
        for e in extensions
    ]
    return df.groupBy("shard_file", "key").agg(*aggs)
