"""Ingest normalization: the layer that turns raw catalog tables into
scale-ready Spark layouts.

This replaces the reference's positional machinery (SURVEY §1.2 "the
single biggest model translation"): spatial octree cells, HEALPix
pixels, and link keys become ordinary columns computed once at ingest,
so every later query is a plain predicate/join that Catalyst can push
down and prune.

At 100 TB the ingest also decides physical layout: ``repartitionByRange``
on the cell column + ``sortWithinPartitions`` ⇒ z-order clustering ⇒
Parquet row-group min/max stats skip non-matching cells for any
spatial query; lightcones additionally ``partitionBy(step)`` for
directory-level pruning of redshift ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..spatial.bound import CELL_COL, PIXEL_COL
from ..spatial.octree import morton_cell_column


def ingest_snapshot(
    df: DataFrame,
    coord_cols: tuple[str, str, str],
    box_size: float,
    level: int = 4,
    cluster: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Attach the z-order octree cell column and (optionally) cluster
    the data by it."""
    cell = morton_cell_column(
        [F.col(c) for c in coord_cols], [0.0, 0.0, 0.0], box_size, level
    )
    out = df.withColumn(CELL_COL, cell)
    if cluster:
        n = partitions or df.sparkSession.sparkContext.defaultParallelism
        out = out.repartitionByRange(n, CELL_COL).sortWithinPartitions(CELL_COL)
    return out


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Bucketed ingest for co-located joins: persist ``df`` hash-bucketed
    (and sorted) by the link key via the table catalog.

    Two tables bucketed by the same key with the same bucket count join
    with ZERO exchange on either side — the bucket layout IS the hash
    partitioning, carried in catalog metadata, so every future
    halo↔particle cascade join starts pre-shuffled (the SCALE.md §2
    claim, asserted by plan test). Sorting within buckets additionally
    removes the join's sort. At 100 TB this is the difference between
    re-shuffling the particle table per query and never shuffling it
    again after ingest.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key).sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def ingest_lightcone(
    df: DataFrame,
    nside: int = 64,
    ra_col: str = "ra",
    dec_col: str = "dec",
    cluster: bool = True,
) -> DataFrame:
    """Attach the HEALPix (nested) pixel column for sky indexing."""
    from ..spatial.healpix import ang2pix_expr

    pix = ang2pix_expr(nside, F.col(ra_col), F.col(dec_col))
    out = df.withColumn(PIXEL_COL, pix)
    if cluster:
        n = df.sparkSession.sparkContext.defaultParallelism
        out = out.repartitionByRange(n, PIXEL_COL).sortWithinPartitions(PIXEL_COL)
    return out


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 512,
    cluster_col: str | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_mb`` files —
    the small-files compaction every long-running ingest eventually
    needs (streaming sinks and per-batch appends leave thousands of
    KB-sized files; at 100 TB the NameNode/object-store listing and
    per-file open costs dominate scan time long before the bytes do).

    Sizing comes from the directory's actual on-disk bytes (driver
    file listing via the JVM's Hadoop FileSystem — no data read), so
    the output count adapts to compression ratios. With
    ``cluster_col`` the rewrite uses ``repartitionByRange`` +
    ``sortWithinPartitions`` to restore clustering (identical posture
    to ``write_dataset``); without it a plain ``repartition`` balances
    bytes. Writes to ``<path>.__compact__`` then swaps — the rewrite
    is atomic-ish at the directory level; on an object store prefer
    a table format's transactional rewrite.

    Returns the number of output files.
    """
    import os
    import shutil

    # refuse layouts the flat rewrite would silently destroy: hive
    # key=value partition dirs (directory-level pruning would be lost)
    # and streaming-sink transaction logs
    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        if entry == "_spark_metadata" or (os.path.isdir(full) and "=" in entry):
            raise ValueError(
                f"{path} contains {entry!r}: compact each partition "
                "directory individually (or rewrite with "
                "write.partitionBy) — a flat rewrite would drop the "
                "partitioning/metadata"
            )
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_out = max(1, round(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if cluster_col is not None:
        out = df.repartitionByRange(n_out, F.col(cluster_col)).sortWithinPartitions(
            cluster_col
        )
    else:
        out = df.repartition(n_out)
    tmp = path.rstrip("/") + ".__compact__"
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return sum(
        1
        for _, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
