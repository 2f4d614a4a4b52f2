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


def hadoop_fs(spark, path: str):
    """(jvm, FileSystem, Path) for any Hadoop-supported URI. The one
    place driver-side filesystem metadata operations go through —
    os.listdir/shutil only see the driver's local disk, which silently
    breaks maintenance tooling the moment a table lives on HDFS/S3."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


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
    file listing through the Hadoop FileSystem API — no data read),
    so the output count adapts to compression ratios and the whole
    rewrite works on any Hadoop-supported URI (file://, hdfs://,
    s3a://...), not just driver-local paths. With ``cluster_col`` the
    rewrite uses ``repartitionByRange`` + ``sortWithinPartitions`` to
    restore clustering (identical posture to ``write_dataset``);
    without it a plain ``repartition`` balances bytes. Writes to
    ``<path>.__compact__`` then delete-and-renames — there is a
    non-atomic window between the delete and the rename (a reader
    racing the swap sees a missing directory), and on S3 the rename
    is itself a copy: for concurrent-reader production tables prefer
    a table format's transactional rewrite (the docstring contract
    here is single-writer maintenance windows).

    Returns the number of output files.
    """
    jvm, fs, jpath = hadoop_fs(spark, path)

    # refuse layouts the flat rewrite would silently destroy: hive
    # key=value partition dirs (directory-level pruning would be lost)
    # and streaming-sink transaction logs
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name == "_spark_metadata" or (st.isDirectory() and "=" in name):
            raise ValueError(
                f"{path} contains {name!r}: compact each partition "
                "directory individually (or rewrite with "
                "write.partitionBy) — a flat rewrite would drop the "
                "partitioning/metadata"
            )

    def _parquet_stats():
        n, total = 0, 0
        it = fs.listFiles(jpath, True)
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().endswith(".parquet"):
                n += 1
                total += st.getLen()
        return n, total

    _, total = _parquet_stats()
    n_out = max(1, round(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if cluster_col is not None:
        out = df.repartitionByRange(n_out, F.col(cluster_col)).sortWithinPartitions(
            cluster_col
        )
    else:
        out = df.repartition(n_out)
    # swap order guarantees a complete copy exists at every step:
    # write tmp -> set aside the original -> promote tmp -> drop the
    # set-aside. A failure at any point leaves either the original
    # (still at path, or restorable by renaming .__old__ back) or the
    # compacted copy in place — never a window with data only at a
    # temp path after the original is gone.
    tmp = path.rstrip("/") + ".__compact__"
    old = path.rstrip("/") + ".__old__"
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(old)
    out.write.mode("overwrite").parquet(tmp)
    if fs.exists(jold) and not fs.delete(jold, True):
        raise IOError(f"stale {old} exists and could not be removed")
    if not fs.rename(jpath, jold):
        raise IOError(
            f"could not set aside {path} -> {old} for the compaction "
            f"swap; original untouched, compacted copy at {tmp}"
        )
    if not fs.rename(jtmp, jpath):
        # restore the original so the dataset path stays valid
        fs.rename(jold, jpath)
        raise IOError(
            f"rename {tmp} -> {path} failed; original restored, "
            f"compacted copy left at {tmp}"
        )
    fs.delete(jold, True)
    return _parquet_stats()[0]
