"""Deterministic global shuffle + sharding for training-data output.

A training run wants the corpus (a) shuffled so consecutive examples
are decorrelated, (b) split into a fixed number of shards for the data
loader, and (c) REPRODUCIBLE — the same (shard, position) for every
row on every run, engine, and retry, so a resumed run reads the same
stream. An RNG shuffle gives none of that; a hash shuffle gives all
of it:

    shard = lane(id, seed) mod n_shards
    pos   = rank of lane within the shard (ties broken by id)

where ``lane`` is the 60-bit md5 lane (``dedup.md5_lane`` — uniform,
engine-portable). Ordering by a uniform hash IS the shuffle.

Scale shape: the lane/shard stamp is a pure row-local projection (no
shuffle). Exact per-shard positions use one ``row_number`` window
partitioned BY SHARD — n_shards concurrent sorts of corpus/n_shards
rows each. Real corpora shard into thousands of files precisely so
each shard fits a loader worker, which is the same property that keeps
each window partition executor-sized; never call this with n_shards
smaller than the cluster's parallelism at 100 TB. ``write_sharded``
skips the window entirely (hash-clustered files, lane-sorted within —
position is implied by file order), which is the write-path default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import md5_lane


def shard_lane(id_col: Column | str, seed: str = "") -> Column:
    """The 60-bit deterministic shuffle key for a row id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_lane(F.concat(c.cast("string"), F.lit(":" + seed)))


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "",
    shard_col: str = "shard",
    pos_col: str = "shard_pos",
    with_pos: bool = True,
) -> DataFrame:
    """Stamp each row with its shard and (optionally) its exact 0-based
    position in the shard's deterministic read order."""
    lane = shard_lane(id_col, seed)
    out = df.withColumn("__lane", lane).withColumn(
        shard_col, F.pmod(F.col("__lane"), F.lit(int(n_shards))).cast("int")
    )
    if with_pos:
        w = Window.partitionBy(shard_col).orderBy("__lane", id_col)
        out = out.withColumn(pos_col, F.row_number().over(w) - 1)
    return out.drop("__lane")


def write_sharded(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "",
    shard_col: str = "shard",
    mode: str = "error",
) -> None:
    """Write the deterministic shuffle to ``n_shards`` hash-clustered
    parquet files, lane-sorted within each — the loader reads file i
    top-to-bottom and gets exactly the ``assign_shards`` order without
    anyone having paid a per-shard ranking window.
    """
    lane = shard_lane(id_col, seed)
    staged = df.withColumn("__lane", lane).withColumn(
        shard_col, F.pmod(F.col("__lane"), F.lit(int(n_shards))).cast("int")
    )
    (
        staged.repartition(int(n_shards), F.col(shard_col))
        .sortWithinPartitions("__lane", id_col)
        .drop("__lane")
        .write.mode(mode)
        .parquet(path)
    )
