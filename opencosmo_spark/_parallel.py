"""Scale-adaptive input spreading for compute-heavy operators.

A small parquet file (one row group) scans as ONE task, so every
per-row expression an operator runs before its first exchange —
shingling, minhash lanes, neighbor fan-out, tokenize+score — executes
single-threaded no matter how many cores the cluster has. At real
scale inputs arrive in many partitions and this is a no-op; at small
scale one tiny round-robin exchange of the operator's input buys
full-cluster parallelism for the compute that follows (guide §2.5
"input skew: one huge unsplittable file — repartition immediately
after the read", applied at the opposite end of the size range).

The check is driver-only (partition count from the planned RDD — no
job runs); the repartition is skipped whenever the input already has
at least ``defaultParallelism`` partitions, so cluster-scale plans are
untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def spread_small_input(
    df: DataFrame, min_parts: int | None = None, key=None
) -> DataFrame:
    """Round-robin ``df`` to ``min_parts`` (default: the session's
    defaultParallelism) partitions iff it currently has fewer — a
    no-op on already-parallel inputs (the 100 TB case).

    ``key`` (a Column over a high-cardinality deterministic value, e.g.
    a row id) switches to HASH repartitioning: a keyless round-robin
    first pays a local sort of its input (sortBeforeRepartition, on by
    default so retried tasks reproduce the row->partition map — guide
    §2.5), which serializes in exactly the single map task this helper
    exists to relieve; a deterministic key needs no such sort and is
    retry-safe by construction.

    ``OC_SPREAD_DISABLE=1`` turns the helper into a no-op — the A/B
    switch measurement harnesses flip without rebuilding plans."""
    if os.environ.get("OC_SPREAD_DISABLE"):
        return df
    try:
        sc = df.sparkSession.sparkContext
        want = int(min_parts or sc.defaultParallelism)
        have = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — spreading is best-effort
        return df
    if have >= want or want <= 1:
        return df
    if key is not None:
        return df.repartition(want, key)
    return df.repartition(want)
