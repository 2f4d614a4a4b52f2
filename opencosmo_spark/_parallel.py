"""Scale-adaptive input spreading for compute-heavy operators.

A small parquet file (one row group) scans as ONE task, so every
per-row expression an operator runs before its first exchange —
shingling, minhash lanes, neighbor fan-out, tokenize+score — executes
single-threaded no matter how many cores the cluster has. At real
scale inputs arrive in many partitions and this is a no-op; at small
scale one tiny hash exchange of the operator's input buys
full-cluster parallelism for the compute that follows (guide §2.5
"input skew: one huge unsplittable file — repartition immediately
after the read", applied at the opposite end of the size range).

The partition probe is driver-only and job-free BY CONSTRUCTION
(r15): the old ``df.rdd.getNumPartitions()`` went through the
AQE-prepared executedPlan, and on an input containing exchanges AQE
materializes every query stage EAGERLY — real shuffle jobs ran at
builder time and their results were not reused by the later action
(upstream work executed twice). The probe now inspects the PRE-AQE
physical plan (``queryExecution().sparkPlan()``), and only for plans
with no Exchange/Subquery node — narrow scans, the only shape worth
spreading; a plan that already contains an exchange was just
repartitioned by that exchange, so the spread is pointless there
anyway. Probe results are memoized per (session, analyzed-plan
semanticHash): physical planning (~tens of ms of driver time) runs
once per distinct input shape per session instead of once per
operator construction.
"""

from __future__ import annotations

import os
from collections import OrderedDict

from pyspark.sql import DataFrame

# (session id, analyzed-plan semanticHash) -> partition count or None
# (None = plan not probe-safe). Bounded: oldest entries evicted.
_PROBE_MEMO: OrderedDict[tuple[int, int], int | None] = OrderedDict()
_PROBE_MEMO_MAX = 256


def _input_partitions(df: DataFrame) -> int | None:
    """Partition count of ``df``'s input, or None when it cannot be
    determined without running work. Job-free: uses the pre-AQE
    physical plan, and refuses plans containing Exchange (AQE stage
    materialization hazard; also already-parallel) or Subquery
    (``execute()`` would submit the subquery job)."""
    try:
        jqe = df._jdf.queryExecution()
        key = (id(df.sparkSession), jqe.analyzed().semanticHash())
        if key in _PROBE_MEMO:
            _PROBE_MEMO.move_to_end(key)
            return _PROBE_MEMO[key]
        plan = jqe.sparkPlan()  # physical planning only — no execution
        txt = plan.toString()
        if "Exchange" in txt or "Subquery" in txt:
            n: int | None = None
        else:
            # building the RDD lineage of a narrow plan runs no jobs
            n = plan.execute().getNumPartitions()
    except Exception:  # noqa: BLE001 — probing is best-effort
        return None
    _PROBE_MEMO[key] = n
    while len(_PROBE_MEMO) > _PROBE_MEMO_MAX:
        _PROBE_MEMO.popitem(last=False)
    return n


def spread_small_input(
    df: DataFrame, min_parts: int | None = None, key=None
) -> DataFrame:
    """Repartition ``df`` to ``min_parts`` (default: the session's
    defaultParallelism) partitions iff it currently has fewer — a
    no-op on already-parallel inputs (the 100 TB case) and on inputs
    whose partitioning cannot be probed without running work.

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
    except Exception:  # noqa: BLE001 — spreading is best-effort
        return df
    have = _input_partitions(df)
    if have is None or have >= want or want <= 1:
        return df
    if key is not None:
        return df.repartition(want, key)
    return df.repartition(want)
