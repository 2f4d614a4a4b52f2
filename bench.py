#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (collect to count) — timings
include the full scan->shuffle->result path, not plan construction.
Each headline query runs three times and reports the fastest run:
the steady-state number a long-lived cluster sees (the first run
pays one-time JVM JIT, codegen compilation, and file-listing costs
that amortize to zero in production, and interleaved same-code
measurements on this shared VM swing +-15% run-to-run — best-of-3
suppresses that noise; all runs re-read parquet from disk, no
df.cache()).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from opencosmo_spark import get_spark

# The 18 headline queries fixed since round 1 — the "value" total stays
# round-over-round comparable. Later operators are timed separately in
# "extra_queries" (reported, but excluded from the headline total).
BENCH_QUERIES = [
    "q01_scan_filter_project",
    "q08_sort_topk",
    "q13_zscore",
    "q15_tpch_q1",
    "q16_degrade",
    "q21_semi_cascade",
    "q22_join_nested_agg",
    "q26_window_topk",
    "q27_window_running",
    "q28_time_window",
    "q29_spatial_box",
    "q31_dedup_fingerprint",
    "q33_cosine_topk",
    "q35_minhash_lsh",
    "q37_sessionize",
    "q39_ngram_jaccard",
    "q40_ann_lsh",
    "q44_asof_join",
]

EXTRA_QUERIES = [
    "q43_grouping_sets",
    "q47_dedup_clusters",
    "q49_ivf_lloyd_step",
    "q50_stratified_sample",
    "q51_tpch_q3",
    "q58_decontaminate",
    "q59_pii_scrub",
    "q60_semantic_dedup",
    "q61_shard_assign",
    "q62_line_dedup",
    "q63_bm25_topk",
    "q64_nb_classify",
    "q65_dup_spans",
    "q66_pair_counts",
]


def _calibration_probe(spark) -> float:
    """Fixed CPU-bound JVM probe, independent of the repo's code and of
    the data on disk: an arithmetic aggregation over a generated
    10⁷-row range. Its runtime tracks host speed (CPU clock, JIT,
    steal) and nothing else, so cross-round headline comparisons can
    divide by it — rounds r6→r8 showed uniform 1.2-1.5× swings on
    UNCHANGED query code that were pure host drift (SCALE.md). Best-of-3
    like the queries; the probe runs before the suite so it also
    absorbs first-job JVM warmup."""
    from pyspark.sql import functions as F

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        x = F.col("id").cast("double")
        spark.range(0, 10_000_000, 1, 32).agg(
            F.sum(F.sin(x * 1e-6) * F.cos(x * 1e-7) + F.sqrt(x))
        ).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    qs = entrymod.queries()

    # warm the JVM + parquet footers with a trivial action
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    calibration = _calibration_probe(spark)
    print(f"# calibration_probe: {calibration:.3f}s", file=sys.stderr)

    # one failing query must not zero the whole artifact: record its
    # error, keep timing the rest, total over the survivors
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = qs[name]
        best, n = None, 0
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                n = df.count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        except Exception as e:  # noqa: BLE001 — isolate per query
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    # extras get the same best-of-3 protocol as the headliners: on a
    # shared VM with ±15% run-to-run swing, single-shot extras made
    # round-over-round deltas unclassifiable (r6's q63 "regression"
    # was pure single-shot noise — see SCALE.md)
    extra: dict[str, float] = {}
    for name in EXTRA_QUERIES:
        fn = qs.get(name)
        if fn is None:
            continue
        best, n = None, 0
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                n = fn(spark, sf_dir).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        except Exception as e:  # noqa: BLE001 — isolate per query
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        extra[name] = round(best, 3)
        print(f"# {name}: {extra[name]:.3f}s ({n} rows) [extra]", file=sys.stderr)

    # second probe AFTER the suite: a single start-of-run probe can't
    # see interference that arrives mid-suite (observed r9: probe
    # 0.44 s, then queries 4-8x their quiet-window times minutes
    # later) — the start/end pair brackets the run
    calibration_end = _calibration_probe(spark)
    print(f"# calibration_probe_end: {calibration_end:.3f}s", file=sys.stderr)

    out = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "extra_queries": extra,
        "calibration_sec": calibration,
        "calibration_end_sec": calibration_end,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
