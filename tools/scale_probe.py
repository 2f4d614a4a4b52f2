#!/usr/bin/env python3
"""Empirical scale probe: measure t(sf1) / t(sf0.1) per headline query.

The 100x-scale arguments in SCALE.md are made from plan shapes; this
probe measures a real 10x data scale-up so a super-linear driver-side
bottleneck (collect growth, per-row driver loops, quadratic candidate
generation) cannot hide behind a plan read.

sf1 (~10x sf0.1, ~6M lineitem rows) is DERIVED into /tmp/sf1 — never
touching the read-only testdata — as 10 id-offset copies of sf0.1:
every primary/foreign key family shifts by copy_index * 1e8 so joins
keep exactly their selectivity, and documents.text goes through a
per-copy vowel substitution so cross-copy rows are NOT near-duplicates
(10 verbatim copies would inflate every near-dup query's within-bucket
pair count quadratically — a fixture artifact, not an engine cost).
nation/region stay at their dimensional sizes, exactly as TPC-H scales.

Usage:
    python3 tools/scale_probe.py            # build if needed + probe
    python3 tools/scale_probe.py --rebuild  # force rebuild of /tmp/sf1

Prints a markdown table (for SCALE.md) of per-query times and ratios,
with the calibration probe bracketing the suites so host drift between
the two measurement windows is visible.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from bench import BENCH_QUERIES, _calibration_probe
from opencosmo_spark import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"

# the costliest extras (bench's extra_queries) — exactly the ones a
# headline-only probe would skip, added in r13 per the r12 verdict
EXTRA_PROBE = (
    "q47_dedup_clusters",
    "q49_ivf_lloyd_step",
    "q50_stratified_sample",
    "q60_semantic_dedup",
    "q66_pair_counts",
)
COPIES = 10
OFFSET = 100_000_000

# key families that shift together per copy (PK and every FK)
KEYED = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "part": ("p_partkey",),
    "supplier": ("s_suppkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
DIMS = ("nation", "region")

# per-copy vowel substitution alphabets: copy 0 is identity, the rest
# rewrite nearly every word so near-dup shingles don't repeat across
# copies (within-copy near-dup structure is preserved verbatim)
VOWEL_MAPS = [
    "aeiou", "eioua", "iouae", "ouaei", "uaeio",
    "bcdfg", "cdfgb", "dfgbc", "fgbcd", "gbcdf",
]


def build(spark, force=False) -> None:
    marker = os.path.join(DST, "_BUILT")
    if os.path.exists(marker) and not force:
        return
    print(f"# building {DST} from {SRC} ({COPIES} id-offset copies)",
          file=sys.stderr)
    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")
    for t, keys in KEYED.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for k in range(COPIES):
            d = base
            for col in keys:
                dt = base.schema[col].dataType
                d = d.withColumn(
                    col, (F.col(col) + F.lit(k * OFFSET)).cast(dt)
                )
            if t == "documents":
                d = d.withColumn(
                    "text", F.translate("text", "aeiou", VOWEL_MAPS[k])
                )
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    with open(marker, "w") as f:
        f.write("ok\n")


def time_suite(spark, sf_dir, reps=2) -> dict[str, float]:
    qs = entrymod.queries()
    out = {}
    for name in tuple(BENCH_QUERIES) + EXTRA_PROBE:
        fn = qs[name]
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"#   {sf_dir}: {name} {best:.3f}s", file=sys.stderr)
    return out


def main():
    force = "--rebuild" in sys.argv
    spark = get_spark("scale_probe")
    build(spark, force=force)
    cal0 = _calibration_probe(spark)
    t_small = time_suite(spark, SRC)
    cal1 = _calibration_probe(spark)
    t_big = time_suite(spark, DST)
    cal2 = _calibration_probe(spark)

    print(f"\ncalibration probes: before={cal0:.3f}s "
          f"between={cal1:.3f}s after={cal2:.3f}s")
    print("\n| query | t(sf0.1) s | t(sf1) s | ratio |")
    print("|---|---|---|---|")
    tot_s = tot_b = 0.0
    for name in BENCH_QUERIES:
        s, b = t_small[name], t_big[name]
        tot_s += s
        tot_b += b
        print(f"| {name} | {s:.3f} | {b:.3f} | {b / s:.1f}x |")
    print(f"| **total (headline)** | {tot_s:.3f} | {tot_b:.3f} | "
          f"{tot_b / tot_s:.1f}x |")
    for name in EXTRA_PROBE:
        s, b = t_small[name], t_big[name]
        print(f"| {name} (extra) | {s:.3f} | {b:.3f} | {b / s:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
