#!/usr/bin/env python3
"""Per-query profiler for the optimization rounds (guide §1).

For every declared query (or the subset named on the CLI) this runs the
query like bench.py does (.count(), best-of-N) and records, per query:

* wall seconds per run (and best),
* the number of Spark JOBS the query triggered (driver round-trips —
  collect()s inside operator construction show up here),
* the number of stages and tasks (shuffle/AQE materialization overhead
  — at bench scale each stage costs ~10-50 ms of pure scheduling),
* a host-noise micro-probe immediately before each query,
* `.explain("formatted")` written to plans/<tag>/<query>_<suffix>.txt.

Job/stage/task counts come from the Spark UI REST API (the profiler
session enables the UI; bench.py keeps it off), diffed before/after
each timed run — counts are for ONE run of the query.

Usage:
    python tools/profile_queries.py [--plans-dir plans/r14] \
        [--suffix before] [--reps 3] [q39_ngram_jaccard ...]

Output: one JSON line per query on stdout (plus a human table on
stderr), full dump to /tmp/profile_<suffix>.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from opencosmo_spark import get_spark


def _ui_counts(port: int) -> tuple[int, int, int]:
    """(jobs, stages, tasks) completed so far, from the UI REST API."""
    base = f"http://localhost:{port}/api/v1/applications"
    with urllib.request.urlopen(base, timeout=10) as r:
        apps = json.load(r)
    app_id = apps[0]["id"]
    with urllib.request.urlopen(f"{base}/{app_id}/jobs", timeout=10) as r:
        jobs = json.load(r)
    n_jobs = len(jobs)
    n_stages = sum(len(j.get("stageIds", [])) for j in jobs)
    n_tasks = sum(j.get("numCompletedTasks", 0) + j.get("numFailedTasks", 0) for j in jobs)
    return n_jobs, n_stages, n_tasks


def _micro_probe() -> float:
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(200_000):
        acc += math.sin(i * 1e-3)
    _ = acc
    return round(time.perf_counter() - t0, 4)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--port", type=int, default=4040)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(args.port)},
    )
    qs = entrymod.queries()
    names = args.queries or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    # warm: JVM, parquet footers
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    results = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        probe = _micro_probe()
        runs = []
        jobs = stages = tasks = None
        n = 0
        for rep in range(args.reps):
            j0, s0, t0c = _ui_counts(args.port)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = round(time.perf_counter() - t0, 3)
            j1, s1, t1c = _ui_counts(args.port)
            runs.append(dt)
            # keep the LAST run's counts (steady state: caches warm)
            jobs, stages, tasks = j1 - j0, s1 - s0, t1c - t0c
        if args.plans_dir:
            txt = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
        spark.sparkContext.setJobDescription(None)
        rec = {
            "best": min(runs),
            "runs": runs,
            "rows": n,
            "jobs": jobs,
            "stages": stages,
            "tasks": tasks,
            "probe": probe,
        }
        results[name] = rec
        print(
            f"{name:28s} best={rec['best']:7.3f}s runs={runs} "
            f"jobs={jobs} stages={stages} tasks={tasks} rows={n} probe={probe}",
            file=sys.stderr,
        )
        print(json.dumps({name: rec}), flush=True)

    out = f"/tmp/profile_{args.suffix}.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"# full dump -> {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
