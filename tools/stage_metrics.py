#!/usr/bin/env python3
"""Run one declared query and print per-stage metrics (guide §7.1,
UI REST API): stage name, tasks, executorRunTime, shuffle bytes.

Usage: python tools/stage_metrics.py q66_pair_counts [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from opencosmo_spark import get_spark


def main() -> int:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    port = int(os.environ.get("PROFILE_UI_PORT", "4041"))
    spark = get_spark(
        "stagemetrics",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(port)},
    )
    fn = entrymod.queries()[name]
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    # warm runs, keep the last
    for _ in range(reps - 1):
        fn(spark, sf_dir).count()

    base = f"http://localhost:{port}/api/v1/applications"
    with urllib.request.urlopen(base, timeout=10) as r:
        app_id = json.load(r)[0]["id"]

    def stages():
        with urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10) as r:
            return {s["stageId"]: s for s in json.load(r)}

    s0 = stages()
    t0 = time.perf_counter()
    n = fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    s1 = stages()
    new = [s for sid, s in sorted(s1.items()) if sid not in s0]
    print(f"# {name}: wall={wall:.3f}s rows={n} stages={len(new)}")
    tot_rt = 0
    for s in new:
        rt = s.get("executorRunTime", 0)
        cpu = s.get("executorCpuTime", 0) // 1_000_000
        tot_rt += rt
        print(
            f"stage {s['stageId']:>4} tasks={s.get('numCompleteTasks', 0):>3} "
            f"runTime={rt / 1000:7.3f}s cpu={cpu / 1000:7.3f}s "
            f"shufW={s.get('shuffleWriteBytes', 0):>10} "
            f"shufR={s.get('shuffleReadBytes', 0):>10} "
            f"in={s.get('inputBytes', 0):>10} "
            f"| {s.get('name', '')[:70]}"
        )
    print(f"# sum executorRunTime = {tot_rt / 1000:.3f}s (wall {wall:.3f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
