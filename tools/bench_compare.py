#!/usr/bin/env python3
"""Compare a bench run against a reference BENCH_r{N}.json and flag
per-query regressions.

Usage:
    python3 bench.py | tail -1 > /tmp/bench_now.json
    python3 tools/bench_compare.py /tmp/bench_now.json BENCH_r01.json [ratio]

Exit code 1 when any shared query exceeds `ratio` (default 1.5) times
the reference, so it can gate a round's final commit.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accept either the raw bench stdout (one {"metric": ...} line,
    possibly with log noise) or the driver's BENCH_r{N}.json wrapper
    (metric line embedded in its "tail" string)."""
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
        if "metric" in doc:
            return doc
        text = doc.get("tail", "")
    except json.JSONDecodeError:
        pass
    start = text.rfind('{"metric"')
    if start < 0:
        raise SystemExit(
            f"error: {path} contains no bench metric line "
            '(expected a {"metric": ...} JSON object)'
        )
    return json.loads(text[start:].splitlines()[0])


def main() -> int:
    now = load(sys.argv[1])
    ref = load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    def all_queries(d: dict) -> dict:
        out = dict(d.get("queries", {}))
        out.update(d.get("extra_queries", {}))
        return out

    qn, qr = all_queries(now), all_queries(ref)
    shared = sorted(set(qn) & set(qr))
    bad = []
    for q in shared:
        r = qn[q] / qr[q] if qr[q] > 0 else float("inf")
        flag = " <-- REGRESSION" if r > ratio else ""
        print(f"{q:28s} {qr[q]:7.3f}s -> {qn[q]:7.3f}s  ({r:4.2f}x){flag}")
        if r > ratio:
            bad.append(q)
    total_ratio = now["value"] / ref["value"] if ref["value"] else float("inf")
    print(
        f"\ntotal {ref['value']:.3f}s -> {now['value']:.3f}s "
        f"({total_ratio:.2f}x), {len(shared)} shared queries, "
        f"{len(bad)} over {ratio}x"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
