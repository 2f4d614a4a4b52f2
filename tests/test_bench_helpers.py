"""bench.py noise-hygiene helpers: the history-median gate that
catches sustained noise windows (all three runs slow together, intra-
run spread clean — r10's q35 recorded 9.881s at spread 1.34, 8.7x its
steady state) and the compact-driver-line contract."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _write(path, doc):
    with open(path, "w") as f:
        json.dump(doc, f)


def test_history_medians_same_sf_only(tmp_path):
    d = str(tmp_path)
    _write(
        f"{d}/BENCH_r01.json",
        {"metric": "x", "sf": 0.1, "queries": {"q1": 1.0}, "extra_queries": {"e1": 2.0}},
    )
    _write(
        f"{d}/BENCH_r02.json",
        {"metric": "x", "sf": 0.1, "queries": {"q1": 3.0}},
    )
    _write(
        f"{d}/BENCH_r03.json",
        {"metric": "x", "sf": 0.01, "queries": {"q1": 100.0}},  # other SF
    )
    h = bench._history_medians(d, sf=0.1)
    assert h["q1"] == 2.0  # median of 1.0, 3.0 — the 0.01 round excluded
    assert h["e1"] == 2.0
    # no sf filter -> all rounds pool
    assert bench._history_medians(d)["q1"] == 3.0


def test_history_medians_driver_wrapper_and_junk(tmp_path):
    d = str(tmp_path)
    line = json.dumps({"metric": "x", "sf": 0.1, "queries": {"q1": 4.0}})
    _write(
        f"{d}/BENCH_r01.json",
        {"parsed": None, "tail": "WARN noise\n" + line + "\n"},
    )
    with open(f"{d}/BENCH_r02.json", "w") as f:
        f.write("not json at all")
    _write(f"{d}/BENCH_r03.json", {"parsed": None, "tail": "no metric here"})
    h = bench._history_medians(d, sf=0.1)
    assert h == {"q1": 4.0}


def test_history_gate_replays_r10_sustained_window():
    """The real artifact history must flag r10's sustained-noise q35
    measurement (9.881s, intra-run spread only 1.34x) at the 2.5x
    gate, while its quiet steady state (~0.96s) passes."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = bench._history_medians(repo, sf=0.1)
    if "q35_minhash_lsh" not in h:
        import pytest

        pytest.skip("no sf0.1 bench history in this checkout")
    med = h["q35_minhash_lsh"]
    assert 9.881 > bench.HISTORY_RATIO * med  # the r10 miss now flags
    assert 0.957 <= bench.HISTORY_RATIO * med  # steady state passes
