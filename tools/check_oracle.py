#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() twin at sf0.01,
compare row count + schema + exact values (columns sorted by name,
rows sorted) — stricter than the driver's hash.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

import os

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_connection():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return pdf


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        problems.append(f"schema mismatch: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count mismatch: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        # Dtype-strict kind check BEFORE any coercion: the driver hashes
        # formatted values, so an int64-vs-float64 divergence renders as
        # `-123` vs `-123.0` and hash-mismatches even when the values are
        # numerically equal (this is exactly how q64 shipped red in r5 —
        # DuckDB SUM(BIGINT)->HUGEINT->pandas float64 vs Spark int64).
        # Integer kinds ('i'/'u') may differ in width but must not face a
        # float kind ('f') on the other side; bool-vs-numeric also fails.
        kinds = {av.dtype.kind, bv.dtype.kind}
        if kinds <= {"i", "u"}:
            pass  # widths may differ; formatted values agree
        elif len(kinds) > 1 and not kinds <= {"O", "U"}:
            problems.append(
                f"col {c}: dtype kind mismatch spark={av.dtype} duck={bv.dtype}"
                " (driver hashes formatted values; int vs float renders"
                " differently) — CAST the oracle aggregate"
            )
            continue
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = np.isnan(av) & np.isnan(bv)
            eq = (av == bv) | both_nan
        else:
            eq = av == bv
        if not np.all(eq):
            bad = int(np.sum(~eq))
            i = int(np.argmax(~eq))
            problems.append(
                f"col {c}: {bad} mismatches; first at row {i}: "
                f"spark={av[i]!r} duck={bv[i]!r}"
            )
    return problems


def main():
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    only = set(sys.argv[1:])
    # Deliberately VANILLA session — the driver's harness passes its own
    # plain SparkSession into queries(), so any hidden dependency on the
    # engine's session factory (get_spark) must surface here too.
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    spark = (
        SparkSession.builder.appName("check_oracle_vanilla")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    con = duck_connection()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"okNO {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(sdf)} vs {len(ddf)} rows):")
            for p in problems[:4]:
                print(f"      {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
